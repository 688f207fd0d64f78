"""Multi-chip scale: mesh construction, sharded search, distributed training.

This layer is the TPU-native replacement for the reference's LAN-P2P
distributed search (``api.py:305-1810``, ``system.py:1715-1757``): instead
of HTTP fan-out to desktop peers, the embedding matrix shards across a
``jax.sharding.Mesh`` and per-shard top-k results merge over ICI
collectives inside one ``shard_map`` program (SURVEY.md §2.3, §5.8).
"""

from .mesh import MeshSpec, create_mesh, device_info
from .sharded_ann import ShardedIVF, make_sharded_ivf, sharded_ivf_topk
from .sharded_search import ShardedIndexSearcher, sharded_topk
from .train import CLIPTrainer, TrainConfig

__all__ = [
    "MeshSpec",
    "create_mesh",
    "device_info",
    "ShardedIndexSearcher",
    "ShardedIVF",
    "make_sharded_ivf",
    "sharded_ivf_topk",
    "sharded_topk",
    "CLIPTrainer",
    "TrainConfig",
]
