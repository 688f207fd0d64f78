"""Sharded multi-device search demo (works on a virtual CPU mesh).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_search.py
"""

import sys
from pathlib import Path

# make the example runnable as `python examples/<name>.py` from anywhere:
# `python path/to/script.py` puts the script's OWN directory on sys.path,
# not the repo root that holds the package
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax

    if jax.device_count() < 2:
        jax.config.update("jax_platforms", "cpu")  # may still be 1; fine

    import jax.numpy as jnp

    from intelligent_video_analysis_retrieval_system_tpu.parallel import (
        MeshSpec,
        ShardedIndexSearcher,
        create_mesh,
    )

    n_dev = jax.device_count()
    mesh = create_mesh(MeshSpec(axis_names=("index",), shape=(n_dev,)))
    print(f"mesh: {n_dev} devices on axis 'index'")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((100_000, 256)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)

    searcher = ShardedIndexSearcher(mesh, dtype=jnp.float32)
    searcher.load(x)
    print("stats:", searcher.stats())

    q = x[:4]  # self-queries: expect ids 0..3 at rank 1
    res = searcher.search(q, k=5)
    print("top-1 ids:", np.asarray(res.indices)[:, 0])

    # -- sharded ANN: the IVF latency mode through the same mesh ----------
    # (global k-means, per-shard partitioned buckets, identical results to
    # single-device IVF; see docs/SCALING.md §2 and parallel/sharded_ann.py)
    from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
        build_ivf,
    )

    state, report = build_ivf(searcher._x, n_rows=searcher.n_valid,
                              nlist=256, kmeans_iters=4)
    searcher.set_ann(state)
    print(f"sharded ANN: nlist={report.nlist} cap={report.bucket_cap} "
          f"(buckets partitioned over {n_dev} shards)")
    ares = searcher.search_ann(q, k=5, nprobe=16)
    print("ANN top-1 ids:", np.asarray(ares.indices)[:, 0],
          "(probe 16/256 clusters per query)")
    exact_top1 = np.asarray(res.indices)[:, 0]
    ann_top1 = np.asarray(ares.indices)[:, 0]
    print("ANN == exact at rank 1:", bool((exact_top1 == ann_top1).all()))


if __name__ == "__main__":
    main()
