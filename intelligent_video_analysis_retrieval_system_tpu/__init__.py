"""Intelligent Video Analysis & Retrieval System — TPU-native.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
`DMDung2k3/Intelligent-Video-Analysis-Retrieval-System` (reference at
`/root/reference`, see SURVEY.md): video ingest -> keyframe filtering ->
CLIP embedding -> vector index -> top-k search -> serving, designed
device-first for TPU:

- all math (encoders, similarity search, dedup, image quality metrics)
  runs under `jit` on TPU; the search core is a fused Pallas
  matmul + streaming-top-k kernel over an HBM-resident embedding matrix,
- multi-chip scale uses `jax.sharding.Mesh` + `shard_map` with ICI
  collectives (replacing the reference's LAN-P2P HTTP fan-out,
  reference `system.py:1715-1757`),
- host code does I/O and orchestration only.

Public API (matches the capability checklist in BASELINE.json):

- :class:`ingest.FrameFilter` — ``extract_frames`` / ``apply_filters``
- :class:`index.RAGBuilder` — ``build_index``
- :class:`index.UnifiedIndex` — ``search`` / ``augmented_search``
- :class:`system.EnhancedRetrievalSystem` — facade (build/load/search/chat/serve)

Imports are lazy so that lightweight consumers (e.g. the serving layer)
do not pay for model imports.
"""

from __future__ import annotations

import importlib
from typing import Any

__version__ = "0.2.0"

# Lazily-resolved public symbols -> defining module (relative).
_LAZY: dict[str, str] = {
    # facade
    "EnhancedRetrievalSystem": ".system.facade",
    "SearchOptions": ".system.facade",
    "create_system": ".system.facade",
    "quick_search": ".system.facade",
    # ingest
    "FrameFilter": ".ingest.frames",
    "FrameFilterConfig": ".ingest.frames",
    # index
    "RAGBuilder": ".index.builder",
    "UnifiedIndex": ".index.unified",
    "UnifiedIndexConfig": ".index.unified",
    "PortableIndex": ".index.portable",
    # retrieval data models
    "KeyframeMetadata": ".retrieval.results",
    "SearchResult": ".retrieval.results",
    # config / logging
    "Config": ".utils.config",
    "Logger": ".utils.logging",
    "get_config": ".utils.config",
    "get_logger": ".utils.logging",
}

__all__ = sorted(_LAZY) + ["__version__"]


def __getattr__(name: str) -> Any:
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    module = importlib.import_module(mod, __name__)
    value = getattr(module, name)
    globals()[name] = value
    return value


def __dir__() -> list[str]:
    return __all__
