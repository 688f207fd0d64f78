"""FastLoader: cache-backed and progressive index loading.

Parity with the reference ``FastLoader`` (``core.py:4093-4505``):
- ``load_with_cache``: metadata parsing (the slow, per-record JSON part of
  an index open) is cached in the two-tier CacheManager keyed by file
  identity (path, mtime, size) — warm re-opens skip the parse entirely;
- ``progressive_load``: the container opens and *searches become available
  immediately* over a growing prefix while embedding chunks stream to the
  device in a background thread (reference chunked/background loading,
  ``core.py:4161+``). The fused top-k kernel's dynamic ``n_valid`` makes
  the growing prefix free — no recompiles as rows arrive.
"""

from __future__ import annotations

import functools
import threading
from pathlib import Path
from typing import Callable

import numpy as np

from ..utils.cache import CacheManager
from .unified import UnifiedIndex, UnifiedIndexConfig

__all__ = ["FastLoader"]


def _file_key(path: Path) -> str:
    st = path.stat()
    return f"fastload::{path.resolve()}::{st.st_mtime_ns}::{st.st_size}"


class FastLoader:
    def __init__(
        self,
        cache: CacheManager | None = None,
        config: UnifiedIndexConfig | None = None,
    ) -> None:
        self.cache = cache
        self.config = config

    # -- cached load ---------------------------------------------------------

    def load_with_cache(self, path: str | Path) -> UnifiedIndex:
        """Open an index; reuse cached parsed metadata when file unchanged."""
        path = Path(path)
        index = UnifiedIndex(self.config)
        cached_records = None
        key = None
        if self.cache is not None and path.is_file():
            key = _file_key(path)
            cached_records = self.cache.get(key)
        if cached_records is not None:
            index._container = __import__(
                "intelligent_video_analysis_retrieval_system_tpu.index.container",
                fromlist=["IndexContainer"],
            ).IndexContainer(path, mode="r")
            index.path = path
            from ..retrieval.results import KeyframeMetadata

            index._metadata = [
                KeyframeMetadata.from_dict(r) for r in cached_records
            ]
            index._row_by_key = {m.key: m.row_id for m in index._metadata}
            index._upload_embeddings()
            index.load_time_s = 0.0
            return index
        index.load_unified_index(path, mode="r")
        if self.cache is not None and key is not None:
            records = [m.to_dict() for m in index._metadata]
            self.cache.set(key, records, ttl_s=7 * 24 * 3600)
        return index

    # -- progressive load ------------------------------------------------------

    def progressive_load(
        self,
        path: str | Path,
        chunk_rows: int = 100_000,
        on_progress: Callable[[int, int], None] | None = None,
    ) -> tuple[UnifiedIndex, threading.Thread]:
        """Open immediately; stream embeddings to device in the background.

        Returns (index, loader_thread). ``index.ntotal`` grows as chunks
        land; searches run over the loaded prefix at any time. Join the
        thread (or poll ``index.ntotal``) for completion.
        """
        import jax
        import jax.numpy as jnp

        from ..ops.topk import TILE_N

        path = Path(path)
        index = UnifiedIndex(self.config)
        from .container import IndexContainer

        container = IndexContainer(path, mode="r")
        index._container = container
        index.path = path
        index._load_metadata_cache()

        total = container.num_rows
        dim = container.dim
        cap = max(TILE_N, -(-total // TILE_N) * TILE_N)
        dtype = jnp.bfloat16 if container.dtype == "bfloat16" else jnp.float32
        index._dev_x = jnp.zeros((cap, dim), dtype)
        index._capacity = cap
        index._n_valid = 0
        # tombstones apply from the start (the manual device-state path
        # bypasses _upload_embeddings, which normally loads the delete log)
        index._deleted = container.deleted_rows()
        if index._deleted:
            index._rebuild_deleted_mask()

        # donated jitted updater: the buffer is updated in place rather
        # than copied per chunk (an eager dynamic_update_slice would copy
        # the whole padded buffer every chunk — O(total^2/chunk) traffic)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def _update(buf, rows, start):
            return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

        def loader() -> None:
            loaded = 0
            while loaded < total:
                end = min(loaded + chunk_rows, total)
                rows = container.read_embeddings(loaded, end, as_float32=True)
                if index.config.normalize:
                    rows = rows / np.maximum(
                        np.linalg.norm(rows, axis=-1, keepdims=True), 1e-12
                    )
                # fixed chunk shape (pad the tail) -> one compile
                if rows.shape[0] < chunk_rows:
                    rows = np.concatenate([
                        rows,
                        np.zeros((chunk_rows - rows.shape[0], dim), np.float32),
                    ])
                with index._lock:
                    index._dev_x = _update(
                        index._dev_x, jnp.asarray(rows, dtype),
                        jnp.int32(loaded),
                    )
                    index._n_valid = end
                loaded = end
                if on_progress is not None:
                    on_progress(loaded, total)

        thread = threading.Thread(target=loader, daemon=True)
        thread.start()
        return index, thread
