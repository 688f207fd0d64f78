"""UnifiedIndex: the searchable single-file index engine.

API-parity with the reference ``UnifiedIndex`` (``unified_index.py:94-636``):
``create_unified_index`` / ``load_unified_index`` / ``search_vectors`` /
``get_thumbnail`` / ``get_full_image`` / ``get_temporal_context`` /
``incremental_update`` — plus the BASELINE.json names ``search`` and
``augmented_search``.

TPU-native differences:
- the searchable state is a padded device array (bf16) + live row count;
  search is ``ops.topk.topk_search`` (fused Pallas kernel), not FAISS;
- index load = one bulk read + one host->HBM transfer (no FAISS
  deserialize — the reference stored a serialized FAISS blob,
  ``unified_index.py:1795-1829``);
- appends go into pre-padded device capacity via ``dynamic_update_slice``
  without recompilation (capacity doubles on overflow);
- similarity IS the inner product (cosine on normalized rows). The
  reference converted L2 distance as ``1 - d`` (``unified_index.py:507``).
"""

from __future__ import annotations

import functools
import threading
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Sequence

import numpy as np

from ..ops.topk import TILE_N, TopKResult, topk_search
from ..retrieval.results import KeyframeMetadata, SearchResult
from .container import IndexContainer

__all__ = ["UnifiedIndex", "UnifiedIndexConfig"]


def _fold_norm_into_scales(rows_i8: "np.ndarray", scales: "np.ndarray") -> "np.ndarray":
    """Fold row L2-normalization into the int8 dequant scale:
    ``score = (q . int) / ||int||``. The ONE definition shared by every
    upload and in-place-append site — the bit-exact append-vs-reload
    contract depends on these staying identical.

    Chunked integer math: sums of squares of int8 rows are exact integers
    < 2^24, so the result is bit-identical for ANY summation order or
    chunking (and never materializes an f32 copy of the whole corpus —
    the old whole-array ``astype(f32)`` cost 4 bytes/elem of RAM and a
    full-corpus pass at every load)."""
    out = np.asarray(scales, np.float32).copy()
    CH = 1_000_000
    for s in range(0, len(rows_i8), CH):
        q = rows_i8[s:s + CH].astype(np.int32)
        n2 = np.einsum("nd,nd->n", q, q)              # exact integers
        norms = np.sqrt(n2.astype(np.float32))        # exact f32 inputs
        inv = (1.0 / np.maximum(norms, 1e-12)).astype(np.float32)
        live = n2 > 0
        view = out[s:s + CH]
        view[live] = inv[live]
    return out


@functools.lru_cache(maxsize=16)
def _norm_upload_program(rows: int, d: int, src: str, out_name: str,
                         normalize: bool):
    """Jitted chunk program: raw storage chunk -> (optionally L2-normalized)
    rows written into a donated (cap, d) device buffer.

    Normalization belongs ON DEVICE: the former host path converted bf16
    bits to f32 and ran numpy ``norm`` over the whole corpus — measured
    tens of seconds per 200k rows on this 1-core host (profiled: 40 s
    convert + 34 s norm) vs milliseconds of device time — and it defeated
    the container's raw-bits zero-convert upload design.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    out_dtype = jnp.bfloat16 if out_name == "bfloat16" else jnp.float32

    def fn(buf, chunk, start):
        x = chunk
        if src == "bf16_bits":
            x = lax.bitcast_convert_type(x, jnp.bfloat16)
        xf = x.astype(jnp.float32)
        if normalize:
            nrm = jnp.maximum(
                jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-12
            )
            xf = xf / nrm
        return lax.dynamic_update_slice(
            buf, xf.astype(out_dtype), (start, 0)
        )

    return jax.jit(fn, donate_argnums=(0,))


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(slots=True)
class UnifiedIndexConfig:
    """Build/runtime knobs (parity with ``unified_index.py:49-60``)."""

    chunk_size: int = 1024
    checkpoint_every_chunks: int = 5
    store_thumbnails: bool = True
    thumbnail_size: int = 224
    store_full_images: bool = False
    dtype: str = "bfloat16"
    incremental_rebuild_threshold: float = 0.10
    temporal_window: int = 5  # reference precomputes +-5 (unified_index.py:1133)
    normalize: bool = True
    # IVF approximate search (ops.ann): opt-in latency mode matching the
    # reference's approximate index types (core.py:1213-1216). Applies to
    # every device backend — mesh-backed indexes run the partitioned
    # sharded program (parallel.sharded_ann), equal to the single-device
    # result. Batches larger than ann_max_batch fall back to the dense
    # sweep. Round 4's batched union program (ops.ann
    # _build_ivf_batch_searcher: probed buckets dedup across the batch,
    # one shared row gather, one GEMM) replaced the round-3 per-query
    # batching (which materialized B duplicated candidate tensors and
    # lost to dense above B=4: 21.5 vs 13.7 ms/batch at B=8 over 10M);
    # the crossover default is 4 — CHIP-MEASURED at 10M rows (round 5,
    # benchmarks/exp_ivf_10m.py on the real v5e): the union program wins
    # 2.15x at B=4, is break-even at B=8 on a clustered corpus (and
    # LOSES 0.81x at B=8 on the uniform bench corpus), and loses 0.63x /
    # 0.43x at B=16 — the round-4 CPU smoke that suggested >=16 did not
    # transfer to the chip. Per-index measure_ann_crossover() overrides
    # this static guess with the corpus's own measured crossover.
    ann: bool = False
    ann_nlist: int | None = None     # None = ops.ann.default_nlist(n)
    ann_nprobe: int = 32
    ann_max_batch: int = 4
    # int8 exact-rescore mode (round 4): containers built with this flag
    # keep a bf16 copy of every row on DISK (embeddings_fp; HBM keeps the
    # 2x int8 capacity win), and searches rescore the int8 top
    # (k * int8_rescore_factor) candidates at full precision on the host
    # (~100 KB gather/query) — recovering the exact bf16 ranking whenever
    # int8's widened candidate set contains it (int8 top-10 overlap is
    # already 97.5%; the x4 widening closes the rest; see cli evaluate
    # --search int8_rescore). Reference exactness contract: core.py:
    # 1204-1212 forces exact Flat.
    int8_rescore: bool = False
    int8_rescore_factor: int = 4
    # opt-in (round 5, VERDICT r4 #8): keep the bf16 rescore rows resident
    # in HOST RAM instead of gathering them from disk per query. DEVICE
    # residency would be self-defeating at capacity scale (the bf16 copy
    # of a 10M corpus is 15.4 GB — it doesn't fit v5e HBM next to the
    # int8 rows, and if it did you'd serve the bf16 exact path instead);
    # host RAM kills the h5py seek cost without spending a byte of HBM.
    # Costs 2 bytes/dim/row of RAM (15.4 GB at 10M x 768) + one streaming
    # read at load. Appends extend the cache in place (amortized growth).
    int8_rescore_cache: bool = False
    # Default-on recall guard (round 4): every build_ann() samples recall
    # at the configured nprobe and climbs the tune_nprobe ladder to this
    # target — on corpora without cluster structure (where IVF recall at
    # fixed nprobe is a footgun: 0.15-0.33 measured on uniform corpora,
    # benchmarks/exp_ivf_recall_sensitivity.py) the ladder lands at
    # nprobe=nlist (provably exact) and logs a LOUD warning that ANN buys
    # no latency there. None disables (build-time only; restores skip it).
    ann_target_recall: float | None = 0.95
    # FAISS-like persisted-index-type semantics: a container carrying an
    # ``ann`` group reactivates approximate search on load even with
    # ann=False (the file IS the index type). Set False to force
    # exact-only serving regardless of what the container carries — the
    # facade does this for index_type="exact" (the native spelling;
    # reference FAISS names keep the FAISS behavior).
    ann_restore: bool = True


class UnifiedIndex:
    """Searchable index over a single container file."""

    def __init__(
        self,
        config: UnifiedIndexConfig | None = None,
        device_put: bool | None = None,
        mesh: Any | None = None,
    ) -> None:
        """``mesh``: a ``jax.sharding.Mesh`` with an "index" axis — rows
        shard across its devices and searches merge over ICI (the
        multi-chip path; single-device otherwise). int8 containers shard
        rows + per-row scales together (quantized capacity mode: ~2x the
        corpus per mesh vs bf16)."""
        self.config = config or UnifiedIndexConfig()
        self.mesh = mesh
        self._sharded = None  # parallel.ShardedIndexSearcher when mesh set
        self._container: IndexContainer | None = None
        self._lock = threading.RLock()
        # device state
        self._dev_x = None          # padded (cap, dim) jnp array
        self._dev_scales = None     # (cap,) f32 — int8 quantized mode only
        self._n_valid = 0
        self._capacity = 0
        self._device_put = device_put
        # tombstones
        self._deleted: set[int] = set()
        self._dev_deleted = None    # (cap, 1) int8 device mask (lazy)
        # IVF structure (ops.ann.IVFState) when the ANN mode is active
        self._ann = None
        # ANN-STATE generation: bumps whenever self._ann is replaced
        # (build install, drop, restore, tail registration). Row mutations
        # bump self.generation but ANN swaps do NOT — tune_nprobe must
        # watch this too, or a build_ann/drop_ann landing mid-ladder mixes
        # measurements from two structures into one installed nprobe.
        self._ann_gen = 0
        # host-RAM bf16-bits cache of the rescore rows (uint16 (cap, dim);
        # config.int8_rescore_cache) — None when the mode is off
        self._fp_cache = None
        self._fp_cache_n = 0
        # True once config.ann_max_batch comes from a crossover MEASUREMENT
        # (measure_ann_crossover here, or restored from a container whose
        # builder measured it) rather than the dataclass default
        self._ann_crossover_measured = False
        # set while an overflow-append reload runs: suppresses the ANN
        # AUTO-BUILD (persisted-state restore still happens) so appends
        # never block on a synchronous k-means rebuild
        self._ann_autobuild_suppressed = False
        # monotonically increasing mutation counter: bumps on load/append/
        # delete/compact so result caches keyed on it can never serve stale
        # hits after the index changes
        self.generation = 0
        # row-REMAP counter: bumps only when existing row ids change meaning
        # (reload/compact/close). Appends grow n_valid without remapping and
        # deletes only tombstone, so the off-lock build_ann install can
        # reconcile those — a _rows_gen change forces a rebuild instead
        self._rows_gen = 0
        # host metadata cache
        self._metadata: list[KeyframeMetadata] = []
        self._row_by_key: dict[tuple[str, str], int] = {}
        self.load_time_s: float | None = None
        self.path: Path | None = None

    # -- lifecycle ----------------------------------------------------------

    @property
    def is_loaded(self) -> bool:
        return self._container is not None

    @property
    def ntotal(self) -> int:
        return self._n_valid

    @property
    def dim(self) -> int:
        return self._container.dim if self._container else 0

    def load_unified_index(self, path: str | Path, mode: str = "r") -> "UnifiedIndex":
        """Open container, bulk-load embeddings to device, warm metadata.

        Reference analog: ``unified_index.py:365-413`` (sub-second load goal).
        """
        t0 = time.perf_counter()
        with self._lock:
            self.close()
            self._container = IndexContainer(path, mode=mode)
            self.path = Path(path)
            report = self._container.consistency_report()
            if not report["ok"] and mode != "r":
                self._container.repair_to_consistent()
            self._load_metadata_cache()
            self._upload_embeddings()
            self._maybe_build_fp_cache()
        self.load_time_s = time.perf_counter() - t0
        return self

    def attach_container(self, container: IndexContainer) -> "UnifiedIndex":
        """Adopt an already-open container (used by the builder)."""
        with self._lock:
            self._container = container
            self.path = container.path
            self._load_metadata_cache()
            self._upload_embeddings()
            self._maybe_build_fp_cache()
        return self

    def close(self) -> None:
        with self._lock:
            if self._container is not None:
                self._container.close()
                self._container = None
            self._dev_x = None
            self._dev_scales = None
            self._sharded = None
            self._ann = None
            self._ann_gen += 1
            self._n_valid = 0
            self._capacity = 0
            self._rows_gen += 1
            self._metadata = []
            self._row_by_key = {}
            self._fp_cache = None
            self._fp_cache_n = 0

    # -- device state -------------------------------------------------------

    def _use_device(self) -> bool:
        if self._device_put is not None:
            return self._device_put
        return True  # jnp works on any backend; CPU fallback handled in ops

    def _upload_embeddings(self) -> None:
        import jax.numpy as jnp

        assert self._container is not None
        n = self._container.num_rows
        self._n_valid = n
        self.generation += 1
        self._rows_gen += 1
        self._dev_scales = None
        self._sharded = None
        self._ann = None
        self._ann_gen += 1
        self._fp_cache = None
        self._fp_cache_n = 0
        if n == 0:
            self._dev_x = None
            self._capacity = 0
            return
        if self.mesh is not None:
            # multi-chip: rows shard over the mesh's "index" axis
            from ..parallel.sharded_search import ShardedIndexSearcher

            self._deleted = self._container.deleted_rows()
            if self._container.dtype == "int8":
                # quantized capacity mode on a mesh: int8 rows + per-row
                # scales shard together; normalization folds into the scale
                rows = np.empty((n, self._container.dim), np.int8)
                scales = np.empty((n,), np.float32)
                self._quantized_into(rows, scales)
                self._sharded = ShardedIndexSearcher(self.mesh)
                self._sharded.load_int8(rows, scales,
                                        deleted_rows=self._deleted)
            else:
                raw = self._normalized_rows_host(n)
                dtype = (
                    jnp.bfloat16 if self._container.dtype == "bfloat16"
                    else jnp.float32
                )
                self._sharded = ShardedIndexSearcher(self.mesh, dtype=dtype)
                self._sharded.load(raw, deleted_rows=self._deleted)
            self._capacity = int(self._sharded._x.shape[0])
            self._dev_x = None
            self._dev_deleted = None
            self._restore_or_build_ann()
            return
        if self._container.dtype == "int8":
            # int8 fast path: upload quantized rows directly; row
            # normalization folds into the per-row scale (dividing a row by
            # its norm == dividing its scale by the norm). The sidecar
            # read streams straight into the padded staging buffers.
            cap = _ceil_to(n, TILE_N)
            host = np.zeros((cap, self._container.dim), np.int8)
            host_s = np.zeros((cap,), np.float32)
            self._quantized_into(host[:n], host_s[:n])
            self._dev_x = jnp.asarray(host)
            self._dev_scales = jnp.asarray(host_s)
            self._capacity = cap
        else:
            # raw-bits upload + ON-DEVICE L2 normalization (the former host
            # convert+norm pass measured tens of seconds per 200k rows on a
            # 1-core host; see _norm_upload_program)
            cap = _ceil_to(n, TILE_N)
            self._dev_x = self._rows_to_device(n, cap)
            self._capacity = cap
        # tombstones from the append-only delete log
        self._deleted = self._container.deleted_rows()
        self._dev_deleted = None
        if self._deleted:
            self._rebuild_deleted_mask()
        self._restore_or_build_ann()

    # -- ANN (IVF approximate search, ops.ann) -----------------------------

    def _restore_or_build_ann(self) -> None:
        """Restore the persisted IVF structure (rows appended since the
        persisted build go to the always-scanned tail) or build it fresh
        when the config enables ANN. On a mesh the same global state is
        additionally partitioned over the shards (``parallel.sharded_ann``)
        — the persisted format is backend-portable."""
        self._ann = None
        self._ann_gen += 1
        if self._dev_x is None and self._sharded is None:
            return
        restored = self._restore_persisted_ann()
        if (
            not restored
            and self.config.ann
            and not getattr(self, "_ann_autobuild_suppressed", False)
        ):
            try:
                self.build_ann()
            except Exception:
                import logging

                logging.getLogger("ivars").exception(
                    "ANN build failed; falling back to dense search"
                )

    def _restore_persisted_ann(self) -> bool:
        import jax.numpy as jnp

        from ..ops.ann import IVFState, TAIL_MAX, tail_append

        assert self._container is not None
        if not self.config.ann_restore:
            return False  # exact-only serving requested (ann_restore)
        got = self._container.get_ann()
        if got is None:
            return False
        arrays, attrs = got
        ann_rows = int(attrs.get("ann_rows", -1))
        if (
            ann_rows < 0
            or ann_rows > self._n_valid
            or int(attrs.get("dim", self.dim)) != self.dim
        ):
            self._container.drop_ann()  # stale (no-op when read-only)
            return False
        tail_count = int(attrs.get("tail_count", 0))
        extra = self._n_valid - ann_rows
        if tail_count + extra > TAIL_MAX:
            return False  # appends outgrew the tail: dense until rebuilt
        try:
            # a corrupt / partially-written 'ann' group (e.g. a crash mid
            # put_ann) must degrade to dense search, not fail the whole
            # index load (mirrors the build_ann failure path)
            state = IVFState(
                centroids=jnp.asarray(arrays["centroids"], jnp.float32),
                bucket_ids=jnp.asarray(arrays["bucket_ids"], jnp.int32),
                tail_ids=jnp.asarray(arrays["tail_ids"], jnp.int32),
                tail_count=jnp.asarray(tail_count, jnp.int32),
                ann_rows=ann_rows,
            )
            if state.centroids.ndim != 2 or state.bucket_ids.ndim != 2 or (
                int(state.centroids.shape[1]) != self.dim
            ):
                raise ValueError(
                    f"bad ANN shapes: centroids {state.centroids.shape}, "
                    f"bucket_ids {state.bucket_ids.shape}"
                )
            if extra:
                state = tail_append(
                    state, list(range(ann_rows, self._n_valid))
                )
        except Exception:
            import logging

            logging.getLogger("ivars").exception(
                "persisted ANN group unreadable; dropping it and serving "
                "dense search"
            )
            try:
                self._container.drop_ann()  # no-op when read-only
            except Exception:
                pass
            return False
        self._ann = state
        self._ann_gen += 1
        # restore the runtime knobs tuned/measured on this corpus (older
        # containers lack the attrs: keep the config values) — but ONLY
        # where the live config still holds the dataclass default: an
        # operator who explicitly set ann_nprobe/ann_max_batch must not
        # have a restart silently clobber it with stale build-time values
        # (found by review, round 5). Explicitly setting the default value
        # is indistinguishable from not setting it — the per-query
        # nprobe= argument escapes that corner.
        defaults = type(self.config)()
        if ("nprobe" in attrs
                and self.config.ann_nprobe == defaults.ann_nprobe):
            self.config.ann_nprobe = int(attrs["nprobe"])
        if ("max_batch" in attrs
                and self.config.ann_max_batch == defaults.ann_max_batch):
            self.config.ann_max_batch = int(attrs["max_batch"])
            self._ann_crossover_measured = bool(
                attrs.get("max_batch_measured", False)
            )
        if self._sharded is not None:
            self._sharded.set_ann(state)
        if not self.config.ann:
            # FAISS-like: the container's persisted index type activated
            # approximate search without the config asking for it — a
            # WARNING (not info) because a default-config deployment now
            # serves approximate results for small batches; ann_active is
            # also surfaced in stats() / /api/stats
            import logging

            logging.getLogger("ivars").warning(
                "persisted ANN restored (nlist=%d, nprobe=%d): small "
                "batches serve approximate results; pass exact=True per "
                "query, use index_type='exact', or drop_ann() for "
                "exact-only serving",
                int(state.bucket_ids.shape[0]),
                self.config.ann_nprobe,
            )
        return True

    def build_ann(
        self,
        nlist: int | None = None,
        persist: bool = True,
        check_recall: bool | None = None,
        **build_kwargs,
    ) -> dict[str, Any]:
        """Build (or rebuild) the IVF structure over the current device
        rows and activate approximate search (config ``ann_nprobe`` probes
        per query, exact within the probed candidates; see ``ops.ann``).

        Runs entirely on device. ``persist=True`` stores the structure in
        the container so later loads skip the build.

        ``check_recall`` (default: on when ``config.ann_target_recall`` is
        set — which it is by default): after the build, sample recall vs
        the exact path and climb the ``tune_nprobe`` ladder to the target.
        Guards the structureless-corpus footgun — IVF recall at a fixed
        nprobe ranges 0.15-0.33 on uniform corpora (measured,
        benchmarks/exp_ivf_recall_sensitivity.py); the ladder then lands
        at nprobe=nlist (provably exact) and the build WARNS that ANN buys
        no latency on this corpus instead of silently serving bad recall.
        """
        import logging

        from ..ops.ann import build_ivf

        log = logging.getLogger("ivars")
        # The k-means build runs OFF the index lock over a snapshot of the
        # device buffer, so live searches keep serving during a rebuild — a
        # lock-held build starved every request behind it for the build +
        # recall-check duration (measured as 10s+ request timeouts in the
        # serving soak). Two snapshot-invalidation paths exist:
        #   - single-device backends append via eager dynamic_update_slice,
        #     which rebinds self._dev_x to a NEW array — the snapshot stays
        #     a valid (stale) value, and install re-checks _rows_gen:
        #     appends since the snapshot ride the fresh state's tail, a
        #     remap (reload/compact/close) forces a retry;
        #   - the MESH backend's append DONATES the old sharded buffer
        #     (parallel/sharded_search.py donate_argnums=(0,), avoiding a
        #     2x memory spike at 10M rows), which DELETES the very array
        #     the snapshot holds — the next build dispatch raises
        #     "Array has been deleted". That is caught below and treated
        #     like a remap: re-snapshot and retry.
        report = None
        # separate retry budgets: donated snapshots (mesh appends delete
        # the buffer we hold — routine under steady serving traffic, so it
        # gets more headroom) vs row remaps (reload/compact mid-build —
        # rare, an operator-driven event). A shared budget let append
        # traffic exhaust the remap budget and then blame "reloads".
        donated_retries = 0
        remap_retries = 0
        max_donated, max_remap = 5, 3
        while True:
            if donated_retries >= max_donated or remap_retries >= max_remap:
                cause = (
                    "concurrent appends kept donating (deleting) the "
                    "snapshot buffer (%d retries); pause appends and retry "
                    "build_ann" % donated_retries
                    if donated_retries >= max_donated
                    else "rows were reloaded/remapped mid-build on every "
                    "attempt (%d retries); retry when the index stops "
                    "being rebuilt concurrently" % remap_retries
                )
                raise RuntimeError(
                    "build_ann gave up: %s (the previous ANN structure, "
                    "if any, is still serving)" % cause
                )
            with self._lock:
                sharded = self._sharded
                if sharded is not None:
                    # mesh backend: build over the SHARDED buffer (GSPMD
                    # routes the k-means/assignment sweeps; no unsharded
                    # copy is ever materialized), then partition per shard
                    if sharded._x is None or self._n_valid == 0:
                        raise RuntimeError("no device rows loaded")
                    x = sharded._x
                    scales = sharded._scales
                    scales = None if scales is None else scales.reshape(-1)
                else:
                    if self._dev_x is None or self._n_valid == 0:
                        raise RuntimeError("no device rows loaded")
                    x = self._dev_x
                    scales = self._dev_scales
                snap_n = self._n_valid
                snap_gen = self._rows_gen
            try:
                state, report = build_ivf(
                    x,
                    n_rows=snap_n,
                    x_scales=scales,
                    nlist=nlist or self.config.ann_nlist,
                    **build_kwargs,
                )
            except (RuntimeError, ValueError) as e:
                # single-controller jax raises RuntimeError("Array has
                # been deleted"); the multi-controller runtime surfaces
                # the same condition as ValueError("Invalid buffer ...
                # deleted or donated") at Execute() time (found by
                # tests/test_distributed_multiproc.py's race stage)
                msg = str(e).lower()
                if "deleted" not in msg and "donated" not in msg:
                    raise
                # mesh backend: a concurrent append donated (deleted) the
                # snapshotted buffer mid-build — retry over the fresh one
                donated_retries += 1
                log.info(
                    "build_ann: snapshot buffer donated by a concurrent "
                    "append (retry %d/%d); rebuilding over the new buffer",
                    donated_retries, max_donated,
                )
                continue
            with self._lock:
                if self._rows_gen != snap_gen:
                    remap_retries += 1
                    log.info(
                        "build_ann: rows reloaded/remapped mid-build "
                        "(retry %d/%d); rebuilding over the new buffer",
                        remap_retries, max_remap,
                    )
                    continue
                self._ann = state
                self._ann_gen += 1
                if self._sharded is not None:
                    self._sharded.set_ann(state)
                if self._n_valid > snap_n:
                    # rows appended mid-build: register them in the fresh
                    # state's tail (drops ANN only on tail overflow)
                    self._ann_register_append(snap_n, self._n_valid - snap_n)
                if (
                    self._ann is not None
                    and persist
                    and self._container is not None
                    and self._container.mode != "r"
                ):
                    self._persist_ann()
                break
        out = report._asdict()
        target = self.config.ann_target_recall
        if check_recall is None:
            check_recall = bool(target)
        if check_recall and target and self._container is not None \
                and self._ann is not None:
            try:
                tune = self.tune_nprobe(target_recall=float(target))
                out["recall_check"] = tune
                nlist_built = int(state.bucket_ids.shape[0])
                if tune.get("raced_mutation"):
                    log.warning(
                        "ANN recall check raced a concurrent mutation; "
                        "the estimate was discarded — run tune_ann when "
                        "mutations settle"
                    )
                elif tune["nprobe"] >= nlist_built:
                    log.warning(
                        "ANN recall check: this corpus shows weak "
                        "cluster structure — nprobe climbed to nlist="
                        "%d (equivalent to exact search with gather "
                        "overhead; ladder: %s). ANN buys no latency "
                        "here; consider index_type='exact'.",
                        nlist_built, tune["ladder"],
                    )
                else:
                    log.info(
                        "ANN recall check: recall@%d %.4f at tuned "
                        "nprobe=%d (target %.2f)",
                        tune["top_k"], tune["recall"], tune["nprobe"],
                        float(target),
                    )
            except Exception:
                log.exception(
                    "ANN recall check failed; keeping configured "
                    "nprobe %d UNVERIFIED on this corpus",
                    self.config.ann_nprobe,
                )
        return out

    def tune_nprobe(
        self,
        target_recall: float = 0.99,
        sample: int = 32,
        top_k: int = 10,
        noise: float = 0.25,
        seed: int = 0,
    ) -> dict[str, Any]:
        """Pick the smallest ``ann_nprobe`` reaching ``target_recall``.

        FAISS users hand-tune nprobe per corpus; here the index tunes
        itself: sample ``sample`` stored rows, PERTURB them (``noise`` is
        the relative noise-vector norm, like real retrieval queries that
        embed near — not at — their matches), compare the ANN path against
        the exact dense sweep at each rung of a doubling ladder, and stop
        at the first rung whose mean recall@``top_k`` meets the target.
        Sets ``config.ann_nprobe`` and returns ``{"nprobe", "recall",
        "ladder": [(nprobe, recall)...]}``.

        Why perturb: unperturbed corpus rows self-retrieve — a row's home
        bucket is almost always its top probe, which overestimates recall
        for out-of-corpus queries and would under-tune nprobe for served
        traffic (``noise=0.0`` restores the optimistic variant).

        Cost: one exact sweep + a few small ANN sweeps over ``sample``
        queries — seconds, not minutes, at any corpus size. The ladder runs
        OFF the index lock (each search call locks itself) with a per-call
        ``nprobe`` override rather than mutating the live config, so served
        traffic neither blocks behind the tune nor observes fluctuating
        probe counts. Mutations racing the ladder can skew the estimate
        (a compact remaps row ids, deflating recall toward random
        overlap); a generation change is detected, the skewed result is
        NOT installed into the config, and ``raced_mutation=True`` is
        reported so callers can re-run.
        """
        with self._lock:
            if self._ann is None:
                raise RuntimeError("ANN not active; call build_ann() first")
            assert self._container is not None
            rng = np.random.default_rng(seed)
            n_live = self._n_valid - len(self._deleted)
            if n_live <= 0:
                raise RuntimeError("no live rows to sample")
            # rejection-sample live row ids: tombstones are sparse in any
            # corpus worth tuning, and a materialized live-row list would
            # be an O(N) python scan under the lock at 10M rows
            want = min(sample, n_live)
            picks: list[int] = []
            seen: set[int] = set()
            while len(picks) < want:
                for r in rng.integers(0, self._n_valid, size=4 * want):
                    r = int(r)
                    if r in seen or r in self._deleted:
                        continue
                    seen.add(r)
                    picks.append(r)
                    if len(picks) >= want:
                        break
                else:
                    if len(seen) + len(self._deleted) >= self._n_valid:
                        picks = [r for r in range(self._n_valid)
                                 if r not in self._deleted][:want]
                        break
            picks = sorted(picks)
            rows = np.stack(
                [
                    self._container.read_embeddings(r, r + 1,
                                                    as_float32=True)[0]
                    for r in picks
                ]
            )
            nlist = int(self._ann.bucket_ids.shape[0])
            snap_gen = self.generation
            # ANN swaps (build_ann install, drop_ann) do NOT bump
            # self.generation — both now run off the index lock, so a
            # ladder can straddle two IVF structures; watch _ann_gen too
            snap_ann_gen = self._ann_gen
        q = rows / np.maximum(
            np.linalg.norm(rows, axis=1, keepdims=True), 1e-12
        )
        if noise > 0:
            d = q.shape[1]
            q = q + (noise / d**0.5) * rng.standard_normal(
                q.shape
            ).astype(np.float32)
            q /= np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-12
            )
        exact = self.search_vectors(q, top_k=top_k, exact=True)
        exact_ids = [{h.metadata.row_id for h in hits}
                     for hits in exact]
        ladder: list[tuple[int, float]] = []
        best = nlist
        nprobe = 4
        while True:
            nprobe = min(nprobe, nlist)
            got: list[list] = []
            step = max(int(self.config.ann_max_batch), 1)
            for s in range(0, len(q), step):
                got.extend(
                    self.search_vectors(
                        q[s:s + step], top_k=top_k, nprobe=nprobe
                    )
                )
            recall = float(
                np.mean(
                    [
                        len({h.metadata.row_id for h in hits}
                            & ids) / max(len(ids), 1)
                        for hits, ids in zip(got, exact_ids)
                    ]
                )
            )
            ladder.append((nprobe, recall))
            if recall >= target_recall or nprobe >= nlist:
                best = nprobe
                break
            nprobe *= 2
        raced = False
        with self._lock:
            raced = (self.generation != snap_gen
                     or self._ann_gen != snap_ann_gen)
            if not raced:
                self.config.ann_nprobe = best
                if (self._container is not None
                        and self._container.mode != "r"):
                    # travel with the structure: a reopened index serves
                    # at the tuned probe count (see _persist_ann)
                    self._container.update_ann_attrs({"nprobe": int(best)})
        if raced:
            import logging

            logging.getLogger("ivars").warning(
                "tune_nprobe: index mutated during the ladder (row ids may "
                "have remapped, deflating the recall estimate toward random "
                "overlap); the measured nprobe=%d was NOT installed — "
                "config keeps nprobe=%d. Re-run when mutations settle.",
                best, self.config.ann_nprobe,
            )
        return {
            "nprobe": best,
            "recall": ladder[-1][1],
            "target": target_recall,
            "ladder": ladder,
            "sample": len(q),
            "top_k": top_k,
            "raced_mutation": raced,
        }

    def measure_ann_crossover(
        self,
        batch_sizes: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64),
        top_k: int = 10,
        repeats: int = 3,
        persist: bool = True,
    ) -> dict[str, Any]:
        """Measure the IVF/dense crossover batch size on THIS corpus and
        backend, install it as ``config.ann_max_batch``, and persist it
        with the ANN structure so a reopened index serves with the
        measured cap instead of the compiled-in guess (VERDICT r4 #3).

        Why it matters: ``ann_max_batch`` is the IVF/dense ROUTING
        threshold — batches at/below it probe, larger ones take the dense
        sweep (which amortizes one corpus pass over the whole batch, so
        above the crossover dense is genuinely faster, not a fallback).
        The crossover depends on corpus size, dtype, nprobe, and the
        backend: round-4 CPU smoke runs suggested >=16, but the round-5
        chip measurement at 10M pinned it at 4-8 (exp_ivf_10m.py) — a
        hardcoded default can't be right everywhere, so measure it.

        Method: walk ``batch_sizes`` in order; at each B time the ANN
        path (explicit ``nprobe=`` forces probing past the current cap)
        against the exact dense sweep — fresh random queries every timed
        call (same-input repeats hit result caching below the dispatch
        layer and report impossible speeds; CLAUDE.md), min over
        ``repeats``. The crossover is the last B before IVF first loses
        (monotone-crossing assumption: the union GEMM grows with B while
        the dense sweep's row traffic is B-independent). ``0`` means IVF
        never won — every batch then routes to the dense sweep.

        Runs OFF the index lock like :meth:`tune_nprobe` (each search
        call locks itself); a mutation or ANN swap racing the ladder
        discards the result (``raced_mutation=True``) instead of
        installing a number measured across two structures.

        Reference analog: FAISS IVF's batch behavior is tuned by hand per
        deployment; here the index measures its own (``core.py:1213-1216``
        accepted whatever index type was handed in).
        """
        with self._lock:
            if self._ann is None:
                raise RuntimeError("ANN not active; call build_ann() first")
            if self._dev_x is None and self._sharded is None:
                raise RuntimeError("no device rows loaded")
            snap_gen = self.generation
            snap_ann_gen = self._ann_gen
            nprobe = int(self.config.ann_nprobe)
            d = self.dim
        rng = np.random.default_rng(0)
        ladder: list[dict[str, Any]] = []
        crossover = 0
        for b in batch_sizes:
            if b > self._n_valid:
                break
            # warm both programs (compile) before timing
            warm = rng.standard_normal((b, d)).astype(np.float32)
            self.search_vectors(warm, top_k=top_k, nprobe=nprobe)
            self.search_vectors(warm, top_k=top_k, exact=True)
            t_ann = t_dense = float("inf")
            for _ in range(repeats):
                q = rng.standard_normal((b, d)).astype(np.float32)
                t0 = time.perf_counter()
                self.search_vectors(q, top_k=top_k, nprobe=nprobe)
                t_ann = min(t_ann, time.perf_counter() - t0)
                q = rng.standard_normal((b, d)).astype(np.float32)
                t0 = time.perf_counter()
                self.search_vectors(q, top_k=top_k, exact=True)
                t_dense = min(t_dense, time.perf_counter() - t0)
            ladder.append(
                {"batch": b, "ann_ms": round(t_ann * 1e3, 3),
                 "dense_ms": round(t_dense * 1e3, 3)}
            )
            if t_ann < t_dense:
                crossover = b
            else:
                break
        raced = False
        with self._lock:
            raced = (self.generation != snap_gen
                     or self._ann_gen != snap_ann_gen)
            if not raced:
                self.config.ann_max_batch = crossover
                self._ann_crossover_measured = True
                if (persist and self._container is not None
                        and self._container.mode != "r"):
                    self._container.update_ann_attrs(
                        {"max_batch": int(crossover),
                         "max_batch_measured": True}
                    )
        if raced:
            import logging

            logging.getLogger("ivars").warning(
                "measure_ann_crossover: index mutated during the ladder; "
                "the measured crossover=%d was NOT installed — config "
                "keeps ann_max_batch=%d. Re-run when mutations settle.",
                crossover, self.config.ann_max_batch,
            )
        return {
            "max_batch": crossover,
            "nprobe": nprobe,
            "ladder": ladder,
            "raced_mutation": raced,
        }

    def _persist_ann(self) -> None:
        assert self._container is not None and self._ann is not None
        state = self._ann
        self._container.put_ann(
            {
                "centroids": np.asarray(state.centroids, np.float32),
                "bucket_ids": np.asarray(state.bucket_ids, np.int32),
                "tail_ids": np.asarray(state.tail_ids, np.int32),
            },
            {
                "ann_rows": int(state.ann_rows),
                "tail_count": int(state.tail_count),
                "dim": self.dim,
                "nlist": int(state.bucket_ids.shape[0]),
                # runtime knobs measured on THIS corpus travel with the
                # structure (FAISS persists nprobe inside the index file
                # too): a restored index serves with the tuned probe count
                # and the measured IVF/dense crossover cap, not the
                # compiled-in defaults (VERDICT r4 #3)
                "nprobe": int(self.config.ann_nprobe),
                "max_batch": int(self.config.ann_max_batch),
                "max_batch_measured": bool(self._ann_crossover_measured),
                "version": 1,
            },
        )

    @property
    def ann_active(self) -> bool:
        return self._ann is not None

    def drop_ann(self) -> dict[str, Any]:
        """Deactivate approximate search and (when writable) remove the
        persisted structure — the container reverts to a plain exact
        index on every future load."""
        with self._lock:
            was_active = self._ann is not None
            self._ann = None
            self._ann_gen += 1
            if self._sharded is not None:
                self._sharded.clear_ann()
            dropped = False
            if self._container is not None and self._container.mode != "r":
                self._container.drop_ann()
                dropped = True
            return {"was_active": was_active, "persisted_removed": dropped}

    def _ann_register_append(self, start: int, count: int) -> None:
        """Track appended rows in the IVF tail; on overflow drop to dense
        search until the next :meth:`build_ann` (or reload rebuild).

        On a mesh the sharded searcher's partitioned tails re-target from
        the updated global state; if the append overflowed capacity and
        forced a re-shard (shard_rows changed, making local bucket ids
        stale — the searcher clears its partition), the whole state is
        re-partitioned instead."""
        if self._ann is None or count == 0:
            return
        from ..ops.ann import tail_append

        try:
            self._ann = tail_append(self._ann, list(range(start, start + count)))
            self._ann_gen += 1
        except OverflowError:
            import logging

            logging.getLogger("ivars").warning(
                "IVF tail full after append; reverting to dense search "
                "until build_ann() is called again"
            )
            self._ann = None
            self._ann_gen += 1
            if self._sharded is not None:
                self._sharded.clear_ann()
            return
        if self._sharded is not None:
            if self._sharded.ann_active:
                self._sharded.update_ann_tail(
                    np.asarray(self._ann.tail_ids, np.int32),
                    int(self._ann.tail_count),
                )
            else:
                self._sharded.set_ann(self._ann)

    def _rebuild_deleted_mask(self) -> None:
        import jax.numpy as jnp

        mask = np.zeros((self._capacity, 1), np.int8)
        for row in self._deleted:
            if 0 <= row < self._capacity:
                mask[row, 0] = 1
        self._dev_deleted = jnp.asarray(mask)

    # write the .flat/.flat8 rows sidecars only above this many rows: tiny
    # corpora open instantly either way (same spirit as
    # metacols.SIDECAR_MIN_ROWS)
    _FLAT_MIN_ROWS = 10_000

    def _fresh_flat8(self):
        """A header-validated ``native.FlatInt8File`` matching this
        container's (rows, dim, normalize) — or None (missing / stale /
        normalize-config mismatch / unreadable)."""
        if self.path is None or self._container is None:
            return None
        p = self.path.with_name(self.path.name + ".flat8")
        if not p.is_file():
            return None
        try:
            from .. import native

            f = native.FlatInt8File(p)
            n, d, norm = f.header()
            if (n == self._container.num_rows and d == self._container.dim
                    and norm == bool(self.config.normalize)):
                return f
        except Exception:  # unreadable sidecar = just use the blob
            pass
        return None

    def _quantized_into(self, rows_out: np.ndarray,
                        scales_out: np.ndarray) -> None:
        """Fill caller-owned ``(n, d)`` int8 rows + ``(n,)`` f32 serving
        scales, cheapest path first.

        Fresh ``.flat8`` sidecar (``native.FlatInt8File``): one buffered
        sequential pass straight into the output buffers, scales already
        normalization-folded. Otherwise the container blob — measured
        71 MB/s at 10M rows, because the int8 chunks interleave with the
        keep_fp blob on disk — plus the fold, then a best-effort sidecar
        write so the NEXT open takes the fast path (the metacols
        lazy-write pattern; round 5, 10M reopen 130 s -> 26 s)."""
        assert self._container is not None
        n = rows_out.shape[0]
        f8 = self._fresh_flat8()
        if f8 is not None:
            try:
                f8.read_into(rows_out, scales_out)
                return
            except Exception:  # torn mid-read (raced mutation): blob wins
                pass
        rows, scales = self._container.read_quantized()
        if self.config.normalize:
            scales = _fold_norm_into_scales(rows, scales)
        rows_out[:] = rows
        scales_out[:] = scales
        if self.path is not None and n >= self._FLAT_MIN_ROWS:
            try:
                from .. import native

                native.FlatInt8File.write(
                    self.path.with_name(self.path.name + ".flat8"),
                    rows, scales, normalized=bool(self.config.normalize),
                )
            except Exception:  # read-only dir etc. — never a load failure
                pass

    def _read_rows_raw(self, n: int) -> np.ndarray:
        """Rows in their cheapest host form: RAW storage bits (u16 bf16 /
        f32) from the ``.flat`` sidecar when fresh — one buffered
        sequential pass, half the bytes of the old mmap+f32 conversion —
        else the container blob, with a lazy best-effort sidecar write
        for the next open.

        Why (round-5 measurement): on a thumbnail-bearing container the
        embedding chunks interleave with the blob sections on disk, so the
        dataset-order h5py read streams at **87 MB/s** against the disk's
        ~1 GB/s sequential rate — the same pathology (and the same fix) as
        the int8 ``.flat8`` sidecar."""
        assert self._container is not None
        d = self._container.dim
        store = self._container.dtype
        flat_dtype = "bfloat16" if store == "bfloat16" else "float32"
        p = (self.path.with_name(self.path.name + ".flat")
             if self.path is not None else None)
        if p is not None and p.is_file():
            try:
                from .. import native

                f = native.FlatEmbeddingFile(p)
                fn, fd, fname = f.header()
                if fn == n and fd == d and fname == flat_dtype:
                    out = np.empty(
                        (n, d),
                        np.uint16 if fname == "bfloat16" else np.float32,
                    )
                    f.read_into(out)
                    return out
            except Exception:  # stale/torn sidecar: the blob path wins
                pass
        host = self._container.read_embeddings(0, n)
        if store == "float16":
            # f16 containers keep the raw blob path (the builder-written
            # sidecar converts to f32 at finalize; a lazy write here would
            # double the bytes for a rare storage mode)
            return host
        if p is not None and n >= self._FLAT_MIN_ROWS:
            try:
                from .. import native

                native.FlatEmbeddingFile.write_raw(p, host, flat_dtype)
            except Exception:  # read-only dir etc. — never a load failure
                pass
        return host

    # full-corpus single-device staging is allowed below this many bytes;
    # larger corpora stream chunk-normalized rows to host instead of
    # materializing one (cap, d) buffer on the default device (a 10M bf16
    # mesh load would otherwise stage ~15 GB on a single 16 GB chip)
    _MESH_STAGE_BYTES = 2 << 30

    def _normalized_rows_host(self, n: int) -> np.ndarray:
        """(n, d) host f32 rows, L2-normalized by THE SAME device program
        the single-device path uses — mesh and single-device backends hold
        bit-identical rows (bf16 -> f32 round-trips are lossless).

        Small corpora stage the whole single-device buffer; above
        ``_MESH_STAGE_BYTES`` rows stream through chunk-sized buffers of
        the same program shape, so peak device memory is one chunk."""
        import jax.numpy as jnp

        assert self._container is not None
        d = self._container.dim
        cap = _ceil_to(n, TILE_N)
        itemsize = 2 if self._container.dtype == "bfloat16" else 4
        if cap * d * itemsize <= self._MESH_STAGE_BYTES:
            dev = self._rows_to_device(n, cap)
            out = np.asarray(dev[:n], np.float32)
            del dev
            return out
        host = self._read_rows_raw(n)
        src = "bf16_bits" if host.dtype == np.uint16 else "float"
        out_name = (
            "bfloat16" if self._container.dtype == "bfloat16" else "float32"
        )
        out_dtype = jnp.bfloat16 if out_name == "bfloat16" else jnp.float32
        CH = 262_144
        out = np.empty((n, d), np.float32)
        pos = 0
        while pos < n:
            m = min(CH, n - pos)
            m_pad = _ceil_to(m, TILE_N)
            chunk = host[pos:pos + m]
            if m_pad != m:
                chunk = np.concatenate(
                    [chunk, np.zeros((m_pad - m, d), host.dtype)]
                )
            fill = _norm_upload_program(
                m_pad, d, src, out_name, self.config.normalize
            )
            buf = fill(jnp.zeros((m_pad, d), out_dtype),
                       jnp.asarray(chunk), jnp.int32(0))
            out[pos:pos + m] = np.asarray(buf[:m], np.float32)
            del buf
            pos += m
        return out

    def _rows_to_device(self, n: int, cap: int):
        """Padded (cap, d) device rows in compute dtype, L2-normalized ON
        DEVICE in chunks (see :func:`_norm_upload_program`)."""
        import jax.numpy as jnp

        assert self._container is not None
        d = self._container.dim
        host = self._read_rows_raw(n)
        src = "bf16_bits" if host.dtype == np.uint16 else "float"
        out_name = (
            "bfloat16" if self._container.dtype == "bfloat16" else "float32"
        )
        out_dtype = jnp.bfloat16 if out_name == "bfloat16" else jnp.float32
        CH = 262_144  # TILE_N multiple; f32 intermediate stays < 1 GB
        buf = jnp.zeros((cap, d), out_dtype)
        pos = 0
        while pos < n:
            m = min(CH, n - pos)
            # round odd tails to TILE_N multiples: bounded program count
            m_pad = min(_ceil_to(m, TILE_N), cap - pos)
            chunk = host[pos:pos + m]
            if m_pad != m:
                pad = np.zeros((m_pad - m, d), host.dtype)
                chunk = np.concatenate([chunk, pad])
            fill = _norm_upload_program(
                m_pad, d, src, out_name, self.config.normalize
            )
            buf = fill(buf, jnp.asarray(chunk), jnp.int32(pos))
            pos += m
        return buf

    def _invalidate_sidecar(self) -> None:
        if self.path is not None:
            self.path.with_name(self.path.name + ".flat").unlink(missing_ok=True)
            self.path.with_name(self.path.name + ".flat8").unlink(missing_ok=True)
            self.path.with_name(
                self.path.name + ".meta.npz"
            ).unlink(missing_ok=True)

    def _append_device_rows(self, rows: np.ndarray) -> None:
        """Append normalized rows into padded device capacity (no reload).

        Every backend appends in place (O(new), donated updates) while the
        padded capacity allows — the mesh searcher re-shards internally on
        overflow (carrying tombstones); the single-device paths fall back to
        a full re-upload only when capacity is exceeded. Appends used to be
        O(N) re-uploads for the mesh and int8 backends, which made live
        serving appends scale with corpus size.
        """
        import jax
        import jax.numpy as jnp

        m = len(rows)
        if m == 0:
            return
        if self._sharded is not None:  # mesh backend, both dtypes
            start = self._n_valid
            if self._sharded._scales is not None:
                self._sharded.append_quantized(
                    *self._quantize_like_upload(rows)
                )
            else:
                self._sharded.append(np.asarray(rows, np.float32))
            self._n_valid += m
            self._capacity = int(self._sharded._x.shape[0])
            self._ann_register_append(start, m)
            return
        if self._dev_scales is not None:  # single-device int8
            if self._dev_x is None or self._n_valid + m > self._capacity:
                self._reload_for_append()
                return
            q, s = self._quantize_like_upload(rows)
            self._dev_x = jax.lax.dynamic_update_slice(
                self._dev_x, jnp.asarray(q), (self._n_valid, 0)
            )
            self._dev_scales = jax.lax.dynamic_update_slice(
                self._dev_scales, jnp.asarray(s), (self._n_valid,)
            )
            self._ann_register_append(self._n_valid, m)
            self._n_valid += m
            return
        if self._dev_x is None or self._n_valid + m > self._capacity:
            self._reload_for_append()
            return
        dtype = self._dev_x.dtype
        update = jnp.asarray(rows, dtype)
        self._dev_x = jax.lax.dynamic_update_slice(
            self._dev_x, update, (self._n_valid, 0)
        )
        self._ann_register_append(self._n_valid, m)
        self._n_valid += m

    def _reload_for_append(self) -> None:
        """Full device re-upload on capacity overflow, WITHOUT the ANN
        auto-build: an append must never block minutes on a synchronous
        k-means rebuild (persisted-state RESTORE still runs — it is
        cheap and keeps ANN when the tail can absorb the new rows). If
        the restore cannot cover the appends, search degrades to dense
        until :meth:`build_ann` is called — the same contract as the
        in-place tail-overflow path (`ops/ann.py` module docs)."""
        self._ann_autobuild_suppressed = True
        try:
            self._upload_embeddings()
        finally:
            self._ann_autobuild_suppressed = False
        # _upload_embeddings clears the resident rescore cache; rebuild it
        # here (the container already holds the new rows' fp bits) or the
        # cache mode silently degrades to per-query disk gathers for the
        # rest of the process lifetime (found by review, round 5) — the
        # _fp_cache_n >= _n_valid guard in _fp_cache_append relies on this
        self._maybe_build_fp_cache()
        if self.config.ann and self._ann is None:
            import logging

            logging.getLogger("ivars").warning(
                "ANN rebuild deferred after capacity-overflow append; "
                "dense search until build_ann() is called"
            )

    def _quantize_like_upload(
        self, rows: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Quantize new rows with the SAME convention ``_upload_embeddings``
        uses on reload (normalization folded into the scale as 1/||int||), so
        in-place appended rows score bit-identically to a later reload."""
        from ..ops.quant import quantize_rows_int8

        q, s = quantize_rows_int8(np.asarray(rows, np.float32))
        if self.config.normalize:
            s = _fold_norm_into_scales(q, s)
        return q, s

    def _load_metadata_cache(self) -> None:
        assert self._container is not None
        from .metacols import (
            SIDECAR_MIN_ROWS,
            LazyRowByKey,
            load_sidecar,
            write_sidecar,
        )

        n = self._container.num_metadata
        use_sidecar = (
            self._container.path is not None and n >= SIDECAR_MIN_ROWS
        )
        if use_sidecar:
            # columnar sidecar (metacols.py): O(numpy reads) open,
            # records constructed on access — the blob store below stays
            # authoritative and is the fallback for every failure mode
            cols = load_sidecar(
                self._container.path, n, self._container.get_metadata
            )
            if cols is not None:
                self._metadata = cols
                self._row_by_key = LazyRowByKey(cols)
                return
        self._metadata = []
        self._row_by_key = {}
        for i, record in enumerate(self._container.iter_metadata()):
            record.setdefault("row_id", i)
            meta = KeyframeMetadata.from_dict(record)
            self._metadata.append(meta)
            self._row_by_key[meta.key] = i
        if use_sidecar:
            write_sidecar(self._metadata, self._container.path)

    # -- search ---------------------------------------------------------------

    def _maybe_build_fp_cache(self) -> None:
        """Stream the container's bf16 rescore rows into host RAM
        (``config.int8_rescore_cache``). Caller holds the index lock."""
        self._fp_cache = None
        self._fp_cache_n = 0
        if not (
            self.config.int8_rescore
            and self.config.int8_rescore_cache
            and self._container is not None
            and getattr(self._container, "has_fp_rows", False)
        ):
            return
        n = self._n_valid
        if n == 0:
            return
        import logging

        chunk = 262_144
        cap = _ceil_to(n, chunk)
        cache = np.empty((cap, self.dim), np.uint16)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            cache[s:e] = self._container.read_fp_bits(s, e)
        self._fp_cache = cache
        self._fp_cache_n = n
        logging.getLogger("ivars").info(
            "int8_rescore_cache: %d bf16 rows resident in host RAM "
            "(%.2f GB) — per-query rescore gathers skip the disk",
            n, cache.nbytes / 1e9,
        )

    def _fp_cache_append(self, rows_f32: np.ndarray) -> None:
        """Extend the resident rescore cache with freshly appended rows
        (same bf16 bits the container's fp copy stores). Caller holds the
        index lock; amortized growth, no per-append full copy."""
        if self._fp_cache is None or len(rows_f32) == 0:
            return
        if self._fp_cache_n >= self._n_valid:
            # a capacity-overflow append reloads the index, which rebuilds
            # the cache from the container (new rows included) — appending
            # again here would duplicate them
            return
        from .. import native

        bits = native.f32_to_bf16(np.ascontiguousarray(rows_f32, np.float32))
        n0, m = self._fp_cache_n, len(bits)
        if n0 + m > self._fp_cache.shape[0]:
            grown = np.empty(
                (max(_ceil_to(n0 + m, 262_144), int(n0 * 1.5)), self.dim),
                np.uint16,
            )
            grown[:n0] = self._fp_cache[:n0]
            self._fp_cache = grown
        self._fp_cache[n0:n0 + m] = bits
        self._fp_cache_n = n0 + m

    def _rescore_fp_host(
        self,
        q: np.ndarray,
        scores: np.ndarray,
        indices: np.ndarray,
        want: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact full-precision rescore of the int8 search's widened
        candidate set (``int8_rescore`` mode).

        Gathers the candidates' bf16 rows from the container (host; the
        device keeps only int8 — the 2x capacity win is untouched), scores
        them f32 against the query, and returns the top ``want`` re-ranked
        (B, want) arrays. Exactness: equals the bf16 dense path's ranking
        whenever the int8 top-(want*factor) contains the true top-want
        (measured recall@10 ~1.0; gate per-corpus via ``cli evaluate
        --search int8_rescore``). Caller holds the index lock (container
        access). ~want*factor rows * 1.5 KB of host reads per query.
        """
        b, k_dev = indices.shape
        if k_dev == 0:
            return scores, indices
        finite = np.isfinite(scores)
        safe = np.where(finite, indices, 0)
        if self._fp_cache is not None:
            from .. import native

            bits = np.ascontiguousarray(
                self._fp_cache[safe.reshape(-1)]
            )
            rows = native.bf16_to_f32(bits).reshape(b, k_dev, -1)
        else:
            rows = self._container.read_fp_rows(safe.reshape(-1)).reshape(
                b, k_dev, -1
            )
        new = np.einsum(
            "bd,bkd->bk", q.astype(np.float32), rows, optimize=True
        ).astype(np.float32)
        new = np.where(finite, new, -np.inf)
        order = np.argsort(-new, axis=1, kind="stable")[:, :want]
        return (
            np.take_along_axis(new, order, axis=1),
            np.take_along_axis(indices, order, axis=1),
        )

    def search_vectors(
        self,
        query_vectors: np.ndarray,
        top_k: int = 20,
        filter_fn: Callable[[KeyframeMetadata], bool] | None = None,
        over_fetch: int = 4,
        exact: bool = False,
        nprobe: int | None = None,
    ) -> list[list[SearchResult]]:
        """Top-k per query vector. Returns ranked SearchResults.

        Exact by default; when the IVF ANN mode is active (``config.ann`` /
        :meth:`build_ann`) small batches (<= ``config.ann_max_batch``) use
        approximate probing instead — pass ``exact=True`` to force the
        dense sweep for a call, or ``nprobe`` to override the configured
        probe count for THIS call only (``tune_nprobe`` walks its ladder
        this way instead of mutating the live config under traffic).

        ``filter_fn``: metadata predicate applied post-search with
        ``over_fetch``x candidates (reference enrich+filter semantics,
        ``unified_index.py:507-526``).
        """
        import jax.numpy as jnp

        with self._lock:
            if (self._dev_x is None and self._sharded is None) or self._n_valid == 0:
                return [[] for _ in range(len(np.atleast_2d(query_vectors)))]
            q = np.atleast_2d(np.asarray(query_vectors, dtype=np.float32))
            q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            fetch = min(self._n_valid, top_k * over_fetch if filter_fn else top_k)
            # int8 exact-rescore mode: widen the device candidate set so
            # the host rescore (full-precision rows from the container's
            # bf16 copy) can recover the exact bf16 ranking
            rescore_fp = (
                self.config.int8_rescore
                and self._container is not None
                and self._container.dtype == "int8"
                and getattr(self._container, "has_fp_rows", False)
            )
            want = fetch
            if rescore_fp:
                fetch = min(
                    self._n_valid,
                    fetch * max(int(self.config.int8_rescore_factor), 1),
                )
            # an explicit per-call nprobe is an explicit request for the
            # IVF path: it bypasses the ann_max_batch gate (tune_nprobe's
            # ladder and measure_ann_crossover time batches ABOVE the
            # current cap this way; ordinary traffic never passes nprobe)
            use_ann = (
                not exact
                and self._ann is not None
                and (nprobe is not None
                     or len(q) <= self.config.ann_max_batch)
            )
            if nprobe is None:
                nprobe_eff = self.config.ann_nprobe
            elif int(nprobe) <= 0:
                raise ValueError(f"nprobe must be positive, got {nprobe}")
            else:
                nprobe_eff = int(nprobe)
            if use_ann and self._sharded is not None:
                # sharded IVF latency mode (parallel.sharded_ann): equal to
                # the single-device ANN result for the same state
                result: TopKResult = self._sharded.search_ann(
                    q, fetch, nprobe=nprobe_eff
                )
            elif use_ann:  # IVF latency mode (single-device backends)
                from ..ops.ann import ivf_topk

                result = ivf_topk(
                    self._dev_x,
                    self._ann,
                    jnp.asarray(q, jnp.float32),
                    fetch,
                    nprobe=nprobe_eff,
                    n_valid=self._n_valid,
                    deleted=self._dev_deleted,
                    x_scales=self._dev_scales,
                )
            elif self._sharded is not None:  # multi-chip mesh backend
                result = self._sharded.search(q, fetch)
            elif self._dev_scales is not None:  # int8 quantized mode
                from ..ops.quant import topk_search_int8

                result = topk_search_int8(
                    self._dev_x,
                    self._dev_scales,
                    jnp.asarray(q, jnp.float32),
                    fetch,
                    n_valid=self._n_valid,
                    deleted=self._dev_deleted,
                )
            else:
                result = topk_search(
                    self._dev_x,
                    jnp.asarray(q, self._dev_x.dtype),
                    fetch,
                    n_valid=self._n_valid,
                    deleted=self._dev_deleted,
                )
            scores = np.asarray(result.scores, dtype=np.float32)
            indices = np.asarray(result.indices)
            if rescore_fp:
                scores, indices = self._rescore_fp_host(
                    q, scores, indices, want
                )
            # snapshot the metadata reference INSIDE the lock: compact()
            # (invokable on live servers via /api/maintenance) swaps
            # self._metadata and remaps row ids in place — a request
            # thread descheduled here must not attach post-compact
            # metadata to pre-compact row ids
            metadata = self._metadata

        out: list[list[SearchResult]] = []
        for b in range(len(q)):
            hits: list[SearchResult] = []
            for score, row in zip(scores[b], indices[b]):
                if not np.isfinite(score):
                    break  # -inf tail: masked/deleted fillers (k > live rows)
                if row < 0 or row >= len(metadata):
                    continue
                meta = metadata[row]
                if filter_fn is not None and not filter_fn(meta):
                    continue
                hits.append(
                    SearchResult(
                        metadata=meta,
                        similarity_score=float(score),
                        rank=len(hits) + 1,
                        source="local",
                    )
                )
                if len(hits) >= top_k:
                    break
            out.append(hits)
        return out

    def search(
        self,
        query_vector: np.ndarray,
        top_k: int = 20,
        filter_fn: Callable[[KeyframeMetadata], bool] | None = None,
    ) -> list[SearchResult]:
        """Single-query convenience (BASELINE.json public API name)."""
        return self.search_vectors(query_vector[None] if query_vector.ndim == 1
                                   else query_vector, top_k, filter_fn)[0]

    def search_by_row(
        self,
        row_id: int,
        top_k: int = 20,
        exclude_self: bool = True,
        filter_fn: Callable[[KeyframeMetadata], bool] | None = None,
    ) -> list[SearchResult]:
        """Frames similar to an indexed frame (reference
        ``FAISSRetriever.search_by_id``, ``core.py:932``)."""
        assert self._container is not None, "index not loaded"
        if not 0 <= row_id < self._n_valid:
            raise IndexError(f"row {row_id} out of range [0, {self._n_valid})")
        qvec = self._container.read_embeddings(row_id, row_id + 1,
                                               as_float32=True)[0]
        hits = self.search(qvec, top_k + (1 if exclude_self else 0), filter_fn)
        if exclude_self:
            hits = [h for h in hits if h.metadata.row_id != row_id][:top_k]
            for rank, h in enumerate(hits):
                h.rank = rank + 1
        return hits

    def augmented_search(
        self,
        query_vector: np.ndarray,
        top_k: int = 20,
        temporal_window: int | None = None,
        filter_fn: Callable[[KeyframeMetadata], bool] | None = None,
    ) -> list[SearchResult]:
        """search + temporal-context augmentation per hit (BASELINE.json
        public API name; reference analog ``unified_builder.py:229``)."""
        window = self.config.temporal_window if temporal_window is None else temporal_window
        hits = self.search(query_vector, top_k, filter_fn)
        for hit in hits:
            hit.temporal_context = self.get_temporal_context(
                hit.metadata.row_id, window
            )
        return hits

    # -- assets / metadata ----------------------------------------------------

    def get_metadata(self, row_id: int) -> KeyframeMetadata:
        return self._metadata[row_id]

    def row_for(self, folder: str, image: str) -> int | None:
        return self._row_by_key.get((folder, image))

    def get_thumbnail(self, row_id_or_folder: int | str, image: str | None = None) -> bytes:
        """Thumbnail JPEG by row id or (folder, image) pair."""
        assert self._container is not None
        row = self._resolve_row(row_id_or_folder, image)
        return self._container.get_thumbnail(row)

    def get_full_image(self, row_id_or_folder: int | str, image: str | None = None) -> bytes:
        assert self._container is not None
        row = self._resolve_row(row_id_or_folder, image)
        data = self._container.get_image(row) if self._container.num_images else b""
        if not data:
            # fall back to original file on disk (reference behaviour when
            # full images were not stored)
            meta = self._metadata[row]
            if meta.path and Path(meta.path).is_file():
                return Path(meta.path).read_bytes()
        return data

    def _resolve_row(self, row_or_folder: int | str, image: str | None) -> int:
        if isinstance(row_or_folder, int):
            return row_or_folder
        row = self._row_by_key.get((row_or_folder, image or ""))
        if row is None:
            raise KeyError(f"no such keyframe: {row_or_folder}/{image}")
        return row

    def get_temporal_context(self, row_id: int, window: int = 5) -> list[dict[str, Any]]:
        """+-window neighbours within the same folder, ordered by frame_id.

        Row ids are assigned in folder-sorted frame order at build time, so
        neighbours are adjacent rows of the same folder — O(window) lookups
        (the reference precomputed +-5 lists, ``unified_index.py:1115-1144``).
        """
        if not 0 <= row_id < len(self._metadata):
            return []
        center = self._metadata[row_id]
        context = []
        for offset in range(-window, window + 1):
            if offset == 0:
                continue
            idx = row_id + offset
            if 0 <= idx < len(self._metadata) and idx not in self._deleted:
                m = self._metadata[idx]
                if m.folder == center.folder:
                    context.append(
                        {
                            "row_id": m.row_id,
                            "folder": m.folder,
                            "image": m.image,
                            "frame_id": m.frame_id,
                            "offset": offset,
                        }
                    )
        return context

    # -- incremental update -----------------------------------------------

    def incremental_update(
        self,
        new_embeddings: np.ndarray,
        new_metadata: Sequence[KeyframeMetadata | dict[str, Any]],
        thumbnails: list[bytes] | None = None,
        file_hashes: list[str] | None = None,
    ) -> dict[str, Any]:
        """Append new rows (embeddings+metadata+assets) without a rebuild.

        Reference analog ``unified_index.py:415-478``; unlike the reference
        (which falls back to full rebuild above 10% churn because FAISS must
        be rebuilt) appends here are O(new) — the device matrix has padded
        capacity and the kernel masks by ``n_valid``.
        """
        assert self._container is not None, "index not loaded"
        if self._container.mode == "r":
            raise PermissionError("index opened read-only")
        rows = np.atleast_2d(np.asarray(new_embeddings, dtype=np.float32))
        if len(rows) != len(new_metadata):
            raise ValueError("embeddings/metadata count mismatch")
        if self.config.normalize and len(rows):
            rows = rows / np.maximum(
                np.linalg.norm(rows, axis=-1, keepdims=True), 1e-12
            )
        with self._lock:
            start = self._container.num_rows
            records = []
            metas: list[KeyframeMetadata] = []
            for i, m in enumerate(new_metadata):
                meta = (
                    m if isinstance(m, KeyframeMetadata)
                    else KeyframeMetadata.from_dict(dict(m))
                )
                meta.row_id = start + i
                metas.append(meta)
                records.append(meta.to_dict())
            self._invalidate_sidecar()  # row count changes -> sidecar stale
            self._container.append_embeddings(rows)
            self._container.append_metadata(records)
            # keep the thumbnail section consistent: a thumbnail-bearing
            # container must gain one (possibly empty) entry per row, or
            # repair_to_consistent would later truncate these rows away
            has_thumbs = self._container.num_thumbnails > 0
            if thumbnails is not None:
                if len(thumbnails) != len(rows):
                    raise ValueError(
                        f"{len(thumbnails)} thumbnails for {len(rows)} rows"
                    )
                if not has_thumbs and start > 0:
                    # container never stored thumbnails; ignore to keep 0
                    pass
                else:
                    self._container.append_thumbnails(thumbnails)
            elif has_thumbs:
                self._container.append_thumbnails([b""] * len(rows))
            if file_hashes:
                self._container.append_journal(file_hashes)
            self._container.flush_checkpoint()
            self._metadata.extend(metas)
            for meta in metas:
                self._row_by_key[meta.key] = meta.row_id
            self.generation += 1
            self._append_device_rows(rows)
            self._fp_cache_append(rows)
        return {"appended": len(rows), "ntotal": self._n_valid}

    # -- deletion (tombstones + compaction) ------------------------------------

    @property
    def num_deleted(self) -> int:
        return len(self._deleted)

    @property
    def num_live(self) -> int:
        return self._n_valid - len(self._deleted)

    def read_rows_f32(self, start: int = 0, end: int | None = None) -> "np.ndarray":
        """f32 rows regardless of storage dtype (dequantizes int8) —
        public accessor for evaluation/export tooling. When the container
        carries the full-precision copy (``int8_rescore`` builds), rows
        come from it, so evaluation oracles measure against TRUE full
        precision rather than the dequantized int8 approximation."""
        assert self._container is not None, "index not loaded"
        if end is None:
            end = self._n_valid
        if getattr(self._container, "has_fp_rows", False):
            from .. import native

            return native.bf16_to_f32(self._container.read_fp_bits(start, end))
        return self._container.read_embeddings_f32_any(start, end)

    @property
    def deleted_rows(self) -> frozenset:
        """Tombstoned row ids (public, read-only view)."""
        return frozenset(self._deleted)

    def delete_rows(self, row_ids: Sequence[int]) -> dict[str, Any]:
        """Tombstone rows: excluded from all searches immediately, logged
        durably, removed physically by :meth:`compact`.

        Beyond-reference capability: the reference punted deletes to a full
        rebuild above a 10% churn threshold (``unified_index.py:415-478``);
        here a delete is O(1) amortized (append to the log + device mask
        update) and search stays exact via in-kernel masking.
        """
        assert self._container is not None, "index not loaded"
        if self._container.mode == "r":
            raise PermissionError("index opened read-only")
        fresh = [
            int(r) for r in row_ids
            if 0 <= int(r) < self._n_valid and int(r) not in self._deleted
        ]
        if not fresh:
            return {"deleted": 0, "num_live": self.num_live}
        with self._lock:
            self._container.append_deleted(fresh)
            self._container.flush_checkpoint()
            self._deleted.update(fresh)
            self.generation += 1
            if self._sharded is not None:
                self._sharded.set_deleted(self._deleted)
            else:
                self._rebuild_deleted_mask()
        return {"deleted": len(fresh), "num_live": self.num_live}

    def delete_keys(self, keys: Sequence[tuple[str, str]]) -> dict[str, Any]:
        rows = [
            self._row_by_key[key] for key in keys if key in self._row_by_key
        ]
        return self.delete_rows(rows)

    def is_deleted(self, row_id: int) -> bool:
        return row_id in self._deleted

    def compact(self, output_path: str | Path | None = None) -> dict[str, Any]:
        """Physically drop tombstoned rows into a fresh container.

        Writes a new file (atomic rename over the original by default),
        remapping row ids; then reloads. Assets (thumbnails/images) of live
        rows are preserved.

        Holds the index lock for the whole copy + swap: the REST
        maintenance action exposes compaction on LIVE servers, where an
        unlocked compact racing delete/append would resurrect tombstoned
        rows (stale ``keep`` snapshot) or drop concurrently appended ones,
        and readers could hit the closed container mid-swap. Searches
        queue behind it — run under traffic only in a maintenance window.
        """
        with self._lock:
            assert self._container is not None and self.path is not None
            if not self._deleted:
                return {"compacted": 0, "ntotal": self._n_valid}
            src = self._container
            dst_path = (
                Path(output_path) if output_path
                else self.path.with_name(self.path.name + ".compact")
            )
            from .container import IndexContainer

            keep = [r for r in range(src.num_rows) if r not in self._deleted]
            src_fp = getattr(src, "has_fp_rows", False)
            with IndexContainer(
                dst_path, mode="w", dim=src.dim, dtype=src.dtype,
                keep_fp=src_fp,
            ) as dst:
                CHUNK_ROWS = 8192
                for start in range(0, len(keep), CHUNK_ROWS):
                    rows = keep[start : start + CHUNK_ROWS]
                    # bulk-read the covering range, then select (avoids
                    # per-row HDF5 reads; tombstones are sparse so the
                    # range is tight)
                    lo, hi = rows[0], rows[-1] + 1
                    if src_fp:
                        # rescore-enabled int8 source: copy from the bf16
                        # copy so full precision survives the compact (an
                        # int8->f32->int8 round-trip would freeze the fp
                        # copy at int8 precision)
                        from .. import native

                        block = native.bf16_to_f32(src.read_fp_bits(lo, hi))
                    else:
                        block = src.read_embeddings(lo, hi, as_float32=True)
                    emb = block[np.asarray(rows) - lo]
                    dst.append_embeddings(emb)
                    # bulk metadata read of the covering range (per-record
                    # get_metadata pays ~1 ms of h5py overhead each)
                    range_records = src.read_metadata_range(lo, hi)
                    records = []
                    for new_id, old in enumerate(rows, start=start):
                        record = range_records[old - lo]
                        record["row_id"] = new_id
                        records.append(record)
                    dst.append_metadata(records)
                    if src.num_thumbnails:
                        thumbs = src.read_blob_range("thumbnails", lo, hi)
                        dst.append_thumbnails([thumbs[r - lo] for r in rows])
                    if src.num_images:
                        imgs = src.read_blob_range("images", lo, hi)
                        dst.append_images([imgs[r - lo] for r in rows])
                # carry journal hashes + maps + system config
                dst.append_journal(sorted(src.journal_hashes()))
                for folder in src.map_folders():
                    dst.put_map(folder, src.get_map(folder))
                build_info = src.get_system("build")
                if build_info:
                    dst.put_system("build", build_info)
                dst.flush_checkpoint({"compacted_from": str(self.path)})
            removed = len(self._deleted)
            mode = self._container.mode
            in_place = output_path is None
            if in_place:
                self._container.close()
                self._container = None
                self._invalidate_sidecar()
                dst_path.replace(self.path)
                self.load_unified_index(
                    self.path, mode="a" if mode != "r" else "r"
                )
            return {"compacted": removed, "ntotal": self._n_valid,
                    "path": str(self.path if in_place else dst_path)}

    # -- stats ----------------------------------------------------------------

    def get_stats(self) -> dict[str, Any]:
        stats: dict[str, Any] = {
            "ntotal": self._n_valid,
            "num_live": self.num_live,
            "num_deleted": self.num_deleted,
            "dim": self.dim,
            "capacity": self._capacity,
            "load_time_s": self.load_time_s,
            "loaded": self.is_loaded,
            "ann_active": self._ann is not None,
        }
        if self._ann is not None:
            stats["ann"] = {
                "nlist": int(self._ann.bucket_ids.shape[0]),
                "bucket_cap": int(self._ann.bucket_ids.shape[1]),
                "nprobe": self.config.ann_nprobe,
                "max_batch": self.config.ann_max_batch,
                "max_batch_measured": self._ann_crossover_measured,
                "tail_count": int(self._ann.tail_count),
                "ann_rows": self._ann.ann_rows,
            }
        if self._container is not None:
            stats["container"] = self._container.stats().as_dict()
        return stats
