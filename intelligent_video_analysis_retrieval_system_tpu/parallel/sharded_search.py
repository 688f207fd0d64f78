"""Sharded top-k search: per-chip shard sweep + ICI merge.

The multi-chip path named in BASELINE.json config #5 ("multi-chip sharded
index on v5e-8: per-chip shard search + ICI top-k merge"). Replaces the
reference's HTTP fan-out merge (``system.py:1715-1757``: per-node POST of
the query vector, client-side sort) with one SPMD program:

    X rows sharded over mesh axis "index"  (N/d rows per chip, HBM-resident)
    every chip:  local exact top-k (ops.topk fused kernel)
    all_gather (k scores, k global ids) over ICI  — k*devices tiny payload
    every chip:  final k-selection (replicated result)

The collective moves ``devices * B * k * 8`` bytes — for 8 chips, B=8,
k=100 that is 51 KB over ICI vs the reference shipping full result JSON
over a LAN.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import (
    TILE_N,
    TopKResult,
    bucket_b,
    bucket_k,
    topk_masked_reference,
)

__all__ = ["sharded_topk", "sharded_topk_int8", "ShardedIndexSearcher"]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_b(b: int) -> int:
    # power-of-two compile buckets, shared with the single-device path
    # (ops.topk.bucket_b): varying serving batch sizes must not compile a
    # fresh sharded program per distinct size
    return bucket_b(b)


def _pad_queries_to_bucket(q):
    """Pad (b, d) queries to the compile bucket BEFORE the jitted call.

    The outer jit specializes on the INPUT shape: padding inside the
    shard_map (which the inner searcher caches do) still compiles one
    outer program per distinct b — measured on the serving path as the
    20x batch-time blowup class (CLAUDE.md round 3). Callers slice the
    result back to b rows."""
    b = int(q.shape[0])
    b_pad = _pad_b(b)
    if b_pad == b:
        return q, b
    pad = jnp.zeros((b_pad - b, q.shape[1]), q.dtype)
    return jnp.concatenate([q, pad], axis=0), b


def _ici_merge(scores, gids, axis, n_dev, k, b):
    """Gather every chip's (B, k_local) candidates over ICI, k-select locally.

    The payload is tiny (``devices * B * k * 8`` bytes); every chip ends up
    with the identical replicated result.
    """
    all_scores = lax.all_gather(scores, axis, axis=0)   # (ndev, B, k)
    all_ids = lax.all_gather(gids, axis, axis=0)
    k_local = scores.shape[1]
    flat_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(b, n_dev * k_local)
    flat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(b, n_dev * k_local)
    k_out = min(k, n_dev * k_local)
    top_scores, pos = lax.top_k(flat_scores, k_out)
    top_ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    return top_scores, top_ids.astype(jnp.int32)


def build_sharded_searcher(
    mesh: Mesh,
    axis: str,
    n_pad: int,
    k: int,
    use_pallas: bool,
    interpret: bool = False,
    with_mask: bool = False,
):
    """Compile a replicated-output sharded searcher for static shapes.

    Returns ``f(x_sharded, q, n_valid[, deleted_sharded]) -> TopKResult``
    where ``x_sharded`` is (n_pad, D) sharded rows-wise over ``axis`` (and
    ``deleted_sharded`` is (n_pad, 1) int8 sharded the same way); results
    are replicated.
    """
    n_dev = mesh.shape[axis]
    shard_rows = n_pad // n_dev
    assert n_pad % n_dev == 0

    def shard_fn(x_shard, q, n_valid, dead_shard=None):
        my = lax.axis_index(axis)
        offset = my * shard_rows
        # rows of this shard that are live; masking must happen BEFORE the
        # local selection or an all-padding shard would crowd out real hits
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        if use_pallas or interpret:
            from ..ops.topk import _build_searcher, pad_queries

            search = _build_searcher(
                shard_rows, x_shard.shape[1], _pad_b(q.shape[0]), k,
                interpret, lax.Precision.HIGHEST, with_mask=with_mask,
            )
            local = (
                search(x_shard, pad_queries(q), local_valid, dead_shard)
                if with_mask
                else search(x_shard, pad_queries(q), local_valid)
            )
            local = TopKResult(local.scores[: q.shape[0]],
                               local.indices[: q.shape[0]])
        else:
            local = topk_masked_reference(
                x_shard, q, min(k, shard_rows), local_valid,
                deleted=dead_shard,
            )
        return _ici_merge(local.scores, local.indices + offset, axis,
                          n_dev, k, q.shape[0])

    if with_mask:
        in_specs = (P(axis, None), P(), P(), P(axis, None))
    else:
        in_specs = (P(axis, None), P(), P())
    out_specs = (P(), P())
    mapped = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=32)
def _searcher_cache(mesh_key, axis, n_pad, k, use_pallas, interpret,
                    with_mask=False):
    mesh = _MESHES[mesh_key]
    return build_sharded_searcher(
        mesh, axis, n_pad, k, use_pallas, interpret, with_mask=with_mask
    )


# weak registry: meshes must not be pinned alive by the searcher cache
# (long-lived servers recreate meshes; a strong id-keyed dict would leak
# every one of them for process lifetime)
import weakref

_MESHES: "weakref.WeakValueDictionary[tuple, Mesh]" = weakref.WeakValueDictionary()


def mesh_cache_key(mesh: Mesh) -> tuple:
    """Registry key for ``_MESHES`` and the jitted-searcher caches.

    Includes mesh CONTENT, not just ``id()``: a GC'd mesh's id can be
    reused by a different mesh, which must not hit the old searcher.
    Registers the mesh as a side effect (every caller needs both)."""
    key = (
        id(mesh), mesh.axis_names, tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )
    _MESHES[key] = mesh
    return key


def sharded_topk(
    mesh: Mesh,
    x_sharded: jnp.ndarray,
    q: jnp.ndarray,
    k: int,
    n_valid: int,
    axis: str = "index",
    use_pallas: bool | None = None,
    interpret: bool = False,
    deleted_sharded: jnp.ndarray | None = None,
) -> TopKResult:
    """Replicated exact top-k over a row-sharded database."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    mesh_key = mesh_cache_key(mesh)
    # run at the bucketed batch AND k, slice the exact prefix
    q_run, b = _pad_queries_to_bucket(q)
    k_run = bucket_k(int(k))
    fn = _searcher_cache(
        mesh_key, axis, int(x_sharded.shape[0]), k_run, bool(use_pallas),
        bool(interpret), deleted_sharded is not None,
    )
    if deleted_sharded is not None:
        scores, ids = fn(x_sharded, q_run, jnp.int32(n_valid),
                         deleted_sharded)
    else:
        scores, ids = fn(x_sharded, q_run, jnp.int32(n_valid))
    if scores.shape[0] > b or scores.shape[1] > k:
        scores, ids = scores[:b, :k], ids[:b, :k]
    return TopKResult(scores, ids)


def build_sharded_searcher_int8(
    mesh: Mesh,
    axis: str,
    n_pad: int,
    k: int,
    use_pallas: bool,
    interpret: bool = False,
):
    """Compile a sharded searcher over an int8-quantized database.

    Returns ``f(x_i8_sharded, scales_sharded, q, n_valid, dead_sharded)``
    where ``x_i8_sharded`` is (n_pad, D) int8 and ``scales_sharded`` /
    ``dead_sharded`` are (n_pad, 1) sharded the same rows-wise way. The
    tombstone mask is always an input (matching the single-device int8
    path); results are replicated. Capacity mode for multi-chip: int8 rows
    halve HBM bytes per chip, so ~2x the corpus fits per mesh.
    """
    n_dev = mesh.shape[axis]
    shard_rows = n_pad // n_dev
    assert n_pad % n_dev == 0

    def shard_fn(x_shard, s_shard, q, n_valid, dead_shard):
        my = lax.axis_index(axis)
        offset = my * shard_rows
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        k_local = min(k, shard_rows)
        scales = s_shard.reshape(-1)
        if use_pallas or interpret:
            from ..ops.quant import _build_int8_searcher
            from ..ops.topk import pad_queries

            search = _build_int8_searcher(
                shard_rows, x_shard.shape[1], _pad_b(q.shape[0]), k_local,
                interpret,
            )
            local = search(x_shard, scales, pad_queries(q), local_valid,
                           dead_shard)
            local = TopKResult(local.scores[: q.shape[0]],
                               local.indices[: q.shape[0]])
        else:
            from ..ops.quant import _int8_reference

            # fold padding/local-validity into the tombstone mask so masking
            # happens BEFORE the local selection (an all-padding shard must
            # not crowd out real hits in the merge)
            rows = jnp.arange(shard_rows, dtype=jnp.int32)
            dead_all = (dead_shard.reshape(-1) != 0) | (rows >= local_valid)
            local = _int8_reference(x_shard, scales, q, k_local,
                                    deleted=dead_all.astype(jnp.int8))
        return _ici_merge(local.scores, local.indices + offset, axis,
                          n_dev, k, q.shape[0])

    in_specs = (P(axis, None), P(axis, None), P(), P(), P(axis, None))
    out_specs = (P(), P())
    mapped = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=32)
def _int8_searcher_cache(mesh_key, axis, n_pad, k, use_pallas, interpret):
    mesh = _MESHES[mesh_key]
    return build_sharded_searcher_int8(
        mesh, axis, n_pad, k, use_pallas, interpret
    )


def sharded_topk_int8(
    mesh: Mesh,
    x_i8_sharded: jnp.ndarray,
    scales_sharded: jnp.ndarray,
    q: jnp.ndarray,
    k: int,
    n_valid: int,
    axis: str = "index",
    use_pallas: bool | None = None,
    interpret: bool = False,
    deleted_sharded: jnp.ndarray | None = None,
) -> TopKResult:
    """Replicated top-k over a row-sharded int8-quantized database."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    mesh_key = mesh_cache_key(mesh)
    q_run, b = _pad_queries_to_bucket(q)
    k_run = bucket_k(int(k))
    fn = _int8_searcher_cache(
        mesh_key, axis, int(x_i8_sharded.shape[0]), k_run,
        bool(use_pallas), bool(interpret),
    )
    if deleted_sharded is None:
        deleted_sharded = jnp.zeros((x_i8_sharded.shape[0], 1), jnp.int8)
        deleted_sharded = jax.device_put(
            deleted_sharded, NamedSharding(mesh, P(axis, None))
        )
    scores, ids = fn(x_i8_sharded, scales_sharded, q_run,
                     jnp.int32(n_valid), deleted_sharded)
    if scores.shape[0] > b or scores.shape[1] > k:
        scores, ids = scores[:b, :k], ids[:b, :k]
    return TopKResult(scores, ids)


@functools.lru_cache(maxsize=32)
def _append_updater(mesh_key, axis, cap, d, m_pad, dtype_name):
    """Jitted in-place row append on a sharded buffer: donates the old
    buffer and pins the output to the same rows-wise sharding, so GSPMD
    routes the small update to the owning shard(s) without re-sharding."""
    mesh = _MESHES[mesh_key]
    sharding = NamedSharding(mesh, P(axis, None))

    def update(x, upd, off):
        return lax.dynamic_update_slice(x, upd, (off, 0))

    return jax.jit(update, donate_argnums=(0,), out_shardings=sharding)


class ShardedIndexSearcher:
    """Holds a row-sharded device database and serves replicated top-k.

    Drop-in device backend for ``UnifiedIndex`` when a mesh is available:
    rows pad to ``devices * TILE_N`` granularity and shard evenly; queries
    replicate; merged results are identical to single-device search.
    """

    def __init__(self, mesh: Mesh, axis: str = "index", dtype=jnp.bfloat16):
        self.mesh = mesh
        self.axis = axis
        self.dtype = dtype
        self.n_valid = 0
        self._x = None
        self._scales = None  # (n_pad, 1) f32 when int8-quantized
        self._dead = None
        self._ann = None     # parallel.sharded_ann.ShardedIVF when active

    @property
    def n_devices(self) -> int:
        return self.mesh.shape[self.axis]

    def load(self, x: np.ndarray, deleted_rows: set[int] | None = None) -> None:
        """Shard (N, D) rows across the mesh axis."""
        n, d = x.shape
        n_pad = _ceil_to(max(n, 1), self.n_devices * TILE_N)
        host = np.zeros((n_pad, d), dtype=np.float32)
        host[:n] = x
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        self._x = jax.device_put(jnp.asarray(host, self.dtype), sharding)
        self._scales = None
        self.n_valid = n
        self._dead = None
        self._ann = None  # shard_rows changed: local bucket ids are stale
        if deleted_rows:
            self.set_deleted(deleted_rows)

    def load_int8(
        self,
        rows_i8: np.ndarray,
        scales: np.ndarray,
        deleted_rows: set[int] | None = None,
    ) -> None:
        """Shard int8-quantized rows + per-row scales across the mesh axis.

        Capacity mode: half the HBM bytes per chip of bf16, so ~2x corpus per
        mesh (reference's FAISS index has no multi-node quantized analogue —
        it shards by running one whole index per LAN node, ``system.py:1715``).
        """
        n, d = rows_i8.shape
        n_pad = _ceil_to(max(n, 1), self.n_devices * TILE_N)
        host = np.zeros((n_pad, d), np.int8)
        host[:n] = rows_i8
        host_s = np.zeros((n_pad, 1), np.float32)
        host_s[:n, 0] = scales
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        self._x = jax.device_put(jnp.asarray(host), sharding)
        self._scales = jax.device_put(jnp.asarray(host_s), sharding)
        self.n_valid = n
        self._dead = None
        self._ann = None  # shard_rows changed: local bucket ids are stale
        if deleted_rows:
            self.set_deleted(deleted_rows)

    def set_deleted(self, deleted_rows: set[int]) -> None:
        """Install (or clear) the tombstone mask, sharded like the rows."""
        if not deleted_rows:
            self._dead = None
            return
        assert self._x is not None
        mask = np.zeros((int(self._x.shape[0]), 1), np.int8)
        for row in deleted_rows:
            if 0 <= row < mask.shape[0]:
                mask[row, 0] = 1
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        self._dead = jax.device_put(jnp.asarray(mask), sharding)

    def append(self, rows: np.ndarray) -> None:
        """Append rows. In-place into the padded sharded buffer when it
        fits (donated jitted dynamic-update-slice — no re-shard, no host
        round-trip of the existing rows); falls back to a full re-shard
        only when capacity is exceeded."""
        if self._x is None:
            self.load(rows)
            return
        m = len(rows)
        cap = int(self._x.shape[0])
        # fixed-size update chunks so the jitted updater compiles once
        m_pad = _ceil_to(max(m, 1), 256)
        mesh_key = mesh_cache_key(self.mesh)
        if self._scales is not None:
            # int8 capacity mode: quantize ONLY the new rows, then defer to
            # append_quantized (donated in-place updates of rows AND scales;
            # full re-shard carrying tombstones on overflow)
            from ..ops.quant import quantize_rows_int8

            self.append_quantized(*quantize_rows_int8(
                np.asarray(rows, np.float32)
            ))
            return
        if self.n_valid + m_pad <= cap:
            upd = np.zeros((m_pad, rows.shape[1]), np.float32)
            upd[:m] = rows
            fn = _append_updater(
                mesh_key, self.axis, cap, int(self._x.shape[1]), m_pad,
                self._x.dtype.name,
            )
            self._x = fn(self._x, jnp.asarray(upd, self._x.dtype),
                         jnp.int32(self.n_valid))
            # rows in (n_valid, n_valid+m_pad) beyond m are zeros, masked
            # by n_valid; the tombstone mask (all < n_valid) is unaffected
            self.n_valid += m
            return
        # capacity exceeded: full re-shard is unavoidable (buffer grows).
        # Carry the tombstone mask across the re-load — load()/load_int8()
        # reset it, and dropping it would resurrect deleted rows.
        current = np.asarray(self._x[: self.n_valid], np.float32)
        self.load(np.concatenate([current, np.asarray(rows, np.float32)]),
                  deleted_rows=self._live_tombstones())

    def _live_tombstones(self) -> set[int] | None:
        if self._dead is None:
            return None
        mask = np.asarray(self._dead[: self.n_valid, 0])
        return set(np.nonzero(mask)[0].tolist()) or None

    def append_quantized(self, rows_i8: np.ndarray, scales: np.ndarray) -> None:
        """Append pre-quantized int8 rows + per-row scales (int8 mode only).

        In-place donated updates of rows AND scales when the padded capacity
        allows (no host round-trip of the existing corpus); full re-shard
        carrying tombstones on overflow. Callers that need a non-default
        scale convention (``UnifiedIndex`` folds row normalization into the
        scale, matching its reload path) quantize upstream and append here;
        :meth:`append` quantizes with the symmetric max-abs scale.
        """
        assert self._scales is not None, "append_quantized needs int8 mode"
        m = len(rows_i8)
        if m == 0:
            return
        cap = int(self._x.shape[0])
        m_pad = _ceil_to(max(m, 1), 256)
        mesh_key = mesh_cache_key(self.mesh)
        if self.n_valid + m_pad <= cap:
            upd_q = np.zeros((m_pad, rows_i8.shape[1]), np.int8)
            upd_q[:m] = rows_i8
            upd_s = np.zeros((m_pad, 1), np.float32)
            upd_s[:m, 0] = scales
            fn_q = _append_updater(
                mesh_key, self.axis, cap, int(self._x.shape[1]), m_pad,
                "int8",
            )
            fn_s = _append_updater(
                mesh_key, self.axis, cap, 1, m_pad, "float32_scales",
            )
            off = jnp.int32(self.n_valid)
            self._x = fn_q(self._x, jnp.asarray(upd_q), off)
            self._scales = fn_s(self._scales, jnp.asarray(upd_s), off)
            self.n_valid += m
            return
        cur_q = np.asarray(self._x[: self.n_valid], np.int8)
        cur_s = np.asarray(self._scales[: self.n_valid, 0], np.float32)
        self.load_int8(
            np.concatenate([cur_q, rows_i8.astype(np.int8)]),
            np.concatenate([cur_s, np.asarray(scales, np.float32)]),
            deleted_rows=self._live_tombstones(),
        )

    # -- ANN (sharded IVF latency mode, parallel.sharded_ann) --------------

    @property
    def ann_active(self) -> bool:
        return self._ann is not None

    def set_ann(self, state) -> None:
        """Partition a global ``ops.ann.IVFState`` over this mesh and
        activate :meth:`search_ann` (see ``parallel.sharded_ann``)."""
        from .sharded_ann import make_sharded_ivf

        assert self._x is not None, "no database loaded"
        shard_rows = int(self._x.shape[0]) // self.n_devices
        self._ann = make_sharded_ivf(self.mesh, self.axis, state, shard_rows)

    def clear_ann(self) -> None:
        self._ann = None

    def update_ann_tail(self, tail_ids: np.ndarray, tail_count: int) -> None:
        """Re-partition only the tail (appends since the build live there)."""
        from .sharded_ann import retarget_tail

        assert self._ann is not None
        self._ann = retarget_tail(
            self._ann, self.mesh, self.axis, tail_ids, tail_count
        )

    def search_ann(self, q: np.ndarray, k: int, nprobe: int = 32) -> TopKResult:
        """Approximate replicated top-k via the partitioned IVF; results
        equal single-device ``ops.ann.ivf_topk`` with the same state."""
        from .sharded_ann import sharded_ivf_topk

        assert self._ann is not None, "no ANN structure set"
        k = min(k, max(self.n_valid, 1))
        qd = jnp.asarray(np.atleast_2d(q), jnp.float32)
        return sharded_ivf_topk(
            self.mesh, self._x, self._ann, qd, k, nprobe=nprobe,
            n_valid=self.n_valid, deleted_sharded=self._dead,
            scales_sharded=self._scales, axis=self.axis,
        )

    def search(
        self, q: np.ndarray, k: int,
        use_pallas: bool | None = None, interpret: bool = False,
    ) -> TopKResult:
        assert self._x is not None, "no database loaded"
        k = min(k, max(self.n_valid, 1))
        if self._scales is not None:
            qd = jnp.asarray(np.atleast_2d(q), jnp.float32)
            return sharded_topk_int8(
                self.mesh, self._x, self._scales, qd, k, self.n_valid,
                axis=self.axis, use_pallas=use_pallas, interpret=interpret,
                deleted_sharded=self._dead,
            )
        qd = jnp.asarray(np.atleast_2d(q), self.dtype)
        return sharded_topk(
            self.mesh, self._x, qd, k, self.n_valid, axis=self.axis,
            use_pallas=use_pallas, interpret=interpret,
            deleted_sharded=self._dead,
        )

    def stats(self) -> dict[str, Any]:
        return {
            "devices": self.n_devices,
            "axis": self.axis,
            "quantized": self._scales is not None,
            "n_valid": self.n_valid,
            "padded_rows": 0 if self._x is None else int(self._x.shape[0]),
            "rows_per_device": 0 if self._x is None
            else int(self._x.shape[0]) // self.n_devices,
            "ann_active": self._ann is not None,
        }
