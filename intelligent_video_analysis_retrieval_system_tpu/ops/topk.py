"""Fused similarity search: tiled matmul + streaming chunk-max top-k.

TPU-native replacement for FAISS ``IndexFlatIP.search`` (reference
``core.py:1198-1234``, ``unified_index.py:503,1755-1793``) — the centerpiece
kernel named in BASELINE.json.

Algorithm (exact, two phases):

1. **Chunk-max sweep (Pallas).** Stream the database ``X (N, D)`` through
   VMEM tile by tile; each grid step computes ``S = X_tile @ Q^T`` on the
   MXU and reduces every ``CHUNK``-row group to its per-query maximum. Only
   the ``(N/CHUNK, B)`` maxima matrix is written back — the full ``(N, B)``
   score matrix never touches HBM, so the sweep runs at the HBM read
   bandwidth of ``X`` (the floor for exact search). Measured on v5e:
   ~480 GB/s => 1M x 768 bf16 in ~3.2 ms. XLA alone does NOT perform this
   fusion (measured 180x slower unfused), which is why this is a kernel.

2. **Candidate rescore (XLA).** Select the top-``k`` chunks per query by
   chunk max; the union of those chunks provably contains the exact
   top-``k``: fewer than ``k`` scores exceed the true k-th score ``v_k``,
   so at most ``k-1`` chunks have max > ``v_k``, and the chunk holding
   ``v_k`` ranks within the top-``k`` chunk maxima. Gather those
   ``k*CHUNK`` rows, rescore in f32, ``lax.top_k``.

Engineering notes:
- All pallas_call/jit callables are built once per static shape signature
  and cached (re-tracing per call costs ~0.5 s of lowering — measured).
- ``n_valid`` (live row count) is a *dynamic* SMEM scalar so incremental
  index appends within the padded capacity never recompile.
- Multi-chip sharding of ``X`` + ICI merge lives in
  ``parallel.sharded_search``; this module is the per-shard core.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "topk_search",
    "topk_exact_reference",
    "cosine_topk",
    "TopKResult",
    "CHUNK",
    "TILE_N",
    "pad_database",
    "pad_queries",
]

# Rows reduced to one max per query. 128 = lane width; bounds phase-2
# rescore cost at k*128 rows per query.
CHUNK = 128
# Database rows per grid step. (2048, 768) bf16 = 3 MB — double-buffers
# comfortably in 16 MB VMEM; measured fastest vs 4096/8192 on v5e.
TILE_N = 2048
# Query rows are padded to a sublane multiple.
_Q_PAD = 8


class TopKResult(NamedTuple):
    scores: jnp.ndarray   # (B, k) f32, descending
    indices: jnp.ndarray  # (B, k) i32 row ids into the database


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_database(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad rows to a multiple of TILE_N (done once at index load)."""
    n = x.shape[0]
    n_pad = _ceil_to(max(n, TILE_N), TILE_N)
    if n_pad == n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad - n, x.shape[1]), dtype=x.dtype)], axis=0
    )


def bucket_b(b: int) -> int:
    """Compile-bucket for the query-batch dimension: next power of two in
    [8, 128], then 32-multiples (uncapped).

    Serving batch sizes vary per micro-batching window; the former
    ceil-to-8 padding compiled a FRESH searcher program per distinct
    size, and through a congested compile service that measured as 20x
    batch-time blowups under concurrent load (132 ms -> 2.4 s per batch,
    served-QPS probe). Power-of-two buckets keep the program count at 5
    for the serving range (b <= 128) while the sweep stays
    database-stream-bound (extra query columns are nearly free); batch
    APIs above 128 are offline/bulk callers where a few extra programs
    are irrelevant next to the sweep time.

    Above 128 the buckets step by 32, not powers of two: the int8 XLA
    backend materializes an (N, b_pad) i32 score matrix, and rounding a
    129-query batch up to 256 would double it (~10 GB at 10M rows —
    past the v5e HBM budget next to the 7.7 GB row buffer, where the
    ceil-to-8 padding previously fit).
    """
    if b <= _Q_PAD:
        return _Q_PAD
    if b > 128:
        return _ceil_to(b, 32)
    return 1 << (b - 1).bit_length()


def bucket_k(k: int) -> int:
    """Compile-bucket for k (same motivation as :func:`bucket_b`): next
    power of two >= max(k, 8). Callers run the searcher at the bucketed k
    and slice the exact prefix — the top-k prefix of a top-k_run result
    is the exact top-k."""
    return 1 << (max(k, 8) - 1).bit_length()


def pad_queries(q: jnp.ndarray) -> jnp.ndarray:
    b = q.shape[0]
    b_pad = bucket_b(b)
    if b_pad == b:
        return q
    return jnp.concatenate(
        [q, jnp.zeros((b_pad - b, q.shape[1]), dtype=q.dtype)], axis=0
    )


# ---------------------------------------------------------------------------
# Phase 1 kernel
# ---------------------------------------------------------------------------


def _chunk_max_kernel(n_valid_ref, x_ref, q_ref, out_ref):
    """Score a (TILE_N, D) slab against all queries; emit per-CHUNK maxima."""
    import jax.experimental.pallas as pl

    scores = jnp.dot(
        x_ref[:], q_ref[:].T, preferred_element_type=jnp.float32
    )  # (TILE_N, B) on the MXU

    # Mask padding rows (only the last live tile can contain them).
    row = pl.program_id(0) * x_ref.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 0
    )
    scores = jnp.where(row < n_valid_ref[0], scores, -jnp.inf)

    b = scores.shape[1]
    out_ref[:] = jnp.max(scores.reshape(-1, CHUNK, b), axis=1)


def _chunk_max_masked_kernel(n_valid_ref, x_ref, q_ref, dead_ref, out_ref):
    """Chunk-max with a per-row tombstone mask (deleted rows -> -inf BEFORE
    selection — masking after would let dead chunks displace live ones)."""
    import jax.experimental.pallas as pl

    scores = jnp.dot(
        x_ref[:], q_ref[:].T, preferred_element_type=jnp.float32
    )
    row = pl.program_id(0) * x_ref.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 0
    )
    # Mosaic lacks i8 vector compares — widen the mask first
    alive = (row < n_valid_ref[0]) & (dead_ref[:].astype(jnp.int32) == 0)
    scores = jnp.where(alive, scores, -jnp.inf)
    b = scores.shape[1]
    out_ref[:] = jnp.max(scores.reshape(-1, CHUNK, b), axis=1)


@functools.lru_cache(maxsize=128)
def _build_searcher(
    n_pad: int,
    d: int,
    b_pad: int,
    k: int,
    interpret: bool,
    precision: lax.Precision,
    with_mask: bool = False,
):
    """Compile-once fused searcher for a static (n_pad, d, b, k) signature.

    Returns jitted ``f(x, q, n_valid[, deleted]) -> TopKResult`` with
    dynamic n_valid. ``with_mask`` adds a (n_pad, 1) int8 tombstone input
    (~0.1% extra HBM read vs the matrix itself).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_tiles = n_pad // TILE_N
    num_chunks = n_pad // CHUNK
    chunks_per_tile = TILE_N // CHUNK
    k_chunks = min(k, num_chunks)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid (1,) i32
        pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if with_mask:
        in_specs.append(
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    sweep = pl.pallas_call(
        _chunk_max_masked_kernel if with_mask else _chunk_max_kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (chunks_per_tile, b_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_chunks, b_pad), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def search(
        x: jnp.ndarray,
        q: jnp.ndarray,
        n_valid: jnp.ndarray,
        deleted: jnp.ndarray | None = None,
    ) -> TopKResult:
        n_valid_arr = jnp.asarray(n_valid, jnp.int32).reshape(1)
        if with_mask:
            chunk_max = sweep(n_valid_arr, x, q, deleted)      # (NC, B)
        else:
            chunk_max = sweep(n_valid_arr, x, q)
        _, chunk_ids = lax.top_k(chunk_max.T, k_chunks)        # (B, kc)
        row_ids = (
            chunk_ids[:, :, None] * CHUNK + jnp.arange(CHUNK)[None, None, :]
        ).reshape(b_pad, k_chunks * CHUNK)
        valid = row_ids < n_valid
        if with_mask:
            valid &= deleted[row_ids, 0] == 0
        cand = x[jnp.where(valid, row_ids, 0)]                 # (B, kcC, D)
        scores = jnp.einsum(
            "bd,bcd->bc",
            q.astype(jnp.float32),
            cand.astype(jnp.float32),
            precision=precision,
        )
        scores = jnp.where(valid, scores, -jnp.inf)
        k_eff = min(k, scores.shape[1])
        top_scores, pos = lax.top_k(scores, k_eff)
        top_ids = jnp.take_along_axis(row_ids, pos, axis=1)
        return TopKResult(top_scores, top_ids.astype(jnp.int32))

    return search


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def topk_search(
    x: jnp.ndarray,
    q: jnp.ndarray,
    k: int,
    n_valid: int | jnp.ndarray | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
    precision: lax.Precision = lax.Precision.HIGHEST,
    deleted: jnp.ndarray | None = None,
) -> TopKResult:
    """Exact top-k inner-product search of queries ``q`` over rows of ``x``.

    Inputs should be L2-normalized for cosine semantics (matching the
    reference's FAISS IndexFlatIP usage, ``core.py:1176-1212``).

    ``x`` may be pre-padded to a TILE_N multiple (pass ``n_valid`` = live
    rows); otherwise it is padded here. ``use_pallas=None`` auto-selects the
    Pallas sweep on TPU and the jnp oracle elsewhere; ``interpret=True``
    forces the Pallas interpreter (CPU tests of the kernel path).

    ``deleted``: optional (N,) or (N_pad, 1) int8 tombstone mask — rows
    with a nonzero entry never appear in results (exact; masked before
    chunk selection).
    """
    b = q.shape[0]
    n_live = int(x.shape[0]) if n_valid is None else int(n_valid)
    if n_live == 0:
        return TopKResult(
            jnp.full((b, 0), -jnp.inf, jnp.float32), jnp.zeros((b, 0), jnp.int32)
        )
    k = min(k, n_live)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        xs = x[:n_live]
        if deleted is not None:
            mask = jnp.asarray(deleted).reshape(-1)[:n_live]
            return _topk_reference_masked(xs, q, k, mask, precision)
        return topk_exact_reference(xs, q, k, precision=precision)

    x_p = x if x.shape[0] % TILE_N == 0 else pad_database(x)
    q_p = pad_queries(q)
    dead = None
    if deleted is not None:
        dead = jnp.asarray(deleted, jnp.int8).reshape(-1, 1)
        if dead.shape[0] != x_p.shape[0]:
            pad_rows = x_p.shape[0] - dead.shape[0]
            dead = jnp.concatenate(
                [dead, jnp.zeros((pad_rows, 1), jnp.int8)], axis=0
            )
    # run at the bucketed k, slice the exact top-k prefix (see bucket_k)
    k_run = min(bucket_k(k), n_live)
    search = _build_searcher(
        int(x_p.shape[0]), int(x_p.shape[1]), int(q_p.shape[0]), int(k_run),
        bool(interpret), precision, with_mask=dead is not None,
    )
    res = search(x_p, q_p, jnp.int32(n_live), dead) if dead is not None else (
        search(x_p, q_p, jnp.int32(n_live))
    )
    if q_p.shape[0] != b or res.scores.shape[1] != k:
        res = TopKResult(res.scores[:b, :k], res.indices[:b, :k])
    return res


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def _topk_reference_masked(x, q, k, deleted_mask, precision):
    scores = jnp.einsum(
        "bd,nd->bn", q.astype(jnp.float32), x.astype(jnp.float32),
        precision=precision,
    )
    scores = jnp.where(deleted_mask[None, :] == 0, scores, -jnp.inf)
    top_scores, top_ids = lax.top_k(scores, min(k, x.shape[0]))
    return TopKResult(top_scores, top_ids.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def topk_exact_reference(
    x: jnp.ndarray,
    q: jnp.ndarray,
    k: int,
    precision: lax.Precision = lax.Precision.HIGHEST,
) -> TopKResult:
    """Oracle: full score matrix + lax.top_k. Tests + CPU fallback."""
    scores = jnp.einsum(
        "bd,nd->bn", q.astype(jnp.float32), x.astype(jnp.float32),
        precision=precision,
    )
    top_scores, top_ids = lax.top_k(scores, min(k, x.shape[0]))
    return TopKResult(top_scores, top_ids.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def topk_masked_reference(
    x: jnp.ndarray,
    q: jnp.ndarray,
    k: int,
    n_valid: jnp.ndarray,
    precision: lax.Precision = lax.Precision.HIGHEST,
    deleted: jnp.ndarray | None = None,
) -> TopKResult:
    """Oracle with a *dynamic* live-row count (and optional tombstones):
    dead rows are masked to -inf BEFORE selection (the sharded searcher's
    per-shard fallback)."""
    scores = jnp.einsum(
        "bd,nd->bn", q.astype(jnp.float32), x.astype(jnp.float32),
        precision=precision,
    )
    col = jnp.arange(x.shape[0])[None, :]
    alive = col < n_valid
    if deleted is not None:
        alive &= jnp.asarray(deleted).reshape(-1)[None, :] == 0
    scores = jnp.where(alive, scores, -jnp.inf)
    top_scores, top_ids = lax.top_k(scores, min(k, x.shape[0]))
    return TopKResult(top_scores, top_ids.astype(jnp.int32))


def cosine_topk(x: jnp.ndarray, q: jnp.ndarray, k: int, **kwargs) -> TopKResult:
    """Convenience: L2-normalize both sides then exact top-k."""
    from .normalize import l2_normalize

    return topk_search(l2_normalize(x), l2_normalize(q), k, **kwargs)


def chunk_max_sweep(
    x: jnp.ndarray, q: jnp.ndarray, n_valid: int, interpret: bool = False
) -> jnp.ndarray:
    """Phase-1 maxima only (exposed for tests): (N_pad/CHUNK, B_pad)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = x.shape
    assert n_pad % TILE_N == 0, f"x rows {n_pad} not a TILE_N={TILE_N} multiple"
    q_p = pad_queries(q)
    b_pad = q_p.shape[0]
    sweep = pl.pallas_call(
        _chunk_max_kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N // CHUNK, b_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad // CHUNK, b_pad), jnp.float32),
        interpret=interpret,
    )
    out = sweep(jnp.asarray([n_valid], jnp.int32), x, q_p)
    return out[:, : q.shape[0]]
