"""IVF approximate search: TPU-native ANN over the flat device buffer.

Opt-in **latency mode** for very large corpora at small query batches. The
reference accepted approximate FAISS index types (``IndexIVFFlat`` /
``IndexHNSW`` / ``IndexLSH`` — ``core.py:1213-1216``) but its IVF request was
silently converted to exact Flat; HNSW's pointer-chasing graph walk is
hostile to a vector machine. The TPU-native answer is classic IVF re-shaped
for XLA:

- **Buckets hold row IDS, not rows.** The searchable corpus stays the ONE
  flat (cap, d) device buffer the exact path uses (``ops.topk`` /
  ``ops.quant``); the IVF adds only a (nlist, bucket_cap) i32 id table, a
  (nlist, d) f32 centroid matrix and a small dynamic "tail" id list. No row
  duplication, and tombstones/n_valid masking work unchanged (ids map
  through the same masks as the exact kernels).
- **The whole build runs on device.** The host<->device tunnel moves
  ~1 MB/s here (CLAUDE.md), so the corpus can never round-trip: k-means
  samples by device gather, assignment sweeps are chunked device matmuls,
  and capacity-bucketing is a device sort pass per spill round
  (lexicographic ``lax.sort`` on (cluster, -sim) — exact, no float-packed
  keys). Only O(nlist) scalars ever reach the host.
- **Static shapes throughout.** Clusters are capacity-bucketed
  (``bucket_cap`` slots, -1 padding); rows overflowing their nearest
  cluster spill to their 2nd..A-th nearest with free slots; the rare final
  leftovers land in the tail, which is also where post-build appends go.
  Every live row is therefore in EXACTLY ONE bucket slot or the tail —
  probing all ``nlist`` clusters is provably exact, which anchors the test
  oracle.
- **Search = three matmul/gather stages**, all XLA (no Pallas needed —
  gathers and batched GEMMs are XLA strengths, and the same programs run on
  the CPU test backend): (1) probe selection ``q @ C^T`` + top-nprobe;
  (2) candidate gather ``x[bucket_ids[probes]]`` + batched scoring einsum
  (f32-exact for float rows; the bit-exact integer metric of ``ops.quant``
  for int8 rows); (3) chunk-max two-phase selection over the (B, C)
  candidate scores (C can be ~100k; a flat ``lax.top_k`` at that width is
  sort-bound).

Why small batches only: candidate traffic is per-query (B x nprobe x
bucket_cap rows), while the dense exact sweep amortizes ONE corpus pass
over the whole batch. At 10M int8 rows, nprobe=32, cap~2.5k: ~80 MB/query
vs 7.7 GB/pass — a big win at B<=8, a loss at B>=64. Callers auto-fall back
to the dense path above ``UnifiedIndexConfig.ann_max_batch``.

Approximation contract: results are exact *within the probed candidate
set* (same metric as the dense path, including the int8 integer metric);
recall is controlled by ``nprobe``/``nlist`` and measured per-corpus with
``retrieval.evaluation``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from .topk import TopKResult, bucket_k

__all__ = [
    "IVFState",
    "IVFBuildReport",
    "build_ivf",
    "ivf_topk",
    "tail_append",
    "default_nlist",
    "TAIL_MAX",
]

# Dynamic tail capacity: spill leftovers + post-build appends live here and
# are ALWAYS scanned (shared across the batch). When appends outgrow it the
# caller must rebuild (UnifiedIndex falls back to dense until then).
TAIL_MAX = 8192
# Selection chunk for the search's two-phase top-k (mirrors ops.topk.CHUNK).
_SEL_CHUNK = 128
# Max in-program query batch (upper bound; the effective bound is also
# memory-derived, see _max_program_b). Batches beyond it slice through the
# same compiled program.
_MAX_PROGRAM_B = 16
# Budget for the batched searcher's union candidate gather
# (min(B*nprobe, nlist) * cap * d * dtype bytes). ~1.6 GB leaves headroom
# next to a 7.7 GB 10M int8 corpus on a 16 GB v5e.
_GATHER_BUDGET = int(
    __import__("os").environ.get("IVARS_ANN_GATHER_BUDGET", 1_600_000_000)
)
# Row chunk for build-time assignment sweeps over the corpus: bounds the
# transient (chunk, nlist) f32 score block (64k x 16384 x 4B = 4 GB worst
# case -> use 16k rows: <= 1 GB).
_ASSIGN_CHUNK = 16_384


class IVFState(NamedTuple):
    """Device-resident IVF structure over an external flat row buffer."""

    centroids: object     # (nlist, d) f32, unit-norm
    bucket_ids: object    # (nlist, bucket_cap) i32 row ids, -1 = empty slot
    tail_ids: object      # (TAIL_MAX,) i32 row ids, -1 = empty
    tail_count: object    # () i32 — live tail entries
    ann_rows: int         # corpus row count the buckets cover (rows >= this
                          # must be tail-appended or trigger a rebuild)


class IVFBuildReport(NamedTuple):
    nlist: int
    bucket_cap: int
    leftover: int         # rows that fell through to the tail
    kmeans_iters: int
    sample_rows: int


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _max_program_b(nlist: int, cap: int, d: int, nprobe: int,
                   row_bytes: int) -> int:
    """Largest power-of-two in-program batch whose union candidate gather
    (min(B*nprobe, nlist) * cap * d * row_bytes) fits ``_GATHER_BUDGET``
    (never above ``_MAX_PROGRAM_B``). The gather output is the batched
    searcher's only batch-scaling allocation; the (B, n_cand) f32 score
    matrix is ~d x smaller."""
    b = 1
    while b < _MAX_PROGRAM_B:
        nxt = b * 2
        if min(nxt * nprobe, nlist) * cap * d * row_bytes > _GATHER_BUDGET:
            break
        b = nxt
    return b


def _bucket_b_ann(b: int) -> int:
    """Power-of-two compile bucket for the query batch, starting at 1.

    NOT ``ops.topk.bucket_b`` (whose floor is 8, the sublane width): here
    the dominant cost is the per-query candidate GATHER, so padding a
    single query to 8 would pull 8x the candidate bytes. Matmul sublane
    padding is irrelevant — the scoring einsum is gather-bound."""
    return 1 << (max(b, 1) - 1).bit_length()


def default_nlist(n_rows: int) -> int:
    """~4*sqrt(N) rounded to a power of two, clamped to [64, 16384]
    (FAISS-guideline territory: 4096-16384 at 10M rows)."""
    if n_rows <= 0:
        return 64
    target = 4.0 * float(n_rows) ** 0.5
    p = 1 << max(6, int(round(np.log2(max(target, 64.0)))))
    return int(min(max(p, 64), 16384))


# ---------------------------------------------------------------------------
# Build: spherical k-means + capacity bucketing, all on device
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _gather_f32_program(int8: bool):
    """x[ids] as f32 rows (dequantized for int8 corpora)."""
    import jax
    import jax.numpy as jnp

    if int8:

        def fn(x, scales, ids):
            return x[ids].astype(jnp.float32) * scales[ids][:, None]

    else:

        def fn(x, ids):
            return x[ids].astype(jnp.float32)

    return jax.jit(fn)


def _rows_f32(x, x_scales, ids):
    import jax.numpy as jnp

    if x_scales is not None:
        return _gather_f32_program(True)(x, x_scales, jnp.asarray(ids))
    return _gather_f32_program(False)(x, jnp.asarray(ids))


@functools.lru_cache(maxsize=8)
def _kmeans_step_program():
    """One Lloyd step over the (device-resident) sample: assign +
    scatter-add accumulate. Returns (acc, counts)."""
    import jax
    import jax.numpy as jnp

    def fn(x, centroids):
        s = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
        assign = jnp.argmax(s, axis=1)
        acc = jnp.zeros_like(centroids).at[assign].add(x)
        counts = jnp.zeros((centroids.shape[0],), jnp.int32).at[assign].add(1)
        return acc, counts

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _kmeans_finish_program():
    """mean + re-normalize, with empty clusters re-seeded from given rows."""
    import jax
    import jax.numpy as jnp

    def fn(acc, counts, reseed_rows):
        empty = (counts == 0)[:, None]
        mean = jnp.where(
            empty, reseed_rows, acc / jnp.maximum(counts, 1)[:, None]
        )
        norms = jnp.maximum(
            jnp.linalg.norm(mean, axis=1, keepdims=True), 1e-12
        )
        return mean / norms

    return jax.jit(fn)


def _spherical_kmeans(sample, nlist: int, iters: int, seed: int):
    """Unit-norm centroids by Lloyd's on the unit sphere; ``sample`` is a
    device (S, d) f32 array of unit rows. Empty clusters re-seed from
    random sample rows. Everything stays on device."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = int(sample.shape[0])
    init = rng.choice(n, size=nlist, replace=n < nlist)
    centroids = sample[jnp.asarray(init)]
    step = _kmeans_step_program()
    finish = _kmeans_finish_program()
    for _ in range(max(iters, 1)):
        acc, counts = step(sample, centroids)
        reseed = sample[jnp.asarray(rng.choice(n, size=nlist))]
        centroids = finish(acc, counts, reseed)
    return centroids


@functools.lru_cache(maxsize=32)
def _assign_chunk_program(a_top: int, int8: bool):
    """Top-A nearest centroids for a dynamic row chunk of the corpus."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def fn(x, *rest):
        if int8:
            scales, centroids, start = rest
            chunk = lax.dynamic_slice_in_dim(x, start, _ASSIGN_CHUNK, 0)
            cs = lax.dynamic_slice_in_dim(scales, start, _ASSIGN_CHUNK, 0)
            chunk = chunk.astype(jnp.float32) * cs[:, None]
        else:
            centroids, start = rest
            chunk = lax.dynamic_slice_in_dim(
                x, start, _ASSIGN_CHUNK, 0
            ).astype(jnp.float32)
        s = jnp.dot(chunk, centroids.T, preferred_element_type=jnp.float32)
        top_s, top_ids = lax.top_k(s, a_top)
        return top_ids.astype(jnp.int32), top_s

    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _bucket_pass_program(n_pad: int, nlist: int, cap: int):
    """One spill round of capacity bucketing, entirely on device.

    Sorts this round's unplaced rows lexicographically by (cluster, -sim)
    — exact multi-key ``lax.sort``, no packed float keys — then within
    each cluster segment the first ``cap - fill`` rows take slots (keeping
    the rows most similar to the centroid in their home bucket). Returns
    the updated (bucket_flat, placed, fill).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def fn(bucket_flat, placed, fill, choice_c, choice_s, n_rows):
        row = jnp.arange(n_pad, dtype=jnp.int32)
        active = (~placed) & (row < n_rows)
        # inactive rows sort to the end (cluster key = nlist)
        c_key = jnp.where(active, choice_c, nlist)
        neg_s = jnp.where(active, -choice_s, jnp.inf)
        c_sorted, _, rows_sorted = lax.sort(
            (c_key, neg_s, row), num_keys=2
        )
        seg_start = jnp.searchsorted(c_sorted, jnp.arange(nlist))
        in_active = c_sorted < nlist
        c_safe = jnp.minimum(c_sorted, nlist - 1)
        pos = jnp.arange(n_pad, dtype=jnp.int32) - seg_start[c_safe].astype(
            jnp.int32
        )
        slot = fill[c_safe] + pos
        ok = in_active & (slot < cap)
        flat = jnp.where(ok, c_safe * cap + slot, nlist * cap)  # dump slot
        bucket_flat = bucket_flat.at[flat].set(
            jnp.where(ok, rows_sorted, -1)
        )
        placed = placed | jnp.zeros_like(placed).at[rows_sorted].set(ok)
        fill = fill + jnp.zeros_like(fill).at[c_safe].add(ok.astype(jnp.int32))
        return bucket_flat, placed, fill

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _leftover_program(n_pad: int, tail_max: int):
    """Compact unplaced live rows into a (tail_max,) id list + count."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def fn(placed, n_rows):
        row = jnp.arange(n_pad, dtype=jnp.int32)
        active = (~placed) & (row < n_rows)
        # active rows first (sort by ~active), stable -> ascending row ids
        key = (~active).astype(jnp.int32)
        _, rows_sorted = lax.sort((key, row), num_keys=1)
        count = jnp.sum(active.astype(jnp.int32))
        ids = jnp.where(
            jnp.arange(tail_max) < count, rows_sorted[:tail_max], -1
        ).astype(jnp.int32)
        return ids, count

    return jax.jit(fn)


def build_ivf(
    x,
    n_rows: int | None = None,
    x_scales=None,
    nlist: int | None = None,
    bucket_cap: int | None = None,
    cap_factor: float = 1.5,
    spill_rounds: int = 4,
    kmeans_iters: int = 10,
    sample_per_list: int = 128,
    seed: int = 0,
) -> tuple[IVFState, IVFBuildReport]:
    """Build the IVF structure over the flat (device) row buffer ``x``.

    ``x`` is the SAME array the dense search paths use: (cap, d) float rows
    (bf16/f32, L2-normalized) or int8 rows with ``x_scales`` (norm folded
    into the scale, as ``index.unified`` stores them). ``n_rows`` = live
    rows (defaults to all). The whole build executes on device; only
    O(nlist) scalars are fetched.
    """
    import jax.numpy as jnp

    # Fail FAST on a donated/deleted input instead of dispatching: on a
    # single controller a failed Execute is harmless (the caller's retry
    # path catches it), but on a MULTI-CONTROLLER mesh the failed launch
    # desyncs the collective stream and the next collective deadlocks
    # (found by tests/test_distributed_multiproc.py's maintenance-race
    # stage). The host-side check raises the same canonical error the
    # retry paths already catch, without touching the runtime.
    for buf in (x, x_scales):
        if buf is not None and getattr(buf, "is_deleted", lambda: False)():
            raise RuntimeError(
                "Array has been deleted (donated by a concurrent append "
                "before the build dispatched)"
            )
    x = jnp.asarray(x)
    n_pad_src = int(x.shape[0])
    n = n_pad_src if n_rows is None else int(n_rows)
    assert 0 < n <= n_pad_src, f"n_rows {n} out of range"
    if nlist is None:
        nlist = default_nlist(n)
    nlist = int(min(nlist, max(64, n)))
    if bucket_cap is None:
        bucket_cap = _ceil_to(
            max(int(cap_factor * n / nlist), _SEL_CHUNK), _SEL_CHUNK
        )
    assert bucket_cap % _SEL_CHUNK == 0

    # --- k-means on a device-gathered subsample ---------------------------
    sample_n = int(min(n, max(sample_per_list * nlist, 4096)))
    rng = np.random.default_rng(seed)
    idx = (
        np.arange(n) if sample_n >= n
        else np.sort(rng.choice(n, size=sample_n, replace=False))
    )
    sample = _rows_f32(x, x_scales, idx.astype(np.int32))
    centroids = _spherical_kmeans(sample, nlist, kmeans_iters, seed)
    del sample

    # --- full-corpus top-A assignment (chunked device sweeps) -------------
    a_top = int(min(spill_rounds, nlist))
    if n_pad_src < _ASSIGN_CHUNK:
        # tiny corpus: pad up to one chunk (cheap copy)
        pad = jnp.zeros((_ASSIGN_CHUNK - n_pad_src, x.shape[1]), x.dtype)
        x_a = jnp.concatenate([x, pad], axis=0)
        s_a = (
            None if x_scales is None
            else jnp.concatenate(
                [x_scales,
                 jnp.zeros((_ASSIGN_CHUNK - n_pad_src,), jnp.float32)]
            )
        )
        n_pad = _ASSIGN_CHUNK
    else:
        # NO padded copy of a multi-GB corpus: the last chunk overlaps the
        # previous one (same rows -> identical recomputed choices)
        x_a, s_a = x, x_scales
        n_pad = n_pad_src
    assign = _assign_chunk_program(a_top, x_scales is not None)
    choice_c = jnp.zeros((n_pad, a_top), jnp.int32)
    choice_s = jnp.zeros((n_pad, a_top), jnp.float32)
    from jax import lax as _lax

    starts = list(range(0, n_pad - _ASSIGN_CHUNK + 1, _ASSIGN_CHUNK))
    if starts[-1] + _ASSIGN_CHUNK < n_pad:
        starts.append(n_pad - _ASSIGN_CHUNK)
    for start in starts:
        if s_a is not None:
            ids, sims = assign(x_a, s_a, centroids, jnp.int32(start))
        else:
            ids, sims = assign(x_a, centroids, jnp.int32(start))
        choice_c = _lax.dynamic_update_slice(choice_c, ids, (start, 0))
        choice_s = _lax.dynamic_update_slice(choice_s, sims, (start, 0))

    # --- capacity bucketing with spill (device sort passes) ---------------
    def _bucket(cap: int):
        bucket_flat = jnp.full((nlist * cap + 1,), -1, jnp.int32)
        placed = jnp.zeros((n_pad,), bool)
        fill = jnp.zeros((nlist,), jnp.int32)
        step = _bucket_pass_program(n_pad, nlist, cap)
        for a in range(a_top):
            bucket_flat, placed, fill = step(
                bucket_flat, placed, fill,
                choice_c[:, a], choice_s[:, a], jnp.int32(n),
            )
        tail_ids, tail_count = _leftover_program(n_pad, TAIL_MAX)(
            placed, jnp.int32(n)
        )
        return bucket_flat, tail_ids, int(tail_count)

    bucket_flat, tail_ids, leftover = _bucket(bucket_cap)
    if leftover > TAIL_MAX:
        # capacity too tight for this distribution: widen and re-bucket
        bucket_cap = _ceil_to(bucket_cap * 2, _SEL_CHUNK)
        bucket_flat, tail_ids, leftover = _bucket(bucket_cap)
        if leftover > TAIL_MAX:
            raise ValueError(
                f"{leftover} leftover rows exceed tail capacity even at "
                f"bucket_cap={bucket_cap}; raise cap_factor"
            )

    state = IVFState(
        centroids=centroids,
        bucket_ids=bucket_flat[:-1].reshape(nlist, bucket_cap),
        tail_ids=tail_ids,
        tail_count=jnp.asarray(min(leftover, TAIL_MAX), jnp.int32),
        ann_rows=int(n),
    )
    report = IVFBuildReport(
        nlist=nlist,
        bucket_cap=bucket_cap,
        leftover=leftover,
        kmeans_iters=kmeans_iters,
        sample_rows=sample_n,
    )
    return state, report


def tail_append(state: IVFState, row_ids: np.ndarray | list[int]) -> IVFState:
    """Register appended corpus rows in the always-scanned tail.

    Returns the updated state, or raises ``OverflowError`` when the tail is
    full (caller should rebuild, falling back to dense search meanwhile)."""
    import jax
    import jax.numpy as jnp

    ids = np.asarray(row_ids, np.int32).reshape(-1)
    if ids.size == 0:
        return state
    count = int(state.tail_count)
    if count + ids.size > TAIL_MAX:
        raise OverflowError(
            f"IVF tail full ({count}+{ids.size} > {TAIL_MAX}); rebuild"
        )
    tail = jax.lax.dynamic_update_slice(
        state.tail_ids, jnp.asarray(ids), (count,)
    )
    return state._replace(
        tail_ids=tail,
        tail_count=jnp.asarray(count + ids.size, jnp.int32),
        ann_rows=max(state.ann_rows, int(ids.max()) + 1),
    )


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------


def _select_blocks(scores, cand, k: int):
    """Chunk-max block selection over (B, n_cand) scores (flat top_k at
    ~100k width is sort-bound). Returns the winning blocks' selection
    scores (B, kc*CH), their candidate ids, and their flat positions into
    the (B, n_cand) input — callers that re-score phase-B style MUST
    gather every phase-A mask (e.g. the union program's ``own``) through
    those positions, or rows masked out of selection re-enter at rescore.

    Exactness: every true top-k element lives in some 128-chunk; the top-k
    chunks by max contain all of them (standard chunk-max argument, see
    ``ops.topk``), so a flat top-k over the selected blocks is exact."""
    import jax.numpy as jnp
    from jax import lax

    b_pad, n_cand = scores.shape
    assert n_cand % _SEL_CHUNK == 0
    num_chunks = n_cand // _SEL_CHUNK
    k_chunks = min(k, num_chunks)
    cm = jnp.max(scores.reshape(b_pad, num_chunks, _SEL_CHUNK), axis=2)
    _, cid = lax.top_k(cm, k_chunks)                     # (B, kc)
    blocks = jnp.take_along_axis(
        scores.reshape(b_pad, num_chunks, _SEL_CHUNK),
        cid[:, :, None],
        axis=1,
    )                                                    # (B, kc, CH)
    flat = blocks.reshape(b_pad, k_chunks * _SEL_CHUNK)
    flat_pos = (
        cid[:, :, None] * _SEL_CHUNK + jnp.arange(_SEL_CHUNK)[None, None]
    ).reshape(b_pad, k_chunks * _SEL_CHUNK)
    block_cand = jnp.take_along_axis(cand, flat_pos, axis=1)
    return flat, block_cand, flat_pos


def _probe_candidates(centroids, bucket_ids, tail_ids, tail_count, qf,
                      n_valid, nprobe: int):
    """Probe selection + candidate id assembly shared by the single-device
    and sharded (``parallel.sharded_ann``) searchers. ``n_valid`` bounds the
    VALID id range (local live rows for a shard)."""
    import jax.numpy as jnp
    from jax import lax

    b_pad = qf.shape[0]
    cap = bucket_ids.shape[1]
    tail_max = tail_ids.shape[0]
    cs = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
    _, probes = lax.top_k(cs, nprobe)                    # (B, nprobe)
    cand = bucket_ids[probes].reshape(b_pad, nprobe * cap)
    tids = jnp.where(jnp.arange(tail_max) < tail_count, tail_ids, -1)
    cand = jnp.concatenate(
        [cand, jnp.broadcast_to(tids[None], (b_pad, tail_max))], axis=1
    )                                                    # (B, n_cand)
    valid = (cand >= 0) & (cand < n_valid)
    return cand, valid


def _topk_over_candidates_int8(x_i8, x_scales, qf, cand, valid, k: int):
    """Exact int8-metric top-k over an explicit candidate id set.

    ``valid`` must already include range AND tombstone checks. The i32
    accumulation is exact (< 2^24), bit-matching the dense int8 metric
    (``ops.quant``). Shared by the single-device and sharded searchers."""
    import jax.numpy as jnp
    from jax import lax

    from .quant import _quantize_q

    safe = jnp.where(valid, cand, 0)
    q_i8, q_scales = _quantize_q(qf)
    # native int8 x int8 -> i32 batched dot: the gathered rows stay
    # int8 end to end (an f32 convert would materialize 4 bytes per
    # candidate element — measured as a 20 GB allocation at scale).
    int_dot = lax.dot_general(
        q_i8, x_i8[safe],
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)                            # (B, n_cand)
    scores = int_dot * x_scales[safe] * q_scales[:, None]
    scores = jnp.where(valid, scores, -jnp.inf)
    flat, block_cand, _ = _select_blocks(scores, cand, k)
    k_eff = min(k, flat.shape[1])
    top_s, pos = lax.top_k(flat, k_eff)
    top_ids = jnp.take_along_axis(block_cand, pos, axis=1)
    return TopKResult(top_s, top_ids.astype(jnp.int32))


def _topk_over_candidates_float(x, qf, cand, valid, k: int, n_valid, deleted):
    """Two-phase float top-k over an explicit candidate id set.

    Phase A scores in the STORAGE dtype; phase B rescores the selected
    blocks f32-HIGHEST — the dense kernel's own structure, so final scores
    carry the same metric as ``ops.topk`` phase 2. ``valid`` is the phase-A
    mask (range + tombstones); ``n_valid``/``deleted`` re-derive validity
    for phase B. Shared by the single-device and sharded searchers."""
    import jax.numpy as jnp
    from jax import lax

    safe = jnp.where(valid, cand, 0)
    # Phase A: score candidates in the STORAGE dtype (bf16 rows stay
    # bf16 into the MXU — an f32 convert would materialize 4 bytes per
    # candidate element, measured as a 20 GB allocation at scale).
    rows = x[safe]                                       # (B, C, d)
    approx = lax.dot_general(
        qf.astype(x.dtype), rows,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    approx = jnp.where(valid, approx, -jnp.inf)
    # Phase B: exact f32-HIGHEST rescore of the selected blocks only
    # (k_chunks*128 rows per query). Re-deriving range+tombstone here is
    # equivalent to phase A's mask: every candidate in a query's row came
    # from its own probes (no union/`own` dimension in this program).
    _, block_cand, _ = _select_blocks(approx, cand, k)
    bvalid = (block_cand >= 0) & (block_cand < n_valid)
    bsafe = jnp.where(bvalid, block_cand, 0)
    if deleted is not None:
        bvalid &= deleted[bsafe, 0] == 0
    rescored = jnp.einsum(
        "bd,bcd->bc",
        qf,
        x[bsafe].astype(jnp.float32),
        precision=lax.Precision.HIGHEST,
    )
    rescored = jnp.where(bvalid, rescored, -jnp.inf)
    k_eff = min(k, rescored.shape[1])
    top_s, pos = lax.top_k(rescored, k_eff)
    top_ids = jnp.take_along_axis(block_cand, pos, axis=1)
    return TopKResult(top_s, top_ids.astype(jnp.int32))


def _dedup_probes(probes, nlist: int, u_slots: int):
    """Union-dedup the batch's probed bucket ids into ``u_slots`` static
    slots (sentinel ``nlist`` marks empty/duplicate slots).

    Two device sorts: (1) sort the flat (B*nprobe,) probe ids and mark
    duplicates by neighbor equality; (2) stable sort by (is_dup, id) so the
    unique ids compact to the front. ``u_slots = min(B*nprobe, nlist)``
    bounds the unique count, so the static prefix always holds them all.
    """
    import jax.numpy as jnp
    from jax import lax

    flat = probes.reshape(-1).astype(jnp.int32)          # (B*nprobe,)
    ids_sorted = lax.sort(flat)
    dup = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (ids_sorted[1:] == ids_sorted[:-1]).astype(jnp.int32)]
    )
    dup_s, ids_unique_first = lax.sort((dup, ids_sorted), num_keys=2)
    return jnp.where(
        dup_s[:u_slots] == 0, ids_unique_first[:u_slots], nlist
    )                                                    # (u_slots,)


@functools.lru_cache(maxsize=64)
def _build_ivf_batch_searcher(
    nlist: int,
    cap: int,
    d: int,
    b_pad: int,
    k: int,
    nprobe: int,
    tail_max: int,
    int8: bool,
):
    """Compile-once BATCHED IVF searcher: union candidate set + one GEMM.

    The per-query searcher (:func:`_build_ivf_searcher`) materializes a
    (B, nprobe*cap, d) candidate tensor — B duplicated gathers feeding B
    M=1 batched dots, which is why IVF lost to the dense sweep above
    B=4 (round-3 measurement: 21.5 vs 13.7 ms/batch at B=8 over 10M).
    This program instead:

    1. dedups the batch's probed buckets into ``u_slots = min(B*nprobe,
       nlist)`` static slots (:func:`_dedup_probes`) — overlapping queries
       share bucket fetches (duplicate slots degrade to cache-hot row-0
       reads);
    2. gathers the union candidate rows ONCE: (u_slots*cap + tail, d);
    3. scores ALL queries against the union in ONE (B, d) x (d, C) GEMM —
       a proper MXU shape streaming the candidate rows once per batch
       instead of once per query;
    4. masks each query down to candidates from its OWN probed buckets
       (+ the always-scanned tail) before selection, so per-query results
       are IDENTICAL to the B=1 program regardless of batch composition —
       batching stays deterministic (ties aside) and cache-safe.

    Reference analog: FAISS IVF serves batched queries natively
    (``core.py:1213-1216`` accepted IndexIVFFlat); this is the TPU-shaped
    equivalent.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if int8:

        def search(x_i8, x_scales, centroids, bucket_ids, tail_ids,
                   tail_count, q, n_valid, deleted):
            import jax.numpy as jnp

            qf = q.astype(jnp.float32)
            cand, valid, own = _probe_candidates_batched(
                centroids, bucket_ids, tail_ids, tail_count, qf, n_valid,
                nprobe,
            )
            if deleted is not None:
                valid &= deleted[jnp.where(valid, cand, 0), 0] == 0
            return _topk_over_union_int8(
                x_i8, x_scales, qf, cand, valid, own, k
            )

        return jax.jit(search)

    def search(x, centroids, bucket_ids, tail_ids, tail_count, q, n_valid,
               deleted):
        import jax.numpy as jnp

        qf = q.astype(jnp.float32)
        cand, valid, own = _probe_candidates_batched(
            centroids, bucket_ids, tail_ids, tail_count, qf, n_valid, nprobe
        )
        if deleted is not None:
            valid &= deleted[jnp.where(valid, cand, 0), 0] == 0
        return _topk_over_union_float(
            x, qf, cand, valid, own, k, n_valid, deleted
        )

    return jax.jit(search)


def _probe_candidates_batched(centroids, bucket_ids, tail_ids, tail_count,
                              qf, n_valid, nprobe: int):
    """Union probe selection shared by the single-device and sharded
    batched searchers. Returns ``(cand, valid, own)``:

    - ``cand`` (n_cand,): the SHARED candidate id vector — union of the
      batch's probed buckets (deduped into static slots) + the tail;
    - ``valid`` (n_cand,): range mask (callers AND in tombstones);
    - ``own`` (B, n_cand): per-query own-probe membership, restoring
      B=1-identical per-query candidate sets under batching.
    """
    import jax.numpy as jnp
    from jax import lax

    b_pad = qf.shape[0]
    nlist, cap = bucket_ids.shape
    tail_max = tail_ids.shape[0]
    u_slots = min(b_pad * nprobe, nlist)
    cs = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
    _, probes = lax.top_k(cs, nprobe)                    # (B, nprobe)
    u_ids = _dedup_probes(probes, nlist, u_slots)        # (u_slots,)
    u_safe = jnp.minimum(u_ids, nlist - 1)
    bids = jnp.where(
        (u_ids < nlist)[:, None], bucket_ids[u_safe], -1
    )                                                    # (u_slots, cap)
    tids = jnp.where(jnp.arange(tail_max) < tail_count, tail_ids, -1)
    cand = jnp.concatenate([bids.reshape(-1), tids])     # (n_cand,) shared
    valid = (cand >= 0) & (cand < n_valid)
    own_u = jnp.any(
        probes[:, :, None] == u_ids[None, None, :], axis=1
    )                                                    # (B, u_slots)
    own = jnp.concatenate(
        [
            jnp.broadcast_to(
                own_u[:, :, None], (b_pad, u_slots, cap)
            ).reshape(b_pad, u_slots * cap),
            jnp.ones((b_pad, tail_max), bool),
        ],
        axis=1,
    )                                                    # (B, n_cand)
    return cand, valid, own


def _topk_over_union_int8(x_i8, x_scales, qf, cand, valid, own, k: int):
    """int8-metric top-k over the SHARED union candidate set: one row
    gather + one (B, d) x (d, C) GEMM. Bit-matches the per-query metric
    (``_topk_over_candidates_int8``); ``own`` masks each query down to its
    own probed buckets before selection."""
    import jax.numpy as jnp
    from jax import lax

    from .quant import _quantize_q

    safe = jnp.where(valid, cand, 0)
    q_i8, q_scales = _quantize_q(qf)
    rows = x_i8[safe]                                    # (n_cand, d) int8
    int_dot = lax.dot_general(
        q_i8, rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)                                # (B, n_cand)
    scores = int_dot * x_scales[safe][None, :] * q_scales[:, None]
    scores = jnp.where(valid[None, :] & own, scores, -jnp.inf)
    cand_b = jnp.broadcast_to(cand[None], scores.shape)
    flat, block_cand, _ = _select_blocks(scores, cand_b, k)
    k_eff = min(k, flat.shape[1])
    top_s, pos = lax.top_k(flat, k_eff)
    top_ids = jnp.take_along_axis(block_cand, pos, axis=1)
    return TopKResult(top_s, top_ids.astype(jnp.int32))


def _topk_over_union_float(x, qf, cand, valid, own, k: int, n_valid,
                           deleted):
    """Two-phase float top-k over the SHARED union candidate set.

    Phase A: one storage-dtype (B, d) x (d, C) GEMM over the union rows;
    phase B: exact f32-HIGHEST rescore of each query's selected blocks
    (identical structure to ``_topk_over_candidates_float``)."""
    import jax.numpy as jnp
    from jax import lax

    safe = jnp.where(valid, cand, 0)
    rows = x[safe]                                       # (n_cand, d) storage
    approx = lax.dot_general(
        qf.astype(x.dtype), rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (B, n_cand)
    approx = jnp.where(valid[None, :] & own, approx, -jnp.inf)
    cand_b = jnp.broadcast_to(cand[None], approx.shape)
    _, block_cand, flat_pos = _select_blocks(approx, cand_b, k)
    # Phase B must carry EVERY phase-A mask. Range+tombstones re-derive
    # from block_cand, but own-probe membership does not: selected chunks
    # can straddle bucket boundaries (cap % 128 != 0) and -inf filler
    # chunks hold other queries' rows — without the gathered `own`, those
    # rows re-enter at rescore and batched results diverge from B=1
    # (observed: 5/8 queries differ at nprobe=2 on a 4096-row corpus).
    bown = jnp.take_along_axis(own, flat_pos, axis=1)
    bvalid = (block_cand >= 0) & (block_cand < n_valid) & bown
    bsafe = jnp.where(bvalid, block_cand, 0)
    if deleted is not None:
        bvalid &= deleted[bsafe, 0] == 0
    rescored = jnp.einsum(
        "bd,bcd->bc",
        qf,
        x[bsafe].astype(jnp.float32),
        precision=lax.Precision.HIGHEST,
    )
    rescored = jnp.where(bvalid, rescored, -jnp.inf)
    k_eff = min(k, rescored.shape[1])
    top_s, pos = lax.top_k(rescored, k_eff)
    top_ids = jnp.take_along_axis(block_cand, pos, axis=1)
    return TopKResult(top_s, top_ids.astype(jnp.int32))


@functools.lru_cache(maxsize=64)
def _build_ivf_searcher(
    nlist: int,
    cap: int,
    d: int,
    b_pad: int,
    k: int,
    nprobe: int,
    tail_max: int,
    int8: bool,
):
    """Compile-once IVF searcher for a static signature.

    All XLA: probe matmul -> id gather -> batched candidate einsum ->
    chunk-max two-phase selection. Scores match the dense path's metric
    exactly (f32-HIGHEST for float rows; the order-independent integer
    metric of ``ops.quant`` for int8), so results are exact within the
    candidate set.
    """
    import jax
    import jax.numpy as jnp

    assert (nprobe * cap + tail_max) % _SEL_CHUNK == 0

    if int8:

        def search(x_i8, x_scales, centroids, bucket_ids, tail_ids,
                   tail_count, q, n_valid, deleted):
            qf = q.astype(jnp.float32)
            cand, valid = _probe_candidates(
                centroids, bucket_ids, tail_ids, tail_count, qf, n_valid,
                nprobe,
            )
            if deleted is not None:
                valid &= deleted[jnp.where(valid, cand, 0), 0] == 0
            return _topk_over_candidates_int8(
                x_i8, x_scales, qf, cand, valid, k
            )

        return jax.jit(search)

    def search(x, centroids, bucket_ids, tail_ids, tail_count, q, n_valid,
               deleted):
        qf = q.astype(jnp.float32)
        cand, valid = _probe_candidates(
            centroids, bucket_ids, tail_ids, tail_count, qf, n_valid, nprobe
        )
        if deleted is not None:
            valid &= deleted[jnp.where(valid, cand, 0), 0] == 0
        return _topk_over_candidates_float(
            x, qf, cand, valid, k, n_valid, deleted
        )

    return jax.jit(search)


def ivf_topk(
    x,
    state: IVFState,
    q,
    k: int,
    nprobe: int = 32,
    n_valid: int | None = None,
    deleted=None,
    x_scales=None,
) -> TopKResult:
    """Approximate top-k via IVF probing over the flat row buffer ``x``.

    ``x``/``x_scales``/``deleted`` are the SAME device arrays the dense
    path uses (``ops.topk.topk_search`` / ``ops.quant.topk_search_int8``);
    pass ``x_scales`` for int8 corpora. ``nprobe == nlist`` probes every
    bucket and (with the always-scanned tail) is provably exact.

    Batch size is compile-bucketed in powers of two from 1; k like the
    dense path (``ops.topk.bucket_k``). B=1 runs the chip-validated
    per-query program; B>1 runs the BATCHED union program
    (:func:`_build_ivf_batch_searcher`): probed buckets dedup across the
    batch, candidate rows gather once, and scoring is one (B, d) x (d, C)
    GEMM — per-query results equal the B=1 program (own-probe masking).
    Batches above the memory-derived program cap (union gather bytes <=
    ``IVARS_ANN_GATHER_BUDGET``, and never above ``_MAX_PROGRAM_B``) run
    as slices through the same compiled program.
    """
    import jax.numpy as jnp

    b = int(q.shape[0])
    n_live = int(x.shape[0]) if n_valid is None else int(n_valid)
    if n_live == 0:
        return TopKResult(
            jnp.full((b, 0), -jnp.inf, jnp.float32),
            jnp.zeros((b, 0), jnp.int32),
        )
    nlist, cap = int(state.bucket_ids.shape[0]), int(state.bucket_ids.shape[1])
    nprobe = int(min(max(nprobe, 1), nlist))
    prog_b = _max_program_b(
        nlist, cap, int(x.shape[1]), nprobe, np.dtype(x.dtype).itemsize
    )
    if b > prog_b:
        parts = [
            ivf_topk(
                x, state, q[s:s + prog_b], k, nprobe=nprobe,
                n_valid=n_valid, deleted=deleted, x_scales=x_scales,
            )
            for s in range(0, b, prog_b)
        ]
        return TopKResult(
            jnp.concatenate([p.scores for p in parts], axis=0),
            jnp.concatenate([p.indices for p in parts], axis=0),
        )
    k = min(k, n_live)
    tail_max = int(state.tail_ids.shape[0])

    b_pad = _bucket_b_ann(b)
    qf = jnp.asarray(q, jnp.float32)
    if b_pad != b:
        qf = jnp.concatenate(
            [qf, jnp.zeros((b_pad - b, qf.shape[1]), jnp.float32)], axis=0
        )
    k_run = min(bucket_k(k), n_live)
    build = _build_ivf_searcher if b_pad == 1 else _build_ivf_batch_searcher
    searcher = build(
        nlist, cap, int(x.shape[1]), b_pad, int(k_run), nprobe, tail_max,
        int8=x_scales is not None,
    )
    if x_scales is not None:
        res = searcher(
            x, x_scales, state.centroids, state.bucket_ids, state.tail_ids,
            state.tail_count, qf, jnp.int32(n_live), deleted,
        )
    else:
        res = searcher(
            x, state.centroids, state.bucket_ids, state.tail_ids,
            state.tail_count, qf, jnp.int32(n_live), deleted,
        )
    if b_pad != b or res.scores.shape[1] != k:
        res = TopKResult(res.scores[:b, :k], res.indices[:b, :k])
    return res
