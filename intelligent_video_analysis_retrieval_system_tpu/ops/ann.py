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
- **Static shapes throughout.** Clusters are capacity-bucketed
  (``bucket_cap`` slots, -1 padding); rows overflowing their nearest
  cluster spill to their 2nd..A-th nearest with free slots (host-side
  vectorized pass at build); the rare final leftovers land in the tail,
  which is also where post-build appends go. Every live row is therefore in
  EXACTLY ONE bucket slot or the tail — probing all ``nlist`` clusters is
  provably exact, which anchors the test oracle.
- **Search = three matmul/gather stages**, all XLA (no Pallas needed —
  gathers and batched GEMMs are XLA strengths, and the same program runs on
  the CPU test backend): (1) probe selection ``q @ C^T`` + top-nprobe;
  (2) candidate gather ``x[bucket_ids[probes]]`` + batched scoring einsum
  (f32-exact for bf16 rows; the bit-exact integer metric of ``ops.quant``
  for int8 rows); (3) chunk-max two-phase selection over the (B, C)
  candidate scores (C can be ~100k; a flat ``lax.top_k`` at that width is
  sort-bound).

Why small batches only: candidate traffic is per-query (B x nprobe x
bucket_cap rows), while the dense exact sweep amortizes ONE corpus pass
over the whole batch. At 10M int8 rows, nprobe=32, cap~2.5k: ~60 MB/query
vs 7.7 GB/pass — a big win at B<=8, a loss at B>=64. Callers auto-fall back
to the dense path above ``max_batch``.

Approximation contract: results are exact *within the probed candidate
set* (same metric as the dense path, including the int8 integer metric);
recall is controlled by ``nprobe``/``nlist`` and measured per-corpus with
``retrieval.evaluation`` (see ``cli.py evaluate --ann``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from .topk import TopKResult, bucket_b, bucket_k

__all__ = [
    "IVFState",
    "IVFBuildReport",
    "build_ivf",
    "ivf_topk",
    "default_nlist",
    "TAIL_MAX",
]

# Dynamic tail capacity: spill leftovers + post-build appends live here and
# are ALWAYS scanned (shared across the batch). When appends outgrow it the
# caller must rebuild (UnifiedIndex falls back to dense until then).
TAIL_MAX = 8192
# Selection chunk for phase-3 (mirrors ops.topk.CHUNK).
_SEL_CHUNK = 128
# Row chunk for build-time assignment sweeps over the corpus.
_ASSIGN_CHUNK = 65_536


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
    spilled: int          # rows placed in a 2nd..A-th choice bucket
    leftover: int         # rows that fell through to the tail
    kmeans_iters: int
    sample_rows: int


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def default_nlist(n_rows: int) -> int:
    """~4*sqrt(N) rounded to a power of two, clamped to [64, 16384]
    (FAISS-guideline territory: 4096-16384 at 10M rows)."""
    if n_rows <= 0:
        return 64
    target = 4.0 * float(n_rows) ** 0.5
    p = 1 << max(6, int(round(np.log2(max(target, 64.0)))))
    return int(min(max(p, 64), 16384))


# ---------------------------------------------------------------------------
# Build: spherical k-means (device) + capacity bucketing with spill (host)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _assign_program(a_top: int):
    """rows-chunk x centroids -> per-row top-A (cluster ids, sims)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def fn(chunk, centroids):
        s = jnp.dot(
            chunk.astype(jnp.float32), centroids.T,
            preferred_element_type=jnp.float32,
        )
        top_s, top_ids = lax.top_k(s, a_top)
        return top_ids.astype(jnp.int32), top_s

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _kmeans_step_program():
    """One Lloyd step over a sample: assign + scatter-add accumulate."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def fn(x, centroids):
        s = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
        assign = jnp.argmax(s, axis=1)
        acc = jnp.zeros_like(centroids).at[assign].add(x)
        counts = jnp.zeros((centroids.shape[0],), jnp.int32).at[assign].add(1)
        return acc, counts

    return jax.jit(fn)


def _spherical_kmeans(
    sample: np.ndarray, nlist: int, iters: int, seed: int
) -> np.ndarray:
    """Unit-norm centroids by Lloyd's on the unit sphere (assignment =
    max inner product; update = mean then re-normalize). Sample rows must
    be L2-normalized f32."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = len(sample)
    init = rng.choice(n, size=nlist, replace=n < nlist)
    centroids = jnp.asarray(sample[init], jnp.float32)
    x = jnp.asarray(sample, jnp.float32)
    step = _kmeans_step_program()
    for _ in range(max(iters, 1)):
        acc, counts = step(x, centroids)
        acc_np = np.array(acc)      # writable host copies
        counts_np = np.array(counts)
        empty = counts_np == 0
        if empty.any():
            # re-seed empty clusters from random sample rows
            acc_np[empty] = sample[rng.choice(n, size=int(empty.sum()))]
            counts_np[empty] = 1
        mean = acc_np / counts_np[:, None]
        norms = np.maximum(np.linalg.norm(mean, axis=1, keepdims=True), 1e-12)
        centroids = jnp.asarray(mean / norms, jnp.float32)
    return np.asarray(centroids)


def _bucket_with_spill(
    choice_ids: np.ndarray,   # (N, A) i32 per-row nearest clusters, best first
    choice_sims: np.ndarray,  # (N, A) f32 matching sims
    nlist: int,
    cap: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Capacity-bucketed assignment, fully vectorized.

    Pass a: sort this pass's unplaced rows by (cluster, -sim); within each
    cluster segment the first ``free`` rows take slots (keeps the rows most
    similar to the centroid in their home bucket); the rest retry with
    their next-nearest cluster. Returns (bucket_ids, leftover_row_ids,
    n_spilled)."""
    n, a_top = choice_ids.shape
    bucket = np.full((nlist, cap), -1, np.int32)
    fill = np.zeros(nlist, np.int64)
    remaining = np.arange(n, dtype=np.int64)
    spilled = 0
    for a in range(a_top):
        if len(remaining) == 0:
            break
        c = choice_ids[remaining, a].astype(np.int64)
        s = choice_sims[remaining, a]
        order = np.lexsort((-s, c))
        rows_sorted = remaining[order]
        c_sorted = c[order]
        seg_start = np.searchsorted(c_sorted, np.arange(nlist))
        pos = np.arange(len(rows_sorted)) - seg_start[c_sorted]
        slot = fill[c_sorted] + pos
        ok = slot < cap
        bucket[c_sorted[ok], slot[ok]] = rows_sorted[ok]
        if a > 0:
            spilled += int(ok.sum())
        fill += np.bincount(c_sorted[ok], minlength=nlist)
        remaining = rows_sorted[~ok]
    return bucket, remaining.astype(np.int64), spilled


def build_ivf(
    read_rows,                # callable (start, end) -> (m, d) np f32 rows
    n_rows: int,
    dim: int,
    nlist: int | None = None,
    bucket_cap: int | None = None,
    cap_factor: float = 1.5,
    nprobe_spill: int = 4,
    kmeans_iters: int = 10,
    sample_per_list: int = 128,
    seed: int = 0,
) -> tuple[IVFState, IVFBuildReport]:
    """Build the IVF structure over an externally-stored corpus.

    ``read_rows`` abstracts the row source (host arrays, container reads, or
    device-buffer slices) so the builder never needs the whole corpus in
    host RAM at once. Rows must be L2-normalized f32 (the index stores
    normalized rows; int8 corpora pass dequantized rows — probing uses the
    f32 geometry either way, while in-bucket scoring stays in the corpus
    metric).
    """
    import jax.numpy as jnp

    assert n_rows > 0, "empty corpus"
    if nlist is None:
        nlist = default_nlist(n_rows)
    nlist = int(min(nlist, max(64, n_rows)))
    if bucket_cap is None:
        bucket_cap = _ceil_to(
            max(int(cap_factor * n_rows / nlist), _SEL_CHUNK), _SEL_CHUNK
        )
    assert bucket_cap % _SEL_CHUNK == 0

    # --- k-means on a subsample ------------------------------------------
    sample_n = int(min(n_rows, max(sample_per_list * nlist, 4096)))
    rng = np.random.default_rng(seed)
    if sample_n < n_rows:
        # sorted strided sample: keeps read_rows access sequential-ish
        idx = np.sort(rng.choice(n_rows, size=sample_n, replace=False))
        parts = []
        pos = 0
        while pos < len(idx):
            lo = idx[pos]
            hi_pos = int(
                np.searchsorted(idx, lo + _ASSIGN_CHUNK, side="left")
            )
            hi_pos = max(hi_pos, pos + 1)
            block_ids = idx[pos:hi_pos]
            block = read_rows(int(lo), int(block_ids[-1]) + 1)
            parts.append(block[block_ids - lo])
            pos = hi_pos
        sample = np.concatenate(parts, axis=0)
    else:
        sample = read_rows(0, n_rows)
    sample = np.ascontiguousarray(sample, np.float32)
    centroids = _spherical_kmeans(sample, nlist, kmeans_iters, seed)
    del sample

    # --- full-corpus top-A assignment (chunked device sweeps) -------------
    a_top = int(min(nprobe_spill, nlist))
    cdev = jnp.asarray(centroids)
    assign = _assign_program(a_top)
    choice_ids = np.empty((n_rows, a_top), np.int32)
    choice_sims = np.empty((n_rows, a_top), np.float32)
    for start in range(0, n_rows, _ASSIGN_CHUNK):
        end = min(start + _ASSIGN_CHUNK, n_rows)
        ids, sims = assign(jnp.asarray(read_rows(start, end)), cdev)
        choice_ids[start:end] = np.asarray(ids)
        choice_sims[start:end] = np.asarray(sims)

    bucket, leftover, spilled = _bucket_with_spill(
        choice_ids, choice_sims, nlist, bucket_cap
    )
    if len(leftover) > TAIL_MAX:
        # capacity too tight for this distribution: widen and re-bucket
        bucket_cap = _ceil_to(bucket_cap * 2, _SEL_CHUNK)
        bucket, leftover, spilled = _bucket_with_spill(
            choice_ids, choice_sims, nlist, bucket_cap
        )
        assert len(leftover) <= TAIL_MAX, (
            f"{len(leftover)} leftover rows exceed tail capacity even at "
            f"bucket_cap={bucket_cap}; raise cap_factor"
        )
    tail = np.full((TAIL_MAX,), -1, np.int32)
    tail[: len(leftover)] = leftover

    state = IVFState(
        centroids=cdev,
        bucket_ids=jnp.asarray(bucket),
        tail_ids=jnp.asarray(tail),
        tail_count=jnp.asarray(len(leftover), jnp.int32),
        ann_rows=int(n_rows),
    )
    report = IVFBuildReport(
        nlist=nlist,
        bucket_cap=bucket_cap,
        spilled=spilled,
        leftover=len(leftover),
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
    from jax import lax

    n_cand = nprobe * cap + tail_max
    assert n_cand % _SEL_CHUNK == 0
    num_chunks = n_cand // _SEL_CHUNK
    k_chunks = min(k, num_chunks)

    def _select(scores, cand):
        """Two-phase top-k over (B, n_cand) scores (flat top_k at ~100k
        width is sort-bound; chunk-max first)."""
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
        k_eff = min(k, flat.shape[1])
        top_s, pos = lax.top_k(flat, k_eff)
        top_cand_pos = jnp.take_along_axis(flat_pos, pos, axis=1)
        top_ids = jnp.take_along_axis(cand, top_cand_pos, axis=1)
        return TopKResult(top_s, top_ids.astype(jnp.int32))

    if int8:

        def search(x_i8, x_scales, centroids, bucket_ids, tail_ids,
                   tail_count, q, n_valid, deleted):
            from .quant import _quantize_q

            qf = q.astype(jnp.float32)
            cs = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
            _, probes = lax.top_k(cs, nprobe)                # (B, nprobe)
            cand = bucket_ids[probes].reshape(b_pad, nprobe * cap)
            tids = jnp.where(
                jnp.arange(tail_max) < tail_count, tail_ids, -1
            )
            cand = jnp.concatenate(
                [cand, jnp.broadcast_to(tids[None], (b_pad, tail_max))],
                axis=1,
            )                                                # (B, n_cand)
            valid = (cand >= 0) & (cand < n_valid)
            safe = jnp.where(valid, cand, 0)
            if deleted is not None:
                valid &= deleted[safe, 0] == 0
            q_i8, q_scales = _quantize_q(qf)
            int_dot = jnp.einsum(
                "bd,bcd->bc",
                q_i8.astype(jnp.float32),
                x_i8[safe].astype(jnp.float32),
                precision=lax.Precision.HIGHEST,
            )
            scores = int_dot * x_scales[safe] * q_scales[:, None]
            scores = jnp.where(valid, scores, -jnp.inf)
            return _select(scores, cand)

        return jax.jit(search)

    def search(x, centroids, bucket_ids, tail_ids, tail_count, q, n_valid,
               deleted):
        qf = q.astype(jnp.float32)
        cs = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
        _, probes = lax.top_k(cs, nprobe)
        cand = bucket_ids[probes].reshape(b_pad, nprobe * cap)
        tids = jnp.where(jnp.arange(tail_max) < tail_count, tail_ids, -1)
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(tids[None], (b_pad, tail_max))], axis=1
        )
        valid = (cand >= 0) & (cand < n_valid)
        safe = jnp.where(valid, cand, 0)
        if deleted is not None:
            valid &= deleted[safe, 0] == 0
        scores = jnp.einsum(
            "bd,bcd->bc",
            qf,
            x[safe].astype(jnp.float32),
            precision=lax.Precision.HIGHEST,
        )
        scores = jnp.where(valid, scores, -jnp.inf)
        return _select(scores, cand)

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

    Batch size and k are compile-bucketed exactly like the dense path
    (``ops.topk.bucket_b/bucket_k``).
    """
    import jax.numpy as jnp

    b = int(q.shape[0])
    n_live = int(x.shape[0]) if n_valid is None else int(n_valid)
    if n_live == 0:
        return TopKResult(
            jnp.full((b, 0), -jnp.inf, jnp.float32),
            jnp.zeros((b, 0), jnp.int32),
        )
    k = min(k, n_live)
    nlist, cap = int(state.bucket_ids.shape[0]), int(state.bucket_ids.shape[1])
    nprobe = int(min(max(nprobe, 1), nlist))
    tail_max = int(state.tail_ids.shape[0])

    b_pad = bucket_b(b)
    qf = jnp.asarray(q, jnp.float32)
    if b_pad != b:
        qf = jnp.concatenate(
            [qf, jnp.zeros((b_pad - b, qf.shape[1]), jnp.float32)], axis=0
        )
    k_run = min(bucket_k(k), n_live)
    searcher = _build_ivf_searcher(
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
