"""Sharded IVF: multi-chip ANN over the row-sharded corpus.

Composes the two round-3 scaling levers — the IVF latency mode
(``ops.ann``) and the row-sharded mesh search (``parallel.sharded_search``)
— into one SPMD program, so ANN latency applies at ANY corpus scale:

    k-means centroids are GLOBAL (content-based, replicated — tiny:
        nlist x d f32, ~50 MB at nlist=16384/d=768)
    bucket id tables are PARTITIONED BY OWNING SHARD (rows are sharded by
        row id, cluster members spread ~uniformly over shards, so each
        shard's table is ~1/n_dev of the global one)
    every chip: identical probe selection (q @ C^T, replicated math) ->
        gather ITS members of the probed buckets -> local exact top-k over
        the candidates (same two-phase scoring as ``ops.ann``)
    all_gather (k scores, k global ids) over ICI -> replicated k-selection
        (the exact ``_ici_merge`` of the dense sharded path)

The union of the shards' candidates is EXACTLY the single-device IVF's
candidate set for the same ``IVFState`` (every bucket slot and tail entry
lives on exactly one shard), and the per-candidate metric is shared code
(``ops.ann._topk_over_candidates_*``) — so the sharded ANN result equals
the single-device ANN result, which the tests assert exactly. At
``nprobe == nlist`` it is therefore provably exact vs the dense sweep.

Scale math this unlocks (v5e numbers from RESULTS.md): dense sharding
bounds per-chip latency by the HBM sweep of its shard (~3 ms / 2M bf16
rows); IVF bounds it by ``nprobe * bucket_cap / n_dev`` gathered rows.
8 chips x 10M int8 rows/chip = 80M rows with per-shard candidate traffic
~1/8 of the measured single-chip 10M numbers (2.5-7.4 ms p50) — the
<10 ms @10M north star generalizes an order of magnitude up.

Reference analog: none — the reference's only multi-node story is the
LAN HTTP fan-out (``system.py:1715-1757``) over whole FAISS indexes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from ..ops.ann import (
    _SEL_CHUNK,
    IVFState,
    _ceil_to,
    _max_program_b,
    _probe_candidates,
    _probe_candidates_batched,
    _topk_over_candidates_float,
    _topk_over_candidates_int8,
    _topk_over_union_float,
    _topk_over_union_int8,
)
from ..ops.topk import TopKResult, bucket_k
from .sharded_search import _MESHES, _ici_merge, mesh_cache_key

__all__ = ["ShardedIVF", "partition_ivf_host", "make_sharded_ivf",
           "sharded_ivf_topk"]


class ShardedIVF(NamedTuple):
    """Device-resident partitioned IVF over a row-sharded corpus.

    Bucket/tail entries hold LOCAL row ids (global id - shard offset);
    -1 = empty slot. Shapes are identical across shards (SPMD)."""

    centroids: object     # (nlist, d) f32, replicated
    bucket_ids: object    # (n_dev*nlist, cap_local) i32, sharded rows-wise
    tail_ids: object      # (n_dev, tail_max) i32, sharded rows-wise
    tail_counts: object   # (n_dev,) i32, sharded
    shard_rows: int       # rows per shard (padded corpus / n_dev)
    ann_rows: int         # corpus rows covered by the source IVFState


def partition_ivf_host(
    bucket_ids: np.ndarray,
    tail_ids: np.ndarray,
    tail_count: int,
    n_dev: int,
    shard_rows: int,
    tail_max: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Partition a global IVF id table by owning shard (pure numpy).

    Returns ``(tables, tails, tail_counts)`` where ``tables`` is
    (n_dev, nlist, cap_local) of LOCAL ids (-1 padded; members keep their
    within-bucket order, i.e. centroid-similarity order from the build),
    ``tails`` is (n_dev, tail_max) and ``tail_counts`` is (n_dev,).

    Every live global id appears exactly once across all shards' tables +
    tails — the union of per-shard candidates for any probe set equals the
    global candidate set, which is what makes the sharded search exactly
    equal to the single-device one.
    """
    nlist, cap = bucket_ids.shape
    if tail_max is None:
        from ..ops.ann import TAIL_MAX

        tail_max = TAIL_MAX
    ids = np.asarray(bucket_ids, np.int64)
    owner = np.where(ids >= 0, ids // shard_rows, -1)
    counts = np.stack(
        [(owner == s).sum(axis=1) for s in range(n_dev)]
    ) if nlist else np.zeros((n_dev, 0), np.int64)
    cap_local = int(counts.max()) if counts.size else 1
    cap_local = _ceil_to(max(cap_local, 1), _SEL_CHUNK)
    tables = np.full((n_dev, nlist, cap_local), -1, np.int32)
    width = min(cap, cap_local)
    for s in range(n_dev):
        m = owner == s
        local = np.where(m, ids - s * shard_rows, -1).astype(np.int32)
        # stable sort on ~membership compacts members to the front while
        # preserving their build order
        order = np.argsort(~m, axis=1, kind="stable")
        tables[s, :, :width] = np.take_along_axis(local, order, axis=1)[
            :, :width
        ]
    tails, tail_counts = _partition_tail(
        tail_ids, tail_count, n_dev, shard_rows, tail_max
    )
    return tables, tails, tail_counts


def _partition_tail(
    tail_ids: np.ndarray,
    tail_count: int,
    n_dev: int,
    shard_rows: int,
    tail_max: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Split the global tail id list by owning shard (LOCAL ids, -1 pad).

    Shared by the full partition and :func:`retarget_tail`. The global
    tail is capped at ``ops.ann.TAIL_MAX`` which equals the per-shard
    capacity, so even a single-shard pile-up (appends are sequential row
    ids, usually all owned by the LAST shard) always fits; the overflow
    raise is a defensive invariant, not a reachable path."""
    t = np.asarray(tail_ids[:tail_count], np.int64)
    towner = t // shard_rows
    tails = np.full((n_dev, tail_max), -1, np.int32)
    tail_counts = np.zeros((n_dev,), np.int32)
    for s in range(n_dev):
        mine = (t[towner == s] - s * shard_rows).astype(np.int32)
        if mine.size > tail_max:
            raise OverflowError(
                f"sharded IVF tail overflow: {mine.size} > {tail_max}"
            )
        tails[s, : mine.size] = mine
        tail_counts[s] = mine.size
    return tails, tail_counts


def make_sharded_ivf(mesh, axis: str, state: IVFState,
                     shard_rows: int) -> ShardedIVF:
    """Partition a (global) ``IVFState`` and place it on the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    tables, tails, tail_counts = partition_ivf_host(
        np.asarray(state.bucket_ids, np.int32),
        np.asarray(state.tail_ids, np.int32),
        int(state.tail_count),
        n_dev,
        shard_rows,
    )
    nlist, cap_local = tables.shape[1], tables.shape[2]
    row_sharded = NamedSharding(mesh, P(axis, None))
    return ShardedIVF(
        centroids=jax.device_put(
            jnp.asarray(state.centroids, jnp.float32),
            NamedSharding(mesh, P(None, None)),
        ),
        bucket_ids=jax.device_put(
            jnp.asarray(tables.reshape(n_dev * nlist, cap_local)),
            row_sharded,
        ),
        tail_ids=jax.device_put(jnp.asarray(tails), row_sharded),
        tail_counts=jax.device_put(
            jnp.asarray(tail_counts), NamedSharding(mesh, P(axis))
        ),
        shard_rows=int(shard_rows),
        ann_rows=int(state.ann_rows),
    )


def retarget_tail(sivf: ShardedIVF, mesh, axis: str,
                  tail_ids: np.ndarray, tail_count: int) -> ShardedIVF:
    """Re-partition ONLY the tail (post-build appends land there); the
    bucket tables and centroids are untouched device arrays."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    tail_max = int(sivf.tail_ids.shape[1])
    tails, tail_counts = _partition_tail(
        tail_ids, tail_count, n_dev, sivf.shard_rows, tail_max
    )
    return sivf._replace(
        tail_ids=jax.device_put(
            jnp.asarray(tails), NamedSharding(mesh, P(axis, None))
        ),
        tail_counts=jax.device_put(
            jnp.asarray(tail_counts), NamedSharding(mesh, P(axis))
        ),
    )


@functools.lru_cache(maxsize=64)
def _sharded_ivf_searcher_cache(
    mesh_key,
    axis: str,
    nlist: int,
    cap_local: int,
    b_pad: int,
    k: int,
    nprobe: int,
    tail_max: int,
    shard_rows: int,
    int8: bool,
):
    """Compile-once sharded IVF searcher (replicated output).

    One shard_map program: every chip runs the identical probe matmul,
    gathers its own bucket members, scores them with the SAME candidate
    scorer the single-device IVF uses, and the dense path's ``_ici_merge``
    k-selects the union over ICI (payload ``n_dev * B * k * 8`` bytes).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    mesh = _MESHES[mesh_key]
    n_dev = mesh.shape[axis]

    def shard_fn(x_shard, *rest):
        if int8:
            (scales_shard, bucket, tails, tcounts, centroids, q, n_valid,
             dead) = rest
        else:
            bucket, tails, tcounts, centroids, q, n_valid, dead = rest
        my = lax.axis_index(axis)
        offset = my * shard_rows
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        qf = q.astype(jnp.float32)
        if b_pad > 1:
            # batched union program (round 4, ops.ann): probed buckets
            # dedup across the batch, the shard's candidate rows gather
            # once, scoring is one GEMM; own-probe masking keeps per-query
            # results equal to the B=1 program
            cand, valid, own = _probe_candidates_batched(
                centroids, bucket, tails.reshape(-1), tcounts.reshape(()),
                qf, local_valid, nprobe,
            )
            valid &= dead[jnp.where(valid, cand, 0), 0] == 0
            if int8:
                local = _topk_over_union_int8(
                    x_shard, scales_shard.reshape(-1), qf, cand, valid,
                    own, k,
                )
            else:
                local = _topk_over_union_float(
                    x_shard, qf, cand, valid, own, k, local_valid, dead
                )
        else:
            cand, valid = _probe_candidates(
                centroids,
                bucket,                      # (nlist, cap_local) local block
                tails.reshape(-1),           # (tail_max,)
                tcounts.reshape(()),         # (1,) block -> scalar
                qf,
                local_valid,
                nprobe,
            )
            valid &= dead[jnp.where(valid, cand, 0), 0] == 0
            if int8:
                local = _topk_over_candidates_int8(
                    x_shard, scales_shard.reshape(-1), qf, cand, valid, k
                )
            else:
                local = _topk_over_candidates_float(
                    x_shard, qf, cand, valid, k, local_valid, dead
                )
        gids = jnp.where(
            jnp.isfinite(local.scores), local.indices + offset, -1
        ).astype(jnp.int32)
        return _ici_merge(local.scores, gids, axis, n_dev, k, b_pad)

    if int8:
        in_specs = (
            P(axis, None), P(axis, None),            # x, scales
            P(axis, None), P(axis, None), P(axis),   # buckets, tails, counts
            P(None, None), P(), P(), P(axis, None),  # centroids, q, n, dead
        )
    else:
        in_specs = (
            P(axis, None),
            P(axis, None), P(axis, None), P(axis),
            P(None, None), P(), P(), P(axis, None),
        )
    mapped = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=8)
def _zeros_mask(mesh_key, axis: str, n_pad: int):
    """Cached all-live tombstone mask, sharded rows-wise (n_pad x 1 int8 —
    e.g. 10 MB at 10M rows, bounded by the lru size)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _MESHES[mesh_key]
    return jax.device_put(
        jnp.zeros((n_pad, 1), jnp.int8), NamedSharding(mesh, P(axis, None))
    )


def sharded_ivf_topk(
    mesh,
    x_sharded,
    sivf: ShardedIVF,
    q,
    k: int,
    nprobe: int = 32,
    n_valid: int | None = None,
    deleted_sharded=None,
    scales_sharded=None,
    axis: str = "index",
) -> TopKResult:
    """Approximate replicated top-k over a row-sharded corpus.

    ``x_sharded`` / ``scales_sharded`` / ``deleted_sharded`` are the SAME
    sharded device arrays ``parallel.sharded_search`` uses; results equal
    the single-device ``ops.ann.ivf_topk`` on the un-sharded corpus with
    the same source ``IVFState``. Batch/k compile-bucket exactly like the
    single-device path (B=1 per-query program; B>1 the batched union
    program); batches above the memory-derived program cap
    (``ops.ann._max_program_b`` over the PER-SHARD cap_local) slice
    through the same compiled program.
    """
    import jax.numpy as jnp

    b = int(q.shape[0])
    n_live = int(x_sharded.shape[0]) if n_valid is None else int(n_valid)
    if n_live == 0:
        return TopKResult(
            jnp.full((b, 0), -jnp.inf, jnp.float32),
            jnp.zeros((b, 0), jnp.int32),
        )
    if deleted_sharded is None:
        # materialize the no-deletions mask ONCE per (mesh, capacity) —
        # a fresh eager zeros + device_put per query would cost as much
        # as the search itself through the tunnel (and the batch-slicing
        # recursion below would repeat it per 8-query slice)
        deleted_sharded = _zeros_mask(
            mesh_cache_key(mesh), axis, int(x_sharded.shape[0])
        )
    n_dev = mesh.shape[axis]
    nlist = int(sivf.bucket_ids.shape[0]) // n_dev
    cap_local = int(sivf.bucket_ids.shape[1])
    tail_max = int(sivf.tail_ids.shape[1])
    nprobe = int(min(max(nprobe, 1), nlist))
    prog_b = _max_program_b(
        nlist, cap_local, int(x_sharded.shape[1]), nprobe,
        np.dtype(x_sharded.dtype).itemsize,
    )
    if b > prog_b:
        parts = [
            sharded_ivf_topk(
                mesh, x_sharded, sivf, q[s : s + prog_b], k,
                nprobe=nprobe, n_valid=n_valid,
                deleted_sharded=deleted_sharded,
                scales_sharded=scales_sharded, axis=axis,
            )
            for s in range(0, b, prog_b)
        ]
        return TopKResult(
            jnp.concatenate([p.scores for p in parts], axis=0),
            jnp.concatenate([p.indices for p in parts], axis=0),
        )
    k = min(k, n_live)

    from ..ops.ann import _bucket_b_ann

    b_pad = _bucket_b_ann(b)
    qf = jnp.asarray(q, jnp.float32)
    if b_pad != b:
        qf = jnp.concatenate(
            [qf, jnp.zeros((b_pad - b, qf.shape[1]), jnp.float32)], axis=0
        )
    mesh_key = mesh_cache_key(mesh)
    k_run = min(bucket_k(k), n_live)
    fn = _sharded_ivf_searcher_cache(
        mesh_key, axis, nlist, cap_local, b_pad, int(k_run), nprobe,
        tail_max, sivf.shard_rows, scales_sharded is not None,
    )
    nv = jnp.int32(n_live)
    if scales_sharded is not None:
        scores, ids = fn(
            x_sharded, scales_sharded, sivf.bucket_ids, sivf.tail_ids,
            sivf.tail_counts, sivf.centroids, qf, nv, deleted_sharded,
        )
    else:
        scores, ids = fn(
            x_sharded, sivf.bucket_ids, sivf.tail_ids, sivf.tail_counts,
            sivf.centroids, qf, nv, deleted_sharded,
        )
    if b_pad != b or scores.shape[1] != k:
        scores, ids = scores[:b, :k], ids[:b, :k]
    return TopKResult(scores, ids)
