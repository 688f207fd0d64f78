"""IVF vs dense int8 search at scale on one v5e chip.

Question: does the IVF ANN mode (ops.ann) beat the dense exact sweep on
single-query p50 at 10M rows, and at what recall?

Method notes (CLAUDE.md discipline):
- corpus generated ON DEVICE (host->device tunnel ~1 MB/s), and CLUSTERED
  (40k scene centers, intra-cluster cosine ~0.94) so recall numbers mean
  something — uniform random rows have no cluster structure to exploit and
  every IVF probe pattern looks alike;
- queries drawn from the same generative process (corpus-like, as real
  text/image queries are);
- timing via the bench.py marginal-dispatch pattern: enqueue a burst of
  dispatches with VARIED query inputs, fetch only the last result,
  subtract the measured dispatch+fetch overhead;
- recall measured against the dense int8 path on the same buffers (same
  integer metric -> candidate-set differences are pure coverage).

Usage: python benchmarks/exp_ivf_10m.py [--rows 2000000] [--nlist 8192]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import log, percentile_rounds, round_overhead  # noqa: E402

D = 768
TILE_N = 2048


def gen_clustered_int8(n_pad: int, n_centers: int, noise: float, seed: int):
    """Clustered unit rows -> per-row symmetric int8, all on device.
    Returns (rows_i8 (n_pad, D), scales (n_pad,), centers (n_centers, D))."""
    import jax
    import jax.numpy as jnp

    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        symmetric_int8,
    )

    chunk = 262_144
    key = jax.random.PRNGKey(seed)
    key, ck = jax.random.split(key)
    centers = jax.random.normal(ck, (n_centers, D), jnp.float32)
    centers /= jnp.maximum(
        jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-12
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(buf, sbuf, centers, k, start):
        k1, k2 = jax.random.split(k)
        assign = jax.random.randint(k1, (chunk,), 0, n_centers)
        c = centers[assign] + (noise / D**0.5) * jax.random.normal(
            k2, (chunk, D), jnp.float32
        )
        c /= jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-12)
        q, s = symmetric_int8(c, axis=-1)
        buf = jax.lax.dynamic_update_slice(buf, q, (start, 0))
        sbuf = jax.lax.dynamic_update_slice(sbuf, s[:, 0], (start,))
        return buf, sbuf

    buf = jnp.zeros((n_pad, D), jnp.int8)
    sbuf = jnp.zeros((n_pad,), jnp.float32)
    for i in range(-(-n_pad // chunk)):
        start = min(i * chunk, n_pad - chunk)
        key, sub = jax.random.split(key)
        buf, sbuf = fill(buf, sbuf, centers, sub, jnp.int32(start))
    buf.block_until_ready()
    return buf, sbuf, centers


def gen_queries(centers, n_q: int, noise: float, seed: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    assign = jax.random.randint(k1, (n_q,), 0, centers.shape[0])
    q = centers[assign] + (noise / D**0.5) * jax.random.normal(
        k2, (n_q, D), jnp.float32
    )
    q /= jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    return q  # device (n_q, D) f32


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--nlist", type=int, default=8192)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--centers", type=int, default=40_960)
    ap.add_argument("--sample-per-list", type=int, default=64)
    ap.add_argument("--kmeans-iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--per-round", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
        build_ivf,
        ivf_topk,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        topk_search_int8,
    )

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    n_pad = -(-args.rows // TILE_N) * TILE_N

    t0 = time.perf_counter()
    x, scales, centers = gen_clustered_int8(
        n_pad, args.centers, args.noise, seed=3
    )
    log(f"gen {n_pad} clustered int8 rows: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    state, report = build_ivf(
        x,
        n_rows=args.rows,
        x_scales=scales,
        nlist=args.nlist,
        sample_per_list=args.sample_per_list,
        kmeans_iters=args.kmeans_iters,
        seed=0,
    )
    t_build = time.perf_counter() - t0
    log(f"IVF build: {t_build:.1f}s report={report}")

    q_pool = gen_queries(centers, 256, args.noise + 0.1, seed=9)
    overhead = round_overhead(args.per_round)
    log(f"dispatch overhead/round: {overhead*1e3:.2f} ms")

    # Timed paths must be ONE jitted program each: the query-pool slice and
    # the scalar reduction both live INSIDE jit. (First draft did
    # `q_pool[i][None]` and `.scores.sum()` eagerly — two eager device ops
    # per dispatch through the tunnel, tens of ms each, which read as a
    # 41 ms "dense search" where the known number is ~3.4 ms.)
    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        _build_int8_searcher,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
        _build_ivf_batch_searcher,
        _build_ivf_searcher,
    )

    n_rows_j = jnp.int32(args.rows)
    dead = jnp.zeros((n_pad, 1), jnp.int8)

    def make_dense(b: int):
        inner = _build_int8_searcher(n_pad, D, max(b, 8), 16, False, "xla")

        @jax.jit
        def run(x, scales, q_pool, i):
            q = jax.lax.dynamic_slice_in_dim(q_pool, i * b, max(b, 8), 0)
            r = inner(x, scales, q, n_rows_j, dead)
            return r.scores[:b].sum()

        return lambda i: run(x, scales, q_pool, jnp.int32(i % (256 // b - 1)))

    nlist, cap = int(state.bucket_ids.shape[0]), int(state.bucket_ids.shape[1])
    tail_max = int(state.tail_ids.shape[0])

    def make_ivf(b: int, nprobe: int, batched: bool | None = None):
        """B=1 uses the per-query program; B>1 defaults to the round-4
        batched union program (probed-bucket dedup + one GEMM,
        ``_build_ivf_batch_searcher``) — pass ``batched=False`` to
        measure the superseded round-3 per-query batching."""
        if batched is None:
            batched = b > 1
        build = _build_ivf_batch_searcher if batched else _build_ivf_searcher
        inner = build(
            nlist, cap, D, b, 16, nprobe, tail_max, int8=True
        )

        @jax.jit
        def run(x, scales, cent, bid, tid, tcount, q_pool, i):
            q = jax.lax.dynamic_slice_in_dim(q_pool, i * b, b, 0)
            r = inner(x, scales, cent, bid, tid, tcount, q, n_rows_j, None)
            return r.scores.sum()

        return lambda i: run(
            x, scales, state.centroids, state.bucket_ids, state.tail_ids,
            state.tail_count, q_pool, jnp.int32(i % (256 // b - 1)),
        )

    # --- dense reference -------------------------------------------------
    dense_one = make_dense(1)
    dense_one(0)  # compile
    p50, p95, nq = percentile_rounds(
        dense_one, args.rounds, args.per_round, overhead
    )
    log(f"dense int8 B=1: p50 {p50:.2f} ms  p95 {p95:.2f} ms  ({nq} q)")
    results = {"dense_b1_p50_ms": p50, "dense_b1_p95_ms": p95,
               "build_s": t_build, **report._asdict()}

    # dense ids for recall (64 queries through the public wrapper)
    dense_ids = np.asarray(
        topk_search_int8(x, scales, q_pool[:64], 10, n_valid=args.rows).indices
    )

    # --- IVF sweep -------------------------------------------------------
    for nprobe in (16, 32, 64, 128):
        ivf_one = make_ivf(1, nprobe)
        ivf_one(0)  # compile
        p50, p95, _ = percentile_rounds(
            ivf_one, args.rounds, args.per_round, overhead
        )
        got = np.asarray(
            ivf_topk(
                x, state, q_pool[:64], 10, nprobe=nprobe,
                n_valid=args.rows, x_scales=scales,
            ).indices
        )
        recall = float(
            np.mean(
                [
                    len(set(g) & set(w)) / 10.0
                    for g, w in zip(got.tolist(), dense_ids.tolist())
                ]
            )
        )
        log(
            f"ivf nprobe={nprobe:4d}: p50 {p50:6.2f} ms  p95 {p95:6.2f} ms"
            f"  recall@10 {recall:.3f}"
        )
        results[f"ivf_np{nprobe}_p50_ms"] = p50
        results[f"ivf_np{nprobe}_recall10"] = recall

    # --- batched crossover (VERDICT r3 #2): the round-4 union program
    # must keep IVF under the dense sweep at the serving batcher's real
    # batch sizes (8-16); the round-3 per-query batching lost above B=4
    # (21.5 vs 13.7 ms/batch at B=8, kept here as the legacy point).
    for b in (4, 8, 16, 32):
        dense_b = make_dense(b)
        ivf_b = make_ivf(b, 32)
        dense_b(0); ivf_b(0)
        p50d, _, _ = percentile_rounds(dense_b, 5, 4, overhead)
        p50i, _, _ = percentile_rounds(ivf_b, 5, 4, overhead)
        log(f"B={b} batch: dense {p50d:.2f} ms  batched-ivf(np=32) "
            f"{p50i:.2f} ms ({'IVF' if p50i < p50d else 'dense'} wins, "
            f"{p50d / max(p50i, 1e-9):.2f}x; per-query /{b})")
        results[f"dense_b{b}_p50_ms"] = p50d
        results[f"ivf_np32_b{b}_p50_ms"] = p50i
    legacy_b8 = make_ivf(8, 32, batched=False)
    legacy_b8(0)
    p50l, _, _ = percentile_rounds(legacy_b8, 5, 4, overhead)
    log(f"B=8 legacy per-query ivf: {p50l:.2f} ms/batch "
        f"(round-3 program, for the before/after record)")
    results["ivf_np32_b8_perquery_p50_ms"] = p50l

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
