"""Sharded IVF ANN on the real chip: the 1-device-mesh anchor at scale.

Question: does the sharded ANN program (`parallel.sharded_ann` —
shard_map + partitioned buckets + ICI merge) carry the single-chip IVF
numbers, i.e. is the multi-chip latency mode's per-chip work the same
speed as the plain single-device IVF at the same shard size?

Method (CLAUDE.md discipline): corpus generated ON DEVICE and clustered;
1-device "index" mesh (the same program shape real multi-chip runs, minus
cross-chip ICI hops — the merge payload is KBs); timed fns are single
jitted programs slicing a varied query pool INSIDE jit; marginal-dispatch
timing with overhead subtraction; int8 results checked BIT-exact against
the single-device `ops.ann.ivf_topk` on the same buffers before timing.

Usage: python benchmarks/exp_sharded_ann.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import log, percentile_rounds, round_overhead  # noqa: E402
from benchmarks.exp_ivf_10m import (  # noqa: E402
    D,
    TILE_N,
    gen_clustered_int8,
    gen_queries,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--nlist", type=int, default=8192)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--centers", type=int, default=40_960)
    ap.add_argument("--kmeans-iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--per-round", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
        build_ivf,
        ivf_topk,
    )
    from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_ann import (
        _sharded_ivf_searcher_cache,
        make_sharded_ivf,
        sharded_ivf_topk,
    )
    from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_search import (
        _MESHES,
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
        x, n_rows=args.rows, x_scales=scales, nlist=args.nlist,
        sample_per_list=64, kmeans_iters=args.kmeans_iters, seed=0,
    )
    log(f"IVF build: {time.perf_counter()-t0:.1f}s report={report}")

    mesh = Mesh(np.array(jax.devices()[:1]), ("index",))
    sharding = NamedSharding(mesh, P("index", None))
    # 1-device mesh: same buffers, re-annotated (no copy across devices)
    x_sh = jax.device_put(x, sharding)
    sc_sh = jax.device_put(scales[:, None], sharding)
    sivf = make_sharded_ivf(mesh, "index", state, n_pad)
    dead = jax.device_put(jnp.zeros((n_pad, 1), jnp.int8), sharding)
    q_pool = gen_queries(centers, 256, args.noise + 0.1, seed=9)

    # --- correctness gate: bit-exact vs single-device IVF -----------------
    got = sharded_ivf_topk(
        mesh, x_sh, sivf, q_pool[:16], 10, nprobe=32, n_valid=args.rows,
        scales_sharded=sc_sh,
    )
    want = ivf_topk(
        x, state, q_pool[:16], 10, nprobe=32, n_valid=args.rows,
        x_scales=scales,
    )
    assert np.array_equal(np.asarray(got.indices), np.asarray(want.indices))
    assert np.array_equal(np.asarray(got.scores), np.asarray(want.scores))
    log("gate: sharded == single-device IVF, ids and scores BIT-exact")

    overhead = round_overhead(args.per_round)
    log(f"dispatch overhead/round: {overhead*1e3:.2f} ms")

    mesh_key = (
        id(mesh), mesh.axis_names, tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )
    _MESHES[mesh_key] = mesh
    nlist = int(state.bucket_ids.shape[0])
    cap_local = int(sivf.bucket_ids.shape[1])
    tail_max = int(sivf.tail_ids.shape[1])
    n_rows_j = jnp.int32(args.rows)

    def make_timed(nprobe: int):
        inner = _sharded_ivf_searcher_cache(
            mesh_key, "index", nlist, cap_local, 1, 16, nprobe, tail_max,
            n_pad, True,
        )

        @jax.jit
        def run(x, sc, bid, tid, tc, cent, q_pool, i):
            q = jax.lax.dynamic_slice_in_dim(q_pool, i, 1, 0)
            s, _ = inner(x, sc, bid, tid, tc, cent, q, n_rows_j, dead)
            return s.sum()

        return lambda i: run(
            x_sh, sc_sh, sivf.bucket_ids, sivf.tail_ids, sivf.tail_counts,
            sivf.centroids, q_pool, jnp.int32(i % 255),
        )

    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        topk_search_int8,
    )

    dense_ids = np.asarray(
        topk_search_int8(
            x, scales, q_pool[:64], 10, n_valid=args.rows
        ).indices
    )

    results = {"rows": args.rows, **report._asdict()}
    for nprobe in (16, 32, 64):
        timed = make_timed(nprobe)
        timed(0)  # compile
        p50, p95, _ = percentile_rounds(
            timed, args.rounds, args.per_round, overhead
        )
        # recall vs the dense int8 path via the public wrappers
        got = np.asarray(
            sharded_ivf_topk(
                mesh, x_sh, sivf, q_pool[:64], 10, nprobe=nprobe,
                n_valid=args.rows, scales_sharded=sc_sh,
            ).indices
        )
        recall = float(np.mean([
            len(set(g) & set(w)) / 10.0
            for g, w in zip(got.tolist(), dense_ids.tolist())
        ]))
        log(f"sharded ivf nprobe={nprobe:4d}: p50 {p50:6.2f} ms  "
            f"p95 {p95:6.2f} ms  recall@10 {recall:.3f}")
        results[f"sharded_ivf_np{nprobe}_p50_ms"] = p50
        results[f"sharded_ivf_np{nprobe}_recall10"] = recall

    print(json.dumps(results))


if __name__ == "__main__":
    main()
