"""Cold-start capacity soak: empty disk -> serving at 10M rows (VERDICT r4 #4).

One recipe proving the capacity-scale lifecycle end to end, each number
measured where this environment can measure it honestly:

  PHASE build (host, forced CPU — run in the background, no tunnel needed)
      Stream-build the 10M-row int8 .rvdb container with the keep_fp
      rescore copy: rows are jax threefry int8 (the EXACT generator
      bench.py's ``gen_db_int8_device`` runs on chip), so the serve
      phase can materialize a statistically identical corpus ON DEVICE
      and skip the 7.7 GB host->device upload the tunnel makes
      pathological (~25 min/1.5 GB measured, CLAUDE.md). NB the round-5
      run MEASURED the twin gate NEGATIVE: ``jax.random.randint`` int8
      output is NOT bit-identical CPU-vs-TPU on this stack (the raw
      threefry bits may be; the int conversion path differs), so the
      serve phase's timings are valid but bit-identity claims are not —
      the gate reports it honestly. Reports build throughput, wall
      time, and on-disk bytes.

  PHASE open (host, forced CPU)
      The round-4 metacols sidecar at its design scale: time the blob
      open (which writes the sidecar) vs the sidecar open at 10M —
      the 1M measurement was 52.9 s -> 0.29 s (185x); this lands the
      10M row VERDICT asked for. Host-only (device_put=False).

  PHASE serve (chip — queue behind benchmarks/run_chip_queue.sh)
      1. bit-exact gate: device-generated rows == container rows
         (threefry cross-backend determinism, checked, not assumed);
      2. measured upload throughput of a 100k slice -> extrapolated
         full-container load time (documents the tunnel artifact the
         twin-generation sidesteps; a production TPU host loads over
         PCIe/DMA instead);
      3. IVF build over the 10M device rows + ops-level recall sample
         (the build_ann recall-guard equivalent) + persist into the
         container, so a later open restores ANN without rebuilding;
      4. serving p50: int8 dense vs ANN at B in {1, 8, 16} over the
         full 10M corpus, fresh queries per dispatch;
      5. int8_rescore latency delta at 10M: (widened-fetch search -
         plain search) + measured host gather+f32-rescore against the
         REAL 15 GB on-disk fp blob (the disk-seek cost is the point).

Reference claims being tested: load time ("30-60 s", unified_index.py:10)
and "sub-millisecond search" (unified_index.py:491) at 10x the corpus the
reference was demonstrated at.

Usage:
    python benchmarks/exp_coldstart_10m.py --phase build [--rows N]
    python benchmarks/exp_coldstart_10m.py --phase open
    python benchmarks/exp_coldstart_10m.py --phase serve
    python benchmarks/exp_coldstart_10m.py --smoke        # 200k, CPU, all
Default container path: /root/repo/logs/coldstart_10m.rvdb
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

D = 768
SEED = 0
CHUNK = 131_072


def log(m):
    print(m, file=sys.stderr, flush=True)


def out(section: str, payload: dict):
    print(json.dumps({"section": section, **payload}), flush=True)


def _gen_twin(n_pad: int):
    """The exact device generator (bench.gen_db_int8_device) — threefry is
    bit-deterministic across backends, so running it on the CPU backend
    yields the bytes the chip will regenerate in the serve phase."""
    from bench import gen_db_int8_device

    return gen_db_int8_device(n_pad, seed=SEED)


def phase_build(path: Path, rows: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from intelligent_video_analysis_retrieval_system_tpu.index.container import (
        IndexContainer,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import TILE_N

    n_pad = -(-rows // TILE_N) * TILE_N
    log(f"build: generating {rows} rows (pad {n_pad}) x {D} int8 on CPU "
        f"threefry ({n_pad * D / 1e9:.2f} GB)...")
    t0 = time.perf_counter()
    buf, scales = _gen_twin(n_pad)
    rows_np = np.asarray(buf)[:rows]
    scales_np = np.asarray(scales)[:rows]
    del buf, scales
    t_gen = time.perf_counter() - t0
    log(f"build: generated in {t_gen:.1f} s; streaming into {path}")

    if path.exists():
        path.unlink()
    t0 = time.perf_counter()
    with IndexContainer(path, "w", dim=D, dtype="int8", keep_fp=True) as c:
        for s in range(0, rows, CHUNK):
            e = min(s + CHUNK, rows)
            c.append_quantized(rows_np[s:e], scales_np[s:e])
            c.append_metadata(
                [{"folder": f"v{i >> 16}", "image": f"{i & 0xffff}.jpg",
                  "frame_id": i} for i in range(s, e)]
            )
            if (s // CHUNK) % 8 == 7:
                c.flush_checkpoint()
                log(f"build: {e}/{rows} rows "
                    f"({e / (time.perf_counter() - t0):.0f} rows/s)")
        c.flush_checkpoint()
    t_write = time.perf_counter() - t0
    size = path.stat().st_size
    # completion marker the chip queue gates its serve phase on (the gate
    # used to test a file nothing wrote — found by review)
    Path(str(path) + ".build.OK").touch()
    out("build", {
        "rows": rows, "gen_s": round(t_gen, 1),
        "write_s": round(t_write, 1),
        "rows_per_s": round(rows / t_write),
        "disk_gb": round(size / 1e9, 2),
    })


def phase_open(path: Path) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from intelligent_video_analysis_retrieval_system_tpu.index.metacols import (
        sidecar_path,
    )
    from intelligent_video_analysis_retrieval_system_tpu.index.unified import (
        UnifiedIndex,
    )

    side = sidecar_path(path)
    flat8 = path.with_name(path.name + ".flat8")  # round-5 rows sidecar
    for p in (side, flat8):
        if p.exists():
            p.unlink()  # force the full blob path first

    t0 = time.perf_counter()
    idx = UnifiedIndex(device_put=False).load_unified_index(path)
    t_blob = time.perf_counter() - t0
    n = idx.ntotal
    idx.close()
    assert side.exists(), "blob open did not write the sidecar"
    if n >= 10_000:
        assert flat8.exists(), "blob open did not write the .flat8 sidecar"

    t0 = time.perf_counter()
    idx = UnifiedIndex(device_put=False).load_unified_index(path)
    t_side = time.perf_counter() - t0
    assert idx.ntotal == n
    idx.close()
    out("open", {
        "rows": n,
        "blob_open_s": round(t_blob, 2),
        "sidecar_open_s": round(t_side, 2),
        "speedup": round(t_blob / max(t_side, 1e-9), 1),
    })


def phase_serve(path: Path, rows: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import gen_db_int8_device, round_overhead
    from intelligent_video_analysis_retrieval_system_tpu.index.container import (
        IndexContainer,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
        build_ivf, ivf_topk,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        topk_search_int8,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import TILE_N

    if not os.environ.get("IVARS_COLDSTART_ALLOW_CPU"):
        assert jax.default_backend() == "tpu", "serve phase needs the chip"
    n_pad = -(-rows // TILE_N) * TILE_N
    log(f"serve: regenerating the {rows}-row twin on device...")
    x, s = gen_db_int8_device(n_pad, seed=SEED)  # scales flat (n_pad,)

    cont = IndexContainer(path, "a")  # one handle: reads + the ANN persist
    assert cont.num_rows >= rows, (
        f"container has {cont.num_rows} rows; build phase incomplete"
    )

    # 1. bit-exact twin gate (threefry cross-backend determinism)
    probe = 1024
    dev_rows = np.asarray(x[:probe])
    dev_scales = np.asarray(s[:probe])
    disk_rows, disk_scales = cont.read_quantized(0, probe)
    twin_exact = bool(
        np.array_equal(dev_rows, disk_rows)
        and np.array_equal(dev_scales, disk_scales)
    )
    out("twin_gate", {"bit_exact": twin_exact, "rows_checked": probe})
    if not twin_exact:
        log("WARNING: device twin != container rows — PRNG impl differs "
            "across backends here; timings below remain valid, "
            "result-correctness claims do not")

    # 2. measured upload throughput -> extrapolated full-container load
    up_rows = 100_000
    host_slice = np.ascontiguousarray(disk_rows[:1])  # warm the path
    jax.device_put(host_slice).block_until_ready()
    host_rows, _ = cont.read_quantized(0, up_rows)
    t0 = time.perf_counter()
    up = jax.device_put(host_rows)
    np.asarray(up[-1, -1])  # value fetch = true completion (CLAUDE.md)
    t_up = time.perf_counter() - t0
    gbps = host_rows.nbytes / t_up / 1e9
    est_full_s = rows * D / 1e9 / max(gbps, 1e-9)
    out("upload", {
        "slice_rows": up_rows, "seconds": round(t_up, 2),
        "gb_per_s": round(gbps, 3),
        "extrapolated_full_load_s": round(est_full_s),
    })
    del up, host_rows

    # 3. IVF build over the device rows + recall sample + persist
    t0 = time.perf_counter()
    state, report = build_ivf(x, n_rows=rows, x_scales=s)
    jax.block_until_ready(state.centroids)
    np.asarray(state.tail_count)  # value fetch
    t_build = time.perf_counter() - t0
    nlist = int(state.bucket_ids.shape[0])
    log(f"serve: IVF built in {t_build:.1f} s (nlist={nlist})")

    # recall sample at nprobe=32 (the config default): perturbed stored
    # rows, ANN vs exact int8 dense — mirrors the build_ann recall guard
    rng = np.random.default_rng(1)
    picks = np.sort(rng.choice(rows, 32, replace=False))
    picks_j = jnp.asarray(picks)
    sample = (np.asarray(x[picks_j]).astype(np.float32)
              * np.asarray(s[picks_j])[:, None])
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True),
                         1e-12)
    noise = (0.25 / D**0.5) * rng.standard_normal(sample.shape)
    q = (sample + noise).astype(np.float32)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qd = jnp.asarray(q)
    exact = topk_search_int8(x, s, qd, 10, n_valid=rows)
    approx = ivf_topk(x, state, qd, 10, nprobe=32, n_valid=rows,
                      x_scales=s)
    ei = np.asarray(exact.indices)
    ai = np.asarray(approx.indices)
    recall = float(np.mean([
        len(set(ei[i].tolist()) & set(ai[i].tolist())) / 10
        for i in range(len(q))
    ]))
    out("ann_build", {
        "build_s": round(t_build, 1), "nlist": nlist,
        "recall_at_10_nprobe32": round(recall, 4),
    })

    cont.put_ann(
        {"centroids": np.asarray(state.centroids, np.float32),
         "bucket_ids": np.asarray(state.bucket_ids, np.int32),
         "tail_ids": np.asarray(state.tail_ids, np.int32)},
        {"ann_rows": rows, "tail_count": int(state.tail_count),
         "dim": D, "nlist": nlist, "nprobe": 32, "max_batch": 4,
         "max_batch_measured": False, "version": 1},
    )
    log("serve: ANN persisted into the container (cold reopen restores it)")

    # 4. serving p50 at 10M: dense vs ANN, fresh queries per dispatch
    ov = round_overhead(1)  # 1 dispatch + 1 value fetch per timed call
    qpool = rng.standard_normal((64, 16, D)).astype(np.float32)
    qpool /= np.linalg.norm(qpool, axis=-1, keepdims=True)

    def p50(fn, b, reps=24):
        ts = []
        fn(jnp.asarray(qpool[0, :b]))  # warm/compile
        for i in range(reps):
            qi = jnp.asarray(qpool[(i + 1) % 64, :b])
            t0 = time.perf_counter()
            res = fn(qi)
            np.asarray(res.scores[0, 0])  # value fetch
            ts.append(time.perf_counter() - t0)
        return max(float(np.percentile(ts, 50) - ov), 0.0) * 1e3

    lat = {}
    for b in (1, 8, 16):
        lat[f"dense_b{b}_p50_ms"] = round(p50(
            lambda qq: topk_search_int8(x, s, qq, 10, n_valid=rows), b
        ), 2)
        lat[f"ann_b{b}_np32_p50_ms"] = round(p50(
            lambda qq: ivf_topk(x, state, qq, 10, nprobe=32,
                                n_valid=rows, x_scales=s), b
        ), 2)
    out("latency_10m", lat)

    # 5. int8_rescore latency delta at 10M: widened device fetch + the
    # REAL host gather against the 15 GB on-disk fp blob + f32 rescore
    k, factor = 10, 4
    t_k = p50(lambda qq: topk_search_int8(x, s, qq, k, n_valid=rows), 8)
    t_wide = p50(
        lambda qq: topk_search_int8(x, s, qq, k * factor, n_valid=rows), 8
    )
    wide = topk_search_int8(x, s, jnp.asarray(qpool[0, :8]), k * factor,
                            n_valid=rows)
    ids = np.asarray(wide.indices)
    t_host = []
    for i in range(24):
        qi = qpool[i % 8, :8]
        t0 = time.perf_counter()
        for b in range(8):
            fp = cont.read_fp_rows(ids[b])
            sc = fp @ qi[b]
            order = np.argsort(-sc)[:k]
            _ = ids[b][order]
        t_host.append(time.perf_counter() - t0)
    host_ms = float(np.percentile(t_host, 50)) * 1e3

    # RAM-cache variant (config int8_rescore_cache): stream the fp bits
    # into host RAM once, then the same gather+rescore loop against the
    # resident array — quantifies what the cache buys at 10M scale
    from intelligent_video_analysis_retrieval_system_tpu import native

    t0 = time.perf_counter()
    n_fp = cont.num_rows
    cache = np.empty((n_fp, D), np.uint16)
    for cs in range(0, n_fp, 262_144):
        ce = min(cs + 262_144, n_fp)
        cache[cs:ce] = cont.read_fp_bits(cs, ce)
    t_cache_build = time.perf_counter() - t0
    t_host_c = []
    for i in range(24):
        qi = qpool[i % 8, :8]
        t0 = time.perf_counter()
        for b in range(8):
            fp = native.bf16_to_f32(np.ascontiguousarray(cache[ids[b]]))
            sc = fp @ qi[b]
            order = np.argsort(-sc)[:k]
            _ = ids[b][order]
        t_host_c.append(time.perf_counter() - t0)
    host_cached_ms = float(np.percentile(t_host_c, 50)) * 1e3
    out("rescore_delta", {
        "plain_b8_p50_ms": round(t_k, 2),
        "widened_b8_p50_ms": round(t_wide, 2),
        "host_gather_rescore_b8_ms": round(host_ms, 2),
        "delta_b8_ms": round((t_wide - t_k) + host_ms, 2),
        "cache_build_s": round(t_cache_build, 1),
        "host_gather_cached_b8_ms": round(host_cached_ms, 3),
        "delta_cached_b8_ms": round((t_wide - t_k) + host_cached_ms, 2),
    })
    del cache
    cont.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["build", "open", "serve"],
                    default=None)
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--path", type=Path,
                    default=ROOT / "logs" / "coldstart_10m.rvdb")
    ap.add_argument("--smoke", action="store_true",
                    help="200k rows, CPU, build+open (serve needs a chip)")
    args = ap.parse_args()
    args.path.parent.mkdir(parents=True, exist_ok=True)
    if args.smoke:
        args.rows = min(args.rows, 200_000)
        path = args.path.with_name("coldstart_smoke.rvdb")
        phase_build(path, args.rows)
        phase_open(path)
        return
    if args.phase == "build":
        phase_build(args.path, args.rows)
    elif args.phase == "open":
        phase_open(args.path)
    elif args.phase == "serve":
        phase_serve(args.path, args.rows)
    else:
        ap.error("--phase required (or --smoke)")


if __name__ == "__main__":
    main()
