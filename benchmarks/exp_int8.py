"""Experiment: int8 sweep variants on the real TPU.

Round-1 finding: the int8 capacity sweep measures ~6.2 ms per 2M rows
(~248 GB/s effective) vs the bf16 kernel's 4.3 ms over twice the bytes
(~710 GB/s). Hypothesis: the in-VMEM int8->bf16 convert (1.57M VPU elements
per tile) serializes against the MXU matmul inside the kernel, exactly like
the round-1 fused_ln_mlp negative result.

Variants measured here (one process at a time; FIFO-queue marginal timing
per CLAUDE.md):
  A. current:  int8 -> bf16 convert in VMEM, bf16 matmul (ops.quant)
  B. mxu:      int8 x int8 -> i32 on the MXU, scale the (TILE_N, B) output
               (query pre-quantized per-row to int8; no big convert)
  C. tile4096: variant A with TILE_N=4096 (amortization control)

Usage:  python benchmarks/exp_int8.py [--rows 2000000] [--variants A,B,C]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


CHUNK = 128
D = 768


def _mxu_kernel(n_valid_ref, x_ref, xs_ref, q_ref, out_ref):
    """int8 x int8 -> i32 on the MXU; only the (TILE_N, B) output is scaled.

    Query scale is NOT applied here: per-query positive scales commute with
    the per-chunk max, so they are applied outside on the (num_chunks, B)
    maxima (and identically in rescore), preserving chunk containment.
    """
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    scores = jnp.dot(
        x_ref[:], q_ref[:].T, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * xs_ref[:]
    row = pl.program_id(0) * x_ref.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 0
    )
    scores = jnp.where(row < n_valid_ref[0], scores, -jnp.inf)
    b = scores.shape[1]
    out_ref[:] = jnp.max(scores.reshape(-1, CHUNK, b), axis=1)


@functools.lru_cache(maxsize=8)
def build_mxu_sweep(n_pad: int, b_pad: int, tile_n: int):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_tiles = n_pad // tile_n
    sweep = pl.pallas_call(
        _mxu_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n // CHUNK, b_pad), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad // CHUNK, b_pad), jnp.float32),
    )

    @jax.jit
    def run(x_i8, xs, q_i8, n_valid):
        return sweep(jnp.asarray(n_valid, jnp.int32).reshape(1), x_i8,
                     xs.reshape(-1, 1), q_i8)

    return run


def gen_db_int8(n_pad: int, seed: int = 0):
    """Random int8 rows + f32 scales generated ON DEVICE (host upload is
    tunnel-slow)."""
    import jax
    import jax.numpy as jnp

    chunk = 524_288
    assert n_pad % chunk == 0 or n_pad < chunk

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(buf, key, start):
        c = jax.random.randint(key, (chunk, D), -127, 128, dtype=jnp.int8)
        return jax.lax.dynamic_update_slice(buf, c, (start, 0))

    buf = jnp.zeros((n_pad, D), jnp.int8)
    key = jax.random.PRNGKey(seed)
    n_full = n_pad // chunk
    for i in range(n_full):
        key, sub = jax.random.split(key)
        buf = fill(buf, sub, jnp.int32(i * chunk))
    if n_full * chunk < n_pad:
        rem = n_pad - n_full * chunk
        tail = jax.random.randint(key, (rem, D), -127, 128, dtype=jnp.int8)
        buf = jax.lax.dynamic_update_slice(buf, tail, (n_full * chunk, 0))
    scales = (jax.random.uniform(jax.random.PRNGKey(seed + 1), (n_pad,),
                                 jnp.float32) * 0.2 + 0.9) / 127.0
    buf.block_until_ready()
    return buf, scales


def marginal_ms(fn, n1: int = 30, n2: int = 150) -> float:
    """FIFO-queue marginal time (ms) per dispatch; fn(salt)->scalar array."""
    def run_n(n):
        t0 = time.perf_counter()
        outs = [fn(i) for i in range(n)]
        float(outs[-1])
        return time.perf_counter() - t0

    t1, t2 = run_n(n1), run_n(n2)
    m = (t2 - t1) / (n2 - n1) * 1e3
    return m if m > 0 else t2 / n2 * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--variants", default="A,B")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        _build_int8_searcher,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
        TILE_N,
    )

    assert jax.default_backend() == "tpu", "experiment needs the real chip"
    n_pad = -(-args.rows // TILE_N) * TILE_N
    log(f"rows={args.rows} n_pad={n_pad} bytes={n_pad * D / 1e9:.2f} GB")

    x_i8, xs = gen_db_int8(n_pad)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qd = jnp.asarray(q)
    gb = n_pad * D / 1e9

    variants = args.variants.split(",")

    if "A" in variants:
        search = _build_int8_searcher(n_pad, D, 8, 10, False)
        dead = jnp.zeros((n_pad, 1), jnp.int8)

        @jax.jit
        def qa(x_i8, xs, qd, dead, salt):
            res = search(x_i8, xs, qd + salt * 0.0, jnp.int32(args.rows), dead)
            return res.scores[0, 0]

        log("A: compiling current int8 searcher...")
        t0 = time.perf_counter()
        float(qa(x_i8, xs, qd, dead, jnp.float32(0)))
        log(f"A: compiled in {time.perf_counter() - t0:.1f}s")
        # distinct salts -> distinct programsless dispatches
        m = marginal_ms(lambda i: qa(x_i8, xs, qd, dead, jnp.float32(i + 1)))
        log(f"A current int8 e2e search: {m:.2f} ms  ({gb / m * 1e3:.0f} GB/s)")

    if "B" in variants:
        # pre-quantize queries per row
        qs = np.maximum(np.abs(q).max(axis=-1), 1e-12) / 127.0
        q_i8 = jnp.asarray(
            np.clip(np.rint(q / qs[:, None]), -127, 127), jnp.int8
        )
        run = build_mxu_sweep(n_pad, 8, TILE_N)

        @jax.jit
        def qb(x_i8, xs, q_i8, salt):
            cm = run(x_i8, xs, q_i8 + salt * 0, jnp.int32(args.rows))
            return cm[0, 0]

        log("B: compiling int8xint8 MXU sweep...")
        t0 = time.perf_counter()
        float(qb(x_i8, xs, q_i8, jnp.int8(0)))
        log(f"B: compiled in {time.perf_counter() - t0:.1f}s")
        m = marginal_ms(lambda i: qb(x_i8, xs, q_i8, jnp.int8(i % 2)))
        log(f"B int8xint8 MXU sweep only: {m:.2f} ms ({gb / m * 1e3:.0f} GB/s)")

    if "C" in variants:
        run = build_mxu_sweep(n_pad, 8, 4096) if n_pad % 4096 == 0 else None
        if run is None:
            log("C: rows not a 4096 multiple, skipped")
        else:
            qs = np.maximum(np.abs(q).max(axis=-1), 1e-12) / 127.0
            q_i8 = jnp.asarray(
                np.clip(np.rint(q / qs[:, None]), -127, 127), jnp.int8
            )

            @jax.jit
            def qc(x_i8, xs, q_i8, salt):
                cm = run(x_i8, xs, q_i8 + salt * 0, jnp.int32(args.rows))
                return cm[0, 0]

            log("C: compiling MXU sweep TILE_N=4096...")
            t0 = time.perf_counter()
            float(qc(x_i8, xs, q_i8, jnp.int8(0)))
            log(f"C: compiled in {time.perf_counter() - t0:.1f}s")
            m = marginal_ms(lambda i: qc(x_i8, xs, q_i8, jnp.int8(i % 2)))
            log(f"C MXU TILE_N=4096 sweep: {m:.2f} ms ({gb / m * 1e3:.0f} GB/s)")

    log("done")


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def extra_sweeps():
    """Sweep-only comparisons at matched scope (no phase-2): A-kernel vs
    B-kernel at tiles 2048/8192."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert jax.default_backend() == "tpu"
    rows = 2_097_152
    n_pad = rows
    x_i8, xs = gen_db_int8(n_pad)
    import numpy as np
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, D)).astype(np.float32)
    qb = jnp.asarray(q, jnp.bfloat16)
    qs = np.maximum(np.abs(q).max(axis=-1), 1e-12) / 127.0
    q_i8 = jnp.asarray(np.clip(np.rint(q / qs[:, None]), -127, 127), jnp.int8)
    gb = n_pad * D / 1e9

    def build(kernel, tile_n, q_dtype):
        sweep = pl.pallas_call(
            kernel,
            grid=(n_pad // tile_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_n // CHUNK, 8), lambda i: (i, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad // CHUNK, 8), jnp.float32),
        )

        @jax.jit
        def run(x, xsc, qq, salt):
            return sweep(jnp.asarray(2_000_000, jnp.int32).reshape(1), x,
                         xsc.reshape(-1, 1), qq + salt)[0, 0]

        return run

    def conv_kernel(n_valid_ref, x_ref, xs_ref, q_ref, out_ref):
        import jax.experimental.pallas as pl
        xb = x_ref[:].astype(jnp.bfloat16)
        scores = jnp.dot(xb, q_ref[:].T,
                         preferred_element_type=jnp.float32) * xs_ref[:]
        row = pl.program_id(0) * x_ref.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 0)
        scores = jnp.where(row < n_valid_ref[0], scores, -jnp.inf)
        out_ref[:] = jnp.max(scores.reshape(-1, CHUNK, 8), axis=1)

    def mxu_kernel(n_valid_ref, x_ref, xs_ref, q_ref, out_ref):
        import jax.experimental.pallas as pl
        scores = jnp.dot(x_ref[:], q_ref[:].T,
                         preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * xs_ref[:]
        row = pl.program_id(0) * x_ref.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 0)
        scores = jnp.where(row < n_valid_ref[0], scores, -jnp.inf)
        out_ref[:] = jnp.max(scores.reshape(-1, CHUNK, 8), axis=1)

    for name, kern, tile, qq, qz in [
        ("A conv+bf16mm t2048", conv_kernel, 2048, qb, jnp.bfloat16(0)),
        ("A conv+bf16mm t8192", conv_kernel, 8192, qb, jnp.bfloat16(0)),
        ("B i8xi8 MXU  t8192", mxu_kernel, 8192, q_i8, jnp.int8(0)),
    ]:
        try:
            run = build(kern, tile, qq.dtype)
            import time as _t
            t0 = _t.perf_counter()
            float(run(x_i8, xs, qq, qz))
            log(f"{name}: compiled {_t.perf_counter()-t0:.1f}s")
            m = marginal_ms(lambda i: run(x_i8, xs, qq, type(qz)(i % 2)))
            log(f"{name}: {m:.2f} ms ({gb / m * 1e3:.0f} GB/s)")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")



if __name__ == "__main__" and "--extra" in sys.argv:
    extra_sweeps()
