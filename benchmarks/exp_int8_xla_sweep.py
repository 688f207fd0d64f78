"""Can plain XLA beat the Pallas int8 sweep?

Finding so far: the Pallas int8 x int8 chunk-max kernel runs at ~310 GB/s
(Mosaic's int8-matmul lowering is the bottleneck; raw int8 DMA is
~805 GB/s). XLA's int8 dot_general measured 429 TFLOP/s — so a non-fused
phase 1 (materialize the (N, B) i32 score matrix, then mask/scale/chunk-max
as XLA ops) pays only ~64 MB of extra HBM traffic per 2M rows at B=8 and
should be DMA-bound at ~2.2 ms/2M. The round-1 "XLA 180x slower" result
was for the f32/bf16 path at HIGHEST precision; int8 changes the math.

Measures phase-1-only and full-search variants at 2M rows, vs the Pallas
kernel.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


D, B, K, CHUNK = 768, 8, 10, 128


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    sys.path.insert(0, "/root/repo")
    from benchmarks.exp_int8 import gen_db_int8, marginal_ms
    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        _build_int8_searcher,
    )

    assert jax.default_backend() == "tpu"
    n = 2_097_152
    x_i8, xs = gen_db_int8(n)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qd = jnp.asarray(q)
    gb = n * D / 1e9
    dead = jnp.zeros((n, 1), jnp.int8)

    # -- A: current Pallas searcher (e2e) ------------------------------------
    search = _build_int8_searcher(n, D, B, K, False)

    @jax.jit
    def qa(x_i8, xs, qd, dead, salt):
        res = search(x_i8, xs, qd + salt * 0.0, jnp.int32(n), dead)
        return res.scores[0, 0]

    float(qa(x_i8, xs, qd, dead, jnp.float32(0)))
    m = marginal_ms(lambda i: qa(x_i8, xs, qd, dead, jnp.float32(i + 1)))
    log(f"A pallas e2e: {m:.2f} ms ({gb/m*1e3:.0f} GB/s)")

    # -- B: XLA phase-1 only --------------------------------------------------
    @jax.jit
    def xla_sweep(x_i8, xs, q, salt):
        q_i8 = jnp.clip(jnp.round((q + salt * 0.0) * 127), -127, 127).astype(jnp.int8)
        scores = lax.dot_general(
            x_i8, q_i8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xs[:, None]          # (N, B)
        cm = jnp.max(scores.reshape(-1, CHUNK, B), axis=1)  # (N/CHUNK, B)
        return jnp.sum(cm)  # consume everything (no DCE)

    float(xla_sweep(x_i8, xs, qd, jnp.float32(0)))
    m = marginal_ms(lambda i: xla_sweep(x_i8, xs, qd, jnp.float32(i + 1)))
    log(f"B xla sweep only: {m:.2f} ms ({gb/m*1e3:.0f} GB/s)")

    # -- C: XLA full search (sweep + chunk top-k + integer rescore) ----------
    @functools.partial(jax.jit, static_argnames=("k",))
    def xla_search(x_i8, xs, q, n_valid, salt, k=K):
        qf = (q + salt * 0.0).astype(jnp.float32)
        q_scales = jnp.maximum(jnp.abs(qf).max(axis=-1), 1e-12) / 127.0
        q_i8 = jnp.clip(jnp.round(qf / q_scales[:, None]), -127, 127
                        ).astype(jnp.int8)
        scores = lax.dot_general(
            x_i8, q_i8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xs[:, None]
        row = jnp.arange(x_i8.shape[0], dtype=jnp.int32)[:, None]
        scores = jnp.where(row < n_valid, scores, -jnp.inf)
        cm = jnp.max(scores.reshape(-1, CHUNK, B), axis=1)
        _, chunk_ids = lax.top_k(cm.T, k)           # (B, k)
        row_ids = (chunk_ids[:, :, None] * CHUNK
                   + jnp.arange(CHUNK)[None, None, :]).reshape(B, k * CHUNK)
        valid = row_ids < n_valid
        safe = jnp.where(valid, row_ids, 0)
        int_dot = jnp.einsum(
            "bd,bcd->bc", q_i8.astype(jnp.float32),
            x_i8[safe].astype(jnp.float32),
            precision=lax.Precision.HIGHEST,
        )
        final = int_dot * xs[safe] * q_scales[:, None]
        final = jnp.where(valid, final, -jnp.inf)
        ts, pos = lax.top_k(final, k)
        return ts[0, 0]

    float(xla_search(x_i8, xs, qd, jnp.int32(n), jnp.float32(0)))
    m = marginal_ms(lambda i: xla_search(x_i8, xs, qd, jnp.int32(n),
                                         jnp.float32(i + 1)))
    log(f"C xla full search: {m:.2f} ms ({gb/m*1e3:.0f} GB/s)")

    # correctness cross-check: same candidates as the Pallas searcher
    res_pallas = search(x_i8, xs, qd, jnp.int32(n), dead)
    top_pallas = float(res_pallas.scores[0, 0])
    top_xla = float(xla_search(x_i8, xs, qd, jnp.int32(n), jnp.float32(0)))
    log(f"top-1 pallas={top_pallas:.6f} xla={top_xla:.6f} "
        f"{'MATCH' if abs(top_pallas - top_xla) < 1e-5 else 'DIFF'}")


if __name__ == "__main__":
    main()
