"""Does the int8 finding (XLA dot beats the Pallas sweep) carry to bf16?

The int8 path switched to an XLA `lax.dot_general` phase 1 after measuring
2.06x the Pallas kernel (benchmarks/exp_int8_xla_sweep.py). The round-1
"XLA 180x slower" result for bf16 was the f32-HIGHEST einsum chain; this
experiment measures the apples-to-apples variant instead: bf16 x bf16
`dot_general` with `preferred_element_type=f32` (single MXU pass, same
math as the Pallas kernel's in-VMEM `jnp.dot`) + XLA scale/mask/chunk-max,
against the fused Pallas bf16 sweep (measured ~710 GB/s at 2M rows).

Unlike int8 (integer math, bit-exact across schedules), bf16 scores can
differ between compilation schedules in reduction order, so the comparison
is tie-aware: candidate SETS + sorted scores.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


D, B, K, CHUNK = 768, 8, 10, 128


def marginal_ms(fn, n1: int = 4, n2: int = 24) -> float:
    def run(n):
        t0 = time.perf_counter()
        outs = [fn(i) for i in range(n)]
        float(outs[-1])
        return time.perf_counter() - t0

    run(2)  # warm
    return (run(n2) - run(n1)) / (n2 - n1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    sys.path.insert(0, "/root/repo")
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
        topk_search,
    )

    assert jax.default_backend() == "tpu"
    n = 2_097_152
    gb = n * D * 2 / 1e9

    # DB generated on device (host upload is tunnel-slow)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, D), jnp.bfloat16)
    x.block_until_ready()
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qd = jnp.asarray(q, jnp.bfloat16)

    # -- A: current Pallas bf16 searcher (e2e) --------------------------------
    @jax.jit
    def qa(x, qd, salt):
        res = topk_search(x, qd + salt * 0, K, n_valid=n, use_pallas=True)
        return res.scores[0, 0]

    float(qa(x, qd, jnp.bfloat16(0)))
    m = marginal_ms(lambda i: qa(x, qd, jnp.bfloat16(i + 1)))
    log(f"A pallas bf16 e2e: {m:.2f} ms ({gb/m*1e3:.0f} GB/s)")

    # -- B: XLA bf16 sweep only ------------------------------------------------
    @jax.jit
    def xla_sweep(x, q, salt):
        scores = lax.dot_general(
            x, q + salt * 0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (N, B) f32
        cm = jnp.max(scores.reshape(-1, CHUNK, B), axis=1)
        return jnp.sum(cm)

    float(xla_sweep(x, qd, jnp.bfloat16(0)))
    m = marginal_ms(lambda i: xla_sweep(x, qd, jnp.bfloat16(i + 1)))
    log(f"B xla bf16 sweep only: {m:.2f} ms ({gb/m*1e3:.0f} GB/s)")

    # -- C: XLA full search (sweep + chunk top-k + f32 rescore) ---------------
    @jax.jit
    def xla_search(x, q, salt):
        qs = q + salt * 0
        scores = lax.dot_general(
            x, qs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cm = jnp.max(scores.reshape(-1, CHUNK, B), axis=1)
        _, chunk_ids = lax.top_k(cm.T, K)
        row_ids = (chunk_ids[:, :, None] * CHUNK
                   + jnp.arange(CHUNK)[None, None, :]).reshape(B, K * CHUNK)
        cand = jnp.einsum(
            "bd,bcd->bc", qs.astype(jnp.float32),
            x[row_ids].astype(jnp.float32),
            precision=lax.Precision.HIGHEST,
        )
        ts, pos = lax.top_k(cand, K)
        top_ids = jnp.take_along_axis(row_ids, pos, axis=1)
        return ts[0, 0] + top_ids[0, 0] * 0.0

    float(xla_search(x, qd, jnp.bfloat16(0)))
    m = marginal_ms(lambda i: xla_search(x, qd, jnp.bfloat16(i + 1)))
    log(f"C xla bf16 full search: {m:.2f} ms ({gb/m*1e3:.0f} GB/s)")

    # tie-aware cross-check: same candidate set, sorted scores close
    res_pallas = topk_search(x, qd, K, n_valid=n, use_pallas=True)

    @jax.jit
    def xla_full(x, q):
        scores = lax.dot_general(
            x, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cm = jnp.max(scores.reshape(-1, CHUNK, B), axis=1)
        _, chunk_ids = lax.top_k(cm.T, K)
        row_ids = (chunk_ids[:, :, None] * CHUNK
                   + jnp.arange(CHUNK)[None, None, :]).reshape(B, K * CHUNK)
        cand = jnp.einsum(
            "bd,bcd->bc", q.astype(jnp.float32),
            x[row_ids].astype(jnp.float32),
            precision=lax.Precision.HIGHEST,
        )
        ts, pos = lax.top_k(cand, K)
        return ts, jnp.take_along_axis(row_ids, pos, axis=1)

    ts, ids = xla_full(x, qd)
    sp = np.sort(np.asarray(res_pallas.scores), axis=1)
    sx = np.sort(np.asarray(ts), axis=1)
    set_match = all(
        set(np.asarray(res_pallas.indices)[b]) == set(np.asarray(ids)[b])
        for b in range(B)
    )
    log(f"tie-aware check: sets {'MATCH' if set_match else 'DIFF'}, "
        f"max score delta {np.abs(sp - sx).max():.2e}")


if __name__ == "__main__":
    main()
