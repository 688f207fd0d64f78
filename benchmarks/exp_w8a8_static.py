"""Is the W8A8 tower's dynamic per-token activation quant worth replacing
with static (calibrated) scales?

CLAUDE.md round-2 note: the W8A8 ViT-L/14 win is capped at 1.15x by the
VPU-bound per-layer activation quant. A static per-tensor scale removes
the per-token max-reduction (but keeps the round/clip/cast pass). This
probe measures, at ViT-L MLP shapes, the per-layer cost of:
  A  bf16 dense                        (baseline)
  B  w8a8 dynamic per-token scales     (current ops.quant.w8a8_dense)
  C  w8a8 static per-tensor scale      (candidate)
  D  quantize-only pass                (isolates the VPU cost)
If C ~= B, the dynamic reduction is free and static calibration buys
nothing (it would only add a calibration workflow + accuracy risk).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def marginal_ms(fn, n1: int = 4, n2: int = 24) -> float:
    def run(n):
        t0 = time.perf_counter()
        outs = [fn(i) for i in range(n)]
        float(outs[-1])
        return time.perf_counter() - t0

    run(2)
    return (run(n2) - run(n1)) / (n2 - n1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    sys.path.insert(0, "/root/repo")
    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        w8a8_dense,
    )

    assert jax.default_backend() == "tpu"
    # ViT-L/14 MLP fc1 at B=128: (128*257, 1024) x (1024, 4096)
    T, DIN, DOUT = 32896, 1024, 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, DIN)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((DIN, DOUT)).astype(np.float32) * 0.02,
                    jnp.bfloat16)
    flops = 2 * T * DIN * DOUT

    # NB: consume the FULL output (sum) — returning out[0,0] lets XLA
    # dead-code-eliminate all but one row of the GEMM (CLAUDE.md probe
    # gotcha; the first version of this file measured exactly that bug:
    # "343 TFLOP/s bf16" on a 197 TFLOP/s part).
    @jax.jit
    def a_bf16(x, w, salt):
        out = (x + salt) @ w
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def b_dynamic(x, w, salt):
        out = w8a8_dense(x + salt, w.astype(jnp.float32))
        return jnp.sum(out.astype(jnp.float32))

    # pre-quantized weights + static activation scale (what a calibrated
    # deployment would run per layer)
    wf = w.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    w8 = jnp.clip(jnp.round(wf / w_scale), -127, 127).astype(jnp.int8)
    a_scale = jnp.float32(3.5 / 127.0)  # calibrated constant

    @jax.jit
    def c_static(x, w8, w_scale, salt):
        x8 = jnp.clip(jnp.round((x.astype(jnp.float32) + salt) / a_scale),
                      -127, 127).astype(jnp.int8)
        out = lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * a_scale * w_scale
        return jnp.sum(out)

    @jax.jit
    def d_quant_only(x, salt):
        xf = x.astype(jnp.float32) + salt
        s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        x8 = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return jnp.sum(x8.astype(jnp.int32))

    for name, fn in [
        ("A bf16 dense", lambda i: a_bf16(x, w, jnp.bfloat16(i))),
        ("B w8a8 dynamic", lambda i: b_dynamic(x, w, jnp.bfloat16(i))),
        ("C w8a8 static", lambda i: c_static(x, w8, w_scale, jnp.float32(i))),
        ("D quant only", lambda i: d_quant_only(x, jnp.float32(i))),
    ]:
        float(fn(0))
        m = marginal_ms(fn)
        log(f"{name}: {m:.3f} ms ({flops/m/1e9:.0f} GFLOP/s)")


if __name__ == "__main__":
    main()
