"""Is int8 attention math worth it for ViT-L/14 on v5e? (VERDICT r2 #7)

The W8A8-static tower (1160 fps) still runs its attention matmuls (QK^T,
PV) in bf16 inside the fused Pallas MHA; at int8 GEMM peak (429 TFLOP/s
measured vs 169 bf16) the tower sits at ~44% of the int8 ceiling, so
quantizing the attention matmuls is the known untried lever.

Two measurement levels:

A) GEMM-level: attention-shaped batched matmuls, bf16 vs int8x int8->i32,
   exactly as XLA lowers them:
     QK^T: (BH, T, HD) x (BH, T, HD)^T  contraction depth HD=64
     PV  : (BH, T, T)  x (BH, T, HD)    contraction depth T=257
   The int8 MXU win comes from packing along the CONTRACTED axis; QK's
   64-deep contraction is the suspect.

B) Tower-level A/B at ViT-L/14 B=128 (fps + cosine vs bf16 oracle):
     1. bf16 + fused Pallas MHA            (throughput baseline)
     2. int8_static W8A8 + fused bf16 MHA  (current production best)
     3. int8_static W8A8 + int8 attention  (candidate: models/clip.py
        MultiHeadAttention.int8_attn — XLA int8 dot_generals, f32 softmax,
        probs at fixed 1/127 scale)

Verdict recorded in RESULTS.md; the int8_attn flag ships either way
(documented, off by default unless it wins).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


_SALT = [0]


def next_salt() -> int:
    """Strictly increasing across ALL runs/warmups: repeated (program,
    input) dispatches are served from a result cache below the dispatch
    layer (CLAUDE.md), which silently deflates timings."""
    _SALT[0] += 1
    return _SALT[0]


def marginal_ms(fn, n1: int = 4, n2: int = 16) -> float:
    def run(n):
        t0 = time.perf_counter()
        outs = [fn(next_salt()) for _ in range(n)]
        float(outs[-1])
        return time.perf_counter() - t0

    run(2)
    return (run(n2) - run(n1)) / (n2 - n1) * 1e3


def gemm_level():
    import jax
    import jax.numpy as jnp
    from jax import lax

    # ViT-L/14 vision attention at B=128: BH = 128*16, T = 257, HD = 64
    BH, T, HD = 2048, 257, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, T, HD)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, T, HD)).astype(np.float32),
                    jnp.bfloat16)
    p = jnp.asarray(
        rng.uniform(0, 1, (BH, T, T)).astype(np.float32), jnp.bfloat16
    )
    v = jnp.asarray(rng.standard_normal((BH, T, HD)).astype(np.float32),
                    jnp.bfloat16)
    q8 = jnp.asarray(rng.integers(-127, 128, (BH, T, HD)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 128, (BH, T, HD)), jnp.int8)
    p8 = jnp.asarray(rng.integers(0, 128, (BH, T, T)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (BH, T, HD)), jnp.int8)

    # consume FULL outputs (sum) so XLA cannot skip the GEMM, and salt an
    # INPUT operand so no two dispatches are identical (CLAUDE.md: an
    # output-side salt does NOT defeat the below-dispatch result cache)
    @jax.jit
    def qk_bf16(q, k, salt):
        out = lax.dot_general(q + salt, k, (((2,), (2,)), ((0,), (0,))))
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def qk_int8(q8, k8, salt):
        out = lax.dot_general(
            q8 + salt, k8, (((2,), (2,)), ((0,), (0,))),  # int8 wrap: fine
            preferred_element_type=jnp.int32,
        )
        return jnp.sum(out)

    @jax.jit
    def pv_bf16(p, v, salt):
        out = lax.dot_general(p + salt, v, (((2,), (1,)), ((0,), (0,))))
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def pv_int8(p8, v8, salt):
        out = lax.dot_general(
            p8 + salt, v8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        return jnp.sum(out)

    qk_flops = 2 * BH * T * T * HD
    pv_flops = 2 * BH * T * HD * T
    for name, fn, args, flops in (
        ("QK^T bf16 (HD=64 contraction)", qk_bf16, (q, k), qk_flops),
        ("QK^T int8", qk_int8, (q8, k8), qk_flops),
        ("PV   bf16 (T=257 contraction)", pv_bf16, (p, v), pv_flops),
        ("PV   int8", pv_int8, (p8, v8), pv_flops),
    ):
        salt_dtype = jnp.bfloat16 if "bf16" in name else jnp.int8
        ms = marginal_ms(lambda s, f=fn, a=args: f(*a, salt_dtype(s)))
        log(f"  {name}: {ms:7.2f} ms  {flops / (ms / 1e3) / 1e12:7.1f} TFLOP/s")


def tower_level():
    import jax
    import jax.numpy as jnp

    from intelligent_video_analysis_retrieval_system_tpu.models import (
        CLIPConfig,
    )
    from intelligent_video_analysis_retrieval_system_tpu.models.calibrate import (
        calibrate_act_scales,
    )
    from intelligent_video_analysis_retrieval_system_tpu.models.clip import (
        CLIPVisionTower,
    )

    cfg = CLIPConfig.vit_l_14()
    B = 128
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32),
                     jnp.bfloat16)
    base = CLIPVisionTower(cfg.vision, dtype=jnp.bfloat16)
    params = jax.jit(base.init)(jax.random.PRNGKey(0), px[:1])["params"]

    dyn = CLIPVisionTower(cfg.vision, dtype=jnp.bfloat16, w8a8=True)
    scales = calibrate_act_scales(dyn, {"params": params}, [(px,)])

    variants = {
        "bf16 + fused MHA": CLIPVisionTower(cfg.vision, dtype=jnp.bfloat16),
        "int8_static + fused bf16 MHA": CLIPVisionTower(
            cfg.vision, dtype=jnp.bfloat16, w8a8=True, w8a8_static=True
        ),
        "int8_static + int8 attention": CLIPVisionTower(
            cfg.vision, dtype=jnp.bfloat16, w8a8=True, w8a8_static=True,
            int8_attn=True,
        ),
        "w8a8 dynamic + int8 attention": CLIPVisionTower(
            cfg.vision, dtype=jnp.bfloat16, w8a8=True, int8_attn=True
        ),
    }

    oracle = None
    for name, tower in variants.items():
        tree = {"params": params}
        if "static" in name:
            tree = {"params": params, **scales}

        @jax.jit
        def embed(tree, px, salt, tower=tower):
            return tower.apply(tree, px + salt).astype(jnp.float32)

        t0 = time.perf_counter()
        out = np.asarray(embed(tree, px, jnp.bfloat16(0)))
        log(f"  {name}: compiled+first in {time.perf_counter() - t0:.1f}s")
        if oracle is None:
            oracle = out
            cos = 1.0
        else:
            cos = float(np.mean(
                (out * oracle).sum(-1)
                / np.maximum(
                    np.linalg.norm(out, axis=-1)
                    * np.linalg.norm(oracle, axis=-1), 1e-9
                )
            ))

        @jax.jit
        def embed_probe(tree, px, salt, tower=tower):
            return tower.apply(tree, px + salt).astype(jnp.float32)[0, 0]

        float(embed_probe(tree, px, jnp.bfloat16(0)))
        # salts strictly increase (mod 97 keeps bf16 exact) — each variant
        # uses < 97 dispatches, so no (program, input) pair ever repeats
        ms = marginal_ms(
            lambda s: embed_probe(tree, px, jnp.bfloat16(s % 97)), 3, 13
        )
        log(f"  {name}: {ms:6.1f} ms/batch = {B / ms * 1e3:6.0f} fps  "
            f"cosine={cos:.5f}")


def main():
    import jax

    assert jax.default_backend() == "tpu", "run on the TPU chip"
    sys.path.insert(0, "/root/repo")
    log("A) GEMM-level: attention-shaped matmuls, bf16 vs int8")
    gemm_level()
    log("B) Tower-level: ViT-L/14 B=128")
    tower_level()


if __name__ == "__main__":
    main()
