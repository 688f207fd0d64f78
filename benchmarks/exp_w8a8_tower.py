"""Measure W8A8 vs bf16 ViT-L/14 image tower throughput on the real chip.

VERDICT r1 #8: the int8 MXU runs 2.5x bf16 peak on v5e (int8 matmul probe:
429 vs 169 TFLOP/s); the tower's dense layers are ~96% of its FLOPs, so
W8A8 should land ~1.4-1.6x including the dynamic quant/dequant overhead.
"""
import sys, time
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from intelligent_video_analysis_retrieval_system_tpu.models import CLIPConfig
    from intelligent_video_analysis_retrieval_system_tpu.models.clip import CLIPVisionTower

    assert jax.default_backend() == "tpu"
    import os
    if os.environ.get("IVARS_TOWER", "vit_l_14") == "vit_b_32":
        cfg, B = CLIPConfig.vit_b_32(), 256
    else:
        cfg, B = CLIPConfig.vit_l_14(), 128
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32),
                     jnp.bfloat16)

    results = {}
    for name, kwargs in [
        ("bf16", {}),
        ("w8a8", {"w8a8": True}),
        ("w8a8_static", {"w8a8": True, "w8a8_static": True}),
    ]:
        tower = CLIPVisionTower(cfg.vision, dtype=jnp.bfloat16, **kwargs)
        vp = jax.jit(tower.init)(jax.random.PRNGKey(0), px[:1])["params"]

        if kwargs.get("w8a8_static"):
            # calibrate on one batch through the dynamic twin
            from intelligent_video_analysis_retrieval_system_tpu.models.calibrate import (
                calibrate_act_scales,
            )

            dyn = CLIPVisionTower(cfg.vision, dtype=jnp.bfloat16, w8a8=True)
            scales = calibrate_act_scales(dyn, {"params": vp}, [(px,)])
            log(f"{name}: calibrated "
                f"{len(jax.tree_util.tree_leaves(scales))} scales")

            @jax.jit
            def fwd(vp, px, salt, _s=scales):
                return tower.apply(
                    {"params": vp, **_s}, px + salt
                ).astype(jnp.float32)[0, 0]
        else:

            @jax.jit
            def fwd(vp, px, salt):
                return tower.apply(
                    {"params": vp}, px + salt
                ).astype(jnp.float32)[0, 0]

        t0 = time.perf_counter()
        float(fwd(vp, px, jnp.bfloat16(0)))
        log(f"{name}: compiled in {time.perf_counter()-t0:.1f}s")

        def run(iters):
            t0 = time.perf_counter()
            outs = [fwd(vp, px, jnp.bfloat16(i + 1)) for i in range(iters)]
            float(outs[-1]); return time.perf_counter() - t0
        t1, t2 = run(3), run(13)
        per_batch = (t2 - t1) / 10
        results[name] = B / per_batch
        log(f"{name}: {B/per_batch:.0f} frames/s/chip ({per_batch*1e3:.1f} ms/batch B={B})")

        # quality: cosine vs the bf16 tower on the same params
        if name != "bf16":
            base = CLIPVisionTower(cfg.vision, dtype=jnp.bfloat16)
            a = np.asarray(jax.jit(lambda vp, px: base.apply({"params": vp}, px))(vp, px[:8]), np.float32)
            if kwargs.get("w8a8_static"):
                b = np.asarray(jax.jit(
                    lambda vp, px, _s=scales: tower.apply({"params": vp, **_s}, px)
                )(vp, px[:8]), np.float32)
            else:
                b = np.asarray(jax.jit(lambda vp, px: tower.apply({"params": vp}, px))(vp, px[:8]), np.float32)
            cos = (a*b).sum(-1)/(np.linalg.norm(a,axis=-1)*np.linalg.norm(b,axis=-1))
            log(f"{name} vs bf16 cosine: min={cos.min():.4f} mean={cos.mean():.4f}")
    log(f"speedup: w8a8 {results.get('w8a8',0)/results['bf16']:.2f}x, "
        f"static {results.get('w8a8_static',0)/results['bf16']:.2f}x")

if __name__ == "__main__":
    main()
