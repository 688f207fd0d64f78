"""Serving throughput vs batch size over the 10M-row int8 index.

The sweep cost is dominated by streaming the 7.73 GB of rows; a B-query
batch adds only the (N, B) i32 score materialization (~0.04 GB/M rows per
query). So QPS should scale nearly linearly with B until the score
traffic rivals the row traffic:

    traffic(B) = 7.73 GB + 2 * N * B * 4 bytes
    B=8: 8.4 GB   B=32: 10.3 GB   B=64: 12.9 GB   B=128: 18.0 GB

Run alone (single TPU process rule; ~6 min incl. on-device DB gen):
    timeout 590 python -u benchmarks/exp_qps_10m.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import gen_db_int8_device, round_overhead
    from intelligent_video_analysis_retrieval_system_tpu.models import (
        CLIPConfig,
        SimpleTokenizer,
    )
    from intelligent_video_analysis_retrieval_system_tpu.models.clip import (
        CLIPTextTower,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        _build_int8_searcher,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import TILE_N

    assert jax.default_backend() == "tpu"
    D, K, N10 = 768, 10, 10_000_000
    n_pad = -(-N10 // TILE_N) * TILE_N
    log(f"generating 10M x {D} int8 DB on device ({n_pad * D / 1e9:.2f} GB)")
    x10, s10 = gen_db_int8_device(n_pad)
    dead = jnp.zeros((n_pad, 1), jnp.int8)

    cfg = CLIPConfig.vit_l_14()
    tower = CLIPTextTower(cfg.text, dtype=jnp.bfloat16)
    tok = SimpleTokenizer(vocab_size=cfg.text.vocab_size)
    tokens1 = jnp.asarray(tok(["a photo of a scene"], cfg.text.max_length))
    tp = jax.jit(tower.init)(jax.random.PRNGKey(0), tokens1)["params"]

    for B in (8, 32, 64, 128):
        search = _build_int8_searcher(n_pad, D, B, K, False)
        tokens_b = jnp.tile(tokens1, (B, 1))

        @jax.jit
        def qbatch(tp, x10, s10, dead, tokens_b, salt, _search=search, _B=B):
            toks = tokens_b.at[:, 1].set(
                (salt.astype(jnp.int32)
                 + jnp.arange(_B, dtype=jnp.int32)) % 49000
            )
            emb = tower.apply({"params": tp}, toks).astype(jnp.float32)
            emb /= jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
            res = _search(x10, s10, emb, jnp.int32(N10), dead)
            return res.scores[0, 0]

        t0 = time.perf_counter()
        float(qbatch(tp, x10, s10, dead, tokens_b, jnp.float32(0)))
        log(f"B={B}: compiled in {time.perf_counter()-t0:.0f}s")
        ovh = round_overhead(4)

        def run(n):
            t0 = time.perf_counter()
            outs = [
                qbatch(tp, x10, s10, dead, tokens_b, jnp.float32(i + 1))
                for i in range(n)
            ]
            float(outs[-1])
            return time.perf_counter() - t0

        t1, t2 = run(2), run(6)
        per = (t2 - t1) / 4
        traffic = n_pad * D + 2 * n_pad * B * 4
        log(f"B={B}: {per*1e3:.2f} ms/batch = {B/per:.0f} QPS/chip "
            f"({traffic/per/1e9:.0f} GB/s of {traffic/1e9:.1f} GB)")


if __name__ == "__main__":
    main()
