"""Where does the single-query e2e time go? (text encode / sweep / rest)

Decomposes the 1M bf16 headline (bench.py) by timing, with the same
FIFO-marginal methodology:
  A  text tower alone (ViT-L/14, B=1 padded to 8)
  B  fused Pallas sweep + rescore alone (precomputed query)
  C  full e2e (encode + sweep in ONE jit — what bench.py measures)
C - (A + B) exposes scheduling/fusion overhead of composing the two.

MEASURED VERDICT (2026-08-17, see RESULTS.md): A reads 3.2-4.9 ms and B
2.2 ms standalone, yet C is only 2.9-3.2 ms — the standalone numbers are
DISPATCH-FLOOR-limited through the tunnel, not device time. An
interleaved A/B follow-up with a W8A8-static text tower (2.3x faster
standalone) showed NO composed-e2e win, so the e2e is sweep-dominated
and the B=1 tower costs well under 1 ms of device time. Standalone
marginals of sub-ms programs are NOT trustworthy on this tunnel; only
composed-program comparisons are.

Run alone: timeout 590 python -u benchmarks/exp_latency_breakdown.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import gen_db_bf16_device
    from intelligent_video_analysis_retrieval_system_tpu.models import (
        CLIPConfig,
        SimpleTokenizer,
    )
    from intelligent_video_analysis_retrieval_system_tpu.models.clip import (
        CLIPTextTower,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
        TILE_N,
        topk_search,
    )

    assert jax.default_backend() == "tpu"
    D, K, N = 768, 10, 1_000_000
    n_pad = -(-N // TILE_N) * TILE_N
    log(f"generating {N}x{D} bf16 DB on device...")
    xd = gen_db_bf16_device(n_pad)

    cfg = CLIPConfig.vit_l_14()
    tower = CLIPTextTower(cfg.text, dtype=jnp.bfloat16)
    tok = SimpleTokenizer(vocab_size=cfg.text.vocab_size)
    tokens = jnp.asarray(tok(["a photo of a scene"], cfg.text.max_length))
    tp = jax.jit(tower.init)(jax.random.PRNGKey(0), tokens)["params"]

    def encode(tp, tokens, salt):
        toks = tokens.at[0, 1].set(salt.astype(jnp.int32) % 49000)
        emb = tower.apply({"params": tp}, toks).astype(jnp.float32)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )

    @jax.jit
    def a_encode(tp, tokens, salt):
        return encode(tp, tokens, salt)[0, 0]

    @jax.jit
    def b_sweep(xd, q, salt):
        # salt must actually change the bf16 query or results get cached
        # below the dispatch layer (CLAUDE.md probe gotcha)
        qq = q + salt.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        res = topk_search(xd, qq, K, n_valid=N, use_pallas=True)
        return res.scores[0, 0]

    @jax.jit
    def c_full(tp, xd, tokens, salt):
        emb = encode(tp, tokens, salt)
        res = topk_search(xd, emb.astype(jnp.bfloat16), K, n_valid=N,
                          use_pallas=True)
        return res.scores[0, 0]

    q0 = np.random.default_rng(0).standard_normal((1, D)).astype(np.float32)
    q0 /= np.linalg.norm(q0)
    q0 = jnp.asarray(q0, jnp.bfloat16)

    def fetch(x):
        return float(x)

    def marginal(fn, *args):
        def run(n):
            t0 = time.perf_counter()
            outs = [fn(*args, jnp.float32(i)) for i in range(n)]
            fetch(outs[-1])
            return time.perf_counter() - t0

        run(3)
        t1, t2 = run(5), run(25)
        return (t2 - t1) / 20 * 1e3

    for name, fn, args in (
        ("A text encode", a_encode, (tp, tokens)),
        ("B sweep+rescore", b_sweep, (xd, q0)),
        ("C full e2e", c_full, (tp, xd, tokens)),
    ):
        fetch(fn(*args, jnp.float32(-1)))
        ms = marginal(fn, *args)
        log(f"{name}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
