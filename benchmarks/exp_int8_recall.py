"""int8 capacity-mode retrieval quality on realistic (clustered) corpora.

The round-1/2 int8 recall numbers (top-1 exact, ~97.5% top-10 overlap)
were measured on uniform-random unit vectors — the WORST case for a
quantized metric, because all similarities concentrate in a narrow band
(~N(0, 1/sqrt(768))) and ranks are decided by tiny margins. Real CLIP
embeddings are clustered: same-scene frames sit close together and the
relevant candidates are separated from the bulk by large margins.

This probe builds a mixture-of-vMF-like corpus (cluster centers on the
unit sphere, per-cluster concentration sweep), issues two query families:
  - "duplicate" queries: a perturbed copy of a database row (the ingest
    dedup / frame-similarity case);
  - "cluster" queries: fresh samples of a cluster (the text->scene case),
and reports recall@1 / top-10 overlap of the int8 quantized metric vs the
exact f32 metric, per concentration level. Pure CPU (deterministic int8
metric — CPU results equal TPU bit-exactly, ops/quant.py docstring).

Run:  python -u benchmarks/exp_int8_recall.py        (~1-2 min, CPU)
"""

from __future__ import annotations

import sys

import numpy as np


def log(m):
    print(m, flush=True)


def build_corpus(rng, n, d, k_clusters, sigma):
    centers = rng.standard_normal((k_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    assign = rng.integers(0, k_clusters, n)
    x = centers[assign] + sigma * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x, centers, assign


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
        _int8_reference,
        quantize_rows_int8,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
        topk_exact_reference,
    )

    rng = np.random.default_rng(0)
    N, D, K, B = 100_000, 768, 500, 64

    log(f"N={N} D={D} clusters={K} queries={B} per family")
    log(f"{'sigma':>6} {'family':>10} {'recall@1':>9} {'top10 overlap':>14}")
    for sigma in (0.1, 0.3, 0.6, 1.0):
        x, centers, assign = build_corpus(rng, N, D, K, sigma)
        xq, xs = quantize_rows_int8(x)
        xd = jnp.asarray(x)
        xqd, xsd = jnp.asarray(xq), jnp.asarray(xs)

        for family in ("duplicate", "cluster"):
            if family == "duplicate":
                idx = rng.integers(0, N, B)
                q = x[idx] + 0.05 * rng.standard_normal((B, D)).astype(
                    np.float32
                )
            else:
                cl = rng.integers(0, K, B)
                q = centers[cl] + sigma * rng.standard_normal((B, D)).astype(
                    np.float32
                )
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            qd = jnp.asarray(q)

            exact = np.asarray(topk_exact_reference(xd, qd, 10).indices)
            got = np.asarray(_int8_reference(xqd, xsd, qd, 10).indices)
            r1 = float(np.mean(got[:, 0] == exact[:, 0]))
            overlap = float(
                np.mean(
                    [
                        len(set(got[i]) & set(exact[i])) / 10.0
                        for i in range(B)
                    ]
                )
            )
            log(f"{sigma:>6} {family:>10} {r1:>9.3f} {overlap:>14.3f}")

    # worst case for contrast: uniform random corpus + random queries
    x = rng.standard_normal((N, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    xq, xs = quantize_rows_int8(x)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    exact = np.asarray(topk_exact_reference(jnp.asarray(x), jnp.asarray(q), 10).indices)
    got = np.asarray(_int8_reference(jnp.asarray(xq), jnp.asarray(xs),
                                     jnp.asarray(q), 10).indices)
    r1 = float(np.mean(got[:, 0] == exact[:, 0]))
    overlap = float(np.mean([len(set(got[i]) & set(exact[i])) / 10.0
                             for i in range(B)]))
    log(f"{'random':>6} {'(worst)':>10} {r1:>9.3f} {overlap:>14.3f}")


if __name__ == "__main__":
    main()
