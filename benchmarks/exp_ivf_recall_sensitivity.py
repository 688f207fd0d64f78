"""IVF recall sensitivity to corpus structure (CPU-runnable study).

Recall-at-nprobe is a property of the CORPUS, not the index: clustered
embeddings (real video frames: intra-scene cosine ~0.94) concentrate
each query's neighbors in few cells, while structureless corpora spread
them. This study quantifies that dependence so deployment guidance
("tune nprobe per corpus", `tune_nprobe` / `ann_target_recall`) rests on
a measured curve instead of an assertion.

Method: 200k x 256 corpora from one generative family — unit cluster
centers + Gaussian intra-cluster noise of total relative norm sigma
(sigma=0.35 matches measured CLIP video-frame corpora; 'uniform' is the
no-structure adversarial limit) — queries drawn near corpus items (as
retrieval queries are), recall@10 vs the exact dense path on the SAME
buffers. Deterministic on CPU (f32 exact at these magnitudes).

Usage:  python benchmarks/exp_ivf_recall_sensitivity.py [--rows 200000]
(forces the CPU backend in-process — runs during TPU outages too)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=2000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
        build_ivf,
        ivf_topk,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
        TILE_N,
        topk_search,
    )

    n, d = args.rows, args.dim
    n_pad = -(-n // TILE_N) * TILE_N
    results = {"rows": n, "dim": d, "nlist": args.nlist,
               "clusters": args.clusters, "queries": args.queries}

    def corpus(sigma: float | None, seed: int):
        rng = np.random.default_rng(seed)
        if sigma is None:  # structureless limit
            x = rng.standard_normal((n, d)).astype(np.float32)
        else:
            centers = rng.standard_normal((args.clusters, d)).astype(
                np.float32
            )
            centers /= np.linalg.norm(centers, axis=1, keepdims=True)
            assign = rng.integers(0, args.clusters, n)
            x = centers[assign] + (sigma / d**0.5) * rng.standard_normal(
                (n, d)
            ).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        picks = rng.choice(n, args.queries, replace=False)
        q = x[picks] + (0.5 / d**0.5) * rng.standard_normal(
            (args.queries, d)
        ).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return x, q

    for label, sigma in (("sigma0.2", 0.2), ("sigma0.35", 0.35),
                         ("sigma0.5", 0.5), ("uniform", None)):
        x, q = corpus(sigma, seed=11)
        host = np.zeros((n_pad, d), np.float32)
        host[:n] = x
        xd = jnp.asarray(host)
        t0 = time.perf_counter()
        state, report = build_ivf(
            xd, n_rows=n, nlist=args.nlist, kmeans_iters=6,
            sample_per_list=48, seed=0,
        )
        build_s = time.perf_counter() - t0
        dense = topk_search(xd, jnp.asarray(q), 10, n_valid=n)
        dense_ids = np.asarray(dense.indices)
        line = [f"{label:9s} build {build_s:5.1f}s "
                f"cap={report.bucket_cap}"]
        for nprobe in (8, 16, 32, 64):
            got = np.asarray(
                ivf_topk(xd, state, jnp.asarray(q), 10, nprobe=nprobe,
                         n_valid=n).indices
            )
            recall = float(np.mean([
                len(set(g) & set(w)) / 10.0
                for g, w in zip(got.tolist(), dense_ids.tolist())
            ]))
            results[f"{label}_np{nprobe}_recall10"] = round(recall, 4)
            line.append(f"np{nprobe}={recall:.3f}")
        print("  ".join(line), file=sys.stderr, flush=True)
        del xd, state

    print(json.dumps(results))


if __name__ == "__main__":
    main()
