"""IVF ANN latency-mode walkthrough: build -> probe sweep -> persistence.

The workflow for single-chip low-latency serving of very large corpora
(docs/SCALING.md §2): instead of the dense corpus sweep (HBM-bound, e.g.
~15 ms at 10M int8 rows on a v5e), an IVF structure probes a handful of
clusters per query (measured 2.5-7.4 ms at recall 0.995-1.0; see
RESULTS.md / benchmarks/exp_ivf_10m.py for the real-chip numbers).

1. build a clustered synthetic corpus straight into an ``IndexContainer``;
2. open it with ``index_type`` semantics (``UnifiedIndexConfig(ann=True)``)
   — the IVF builds on load and persists in the container's ``ann`` group;
3. sweep ``ann_nprobe`` and report recall@10 vs the exact dense path;
4. reopen with a DEFAULT config: the persisted structure restores without
   a rebuild (FAISS-like persisted index type).

Runs anywhere (forced CPU, synthetic corpus):
    python examples/ann_latency.py /tmp/workdir
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from intelligent_video_analysis_retrieval_system_tpu.index import (
        IndexContainer,
        UnifiedIndex,
        UnifiedIndexConfig,
    )

    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ivars_ann")
    workdir.mkdir(parents=True, exist_ok=True)
    path = workdir / "ann_demo.rvdb"
    path.unlink(missing_ok=True)

    # -- 1. clustered corpus (scenes -> nearby frames) ---------------------
    rng = np.random.default_rng(0)
    n, d, n_scenes = 50_000, 256, 400
    centers = rng.standard_normal((n_scenes, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_scenes, n)
    x = centers[assign] + (0.35 / d**0.5) * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    with IndexContainer(path, "w", dim=d, dtype="int8") as c:
        c.append_embeddings(x)
        c.append_metadata(
            [
                {"folder": f"scene{assign[i]:03d}", "image": f"{i}.jpg",
                 "frame_id": i, "row_id": i}
                for i in range(n)
            ]
        )
        c.flush_checkpoint()
    print(f"corpus: {n} rows x {d} dims, int8 container at {path}")

    # -- 2. open with ANN enabled (builds + persists) ----------------------
    t0 = time.perf_counter()
    idx = UnifiedIndex(
        UnifiedIndexConfig(ann=True, ann_nlist=512, ann_nprobe=32)
    ).load_unified_index(path, mode="a")
    print(f"load + IVF build: {time.perf_counter()-t0:.1f}s  "
          f"stats={idx.get_stats()['ann']}")

    # -- 3. nprobe sweep: latency is traffic, recall is coverage -----------
    q = x[rng.choice(n, 16, replace=False)] + (
        0.5 / d**0.5
    ) * rng.standard_normal((16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    exact = idx.search_vectors(q, top_k=10, exact=True)
    exact_ids = [{h.metadata.row_id for h in hits} for hits in exact]
    for nprobe in (4, 16, 64, 512):
        idx.config.ann_nprobe = nprobe
        got = idx.search_vectors(q, top_k=10)
        recall = np.mean(
            [
                len({h.metadata.row_id for h in hits} & ids) / 10
                for hits, ids in zip(got, exact_ids)
            ]
        )
        note = "  <- exact by construction" if nprobe == 512 else ""
        print(f"  nprobe={nprobe:4d}/512: recall@10 = {recall:.3f}{note}")
    idx.close()

    # -- 4. persistence: reopen with a default config ----------------------
    re = UnifiedIndex().load_unified_index(path)
    assert re.ann_active, "persisted ANN should restore"
    print(f"reopened with default config: ann_active={re.ann_active} "
          f"(no rebuild — restored from the container's 'ann' group)")
    re.close()


if __name__ == "__main__":
    main()
