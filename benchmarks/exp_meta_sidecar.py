"""Columnar metadata sidecar: open-time A/B (index/metacols.py).

Reproduces the RESULTS.md load-at-scale numbers: build an N-row container,
time the blob-path open (which writes the sidecar), then the sidecar open,
and assert record equality between the two views.

Host-CPU deterministic (forces the CPU backend in-process) — the work
measured is host-side storage/parse, not device math.

Usage: python benchmarks/exp_meta_sidecar.py [--rows 200000]
"""
from __future__ import annotations

import argparse
import json
import random
import sys
import tempfile
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from intelligent_video_analysis_retrieval_system_tpu.index.container import (
        IndexContainer,
    )
    from intelligent_video_analysis_retrieval_system_tpu.index.metacols import (
        ColumnarMetadata,
        sidecar_path,
    )
    from intelligent_video_analysis_retrieval_system_tpu.index.unified import (
        UnifiedIndex,
        UnifiedIndexConfig,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=32)
    args = ap.parse_args()
    n, d = args.rows, args.dim

    tmp = tempfile.mkdtemp(prefix="ivars_meta_sidecar_")
    path = f"{tmp}/m.rvdb"
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    c = IndexContainer(path, mode="w", dim=d, dtype="float32")
    chunk = 20_000
    for s in range(0, n, chunk):
        m = min(chunk, n - s)
        c.append_embeddings(rng.standard_normal((m, d), dtype=np.float32))
        c.append_metadata([
            {"folder": f"v{i % 97}", "image": f"{i:06d}.jpg",
             "frame_id": i, "pts_time": i * 0.5, "row_id": i,
             "path": f"/data/v{i % 97}/{i:06d}.jpg"}
            for i in range(s, s + m)
        ])
    c.flush_checkpoint()
    c.close()
    t_build = time.perf_counter() - t0
    log(f"built {n} rows in {t_build:.2f}s")

    t0 = time.perf_counter()
    idx = UnifiedIndex(UnifiedIndexConfig(dtype="float32"))
    idx.load_unified_index(path)
    t_blob = time.perf_counter() - t0
    assert isinstance(idx._metadata, list)
    sample = random.Random(1).sample(range(n), 200)
    blob_records = {i: idx._metadata[i] for i in sample}
    idx.close()
    assert sidecar_path(path).is_file(), "sidecar not written"

    t0 = time.perf_counter()
    idx2 = UnifiedIndex(UnifiedIndexConfig(dtype="float32"))
    idx2.load_unified_index(path)
    t_side = time.perf_counter() - t0
    assert isinstance(idx2._metadata, ColumnarMetadata)
    for i, rec in blob_records.items():
        assert idx2._metadata[i] == rec, i
    idx2.close()
    log(f"open: blob {t_blob:.2f}s -> sidecar {t_side:.3f}s "
        f"({t_blob / max(t_side, 1e-9):.0f}x); equality spot-checked")

    print(json.dumps({
        "rows": n,
        "build_s": round(t_build, 2),
        "open_blob_s": round(t_blob, 2),
        "open_sidecar_s": round(t_side, 3),
        "speedup_x": round(t_blob / max(t_side, 1e-9), 1),
    }))


if __name__ == "__main__":
    main()
