"""Production serving recipe: open an index, pre-warm, serve, query.

    python examples/serve_production.py [index.rvdb]

Demonstrates the round-3 serving lessons (RESULTS.md "Serving note"):

1. **Pre-warm text-encode buckets before accepting traffic** — the first
   compile of each batch-size bucket otherwise lands on live requests
   (30-60 s on TPU) and can blow the QueryBatcher's per-request timeout.
2. **QueryBatcher on** (``api.batching``): concurrent ``/api/search``
   requests aggregate into ONE device program per window.
3. **Wide request executor** (``api.executor_workers``): batched-search
   request threads spend their life blocked on an event, not computing,
   so the pool must be much wider than the core count or the batcher
   starves (asyncio's default executor is cpus+4 threads).

Runs self-contained: with no argument it builds a tiny demo index first
(CPU-friendly), then serves it and fires a few queries.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_demo_index(root: Path):
    import numpy as np
    from PIL import Image

    from intelligent_video_analysis_retrieval_system_tpu.models import (
        CLIPConfig,
    )
    from intelligent_video_analysis_retrieval_system_tpu.system import (
        CLIPEmbedder,
        EnhancedRetrievalSystem,
    )
    from intelligent_video_analysis_retrieval_system_tpu.utils.config import (
        Config,
    )

    rng = np.random.default_rng(0)
    for f in range(2):
        folder = root / "keyframes" / f"vid{f}"
        folder.mkdir(parents=True, exist_ok=True)
        for n in range(8):
            arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
    cfg = Config(
        config_file=None, base_dir=root, create_dirs=True,
        overrides={
            "index": {"dtype": "bfloat16", "thumbnail_size": 32},
            "api": {"batching": True, "batching_window_ms": 3.0,
                    "executor_workers": 128},
        },
    )
    system = EnhancedRetrievalSystem(
        cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                   compute_dtype="float32"),
    )
    system.build_system(root / "keyframes")
    return system


def main() -> None:
    import tempfile
    import urllib.request
    import json

    root = Path(tempfile.mkdtemp(prefix="ivars_serve_demo_"))
    if len(sys.argv) > 1:
        from intelligent_video_analysis_retrieval_system_tpu.system import (
            EnhancedRetrievalSystem,
        )
        from intelligent_video_analysis_retrieval_system_tpu.utils.config import (
            Config,
        )

        cfg = Config(config_file=None, base_dir=root, create_dirs=True,
                     overrides={"api": {"batching": True,
                                        "executor_workers": 128}})
        system = EnhancedRetrievalSystem(cfg)
        system.load_system(sys.argv[1])
    else:
        print("no index given - building a tiny demo index...")
        system = build_demo_index(root)

    # 1. pre-warm the buckets the load pattern will hit — ENCODE and
    # SEARCH both: the batcher can form any batch size up to its max, and
    # an unwarmed search bucket compiling on a live request reads as a
    # multi-second p95 stall
    print("pre-warming text-encode + search buckets...")
    t0 = time.perf_counter()
    for b in (1, 32, 64):
        system.embedder.encode_text([f"warm {i}" for i in range(b)])
    if system.index is not None and system.index.ntotal:
        for b in (1, 9, 17, 33):   # DENSE search b-buckets 8/16/32/64
            qv = system.embedder.encode_text(
                [f"warm s{i}" for i in range(b)]
            )
            # exact=True: with ANN active, small batches would otherwise
            # route down the ANN path and leave the dense buckets cold
            system.index.search_vectors(qv, top_k=10, exact=True)
        if system.index.ann_active:
            b = 1  # ANN b-buckets are powers of two up to ann_max_batch
            while True:
                qv = system.embedder.encode_text(
                    [f"warm a{i}" for i in range(b)]
                )
                system.index.search_vectors(qv, top_k=10)
                if b >= max(system.index.config.ann_max_batch, 1):
                    break
                b *= 2
    print(f"buckets warm in {time.perf_counter() - t0:.1f}s")

    # 2+3. serve (batching + wide executor come from the config above)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = system.start_server(host="127.0.0.1", port=port, block=False)
    base = f"http://127.0.0.1:{port}"
    print(f"serving on {base} (console at {base}/)")

    def post(path: str, payload: dict) -> dict:
        req = urllib.request.Request(
            base + path, json.dumps(payload).encode(),
            headers={"content-type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    out = post("/api/search", {"query": "a demo scene", "limit": 3})
    print(f"search: {out['count']} hits in {out['latency_ms']} ms")
    batch = post("/api/search_batch",
                 {"queries": ["scene one", "scene two"], "limit": 2})
    print(f"search_batch: {batch['count']} hits in {batch['latency_ms']} ms")
    stats = server.batcher.stats if server.batcher else None
    if stats:
        print(f"batcher: {stats.requests} requests in {stats.batches} batches")
    server.stop()
    system.cleanup()
    print("done")


if __name__ == "__main__":
    main()
