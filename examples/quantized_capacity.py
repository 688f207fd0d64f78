"""int8 capacity-mode walkthrough: build -> quality check -> batched serving.

Demonstrates the workflow docs/DEPLOYMENT.md prescribes for very large
corpora (~2x rows per chip vs bf16):

1. build an index with ``index.dtype="int8"`` (rows quantized per-row at
   write time, full build pipeline otherwise unchanged);
2. measure what the quantized metric costs on THIS corpus with the same
   machinery as ``ivars evaluate`` (recall@k vs an exact f32 oracle);
3. serve a batch of queries through ``search_batch`` (one tower forward +
   one sweep for the whole batch).

Runs anywhere (forced CPU, tiny synthetic corpus):
    python examples/quantized_capacity.py /tmp/workdir
"""

import sys
from pathlib import Path

# make the example runnable as `python examples/<name>.py` from anywhere
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from intelligent_video_analysis_retrieval_system_tpu.cli import main as cli
    from intelligent_video_analysis_retrieval_system_tpu.models import (
        CLIPConfig,
    )
    from intelligent_video_analysis_retrieval_system_tpu.system import (
        CLIPEmbedder,
        EnhancedRetrievalSystem,
        SearchOptions,
    )
    from intelligent_video_analysis_retrieval_system_tpu.utils.config import (
        Config,
    )

    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "quantized_demo")
    workdir.mkdir(parents=True, exist_ok=True)

    # -- tiny synthetic corpus ------------------------------------------------
    rng = np.random.default_rng(0)
    kf = workdir / "keyframes" / "demo"
    kf.mkdir(parents=True, exist_ok=True)
    for n in range(24):
        Image.fromarray(
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(kf / f"{n}.jpg", quality=92)

    # -- 1. build with int8 row storage --------------------------------------
    cfg = Config(
        config_file=None, base_dir=workdir, create_dirs=True,
        overrides={"index": {"dtype": "int8", "thumbnail_size": 32}},
    )
    system = EnhancedRetrievalSystem(
        cfg,
        embedder=CLIPEmbedder(config=CLIPConfig.tiny_test()),
    )
    out = system.build_system(workdir / "keyframes")
    index_path = out["index_path"]
    print(f"built int8 index: {index_path} "
          f"({out['report']['processed']} rows)")

    # -- 2. per-corpus quality gate (same as `ivars evaluate`) ----------------
    rc = cli(["evaluate", str(index_path), "--queries", "12", "--top-k", "5"])
    assert rc == 0

    # -- 3. batched serving path ----------------------------------------------
    batches = system.search_batch(
        ["a night scene", "a person walking", "red car"],
        SearchOptions(limit=3),
    )
    for query, hits in zip(("a night scene", "a person walking", "red car"),
                           batches):
        top = hits[0]["image"] if hits else "-"
        print(f"  {query!r}: top hit {top}")
    system.cleanup()
    print("done")


if __name__ == "__main__":
    main()
