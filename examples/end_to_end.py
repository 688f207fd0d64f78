"""End-to-end walkthrough: videos -> keyframes -> index -> search -> serve.

Run from the repo root (or with the package on PYTHONPATH):
    python examples/end_to_end.py /path/to/workdir video1.mp4 [video2.mp4 ...]

With no video arguments, a synthetic 3-scene clip is generated so the
example is runnable anywhere.
"""

import sys
from pathlib import Path

# make the example runnable as `python examples/<name>.py` from anywhere:
# `python path/to/script.py` puts the script's OWN directory on sys.path,
# not the repo root that holds the package
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_demo_video(path: Path) -> None:
    import cv2

    rng = np.random.default_rng(0)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25, (128, 128)
    )
    for _ in range(3):
        scene = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        for _ in range(30):
            writer.write(cv2.cvtColor(scene, cv2.COLOR_RGB2BGR))
    writer.release()


def main() -> None:
    workdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("ivars_demo")
    videos = [Path(v) for v in sys.argv[2:]]
    workdir.mkdir(parents=True, exist_ok=True)
    if not videos:
        demo = workdir / "demo.mp4"
        make_demo_video(demo)
        videos = [demo]

    from intelligent_video_analysis_retrieval_system_tpu import (
        Config,
        EnhancedRetrievalSystem,
        FrameFilter,
        SearchOptions,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ingest import (
        FrameFilterConfig,
    )

    # 1. extract keyframes (batched decode + streaming cosine dedup)
    ff = FrameFilter(FrameFilterConfig(frame_batch=64))
    for video in videos:
        report = ff.extract_frames(video, workdir / "keyframes", workdir / "map")
        print(f"extracted {report.frames_kept}/{report.frames_seen} frames "
              f"from {report.video}")

    # 2. build the index (chunked, checkpointed, resumable)
    config = Config(config_file=None, base_dir=workdir, create_dirs=True)
    system = EnhancedRetrievalSystem(config)
    out = system.build_system(workdir / "keyframes", map_dir=workdir / "map")
    print(f"indexed -> {out['index_path']}")

    # 3. search (translation built in; vi queries work offline)
    for query in ("a colorful scene", "người trên bãi biển"):
        results = system.search(query, SearchOptions(limit=3))
        print(f"query {query!r}:")
        for r in results:
            print(f"   #{r['rank']} {r['folder']}/{r['image']} "
                  f"score={r['similarity_score']:.3f}")

    # 4. serve (uncomment to start the web console on :5000)
    # system.start_server(port=5000, block=True)
    system.cleanup()


if __name__ == "__main__":
    main()
