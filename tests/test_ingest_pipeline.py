"""Multi-process ingest pipeline tests: decision parity with the
sequential path, multi-video fan-out, phash prefilter, and failure
propagation."""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from intelligent_video_analysis_retrieval_system_tpu.ingest import (  # noqa: E402
    FrameFilter,
    FrameFilterConfig,
)


def make_video(path: Path, n_scenes: int = 4, frames_per_scene: int = 40,
               size: int = 64, seed: int = 0) -> int:
    """Synthetic MP4: static scenes with small per-frame noise (dedup keeps
    ~1 frame/scene) — same recipe the verify skill uses."""
    rng = np.random.default_rng(seed)
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25, (size, size)
    )
    total = 0
    for scene in range(n_scenes):
        base = rng.integers(0, 200, (size, size, 3)).astype(np.uint8)
        for _ in range(frames_per_scene):
            noise = rng.integers(0, 3, base.shape).astype(np.uint8)
            w.write(cv2.add(base, noise))
            total += 1
    w.release()
    return total


def _tree_digest(root: Path) -> dict[str, str]:
    """Relative path -> sha256 of every file under root."""
    out = {}
    for p in sorted(root.rglob("*")):
        if p.is_file():
            out[str(p.relative_to(root))] = hashlib.sha256(
                p.read_bytes()
            ).hexdigest()
    return out


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    paths = []
    for i in range(3):
        p = d / f"vid{i}.mp4"
        make_video(p, n_scenes=3 + i, frames_per_scene=30, seed=i)
        paths.append(p)
    return paths


class TestParallelExtract:
    def test_identical_to_sequential(self, videos, tmp_path):
        cfg = FrameFilterConfig(frame_batch=32, dedup_resize=32)
        seq_dir, par_dir = tmp_path / "seq", tmp_path / "par"
        ff = FrameFilter(cfg)
        seq_reports = ff.extract_frames_batch(
            videos, seq_dir / "keyframes", seq_dir / "map", workers=0
        )
        par_reports = ff.extract_frames_batch(
            videos, par_dir / "keyframes", par_dir / "map", workers=2
        )
        assert len(par_reports) == len(seq_reports) == 3
        for s, p in zip(seq_reports, par_reports):
            assert (s.video, s.frames_seen, s.frames_kept) == (
                p.video, p.frames_seen, p.frames_kept
            )
        # the decisions AND encoded bytes must match exactly
        assert _tree_digest(seq_dir) == _tree_digest(par_dir)
        # sanity: dedup actually dropped most frames
        assert all(r.frames_kept < r.frames_seen // 4 for r in seq_reports)

    def test_identical_with_phash(self, videos, tmp_path):
        cfg = FrameFilterConfig(
            frame_batch=32, dedup_resize=32, use_phash_prefilter=True
        )
        ff = FrameFilter(cfg)
        seq_dir, par_dir = tmp_path / "seq", tmp_path / "par"
        seq = ff.extract_frames_batch(
            videos[:2], seq_dir / "kf", seq_dir / "map", workers=0
        )
        par = ff.extract_frames_batch(
            videos[:2], par_dir / "kf", par_dir / "map", workers=2
        )
        for s, p in zip(seq, par):
            assert s.frames_kept == p.frames_kept
            assert s.phash_dropped == p.phash_dropped
        assert _tree_digest(seq_dir / "kf") == _tree_digest(par_dir / "kf")

    def test_more_workers_than_videos(self, videos, tmp_path):
        cfg = FrameFilterConfig(frame_batch=32, dedup_resize=32)
        ff = FrameFilter(cfg)
        reports = ff.extract_frames_batch(
            videos[:2], tmp_path / "kf", tmp_path / "map", workers=8
        )
        assert len(reports) == 2
        assert all(r.frames_kept >= 1 for r in reports)

    def test_bad_video_raises_after_finishing_rest(self, videos, tmp_path):
        bogus = tmp_path / "broken.mp4"
        bogus.write_bytes(b"not a video at all")
        cfg = FrameFilterConfig(frame_batch=32, dedup_resize=32)
        ff = FrameFilter(cfg)
        with pytest.raises(RuntimeError, match="broken"):
            ff.extract_frames_batch(
                [videos[0], bogus], tmp_path / "kf", tmp_path / "map",
                workers=2,
            )
        # the good video still completed fully before the raise
        assert (tmp_path / "map" / "vid0.csv").exists()
        assert any((tmp_path / "kf" / "vid0").glob("*.jpg"))