"""Ingest tests: video reader, extraction with dedup, filter refinement."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from PIL import Image

from intelligent_video_analysis_retrieval_system_tpu.ingest import (
    FrameFilter,
    FrameFilterConfig,
    VideoReader,
    probe_video,
)


def write_scene_video(path, scenes=3, frames_per_scene=20, size=64, fps=25.0):
    """Synthetic MP4: static distinct scenes (dedup should keep ~1/scene)."""
    rng = np.random.default_rng(7)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size)
    )
    scene_images = []
    for s in range(scenes):
        img = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
        scene_images.append(img)
        for _ in range(frames_per_scene):
            writer.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    writer.release()
    return scene_images


class TestVideoReader:
    def test_probe(self, tmp_path):
        write_scene_video(tmp_path / "v.mp4", scenes=2, frames_per_scene=10)
        info = probe_video(tmp_path / "v.mp4")
        assert info.frame_count == 20
        assert info.fps == pytest.approx(25.0)
        assert info.width == 64

    def test_batched_iteration(self, tmp_path):
        write_scene_video(tmp_path / "v.mp4", scenes=2, frames_per_scene=10)
        reader = VideoReader(tmp_path / "v.mp4", batch_size=8)
        batches = list(reader)
        assert sum(len(b[1]) for b in batches) == 20
        assert batches[0][1].shape == (8, 64, 64, 3)
        np.testing.assert_array_equal(batches[0][0], np.arange(8))

    def test_sampling(self, tmp_path):
        write_scene_video(tmp_path / "v.mp4", scenes=1, frames_per_scene=20)
        reader = VideoReader(tmp_path / "v.mp4", batch_size=64, sample_every=5)
        indices, frames = next(iter(reader))
        assert list(indices) == [0, 5, 10, 15]

    def test_missing_file(self, tmp_path):
        with pytest.raises(IOError):
            probe_video(tmp_path / "nope.mp4")


class TestExtract:
    def test_dedup_keeps_one_per_scene(self, tmp_path):
        write_scene_video(tmp_path / "clip.mp4", scenes=3, frames_per_scene=20)
        ff = FrameFilter(FrameFilterConfig(frame_batch=16))
        report = ff.extract_frames(
            tmp_path / "clip.mp4", tmp_path / "keyframes", tmp_path / "map"
        )
        assert report.frames_seen == 60
        # lossy encode jitters identical frames slightly; dedup threshold
        # 0.98 must still collapse each static scene to ~1 keyframe
        assert 3 <= report.frames_kept <= 6
        kept = list((tmp_path / "keyframes" / "clip").glob("*.jpg"))
        assert len(kept) == report.frames_kept

    def test_map_csv_schema(self, tmp_path):
        write_scene_video(tmp_path / "clip.mp4", scenes=2, frames_per_scene=15)
        ff = FrameFilter(FrameFilterConfig(frame_batch=16))
        ff.extract_frames(tmp_path / "clip.mp4", tmp_path / "keyframes",
                          tmp_path / "map")
        text = (tmp_path / "map" / "clip.csv").read_text()
        assert text.splitlines()[0] == "n,pts_time,fps,frame_idx"
        from intelligent_video_analysis_retrieval_system_tpu.utils.files import (
            FileManager,
        )
        mapping = FileManager().load_csv_mapping(tmp_path / "map" / "clip.csv")
        assert 0 in mapping and mapping[0]["frame_idx"] == 0
        # second scene's keyframe maps to a real source frame index
        assert any(v["frame_idx"] >= 15 for v in mapping.values())

    def test_carry_across_batches(self, tmp_path):
        # batch smaller than scene length: a scene spanning batches must not
        # produce a duplicate keyframe at each batch start
        write_scene_video(tmp_path / "clip.mp4", scenes=2, frames_per_scene=30)
        ff = FrameFilter(FrameFilterConfig(frame_batch=8))
        report = ff.extract_frames(tmp_path / "clip.mp4", tmp_path / "kf",
                                   tmp_path / "map")
        assert report.frames_kept <= 4

    def test_phash_prefilter(self, tmp_path):
        write_scene_video(tmp_path / "clip.mp4", scenes=2, frames_per_scene=20)
        ff = FrameFilter(FrameFilterConfig(frame_batch=16,
                                           use_phash_prefilter=True))
        report = ff.extract_frames(tmp_path / "clip.mp4", tmp_path / "kf",
                                   tmp_path / "map")
        assert report.phash_dropped > 0
        assert report.frames_kept >= 2

    def test_batch_driver(self, tmp_path):
        for name in ("a", "b"):
            write_scene_video(tmp_path / f"{name}.mp4", scenes=1,
                              frames_per_scene=10)
        ff = FrameFilter(FrameFilterConfig(frame_batch=16))
        reports = ff.extract_frames_batch(
            [tmp_path / "a.mp4", tmp_path / "b.mp4"],
            tmp_path / "kf", tmp_path / "map",
        )
        assert len(reports) == 2
        assert (tmp_path / "kf" / "a").is_dir()
        assert (tmp_path / "kf" / "b").is_dir()

    def test_batch_driver_uniquifies_duplicate_stems(self, tmp_path):
        """Regression: same filename in two dirs must not share an output
        dir (the parallel path would interleave writes within one run)."""
        for sub in ("d1", "d2"):
            (tmp_path / sub).mkdir()
            write_scene_video(tmp_path / sub / "clip.mp4", scenes=1,
                              frames_per_scene=8)
        ff = FrameFilter(FrameFilterConfig(frame_batch=16))
        reports = ff.extract_frames_batch(
            [tmp_path / "d1" / "clip.mp4", tmp_path / "d2" / "clip.mp4"],
            tmp_path / "kf", tmp_path / "map",
        )
        assert len(reports) == 2
        assert (tmp_path / "kf" / "clip").is_dir()
        assert (tmp_path / "kf" / "clip_2").is_dir()
        assert (tmp_path / "map" / "clip.csv").is_file()
        assert (tmp_path / "map" / "clip_2.csv").is_file()


class TestApplyFilters:
    def _keyframes(self, root, blurry_count=2, sharp_count=8):
        rng = np.random.default_rng(3)
        folder = root / "keyframes" / "vid"
        folder.mkdir(parents=True)
        n = 0
        for _ in range(sharp_count):
            arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
            n += 1
        for _ in range(blurry_count):
            arr = np.full((64, 64, 3), 128, np.uint8)  # flat = blurry + no edges
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
            n += 1
        return root / "keyframes"

    def test_quality_drop(self, tmp_path):
        kf = self._keyframes(tmp_path)
        ff = FrameFilter(FrameFilterConfig(blur_drop_percentile=15.0,
                                           edge_drop_percentile=15.0,
                                           in_scene_similarity=1.1))
        report = ff.apply_filters(kf, output_dir=tmp_path / "out")
        assert report.dropped_quality >= 2
        assert report.frames_out < report.frames_in
        assert (tmp_path / "out" / "vid").is_dir()

    def test_similarity_drop(self, tmp_path):
        rng = np.random.default_rng(5)
        folder = tmp_path / "keyframes" / "vid"
        folder.mkdir(parents=True)
        base = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        for n in range(4):  # 4 near-identical frames
            jitter = np.clip(base.astype(int) + rng.integers(-2, 3, base.shape),
                             0, 255).astype(np.uint8)
            Image.fromarray(jitter).save(folder / f"{n}.jpg", quality=95)
        ff = FrameFilter(FrameFilterConfig.similarity_only())
        report = ff.apply_filters(tmp_path / "keyframes",
                                  output_dir=tmp_path / "out")
        assert report.dropped_similarity >= 2
        assert report.per_folder["vid"]["out"] < 4

    def test_in_place_deletes(self, tmp_path):
        kf = self._keyframes(tmp_path)
        ff = FrameFilter(FrameFilterConfig(blur_drop_percentile=15.0,
                                           edge_drop_percentile=15.0,
                                           in_scene_similarity=1.1))
        before = len(list((kf / "vid").glob("*.jpg")))
        report = ff.apply_filters(kf)  # in place
        after = len(list((kf / "vid").glob("*.jpg")))
        assert after == report.frames_out < before

    def test_map_rewritten(self, tmp_path):
        kf = self._keyframes(tmp_path)
        mp = tmp_path / "map"
        mp.mkdir()
        lines = ["n,pts_time,fps,frame_idx"] + [
            f"{n},{n*0.5},25,{n*12}" for n in range(10)
        ]
        (mp / "vid.csv").write_text("\n".join(lines))
        ff = FrameFilter(FrameFilterConfig(blur_drop_percentile=15.0,
                                           edge_drop_percentile=15.0,
                                           in_scene_similarity=1.1))
        report = ff.apply_filters(kf, output_dir=tmp_path / "out", map_dir=mp,
                                  output_map_dir=tmp_path / "outmap")
        from intelligent_video_analysis_retrieval_system_tpu.utils.files import (
            FileManager,
        )
        new_map = FileManager().load_csv_mapping(tmp_path / "outmap" / "vid.csv")
        assert len(new_map) == report.frames_out

    def test_presets(self):
        assert FrameFilterConfig.gentle().blur_drop_percentile == 5.0
        assert FrameFilterConfig.ultra_gentle().blur_drop_percentile == 2.0
        assert FrameFilterConfig.similarity_only().blur_drop_percentile == 0.0


class TestDINOEmbedder:
    def test_dino_embedder_dedup_flow(self, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.ingest.frames import (
            dino_embedder,
        )

        embed = dino_embedder(dtype="float32")
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
        near = np.clip(base.astype(int) + rng.integers(-2, 3, base.shape),
                       0, 255).astype(np.uint8)
        far = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
        emb = embed(np.stack([base, near, far]))
        assert emb.shape == (3, 384)
        emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        assert emb[0] @ emb[1] > 0.99 > emb[0] @ emb[2]

    def test_dino_in_frame_filter(self, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.ingest.frames import (
            dino_embedder,
        )

        write_scene_video(tmp_path / "v.mp4", scenes=2, frames_per_scene=10)
        ff = FrameFilter(FrameFilterConfig(frame_batch=8),
                         embed_fn=dino_embedder(dtype="float32"))
        report = ff.extract_frames(tmp_path / "v.mp4", tmp_path / "kf",
                                   tmp_path / "map")
        assert 2 <= report.frames_kept <= 4


class TestClusterDedup:
    def test_cluster_representatives_mask(self):
        from intelligent_video_analysis_retrieval_system_tpu.ops.dedup import (
            cluster_representatives_mask,
        )

        rng = np.random.default_rng(0)
        a = rng.standard_normal(32).astype(np.float32)
        b = rng.standard_normal(32).astype(np.float32)
        cluster_a = np.stack([a + 0.001 * rng.standard_normal(32) for _ in range(4)])
        cluster_b = np.stack([b + 0.001 * rng.standard_normal(32) for _ in range(3)])
        emb = np.concatenate([cluster_a, cluster_b]).astype(np.float32)
        keep = cluster_representatives_mask(emb, eps=0.05)
        # exactly one representative per cluster
        assert keep[:4].sum() == 1
        assert keep[4:].sum() == 1

    def test_singletons_kept(self):
        from intelligent_video_analysis_retrieval_system_tpu.ops.dedup import (
            cluster_representatives_mask,
        )

        rng = np.random.default_rng(1)
        emb = rng.standard_normal((5, 32)).astype(np.float32)  # all distinct
        keep = cluster_representatives_mask(emb, eps=0.05)
        assert keep.all()
        assert cluster_representatives_mask(np.zeros((0, 8), np.float32)).shape == (0,)

    def test_apply_filters_clustering_mode(self, tmp_path):
        rng = np.random.default_rng(5)
        folder = tmp_path / "keyframes" / "vid"
        folder.mkdir(parents=True)
        base = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        for n in range(5):  # 5 near-identical frames = one cluster
            jitter = np.clip(base.astype(int) + rng.integers(-2, 3, base.shape),
                             0, 255).astype(np.uint8)
            Image.fromarray(jitter).save(folder / f"{n}.jpg", quality=95)
        other = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(other).save(folder / "5.jpg", quality=95)
        ff = FrameFilter(FrameFilterConfig(
            blur_drop_percentile=0.0, edge_drop_percentile=0.0,
            use_clustering=True, cluster_eps=0.1, scene_threshold=0.5,
        ))
        report = ff.apply_filters(tmp_path / "keyframes",
                                  output_dir=tmp_path / "out")
        # one representative for the cluster + the distinct frame
        assert report.per_folder["vid"]["out"] == 2
