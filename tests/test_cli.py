"""CLI + FastLoader tests. CLI subcommands run in-process via cli.main."""

import json
import threading
import time

import numpy as np
import pytest
from PIL import Image

cv2 = pytest.importorskip("cv2")

from intelligent_video_analysis_retrieval_system_tpu.cli import main as cli_main
from intelligent_video_analysis_retrieval_system_tpu.index import (
    FastLoader,
    RAGBuilder,
    UnifiedIndexConfig,
)
from intelligent_video_analysis_retrieval_system_tpu.utils.cache import CacheManager

DIM = 32


def fake_embed(batch):
    b, s = len(batch), batch.shape[1]
    g = batch.reshape(b, 4, s // 4, 4, s // 4, 3).mean(axis=(2, 4)).reshape(b, 48)
    g = g[:, :DIM].astype(np.float32) + 1e-3
    return g / np.linalg.norm(g, axis=-1, keepdims=True)


def write_video(path, scenes=2, frames=15):
    rng = np.random.default_rng(0)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
    for _ in range(scenes):
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        for _ in range(frames):
            w.write(img)
    w.release()


class TestCLI:
    def test_extract_filter_pipeline(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        write_video(tmp_path / "clip.mp4")
        rc = cli_main(["extract", str(tmp_path / "clip.mp4"),
                       "--keyframes-dir", "keyframes", "--map-dir", "map",
                       "--batch", "16"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "kept" in out
        assert (tmp_path / "keyframes" / "clip").is_dir()
        rc = cli_main(["filter", "keyframes", "--similarity-only"])
        assert rc == 0
        assert "folders" in capsys.readouterr().out

    def test_validate_command(self, capsys):
        rc = cli_main(["validate"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "ALL CHECKS PASSED" in out

    def test_doctor_command(self, capsys):
        rc = cli_main(["doctor"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "network" in out and "checklist" in out

    def test_doctor_probe_failure(self, capsys):
        rc = cli_main(["doctor", "--probe", "127.0.0.1:1"])
        assert rc == 1
        assert "FAILED" in capsys.readouterr().out

    def test_stats_command(self, tmp_path, capsys):
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for n in range(4):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")
        builder = RAGBuilder(fake_embed, DIM, input_size=32,
                             config=UnifiedIndexConfig(dtype="float32"))
        index, _ = builder.build_index(tmp_path / "keyframes",
                                       tmp_path / "i.rvdb")
        index.close()
        rc = cli_main(["stats", str(tmp_path / "i.rvdb")])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out)
        assert stats["ntotal"] == 4

    def test_tune_command(self, tmp_path, capsys):
        """cli tune builds (--build), tunes nprobe + the crossover cap,
        and persists both; a default-config reopen serves with them."""
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            IndexContainer, UnifiedIndex,
        )

        rng = np.random.default_rng(3)
        cents = rng.standard_normal((16, 32)).astype(np.float32)
        x = cents[rng.integers(0, 16, 1024)] + 0.05 * rng.standard_normal(
            (1024, 32)
        ).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        path = tmp_path / "t.rvdb"
        with IndexContainer(path, "w", dim=32, dtype="float32") as c:
            c.append_embeddings(x)
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                 for i in range(len(x))]
            )
            c.flush_checkpoint()
        rc = cli_main(["tune", str(path), "--target-recall", "0.9",
                       "--build"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "nprobe=" in out and "ann_max_batch=" in out
        re = UnifiedIndex().load_unified_index(path)
        assert re.ann_active and re._ann_crossover_measured
        re.close()
        # without --build on an ANN-less index: actionable failure
        with IndexContainer(tmp_path / "n.rvdb", "w", dim=32,
                            dtype="float32") as c:
            c.append_embeddings(x[:64])
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                 for i in range(64)]
            )
            c.flush_checkpoint()
        rc = cli_main(["tune", str(tmp_path / "n.rvdb")])
        assert rc == 1
        assert "--build" in capsys.readouterr().out

    def test_unknown_command_exits(self):
        with pytest.raises(SystemExit):
            cli_main(["not-a-command"])


class TestFastLoader:
    def _build(self, tmp_path, n=40):
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        rng = np.random.default_rng(1)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{i}.jpg")
        builder = RAGBuilder(fake_embed, DIM, input_size=32,
                             config=UnifiedIndexConfig(dtype="float32"))
        index, _ = builder.build_index(tmp_path / "keyframes",
                                       tmp_path / "i.rvdb")
        index.close()
        return tmp_path / "i.rvdb"

    def test_load_with_cache_roundtrip(self, tmp_path):
        path = self._build(tmp_path)
        cache = CacheManager(cache_dir=tmp_path / ".cache")
        loader = FastLoader(cache=cache,
                            config=UnifiedIndexConfig(dtype="float32"))
        idx1 = loader.load_with_cache(path)
        assert idx1.ntotal == 40
        idx1.close()
        # second open hits the metadata cache
        idx2 = loader.load_with_cache(path)
        assert idx2.ntotal == 40
        assert idx2.load_time_s == 0.0  # cache-path marker
        hits = idx2.search(np.ones(DIM, np.float32), top_k=3)
        assert len(hits) == 3
        idx2.close()

    def test_cache_invalidated_on_change(self, tmp_path):
        path = self._build(tmp_path)
        cache = CacheManager(cache_dir=tmp_path / ".cache")
        loader = FastLoader(cache=cache,
                            config=UnifiedIndexConfig(dtype="float32"))
        loader.load_with_cache(path).close()
        time.sleep(0.02)
        path.touch()  # mtime change -> new cache key -> full parse
        idx = loader.load_with_cache(path)
        assert idx.load_time_s != 0.0
        idx.close()

    def test_progressive_load_search_during(self, tmp_path):
        path = self._build(tmp_path, n=60)
        progress = []
        loader = FastLoader(config=UnifiedIndexConfig(dtype="float32"))
        index, thread = loader.progressive_load(
            path, chunk_rows=16,
            on_progress=lambda done, total: progress.append((done, total)),
        )
        thread.join(timeout=30)
        assert index.ntotal == 60
        assert progress[-1] == (60, 60)
        assert len(progress) >= 4  # chunked
        hits = index.search(np.ones(DIM, np.float32), top_k=5)
        assert len(hits) == 5
        index.close()


class TestCLIInt8AndFlags:
    def test_build_int8_and_search(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(0)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(4):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")
        # note: CLI build uses the real (random-init) CLIP; keep it tiny by
        # just checking the int8 dtype plumbs through the stats output
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            RAGBuilder,
            UnifiedIndexConfig,
        )

        builder = RAGBuilder(fake_embed, DIM, input_size=32,
                             config=UnifiedIndexConfig(dtype="int8",
                                                       thumbnail_size=32))
        index, _ = builder.build_index(kf.parent, tmp_path / "q.rvdb")
        index.close()
        rc = cli_main(["stats", str(tmp_path / "q.rvdb")])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out)
        assert stats["container"]["dtype"] == "int8"

    def test_filter_cluster_flag(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(1)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        base = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
        for n in range(4):
            Image.fromarray(np.clip(base + rng.integers(-2, 3, base.shape),
                                    0, 255).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")
        rc = cli_main(["filter", "keyframes", "--similarity-only",
                       "--cluster"])
        assert rc == 0


class TestCLIMeshFlag:
    def test_search_with_mesh_flag(self, tmp_path, monkeypatch, capsys):
        import jax

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(0)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(6):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")
        builder = RAGBuilder(fake_embed, DIM, input_size=32,
                             config=UnifiedIndexConfig(dtype="float32",
                                                       thumbnail_size=32))
        index, _ = builder.build_index(tmp_path / "keyframes",
                                       tmp_path / "m.rvdb")
        index.close()
        # the CLI search path embeds the query with the real (tiny) CLIP is
        # too slow here; drive _make_system + load directly for the mesh wiring
        from intelligent_video_analysis_retrieval_system_tpu.cli import (
            _make_system,
        )

        system = _make_system(None, mesh=True)
        system.load_system(tmp_path / "m.rvdb")
        assert system.index._sharded is not None
        assert system.index._sharded.stats()["devices"] == jax.device_count()
        hits = system.index.search(np.ones(DIM, np.float32), top_k=3)
        assert len(hits) == 3
        system.cleanup()


class TestComputeDtypeFlag:
    def test_make_system_plumbs_compute_dtype(self, tmp_path, monkeypatch):
        """--compute-dtype sets device.compute_dtype (tower mode) while
        --dtype stays the INDEX row dtype — the two must not be conflated
        (regression: int8_static briefly leaked into the index choices)."""
        monkeypatch.chdir(tmp_path)
        from intelligent_video_analysis_retrieval_system_tpu.cli import (
            _build_parser,
            _make_system,
        )

        system = _make_system(None, dtype="int8",
                              compute_dtype="int8_static")
        assert system.config.get("index.dtype") == "int8"
        assert system.config.get("device.compute_dtype") == "int8_static"
        assert system.embedder.compute_dtype == "int8_static"

        parser = _build_parser()
        args = parser.parse_args(
            ["build", "kf", "--dtype", "int8",
             "--compute-dtype", "int8_static"]
        )
        assert args.dtype == "int8"
        assert args.compute_dtype == "int8_static"
        # int8_static is a tower mode, not an index storage dtype
        import pytest as _pytest

        with _pytest.raises(SystemExit):
            parser.parse_args(["build", "kf", "--dtype", "int8_static"])


class TestEvaluateCommand:
    def test_evaluate_int8_index(self, tmp_path, monkeypatch, capsys):
        """`evaluate` reports device-backend quality vs the f32 oracle —
        for an int8 index this measures the real quantization cost on the
        user's own corpus."""
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(5)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(30):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            RAGBuilder,
            UnifiedIndexConfig,
        )

        builder = RAGBuilder(fake_embed, DIM, input_size=32,
                             config=UnifiedIndexConfig(dtype="int8",
                                                       thumbnail_size=32))
        index, _ = builder.build_index(kf.parent, tmp_path / "e.rvdb")
        index.close()
        rc = cli_main(["evaluate", str(tmp_path / "e.rvdb"),
                       "--queries", "16", "--top-k", "5"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["dtype"] == "int8" and out["rows"] == 30
        assert out["queries"] == 16 and out["k"] == 5
        assert out["recall_at_k"] > 0.8          # int8 on random data
        assert 0.0 <= out["overlap_at_k"] <= 1.0

    def test_evaluate_tune_nprobe(self, tmp_path, monkeypatch, capsys):
        """--tune-nprobe RECALL auto-picks nprobe (implies --search ann)
        and reports the tested ladder in the JSON output."""
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(6)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(40):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            RAGBuilder,
            UnifiedIndexConfig,
        )

        builder = RAGBuilder(fake_embed, DIM, input_size=32,
                             config=UnifiedIndexConfig(thumbnail_size=32))
        index, _ = builder.build_index(kf.parent, tmp_path / "t.rvdb")
        index.close()
        rc = cli_main(["evaluate", str(tmp_path / "t.rvdb"),
                       "--queries", "8", "--top-k", "3",
                       "--tune-nprobe", "0.9"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["search"] == "ann"
        tuned = out["tuned"]
        assert tuned["target"] == 0.9 and tuned["ladder"]
        assert tuned["nprobe"] == tuned["ladder"][-1][0]
