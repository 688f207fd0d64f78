"""Tests for the foundation layer (config, cache, files, perf, paths)."""

import json
import time

import numpy as np
import pytest

import intelligent_video_analysis_retrieval_system_tpu as ivt
from intelligent_video_analysis_retrieval_system_tpu.utils.cache import CacheManager
from intelligent_video_analysis_retrieval_system_tpu.utils.config import Config
from intelligent_video_analysis_retrieval_system_tpu.utils.dataproc import DataProcessor
from intelligent_video_analysis_retrieval_system_tpu.utils.files import FileManager, natural_key
from intelligent_video_analysis_retrieval_system_tpu.utils.paths import SmartPathResolver
from intelligent_video_analysis_retrieval_system_tpu.utils.perf import PerformanceMonitor


class TestConfig:
    def test_defaults(self):
        cfg = Config(config_file=None)
        assert cfg.get("retrieval.default_top_k") == 20
        assert cfg.get("device.compute_dtype") == "bfloat16"

    def test_json_merge_and_dotted_access(self, tmp_path):
        cfile = tmp_path / "config.json"
        cfile.write_text(json.dumps({"retrieval": {"default_top_k": 7}}))
        cfg = Config(config_file=cfile, base_dir=tmp_path)
        assert cfg.get("retrieval.default_top_k") == 7
        # untouched siblings survive the merge
        assert cfg.get("retrieval.max_top_k") == 1000
        cfg.set("api.port", 6000)
        assert cfg.get("api.port") == 6000

    def test_validation_autofix(self):
        cfg = Config(config_file=None, overrides={"retrieval": {"default_top_k": -5}})
        assert cfg.get("retrieval.default_top_k") == 20

    def test_quantized_compute_dtypes_survive_validation(self):
        # regression: the validator silently auto-reverted int8/int8_static
        # to bfloat16, breaking the documented config path for W8A8 towers
        for mode in ("int8", "int8_static"):
            cfg = Config(config_file=None,
                         overrides={"device": {"compute_dtype": mode}})
            assert cfg.get("device.compute_dtype") == mode
        bad = Config(config_file=None,
                     overrides={"device": {"compute_dtype": "int3"}})
        assert bad.get("device.compute_dtype") == "bfloat16"
        # the index has no static-scale variant — int8_static is towers-only
        idx = Config(config_file=None,
                     overrides={"index": {"dtype": "int8_static"}})
        assert idx.get("index.dtype") == "bfloat16"

    def test_cross_field_invariant(self):
        cfg = Config(
            config_file=None,
            overrides={"retrieval": {"default_top_k": 50, "max_top_k": 10}},
        )
        assert cfg.get("retrieval.default_top_k") <= cfg.get("retrieval.max_top_k")

    def test_paths_and_save(self, tmp_path):
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True)
        assert cfg.path("cache_dir").is_dir()
        saved = cfg.save(tmp_path / "out.json")
        assert json.loads(saved.read_text())["system"]["name"] == "IVARS-TPU"


class TestCache:
    def test_memory_roundtrip(self, tmp_path):
        cache = CacheManager(cache_dir=tmp_path)
        cache.set("k", {"a": 1})
        assert cache.get("k") == {"a": 1}
        assert cache.get_stats()["hits"] == 1

    def test_disk_tier_survives_memory_clear(self, tmp_path):
        cache = CacheManager(cache_dir=tmp_path)
        cache.set("k", [1, 2, 3])
        cache._mem.clear()
        cache.stats.bytes_used = 0
        assert cache.get("k") == [1, 2, 3]
        assert cache.get_stats()["disk_hits"] == 1

    def test_ndarray_roundtrip(self, tmp_path):
        cache = CacheManager(cache_dir=tmp_path)
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        cache.set("arr", arr)
        cache._mem.clear()
        cache.stats.bytes_used = 0
        got = cache.get("arr")
        np.testing.assert_array_equal(got, arr)

    def test_ttl_expiry(self, tmp_path):
        cache = CacheManager(cache_dir=tmp_path)
        cache.set("k", "v", ttl_s=0.01)
        time.sleep(0.05)
        assert cache.get("k", default="gone") == "gone"

    def test_lru_eviction_under_budget(self):
        cache = CacheManager(cache_dir=None, memory_budget_mb=1)
        big = np.zeros(200_000, dtype=np.float32)  # ~800KB
        cache.set("a", big)
        cache.set("b", big)  # must evict a
        assert cache.get("a") is None
        assert cache.get("b") is not None

    def test_query_helpers(self, tmp_path):
        cache = CacheManager(cache_dir=tmp_path)
        results = [{"folder": "v1", "image": "1.jpg", "similarity_score": 0.9}]
        cache.cache_query_results("cat", "clip_only", 10, results)
        assert cache.get_cached_results("cat", "clip_only", 10) == results
        assert cache.get_cached_results("cat", "hybrid", 10) is None


class TestFileManager:
    def test_natural_sort(self):
        names = ["kf10.jpg", "kf2.jpg", "kf1.jpg"]
        assert sorted(names, key=natural_key) == ["kf1.jpg", "kf2.jpg", "kf10.jpg"]

    def test_scan_keyframes(self, tmp_workspace):
        kf = tmp_workspace / "keyframes"
        (kf / "video1").mkdir()
        for n in (10, 2, 1):
            (kf / "video1" / f"{n}.jpg").write_bytes(b"x")
        (kf / "video1" / "notes.txt").write_bytes(b"x")
        (kf / "empty").mkdir()
        fm = FileManager()
        scanned = fm.scan_keyframes(kf)
        assert scanned == {"video1": ["1.jpg", "2.jpg", "10.jpg"]}

    def test_csv_mapping_with_header(self, tmp_workspace):
        csv_path = tmp_workspace / "map" / "video1.csv"
        csv_path.write_text("n,pts_time,fps,frame_idx\n0,0.0,25,0\n1,1.2,25,30\n")
        fm = FileManager()
        mapping = fm.load_csv_mapping(csv_path)
        assert mapping[1]["frame_idx"] == 30
        assert mapping[1]["pts_time"] == pytest.approx(1.2)

    def test_csv_mapping_headerless_and_aliases(self, tmp_workspace):
        headerless = tmp_workspace / "map" / "a.csv"
        headerless.write_text("0,0.0,25,0\n1,2.0,25,50\n")
        aliased = tmp_workspace / "map" / "b.csv"
        aliased.write_text("id,timestamp,frame_rate,frame\n3,9.9,30,297\n")
        fm = FileManager()
        assert fm.load_csv_mapping(headerless)[1]["frame_idx"] == 50
        assert fm.load_csv_mapping(aliased)[3]["frame_idx"] == 297

    def test_csv_roundtrip(self, tmp_workspace):
        fm = FileManager()
        rows = [{"n": 0, "pts_time": 0.5, "fps": 25.0, "frame_idx": 12}]
        path = tmp_workspace / "map" / "rt.csv"
        fm.save_csv_mapping(path, rows)
        assert fm.load_csv_mapping(path)[0]["frame_idx"] == 12

    def test_safe_write_atomic(self, tmp_workspace):
        fm = FileManager()
        target = tmp_workspace / "x" / "file.json"
        fm.safe_write(target, '{"ok": true}')
        assert json.loads(target.read_text())["ok"] is True
        assert not list(target.parent.glob("*.tmp*"))


class TestDataProcessor:
    def test_normalize(self):
        dp = DataProcessor()
        out = dp.normalize_features(np.array([[3.0, 4.0]]))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)
        assert dp.is_normalized(out)

    def test_merge_dedup_keeps_best(self):
        dp = DataProcessor()
        a = [{"folder": "v", "image": "1.jpg", "similarity_score": 0.5}]
        b = [
            {"folder": "v", "image": "1.jpg", "similarity_score": 0.9},
            {"folder": "v", "image": "2.jpg", "similarity_score": 0.7},
        ]
        merged = dp.merge_results([a, b])
        assert [m["image"] for m in merged] == ["1.jpg", "2.jpg"]
        assert merged[0]["similarity_score"] == 0.9

    def test_blend_weights(self):
        dp = DataProcessor()
        clip = [{"folder": "v", "image": "1.jpg", "similarity_score": 1.0}]
        llm = [{"folder": "v", "image": "1.jpg", "similarity_score": 0.0}]
        blended = dp.blend_results(clip, llm, 0.7, 0.3)
        assert blended[0]["similarity_score"] == pytest.approx(0.7)


class TestPerfMonitor:
    def test_timer_and_stats(self):
        pm = PerformanceMonitor(slow_op_threshold_s=0.001)
        with pm.timer("op"):
            time.sleep(0.005)
        stats = pm.get_stats("op")
        assert stats["count"] == 1
        assert stats["avg_s"] > 0
        assert pm.get_slow_operations()[0]["operation"] == "op"

    def test_error_accounting(self):
        pm = PerformanceMonitor()
        with pytest.raises(ValueError):
            with pm.timer("bad"):
                raise ValueError("x")
        assert pm.get_stats("bad")["errors"] == 1

    def test_explicit_timers(self):
        pm = PerformanceMonitor()
        pm.start_timer("x")
        assert pm.end_timer("x") >= 0
        assert pm.end_timer("never_started") == 0.0


class TestSmartPathResolver:
    def test_anchor_resolution(self, tmp_workspace, monkeypatch):
        kf = tmp_workspace / "keyframes" / "vid"
        kf.mkdir()
        (kf / "1.jpg").write_bytes(b"x")
        monkeypatch.chdir(tmp_workspace)
        resolver = SmartPathResolver()
        recorded = "C:/somewhere/else/keyframes/vid/1.jpg"
        resolved = resolver.resolve_portable_path(recorded)
        assert resolved is not None and resolved.name == "1.jpg"

    def test_registered_mapping(self, tmp_workspace):
        kf = tmp_workspace / "keyframes" / "vid"
        kf.mkdir()
        (kf / "1.jpg").write_bytes(b"x")
        resolver = SmartPathResolver()
        resolver.register_mapping("/old/root", tmp_workspace)
        got = resolver.resolve_portable_path("/old/root/keyframes/vid/1.jpg")
        assert got is not None and got.exists()

    def test_unresolvable_returns_none(self):
        resolver = SmartPathResolver()
        assert resolver.resolve_portable_path("/no/such/keyframes/x/1.jpg") is None


class TestLazyPackage:
    def test_public_symbols_resolve(self):
        assert ivt.Config is Config
        assert "FrameFilter" in dir(ivt)


class TestAgentCache:
    def test_agent_response_helpers(self, tmp_path):
        cache = CacheManager(cache_dir=tmp_path)
        cache.cache_agent_response("hello", {"response": "hi", "method": "agent"})
        assert cache.get_cached_agent_response("hello")["response"] == "hi"
        assert cache.get_cached_agent_response("other") is None


class TestLoggerRegistry:
    def test_get_logger_rebinds_on_new_logs_dir(self, tmp_path):
        """A second system in one process (new base dir) must not keep
        appending to — and crashing on — the first system's deleted logs
        dir (regression: multi-system lifecycle dryrun)."""
        from intelligent_video_analysis_retrieval_system_tpu.utils.logging import (
            get_logger,
        )

        a = tmp_path / "a" / "logs"
        b = tmp_path / "b" / "logs"
        la = get_logger("ivars-regtest", logs_dir=a)
        assert str(la.logs_dir) == str(a)
        # same dir -> cached instance
        assert get_logger("ivars-regtest", logs_dir=a) is la
        # no dir requested -> cached instance fine
        assert get_logger("ivars-regtest") is la
        # NEW dir -> rebuilt, writes under b
        lb = get_logger("ivars-regtest", logs_dir=b)
        assert lb is not la
        lb.info("hello")
        lb.log_performance("op", 0.01)
        assert (b / "performance.log").exists()


def test_unknown_override_section_warns(caplog, tmp_path):
    """create_system(storage={...}) when the schema key is paths.index_dir
    used to merge silently and no-op — a real debugging trap (round 5)."""
    import logging

    from intelligent_video_analysis_retrieval_system_tpu.utils.config import (
        Config,
    )

    # the package's logging setup flips propagate off once any test
    # configures it; caplog needs records to reach the root handler
    logger = logging.getLogger("ivars")
    old_prop = logger.propagate
    logger.propagate = True
    try:
        with caplog.at_level(logging.WARNING, logger="ivars"):
            Config(config_file=None,
                   overrides={"storage": {"index_dir": "x"}},
                   base_dir=tmp_path)
        assert any("storage" in r.message and "schema" in r.message
                   for r in caplog.records)
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="ivars"):
            Config(config_file=None, overrides={"paths": {"index_dir": "x"}},
                   base_dir=tmp_path)
        assert not any("schema" in r.message for r in caplog.records)
    finally:
        logger.propagate = old_prop
