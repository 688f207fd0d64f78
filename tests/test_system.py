"""System facade tests: build/load/search/chat/export/health on a tiny model."""

import numpy as np
import pytest
from PIL import Image

from intelligent_video_analysis_retrieval_system_tpu.models import CLIPConfig
from intelligent_video_analysis_retrieval_system_tpu.system import (
    CLIPEmbedder,
    EnhancedRetrievalSystem,
    SearchOptions,
)
from intelligent_video_analysis_retrieval_system_tpu.utils.config import Config


def tiny_embedder():
    return CLIPEmbedder(config=CLIPConfig.tiny_test(), compute_dtype="float32")


@pytest.fixture(scope="module")
def built_system(tmp_path_factory):
    """One shared built system (model init is the slow part)."""
    root = tmp_path_factory.mktemp("sys")
    rng = np.random.default_rng(11)
    for f in range(2):
        folder = root / "keyframes" / f"vid{f}"
        folder.mkdir(parents=True)
        for n in range(6):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
    (root / "map").mkdir()
    for f in range(2):
        lines = ["n,pts_time,fps,frame_idx"] + [
            f"{n},{n*0.4},25,{n*10}" for n in range(6)
        ]
        (root / "map" / f"vid{f}.csv").write_text("\n".join(lines))
    cfg = Config(
        config_file=None, base_dir=root, create_dirs=True,
        overrides={"index": {"chunk_size": 8, "dtype": "float32",
                             "thumbnail_size": 32}},
    )
    system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
    system.build_system(root / "keyframes", map_dir=root / "map")
    yield root, system
    system.cleanup()


class TestSearchOptions:
    def test_valid(self):
        SearchOptions(mode="hybrid", limit=100).validate()

    def test_invalid_mode(self):
        with pytest.raises(ValueError):
            SearchOptions(mode="banana").validate()

    def test_invalid_limit(self):
        with pytest.raises(ValueError):
            SearchOptions(limit=0).validate()
        with pytest.raises(ValueError):
            SearchOptions(limit=5000).validate()


class TestBuildAndSearch:
    def test_build_report(self, built_system):
        _, system = built_system
        assert system.is_built
        assert system.index.ntotal == 12

    def test_search_returns_ranked_dicts(self, built_system):
        _, system = built_system
        results = system.search("a red car", SearchOptions(limit=5))
        assert len(results) == 5
        assert results[0]["rank"] == 1
        scores = [r["similarity_score"] for r in results]
        assert scores == sorted(scores, reverse=True)

    def test_search_batch_matches_per_query(self, built_system):
        """search_batch (one tower forward + one sweep for the whole batch)
        must return exactly what per-query search returns, including cache
        interop, empty queries, and non-clip_only fallback."""
        _, system = built_system
        queries = ["a red car", "", "a photo of a dog", "a red car"]
        opts = SearchOptions(limit=4, use_cache=False)
        batched = system.search_batch(queries, opts)
        assert len(batched) == 4
        assert batched[1] == []
        for q, got in zip(queries, batched):
            if q:
                assert got == system.search(q, opts)
        # cache interop: a batch populates the cache per query; a later
        # per-query search with use_cache must hit it (and vice versa)
        copts = SearchOptions(limit=3)
        system.search("cache interop probe", copts)
        again = system.search_batch(["cache interop probe", "a blue boat"], copts)
        assert again[0] == system.search("cache interop probe", copts)
        assert again[1] == system.search("a blue boat", copts)
        # hybrid mode falls back to per-query search, same results
        hopts = SearchOptions(limit=3, mode="hybrid", use_cache=False)
        hb = system.search_batch(["a red car"], hopts)
        assert hb[0] == system.search("a red car", hopts)

    def test_all_modes_work(self, built_system):
        _, system = built_system
        for mode in ("clip_only", "llm_enhanced", "hybrid"):
            results = system.search(
                "person walking", SearchOptions(mode=mode, limit=3,
                                                use_cache=False)
            )
            assert len(results) == 3, mode

    def test_cache_hit(self, built_system):
        _, system = built_system
        a = system.search("cache me", SearchOptions(limit=3))
        hits_before = system.cache.get_stats()["hits"]
        b = system.search("cache me", SearchOptions(limit=3))
        assert a == b
        assert system.cache.get_stats()["hits"] > hits_before

    def test_folder_filter(self, built_system):
        _, system = built_system
        results = system.search(
            "anything", SearchOptions(limit=6, folder_filter="vid1",
                                      use_cache=False)
        )
        assert results and all(r["folder"] == "vid1" for r in results)

    def test_temporal_and_explanations(self, built_system):
        _, system = built_system
        results = system.search(
            "scene", SearchOptions(limit=2, include_temporal=True,
                                   include_explanations=True, use_cache=False)
        )
        assert "temporal_context" in results[0]
        assert "visual match" in results[0]["explanation"]

    def test_vietnamese_query_translates(self, built_system):
        _, system = built_system
        results = system.search("người đang chạy", SearchOptions(limit=3))
        assert len(results) == 3  # translated prompt encoded + searched

    def test_search_by_image_selfmatch(self, built_system):
        root, system = built_system
        path = root / "keyframes" / "vid1" / "3.jpg"
        results = system.search_by_image(path, SearchOptions(limit=3))
        assert results[0]["folder"] == "vid1"
        assert results[0]["image"] == "3.jpg"
        assert results[0]["similarity_score"] > 0.9

    def test_empty_query_empty_results(self, built_system):
        _, system = built_system
        assert system.search("   ") == []

    def test_search_never_raises_without_index(self, tmp_path):
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True)
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        assert system.search("anything") == []


class TestLoadAndPersistence:
    def test_load_system_roundtrip(self, built_system, tmp_path):
        root, system = built_system
        index_path = root / "index" / "index.rvdb"
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"dtype": "float32"}})
        fresh = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        fresh.load_system(index_path)
        assert fresh.index.ntotal == 12
        results = fresh.search("test", SearchOptions(limit=2))
        assert len(results) == 2
        fresh.cleanup()

    def test_portable_roundtrip(self, built_system, tmp_path):
        root, system = built_system
        pkg = system.export_portable_index(tmp_path / "pkg")
        cfg = Config(config_file=None, base_dir=tmp_path / "dst",
                     create_dirs=True)
        dst = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        dst.load_portable_index(pkg)
        assert dst.index.ntotal == 12
        dst.cleanup()


class TestChat:
    def test_greeting_shortcircuit(self, built_system):
        _, system = built_system
        out = system.chat("hello")
        assert out["method"] == "greeting"

    def test_chat_search_fallback(self, built_system):
        _, system = built_system
        out = system.chat("find a person on the beach")
        assert out["method"] == "search"
        assert "search_results" in out

    def test_chat_search_no_results_message(self, tmp_path):
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True)
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        out = system.chat_search("anything")
        assert "couldn't find" in out["response"]


class TestExport:
    def test_json_csv_export(self, built_system, tmp_path):
        _, system = built_system
        results = system.search("export", SearchOptions(limit=3))
        j = system.export_data(results, tmp_path / "out.json")
        c = system.export_data(results, tmp_path / "out.csv")
        import json

        assert len(json.loads(j.read_text())) == 3
        assert "folder" in c.read_text().splitlines()[0]

    def test_xlsx_export(self, built_system, tmp_path):
        pytest.importorskip("openpyxl")
        _, system = built_system
        results = system.search("export", SearchOptions(limit=2))
        x = system.export_data(results, tmp_path / "out.xlsx")
        assert x.stat().st_size > 0

    def test_bad_format(self, built_system, tmp_path):
        _, system = built_system
        with pytest.raises(ValueError):
            system.export_data([], tmp_path / "out.parquet")


class TestHealthAndStats:
    def test_healthy_after_build(self, built_system):
        _, system = built_system
        report = system.health.comprehensive_health_check()
        assert report["overall"] in ("healthy", "warning")  # random init warns
        assert report["components"]["index"]["status"] == "ok"
        assert report["components"]["consistency"]["status"] == "ok"

    def test_error_without_index(self, tmp_path):
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True)
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        report = system.health.comprehensive_health_check()
        assert report["overall"] == "error"
        assert report["recovery_options"]

    def test_stats_shape(self, built_system):
        _, system = built_system
        stats = system.get_system_stats()
        assert stats["built"]
        assert stats["index"]["ntotal"] == 12
        assert "performance" in stats

    def test_optimize(self, built_system):
        _, system = built_system
        out = system.optimize()
        assert "cache" in out


class TestEmbedder:
    def test_vocab_dir_config_upgrades_tokenizer(self, tmp_path):
        """model.vocab_dir in the facade config must reach the embedder:
        dropping merges.txt in upgrades a deployment from the hash
        fallback to the real CLIP BPE without a weight checkpoint
        (VERDICT r3 #3; reference tokenizer semantics core.py:1504)."""
        from intelligent_video_analysis_retrieval_system_tpu.models import (
            CLIPConfig,
        )
        from intelligent_video_analysis_retrieval_system_tpu.system import (
            EnhancedRetrievalSystem,
        )
        from intelligent_video_analysis_retrieval_system_tpu.utils.config import (
            Config,
        )

        vocab = tmp_path / "vocab"
        vocab.mkdir()
        (vocab / "merges.txt").write_text(
            "#version: 0.2\nh e\nl l\nhe ll\nhell o</w>\n"
        )
        cfg = Config(
            config_file=None, base_dir=tmp_path, create_dirs=True,
            overrides={"model": {"vocab_dir": str(vocab)},
                       "logging": {"file": False}},
        )
        system = EnhancedRetrievalSystem(cfg)
        system.embedder._config_override = CLIPConfig.tiny_test()
        system.embedder.ensure_loaded()
        assert system.embedder.get_stats()["tokenizer"] == "clip_bpe"
        system.cleanup()

    def test_text_batching_buckets(self):
        emb = tiny_embedder()
        out = emb.encode_text(["a", "b", "c"])  # pads to bucket 8
        assert out.shape == (3, 32)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

    def test_image_encode_odd_batch(self, rng):
        emb = tiny_embedder()
        imgs = rng.integers(0, 255, (5, 32, 32, 3)).astype(np.uint8)
        out = emb.encode_images(imgs)
        assert out.shape == (5, 32)

    def test_resize_path_for_nonnative_size(self, rng):
        emb = tiny_embedder()
        imgs = rng.integers(0, 255, (2, 60, 90, 3)).astype(np.uint8)
        out = emb.encode_images(imgs)
        assert out.shape == (2, 32)

    def test_encode_image_files_tolerates_bad(self, tmp_path, rng):
        emb = tiny_embedder()
        good = tmp_path / "good.jpg"
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
        ).save(good)
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"nope")
        out, ok = emb.encode_image_files([good, bad])
        assert out.shape == (1, 32)
        assert ok == [0]

    def test_event_callbacks(self, tmp_path, rng):
        events = []
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"dtype": "float32"}})
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        system.on("build_progress", lambda **kw: events.append(kw))
        folder = tmp_path / "keyframes" / "v"
        folder.mkdir(parents=True)
        for n in range(3):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            ).save(folder / f"{n}.jpg")
        system.build_system(tmp_path / "keyframes")
        assert any(e.get("stage") == "done" for e in events)
        system.cleanup()


class TestTrainDeployLoop:
    def test_embedder_adopts_trainer_params(self, tmp_path, rng):
        """Fine-tune with CLIPTrainer, load the params into the retrieval
        embedder, and verify searches use the tuned weights."""
        import jax

        if jax.device_count() < 2:
            pytest.skip("needs multi-device mesh")
        from intelligent_video_analysis_retrieval_system_tpu.parallel import (
            CLIPTrainer,
            MeshSpec,
            create_mesh,
        )

        mesh = create_mesh(MeshSpec(axis_names=("data", "model"), shape=(2, 4)))
        cfg = CLIPConfig.tiny_test()
        trainer = CLIPTrainer(cfg, mesh)
        params, opt_state = trainer.init(0)
        pixels = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
        tokens = rng.integers(1, 500, (8, 16)).astype(np.int32)
        tokens[:, -1] = 511
        params, opt_state, _ = trainer.train_step(params, opt_state, pixels,
                                                  tokens)

        embedder = tiny_embedder()
        before = embedder.encode_text(["a red car"])
        embedder.load_params(params, config=cfg)
        after = embedder.encode_text(["a red car"])
        # tuned params genuinely differ from the random-init embedder's
        assert not np.allclose(before, after, atol=1e-4)
        assert after.shape == (1, 32)
        np.testing.assert_allclose(np.linalg.norm(after, axis=-1), 1.0,
                                   atol=1e-5)
        # image path functional too
        img = embedder.encode_images(
            rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8))
        assert img.shape == (2, 32)


class TestIndexVideos:
    def test_one_shot_video_pipeline(self, tmp_path):
        cv2 = pytest.importorskip("cv2")

        rng = np.random.default_rng(0)
        video = tmp_path / "clip.mp4"
        w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"),
                            25, (64, 64))
        for _ in range(2):
            img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            for _ in range(15):
                w.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        w.release()

        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"dtype": "float32",
                                          "thumbnail_size": 32},
                                "ingest": {"frame_batch": 16}})
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        out = system.index_videos([video])
        assert out["extract"][0]["frames_seen"] == 30
        assert system.index.ntotal == out["report"]["processed"]
        assert 2 <= system.index.ntotal <= 5  # ~1 keyframe per scene
        results = system.search("a scene", SearchOptions(limit=2))
        assert len(results) == 2
        # map CSV written so frame ids map to source frames
        meta = system.index.get_metadata(0)
        assert meta.fps == 25.0
        system.cleanup()


class TestCacheInvalidationOnMutation:
    def test_delete_invalidates_cached_search(self, tmp_path, rng):
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"dtype": "float32",
                                          "thumbnail_size": 32}})
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        folder = tmp_path / "keyframes" / "v"
        folder.mkdir(parents=True)
        for n in range(6):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(folder / f"{n}.jpg")
        system.build_system(tmp_path / "keyframes")
        # must load writable for deletes
        system.load_system(tmp_path / "index" / "index.rvdb", writable=True)

        first = system.search("a scene", SearchOptions(limit=3))
        top_row = first[0]["row_id"] if "row_id" in first[0] else (
            system.index.row_for(first[0]["folder"], first[0]["image"]))
        system.index.delete_rows([top_row])
        second = system.search("a scene", SearchOptions(limit=3))
        # the cached first result (containing the deleted row) must NOT be
        # served back; the new result excludes it
        assert all(
            system.index.row_for(r["folder"], r["image"]) != top_row
            for r in second
        )
        system.cleanup()


class TestFacadeMesh:
    """mesh= plumbing: facade-built/loaded indexes shard over the mesh."""

    def test_load_system_with_mesh_engages_sharded_backend(
        self, built_system, tmp_path
    ):
        import jax

        from intelligent_video_analysis_retrieval_system_tpu.parallel import (
            MeshSpec,
            create_mesh,
        )

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        root, system = built_system
        mesh = create_mesh(MeshSpec(axis_names=("index",), shape=(8,)))
        cfg = Config(
            config_file=None, base_dir=tmp_path, create_dirs=True,
            overrides={"index": {"dtype": "float32", "thumbnail_size": 32}},
        )
        meshed = EnhancedRetrievalSystem(
            cfg, embedder=tiny_embedder(), mesh=mesh
        )
        meshed.load_system(system.index.path)
        assert meshed.index._sharded is not None
        assert meshed.index._sharded.stats()["devices"] == 8
        # rankings equal the single-device system's
        a = [h["image"] for h in system.search("a person walking")[:5]]
        b = [h["image"] for h in meshed.search("a person walking")[:5]]
        assert a == b
        meshed.cleanup()


class TestInt8StaticFacade:
    """Facade lifecycle with compute_dtype="int8_static": build, lazy
    auto-calibration freeze, stable static search (drives the config →
    embedder → calibrate → static-apply chain end to end)."""

    def test_build_calibrate_search(self, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.system.embedder import (
            _CAL_BATCHES,
        )

        rng = np.random.default_rng(3)
        folder = tmp_path / "keyframes" / "vid0"
        folder.mkdir(parents=True)
        for n in range(5):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
        cfg = Config(
            config_file=None, base_dir=tmp_path, create_dirs=True,
            overrides={
                "device": {"compute_dtype": "int8_static"},
                "index": {"thumbnail_size": 32},
            },
        )
        assert cfg.get("device.compute_dtype") == "int8_static"
        embedder = CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                compute_dtype="int8_static")
        system = EnhancedRetrievalSystem(cfg, embedder=embedder)
        out = system.build_system(tmp_path / "keyframes")
        assert out["report"]["processed"] == 5

        for i in range(_CAL_BATCHES):
            results = system.search(f"query {i}")
        assert results
        assert "text" in embedder.get_stats()["act_scales_calibrated"]

        # static path now: identical rankings across repeats
        a = [h["image"] for h in system.search("a red square")]
        b = [h["image"] for h in system.search("a red square")]
        assert a and a == b

        # vision freezes after enough image batches; image search works
        for _ in range(_CAL_BATCHES):
            embedder.encode_images(
                rng.integers(0, 255, (1, 32, 32, 3)).astype(np.uint8)
            )
        assert embedder.get_stats()["act_scales_calibrated"] == [
            "text", "vision",
        ]
        hits = system.search_by_image(
            rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        )
        assert hits and np.isfinite(hits[0]["similarity_score"])
        system.cleanup()

    def test_health_reports_calibration_in_progress(self, tmp_path):
        """int8_static: until both towers freeze, health must warn that
        encodes still run the dynamic (calibration) path."""
        from intelligent_video_analysis_retrieval_system_tpu.system.embedder import (
            _CAL_BATCHES,
        )

        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True)
        embedder = CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                compute_dtype="int8_static")
        system = EnhancedRetrievalSystem(cfg, embedder=embedder)
        embedder.ensure_loaded()
        report = system.health.comprehensive_health_check()
        assert report["components"]["embedder"]["status"] == "warning"
        assert "calibrating" in report["components"]["embedder"]["detail"]
        for _ in range(_CAL_BATCHES):
            embedder.encode_text(["x"])
            embedder.encode_images(np.zeros((1, 32, 32, 3), np.uint8))
        report = system.health.comprehensive_health_check()
        assert "calibrating" not in str(
            report["components"]["embedder"].get("detail")
        )

    def test_act_scales_persist_across_restart(self, tmp_path):
        """int8_static scales export next to the index on freeze and a
        fresh system importing them starts static immediately (no
        recalibration batches)."""
        from intelligent_video_analysis_retrieval_system_tpu.system.embedder import (
            _CAL_BATCHES,
        )

        rng = np.random.default_rng(7)
        folder = tmp_path / "keyframes" / "vid0"
        folder.mkdir(parents=True)
        for n in range(4):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(folder / f"{n}.jpg", quality=95)
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"device": {"compute_dtype": "int8_static"},
                                "index": {"thumbnail_size": 32}})
        emb1 = CLIPEmbedder(config=CLIPConfig.tiny_test(),
                            compute_dtype="int8_static")
        system = EnhancedRetrievalSystem(cfg, embedder=emb1)
        out = system.build_system(tmp_path / "keyframes")
        index_path = out["index_path"]
        from pathlib import Path

        scales_path = Path(f"{index_path}.act_scales.json")
        for i in range(_CAL_BATCHES):
            system.search(f"q{i}")
            emb1.encode_images(rng.integers(0, 255, (1, 32, 32, 3),
                                            dtype=np.uint8))
        assert emb1.get_stats()["act_scales_calibrated"] == ["text", "vision"]
        assert scales_path.is_file(), "scales not exported on freeze"
        baseline = [h["image"] for h in system.search("a probe query")]
        system.cleanup()

        # a stale sidecar from a previous corpus must be REMOVED by a
        # fresh build, not imported over freshly-calibrated scales
        import json as _json

        payload = _json.loads(scales_path.read_text())
        assert payload["format"] == "ivars-act-scales-v1"

        # fresh process analog: new embedder + system, same index
        emb2 = CLIPEmbedder(config=CLIPConfig.tiny_test(),
                            compute_dtype="int8_static")
        cfg2 = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                      overrides={"device": {"compute_dtype": "int8_static"},
                                 "index": {"thumbnail_size": 32}})
        system2 = EnhancedRetrievalSystem(cfg2, embedder=emb2)
        system2.load_system(index_path)
        assert emb2.get_stats()["act_scales_calibrated"] == ["text", "vision"]
        # static from the FIRST query — and identical rankings
        assert [h["image"] for h in system2.search("a probe query")] == baseline
        system2.cleanup()

    def test_scales_frozen_during_build_are_exported(self, tmp_path):
        """Regression: towers that freeze DURING the build (before the
        persistence hook is wired at step 6) must still be exported —
        build-then-exit used to persist nothing."""
        from pathlib import Path

        from intelligent_video_analysis_retrieval_system_tpu.system.embedder import (
            _CAL_BATCHES,
        )

        rng = np.random.default_rng(8)
        folder = tmp_path / "keyframes" / "vid0"
        folder.mkdir(parents=True)
        for n in range(_CAL_BATCHES + 2):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(folder / f"{n}.jpg", quality=95)
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"thumbnail_size": 32,
                                          "chunk_size": 1}})
        # image_batch_size=1 => every image is its own calibration batch,
        # so the vision tower freezes mid-build
        emb = CLIPEmbedder(config=CLIPConfig.tiny_test(),
                           compute_dtype="int8_static", image_batch_size=1)
        system = EnhancedRetrievalSystem(cfg, embedder=emb)
        # plant a stale sidecar that a fresh build must not import
        out_path = tmp_path / "index" / "index.rvdb"
        out_path.parent.mkdir(parents=True, exist_ok=True)
        stale = Path(f"{out_path}.act_scales.json")
        stale.write_text('{"format": "ivars-act-scales-v1", "towers": '
                         '{"vision": {"bogus_ascale": 99.0}}}')
        out = system.build_system(tmp_path / "keyframes",
                                  output_path=out_path)
        assert "vision" in emb.get_stats()["act_scales_calibrated"]
        assert stale.is_file(), "frozen-in-build scales not exported"
        import json as _json

        payload = _json.loads(stale.read_text())
        assert "bogus_ascale" not in str(payload), "stale sidecar imported"
        assert "vision" in payload["towers"]
        system.cleanup()


class TestIndexTypeMapping:
    """Config index_type -> exact/ANN routing (reference FAISS names
    accepted, core.py:1204-1218)."""

    def _system(self, tmp_path, index_type):
        rng = np.random.default_rng(5)
        folder = tmp_path / "keyframes" / "v"
        folder.mkdir(parents=True)
        for n in range(8):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
        cfg = Config(
            config_file=None, base_dir=tmp_path, create_dirs=True,
            overrides={"index": {"chunk_size": 8, "dtype": "float32",
                                 "thumbnail_size": 32,
                                 "index_type": index_type,
                                 "ann_nlist": 64, "ann_nprobe": 64}},
        )
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        system.build_system(tmp_path / "keyframes")
        return system

    def test_ivf_name_activates_ann(self, tmp_path):
        system = self._system(tmp_path, "IndexIVFFlat")
        assert system.index.ann_active
        results = system.search("anything", SearchOptions(limit=3))
        assert len(results) == 3
        system.cleanup()

    def test_hnsw_name_maps_to_ann(self, tmp_path):
        system = self._system(tmp_path, "IndexHNSW")
        assert system.index.ann_active
        system.cleanup()

    def test_unknown_name_falls_back_exact(self, tmp_path):
        system = self._system(tmp_path, "IndexBanana")
        assert not system.index.ann_active
        system.cleanup()

    def test_default_is_exact(self, built_system):
        _, system = built_system
        assert not system.index.ann_active

    def test_exact_name_disables_persisted_ann(self, tmp_path):
        """index_type='exact' (native spelling) forces exact-only serving
        even when the container carries a persisted ANN; the reference
        FAISS names keep FAISS's the-file-is-the-index-type behavior."""
        system = self._system(tmp_path, "IndexIVFFlat")
        assert system.index.ann_active
        path = system.index.path
        system.cleanup()
        for index_type, expect in (("exact", False), ("flat", True)):
            cfg = Config(
                config_file=None, base_dir=tmp_path, create_dirs=True,
                overrides={"index": {"index_type": index_type}},
            )
            s2 = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
            s2.load_system(path)
            assert s2.index.ann_active is expect, index_type
            s2.cleanup()

    def test_default_target_recall_is_the_dataclass_default(self,
                                                            tmp_path):
        """Regression: `UnifiedIndexConfig.ann_target_recall` accessed on
        the CLASS returns the slots member descriptor (truthy, not
        float()-able) — the facade used it as "the default", so the
        default-on recall guard raised TypeError and silently skipped on
        every facade-built index. The default must come from
        __dataclass_fields__."""
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            UnifiedIndexConfig,
        )

        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True)
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        got = system._index_config().ann_target_recall
        want = UnifiedIndexConfig().ann_target_recall  # instance default
        assert isinstance(got, float) and got == want
        system.cleanup()

    def test_facade_build_runs_recall_check(self, tmp_path):
        """The build-time recall guard must actually RUN through the
        facade path (it errored out before the descriptor fix): after an
        ANN build with the default target, the tuned nprobe is installed
        and the structure stays active."""
        system = self._system(tmp_path, "IndexIVFFlat")
        assert system.index.ann_active
        # with the pre-fix TypeError the check raised before the ladder
        # and the report carried no recall_check key
        rep = system.index.build_ann(nlist=4)
        assert "recall_check" in rep, "recall guard did not run"
        assert isinstance(rep["recall_check"]["recall"], float)
        assert system.index.config.ann_nprobe == rep["recall_check"]["nprobe"]
        system.cleanup()

    def test_target_recall_self_tunes(self, tmp_path):
        """index.ann_target_recall makes the facade auto-pick nprobe on
        build (and load): config's ann_nprobe is only the starting point."""
        rng = np.random.default_rng(5)
        folder = tmp_path / "keyframes" / "v"
        folder.mkdir(parents=True)
        for n in range(24):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
        cfg = Config(
            config_file=None, base_dir=tmp_path, create_dirs=True,
            overrides={"index": {"chunk_size": 8, "dtype": "float32",
                                 "thumbnail_size": 32,
                                 "index_type": "ivf",
                                 "ann_nlist": 8, "ann_nprobe": 999,
                                 "ann_target_recall": 0.9}},
        )
        system = EnhancedRetrievalSystem(cfg, embedder=tiny_embedder())
        out = system.build_system(tmp_path / "keyframes")
        assert system.index.ann_active
        # tuned: a real ladder rung (<= nlist), not the configured 999
        tuned_after_build = system.index.config.ann_nprobe
        assert 1 <= tuned_after_build <= 8
        # load path tunes too
        system.load_system(out["index_path"])
        assert 1 <= system.index.config.ann_nprobe <= 8
        assert len(system.search("anything", SearchOptions(limit=3))) == 3
        system.cleanup()
