"""Multi-device tests on the virtual 8-device CPU mesh.

Validates the sharded search merge is exactly equal to single-device search,
and that the TP/DP training step compiles and runs with real shardings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from intelligent_video_analysis_retrieval_system_tpu.models import CLIPConfig
from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
    topk_exact_reference,
)
from intelligent_video_analysis_retrieval_system_tpu.parallel import (
    CLIPTrainer,
    MeshSpec,
    ShardedIndexSearcher,
    create_mesh,
    device_info,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def index_mesh():
    return create_mesh(MeshSpec(axis_names=("index",), shape=(8,)))


@pytest.fixture(scope="module")
def train_mesh():
    return create_mesh(MeshSpec(axis_names=("data", "model"), shape=(2, 4)))


class TestMesh:
    def test_create_default(self):
        mesh = create_mesh()
        assert mesh.shape == {"data": 1, "index": 8}

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            create_mesh(MeshSpec(axis_names=("a",), shape=(3,)))

    def test_device_info(self):
        info = device_info()
        assert info["num_devices"] == 8


class TestShardedSearch:
    def _data(self, rng, n=5000, d=64, b=4):
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = x[rng.integers(0, n, b)] + 0.01 * rng.standard_normal((b, d)).astype(
            np.float32
        )
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return x, q

    def test_matches_single_device_exactly(self, index_mesh, rng):
        x, q = self._data(rng)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x)
        got = searcher.search(q, k=20, use_pallas=False)
        want = topk_exact_reference(jnp.asarray(x), jnp.asarray(q), 20)
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), atol=1e-5
        )
        np.testing.assert_array_equal(got.indices, want.indices)

    def test_batch_sizes_share_one_compiled_program(self, index_mesh, rng):
        """Queries must be padded to the compile bucket BEFORE the jitted
        sharded program: serving batch sizes vary per window, and a
        per-size retrace recompiles the shard_map on live requests (the
        20x blowup class, CLAUDE.md round 3). All b <= 8 map to ONE
        compiled signature — asserted via the jit cache size."""
        from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
            bucket_k,
        )
        from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_search import (
            _searcher_cache,
            mesh_cache_key,
        )

        x, q = self._data(rng, b=8)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x)
        # the lru-cached jitted fn is shared suite-wide, so other tests
        # may already have compiled bucketed signatures — assert the
        # DELTA from this test's five batch sizes is at most one
        fn = _searcher_cache(
            mesh_cache_key(index_mesh), "index", int(searcher._x.shape[0]),
            bucket_k(5), False, False, False,
        )
        before = fn._cache_size()
        for b in (1, 2, 3, 5, 8):
            res = searcher.search(q[:b], k=5, use_pallas=False)
            assert res.scores.shape == (b, 5)
        grew = fn._cache_size() - before
        assert grew <= 1, (
            f"{grew} new compiled signatures for b<=8 — query padding "
            "must happen outside the jitted call"
        )

    def test_results_replicated(self, index_mesh, rng):
        x, q = self._data(rng, n=2000)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x)
        res = searcher.search(q, k=5, use_pallas=False)
        # replicated outputs: every device holds identical full results
        assert res.scores.shape == (4, 5)

    def test_pad_rows_never_win(self, index_mesh, rng):
        # all-negative scores: zero pad rows would rank first if unmasked
        x = -np.abs(rng.standard_normal((1000, 64)).astype(np.float32))
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = np.abs(rng.standard_normal((2, 64)).astype(np.float32))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x)
        res = searcher.search(q, k=10, use_pallas=False)
        assert int(np.asarray(res.indices).max()) < 1000
        want = topk_exact_reference(jnp.asarray(x), jnp.asarray(q), 10)
        np.testing.assert_array_equal(res.indices, want.indices)

    def test_append_reshards(self, index_mesh, rng):
        x, q = self._data(rng, n=1000)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x)
        extra = rng.standard_normal((100, 64)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=-1, keepdims=True)
        searcher.append(extra)
        assert searcher.n_valid == 1100
        res = searcher.search(extra[:1], k=1, use_pallas=False)
        assert int(res.indices[0, 0]) == 1000  # finds the appended row

    def test_stats(self, index_mesh, rng):
        x, _ = self._data(rng, n=1000)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x)
        stats = searcher.stats()
        assert stats["devices"] == 8
        assert stats["padded_rows"] % 8 == 0


class TestShardedInt8:
    """Quantized capacity mode on a mesh: int8 rows + scales shard together."""

    def _data(self, rng, n=5000, d=64, b=4):
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = x[rng.integers(0, n, b)] + 0.01 * rng.standard_normal(
            (b, d)
        ).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return x, q

    def test_matches_single_device_int8(self, index_mesh, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            pad_rows_int8,
            quantize_rows_int8,
            topk_search_int8,
        )

        x, q = self._data(rng)
        xq, xs = quantize_rows_int8(x)
        searcher = ShardedIndexSearcher(index_mesh)
        searcher.load_int8(xq, xs)
        got = searcher.search(q, k=20, use_pallas=False)
        xp, sp = pad_rows_int8(xq, xs)
        want = topk_search_int8(
            jnp.asarray(xp), jnp.asarray(sp), jnp.asarray(q), 20,
            n_valid=len(x), use_pallas=False,
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), atol=1e-5
        )
        np.testing.assert_array_equal(got.indices, want.indices)

    def test_pad_rows_never_win_int8(self, index_mesh, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            quantize_rows_int8,
        )

        # all-negative scores: zero pad rows would rank first if unmasked
        x = -np.abs(rng.standard_normal((1000, 64)).astype(np.float32))
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = np.abs(rng.standard_normal((2, 64)).astype(np.float32))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        xq, xs = quantize_rows_int8(x)
        searcher = ShardedIndexSearcher(index_mesh)
        searcher.load_int8(xq, xs)
        res = searcher.search(q, k=10, use_pallas=False)
        assert int(np.asarray(res.indices).max()) < 1000
        assert np.isfinite(np.asarray(res.scores)).all()

    def test_deleted_rows_excluded(self, index_mesh, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            quantize_rows_int8,
        )

        x, q = self._data(rng, n=2000, b=2)
        xq, xs = quantize_rows_int8(x)
        searcher = ShardedIndexSearcher(index_mesh)
        searcher.load_int8(xq, xs)
        top = int(searcher.search(q[:1], k=1, use_pallas=False).indices[0, 0])
        searcher.set_deleted({top})
        res = searcher.search(q[:1], k=10, use_pallas=False)
        assert top not in set(np.asarray(res.indices[0]).tolist())

    def test_append_requantizes(self, index_mesh, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            quantize_rows_int8,
        )

        x, _ = self._data(rng, n=1000)
        xq, xs = quantize_rows_int8(x)
        searcher = ShardedIndexSearcher(index_mesh)
        searcher.load_int8(xq, xs)
        extra = rng.standard_normal((50, 64)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=-1, keepdims=True)
        searcher.append(extra)
        assert searcher.n_valid == 1050
        assert searcher.stats()["quantized"]
        res = searcher.search(extra[:1], k=1, use_pallas=False)
        assert int(res.indices[0, 0]) == 1000

    def test_append_inplace_equals_requantize_from_scratch(
        self, index_mesh, rng
    ):
        """In-place sharded int8 append (quantize only the NEW rows,
        donated row+scale updates) must produce bit-identical search
        results to requantizing the whole corpus from scratch — the int8
        metric is integer math, so exact equality is required, not
        approximate."""
        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            quantize_rows_int8,
        )

        x, q = self._data(rng, n=900)
        extra = rng.standard_normal((70, 64)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=-1, keepdims=True)

        a = ShardedIndexSearcher(index_mesh)
        a.load_int8(*quantize_rows_int8(x))
        buf_before = a._x
        a.append(extra)
        # capacity (8 dev * TILE_N) holds 900+70 -> must be in-place: the
        # padded buffer shape is unchanged (no re-shard growth)
        assert a._x.shape == buf_before.shape
        assert a.n_valid == 970

        b = ShardedIndexSearcher(index_mesh)
        b.load_int8(*quantize_rows_int8(np.concatenate([x, extra])))

        ra = a.search(q, k=15, use_pallas=False)
        rb = b.search(q, k=15, use_pallas=False)
        np.testing.assert_array_equal(ra.indices, rb.indices)
        np.testing.assert_array_equal(
            np.asarray(ra.scores), np.asarray(rb.scores)
        )
        # and appended rows are retrievable as their own nearest neighbour
        top = a.search(extra[:3], k=1, use_pallas=False)
        np.testing.assert_array_equal(
            np.asarray(top.indices)[:, 0], [900, 901, 902]
        )

    def test_pallas_interpret_composes_with_shard_map(self, index_mesh, rng):
        # compare against the single-device pallas path (interpret mode):
        # the int8 metric is integer math (exact in f32), so the sharded
        # composition must match the single-device kernel bit-exactly
        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            pad_rows_int8,
            quantize_rows_int8,
            topk_search_int8,
        )

        x, q = self._data(rng, n=600, b=2)
        xq, xs = quantize_rows_int8(x)
        searcher = ShardedIndexSearcher(index_mesh)
        searcher.load_int8(xq, xs)
        got = searcher.search(q, k=5, use_pallas=False, interpret=True)
        xp, sp = pad_rows_int8(xq, xs)
        want = topk_search_int8(
            jnp.asarray(xp), jnp.asarray(sp), jnp.asarray(q), 5,
            n_valid=len(x), use_pallas=False, interpret=True,
        )
        np.testing.assert_array_equal(got.indices, want.indices)


class TestTraining:
    def test_train_step_runs_and_descends(self, train_mesh, rng):
        cfg = CLIPConfig.tiny_test()
        trainer = CLIPTrainer(cfg, train_mesh)
        params, opt_state = trainer.init(0)
        # fixed batch: loss must decrease over a few steps
        pixels = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
        tokens = rng.integers(1, 500, (8, 16)).astype(np.int32)
        tokens[:, -1] = 511
        losses = []
        for _ in range(3):
            params, opt_state, metrics = trainer.train_step(
                params, opt_state, pixels, tokens
            )
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

    def test_warmup_cosine_schedule(self, train_mesh, rng):
        from intelligent_video_analysis_retrieval_system_tpu.parallel.train import (
            TrainConfig,
        )

        tc = TrainConfig(schedule="warmup_cosine", warmup_steps=2,
                         total_steps=10, learning_rate=1e-3)
        sched = tc.make_schedule()
        lrs = [float(sched(s)) for s in range(11)]
        assert lrs[0] == 0.0                       # warmup from zero
        assert abs(lrs[2] - 1e-3) < 1e-9           # peak after warmup
        assert lrs[10] < lrs[2]                    # cosine decay
        assert abs(lrs[10] - 1e-4) < 1e-8          # end_lr_factor * lr
        # a trainer built with the schedule still steps
        trainer = CLIPTrainer(CLIPConfig.tiny_test(), train_mesh,
                              train_config=tc)
        params, opt_state = trainer.init(0)
        pixels = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
        tokens = rng.integers(1, 500, (8, 16)).astype(np.int32)
        tokens[:, -1] = 511
        _, _, metrics = trainer.train_step(params, opt_state, pixels, tokens)
        assert np.isfinite(float(metrics["loss"]))

    def test_params_actually_sharded(self, train_mesh):
        cfg = CLIPConfig.tiny_test()
        trainer = CLIPTrainer(cfg, train_mesh)
        params, _ = trainer.init(0)
        fc = params["vision"]["transformer"]["layer_0"]["mlp_fc"]["kernel"]
        spec = fc.sharding.spec
        assert spec == P(None, "model")
        out = params["vision"]["transformer"]["layer_0"]["attn"]["out_proj"]["kernel"]
        assert out.sharding.spec == P("model", None)


class TestCheckpointing:
    def test_save_restore_roundtrip(self, train_mesh, rng, tmp_path):
        cfg = CLIPConfig.tiny_test()
        trainer = CLIPTrainer(cfg, train_mesh)
        params, opt_state = trainer.init(0)
        pixels = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
        tokens = rng.integers(1, 500, (8, 16)).astype(np.int32)
        tokens[:, -1] = 511
        params, opt_state, _ = trainer.train_step(params, opt_state, pixels,
                                                  tokens)
        trainer.save_checkpoint(tmp_path / "ckpt", params, opt_state, step=1)
        params2, opt2, step = trainer.restore_checkpoint(tmp_path / "ckpt")
        assert step == 1
        leaf = params["vision"]["transformer"]["layer_0"]["mlp_fc"]["kernel"]
        leaf2 = params2["vision"]["transformer"]["layer_0"]["mlp_fc"]["kernel"]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf2))
        assert leaf2.sharding.spec == leaf.sharding.spec  # TP layout survives
        # restored state continues training
        _, _, metrics = trainer.train_step(params2, opt2, pixels, tokens)
        assert np.isfinite(float(metrics["loss"]))

    def test_restore_missing_raises(self, train_mesh, tmp_path):
        cfg = CLIPConfig.tiny_test()
        trainer = CLIPTrainer(cfg, train_mesh)
        (tmp_path / "empty").mkdir()
        with pytest.raises(FileNotFoundError):
            trainer.restore_checkpoint(tmp_path / "empty")


class TestDistributedHelpers:
    def test_initialize_noop_single_process(self):
        from intelligent_video_analysis_retrieval_system_tpu.parallel.distributed import (
            initialize_distributed,
            is_multi_host,
        )

        info = initialize_distributed()
        assert info["process_count"] == 1
        assert not is_multi_host()

    def test_host_row_range_single_host(self, index_mesh):
        from intelligent_video_analysis_retrieval_system_tpu.parallel.distributed import (
            host_row_range,
        )

        start, end = host_row_range(1000, index_mesh)
        assert (start, end) == (0, 1000)  # one process owns everything

    def test_make_global_sharded_array(self, index_mesh, rng):
        from intelligent_video_analysis_retrieval_system_tpu.parallel.distributed import (
            make_global_sharded_array,
        )

        rows = rng.standard_normal((1024, 16)).astype(np.float32)
        arr = make_global_sharded_array(rows, 1024, index_mesh)
        assert arr.shape == (1024, 16)
        assert arr.sharding.spec == P("index", None)
        np.testing.assert_array_equal(np.asarray(arr), rows)


class TestMeshBackedIndex:
    def _build(self, tmp_path):
        from PIL import Image

        from intelligent_video_analysis_retrieval_system_tpu.index import (
            RAGBuilder,
            UnifiedIndexConfig,
        )

        rng = np.random.default_rng(6)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(10):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")

        def embed(batch):
            g = batch.reshape(len(batch), 4, 8, 4, 8, 3).mean(axis=(2, 4))
            g = g.reshape(len(batch), 48)[:, :32].astype(np.float32) + 1e-3
            return g / np.linalg.norm(g, axis=-1, keepdims=True)

        builder = RAGBuilder(embed, 32, input_size=32,
                             config=UnifiedIndexConfig(dtype="float32",
                                                       thumbnail_size=32))
        index, _ = builder.build_index(tmp_path / "keyframes",
                                       tmp_path / "i.rvdb")
        index.close()
        return embed

    def test_mesh_index_matches_single_device(self, index_mesh, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            UnifiedIndex,
            UnifiedIndexConfig,
        )

        embed = self._build(tmp_path)
        single = UnifiedIndex(UnifiedIndexConfig(dtype="float32")
                              ).load_unified_index(tmp_path / "i.rvdb")
        meshed = UnifiedIndex(UnifiedIndexConfig(dtype="float32"),
                              mesh=index_mesh
                              ).load_unified_index(tmp_path / "i.rvdb")
        assert meshed._sharded is not None
        q = np.ones(32, np.float32)
        a = [(h.metadata.row_id, round(h.similarity_score, 5))
             for h in single.search(q, top_k=5)]
        b = [(h.metadata.row_id, round(h.similarity_score, 5))
             for h in meshed.search(q, top_k=5)]
        assert a == b
        single.close()
        meshed.close()

    def test_mesh_index_int8_matches_single_device(self, index_mesh, tmp_path):
        from PIL import Image

        from intelligent_video_analysis_retrieval_system_tpu.index import (
            RAGBuilder,
            UnifiedIndex,
            UnifiedIndexConfig,
        )

        rng = np.random.default_rng(7)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(10):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")

        def embed(batch):
            g = batch.reshape(len(batch), 4, 8, 4, 8, 3).mean(axis=(2, 4))
            g = g.reshape(len(batch), 48)[:, :32].astype(np.float32) + 1e-3
            return g / np.linalg.norm(g, axis=-1, keepdims=True)

        cfg = UnifiedIndexConfig(dtype="int8", thumbnail_size=32)
        builder = RAGBuilder(embed, 32, input_size=32, config=cfg)
        index, _ = builder.build_index(tmp_path / "keyframes",
                                       tmp_path / "q.rvdb")
        index.close()
        single = UnifiedIndex(cfg).load_unified_index(tmp_path / "q.rvdb")
        meshed = UnifiedIndex(cfg, mesh=index_mesh
                              ).load_unified_index(tmp_path / "q.rvdb")
        assert meshed._sharded is not None
        assert meshed._sharded.stats()["quantized"]
        q = np.ones(32, np.float32)
        a = [h.metadata.row_id for h in single.search(q, top_k=5)]
        b = [h.metadata.row_id for h in meshed.search(q, top_k=5)]
        assert a == b
        single.close()
        meshed.close()

    def test_mesh_incremental_append_in_place(self, index_mesh, tmp_path):
        """Facade-path appends on a mesh go through the searcher's in-place
        donated update — same searcher object, unchanged capacity, results
        equal to a fresh reload (used to be an O(N) re-read + re-shard)."""
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            UnifiedIndex,
            UnifiedIndexConfig,
        )
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.results import (
            KeyframeMetadata,
        )

        self._build(tmp_path)
        cfg = UnifiedIndexConfig(dtype="float32")
        meshed = UnifiedIndex(cfg, mesh=index_mesh)
        meshed.load_unified_index(tmp_path / "i.rvdb", mode="a")
        searcher = meshed._sharded
        cap = meshed._capacity
        rng = np.random.default_rng(9)
        new = rng.standard_normal((3, 32)).astype(np.float32)
        new /= np.linalg.norm(new, axis=-1, keepdims=True)
        meshed.incremental_update(
            new,
            [KeyframeMetadata(folder="vx", image=f"{i}.jpg", frame_id=i)
             for i in range(3)],
        )
        assert meshed._sharded is searcher  # no searcher rebuild
        assert meshed._capacity == cap      # no re-shard
        q = rng.standard_normal(32).astype(np.float32)
        got = [(h.metadata.row_id, round(h.similarity_score, 5))
               for h in meshed.search(q, top_k=8)]
        meshed.close()
        reloaded = UnifiedIndex(cfg, mesh=index_mesh)
        reloaded.load_unified_index(tmp_path / "i.rvdb")
        want = [(h.metadata.row_id, round(h.similarity_score, 5))
                for h in reloaded.search(q, top_k=8)]
        reloaded.close()
        assert got == want

    def test_mesh_incremental_append_in_place_int8(self, index_mesh, tmp_path):
        """int8 capacity mode on a mesh: in-place append must be bit-exact
        vs a reload (scale convention folds normalization, matching
        ``_upload_embeddings``)."""
        from PIL import Image

        from intelligent_video_analysis_retrieval_system_tpu.index import (
            RAGBuilder,
            UnifiedIndex,
            UnifiedIndexConfig,
        )
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.results import (
            KeyframeMetadata,
        )

        rng = np.random.default_rng(12)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(10):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")

        def embed(batch):
            g = batch.reshape(len(batch), 4, 8, 4, 8, 3).mean(axis=(2, 4))
            g = g.reshape(len(batch), 48)[:, :32].astype(np.float32) + 1e-3
            return g / np.linalg.norm(g, axis=-1, keepdims=True)

        cfg = UnifiedIndexConfig(dtype="int8", thumbnail_size=32)
        builder = RAGBuilder(embed, 32, input_size=32, config=cfg)
        index, _ = builder.build_index(tmp_path / "keyframes",
                                       tmp_path / "q.rvdb")
        index.close()
        meshed = UnifiedIndex(cfg, mesh=index_mesh)
        meshed.load_unified_index(tmp_path / "q.rvdb", mode="a")
        searcher = meshed._sharded
        new = rng.standard_normal((2, 32)).astype(np.float32)
        new /= np.linalg.norm(new, axis=-1, keepdims=True)
        meshed.incremental_update(
            new,
            [KeyframeMetadata(folder="vx", image=f"{i}.jpg", frame_id=i)
             for i in range(2)],
        )
        assert meshed._sharded is searcher
        q = rng.standard_normal(32).astype(np.float32)
        got = [(h.metadata.row_id, h.similarity_score)
               for h in meshed.search(q, top_k=8)]
        meshed.close()
        reloaded = UnifiedIndex(cfg, mesh=index_mesh)
        reloaded.load_unified_index(tmp_path / "q.rvdb")
        want = [(h.metadata.row_id, h.similarity_score)
                for h in reloaded.search(q, top_k=8)]
        reloaded.close()
        assert got == want  # bit-exact

    def test_mesh_index_deletes(self, index_mesh, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            UnifiedIndex,
            UnifiedIndexConfig,
        )

        self._build(tmp_path)
        meshed = UnifiedIndex(UnifiedIndexConfig(dtype="float32"),
                              mesh=index_mesh)
        meshed.load_unified_index(tmp_path / "i.rvdb", mode="a")
        q = np.ones(32, np.float32)
        top = meshed.search(q, top_k=1)[0].metadata.row_id
        meshed.delete_rows([top])
        hits = meshed.search(q, top_k=5)
        assert all(h.metadata.row_id != top for h in hits)
        meshed.close()


class TestInPlaceAppend:
    """append within padded capacity must not re-shard or lose rows."""

    def test_in_place_append_preserves_results(self, index_mesh, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
            topk_exact_reference,
        )

        x = rng.standard_normal((1000, 64)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x)
        cap_before = int(searcher._x.shape[0])
        extra = rng.standard_normal((100, 64)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=-1, keepdims=True)
        searcher.append(extra)
        assert searcher.n_valid == 1100
        assert int(searcher._x.shape[0]) == cap_before  # no re-shard
        full = np.concatenate([x, extra])
        got = searcher.search(full[1095:1100], k=10, use_pallas=False)
        want = topk_exact_reference(
            jnp.asarray(full), jnp.asarray(full[1095:1100]), 10
        )
        np.testing.assert_array_equal(got.indices, want.indices)

    def test_append_overflow_falls_back_to_reshard(self, index_mesh, rng):
        x = rng.standard_normal((100, 64)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x)
        cap = int(searcher._x.shape[0])
        big = rng.standard_normal((cap, 64)).astype(np.float32)
        big /= np.linalg.norm(big, axis=-1, keepdims=True)
        searcher.append(big)
        assert searcher.n_valid == 100 + cap
        assert int(searcher._x.shape[0]) > cap
        res = searcher.search(big[:1], k=1, use_pallas=False)
        assert int(res.indices[0, 0]) == 100

    def test_append_overflow_preserves_tombstones(self, index_mesh, rng):
        """Regression: the grow-path re-load must carry the deleted-row
        mask — it used to reset it, resurrecting tombstoned rows."""
        for int8 in (False, True):
            x = rng.standard_normal((100, 64)).astype(np.float32)
            x /= np.linalg.norm(x, axis=-1, keepdims=True)
            searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
            if int8:
                from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
                    quantize_rows_int8,
                )

                searcher.load_int8(*quantize_rows_int8(x), deleted_rows={3})
            else:
                searcher.load(x, deleted_rows={3})
            cap = int(searcher._x.shape[0])
            big = rng.standard_normal((cap, 64)).astype(np.float32)
            big /= np.linalg.norm(big, axis=-1, keepdims=True)
            searcher.append(big)  # overflow -> re-shard
            assert int(searcher._x.shape[0]) > cap
            res = searcher.search(x[3:4], k=1, use_pallas=False)
            assert int(res.indices[0, 0]) != 3, f"tombstone lost (int8={int8})"

    def test_append_with_tombstones_intact(self, index_mesh, rng):
        x = rng.standard_normal((500, 64)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        searcher = ShardedIndexSearcher(index_mesh, dtype=jnp.float32)
        searcher.load(x, deleted_rows={0})
        extra = x[:1] + 0.0  # identical to the deleted row
        searcher.append(extra)
        res = searcher.search(x[:1], k=1, use_pallas=False)
        # deleted row 0 stays masked; the appended twin (row 500) wins
        assert int(res.indices[0, 0]) == 500
