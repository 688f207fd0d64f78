"""Sharded IVF (`parallel.sharded_ann`): the multi-chip ANN latency mode.

Core contract under test: for the same global ``IVFState``, the sharded
search over the 8-device mesh returns EXACTLY the single-device
``ops.ann.ivf_topk`` result (the per-shard candidate union equals the
global candidate set and the scoring code is shared), and at
``nprobe == nlist`` it equals the dense sharded sweep. int8 scores are
bit-exact (integer metric). Plus the ``UnifiedIndex`` mesh lifecycle:
build over the sharded buffer, backend-portable persistence, tail
appends, tombstones, capacity-overflow re-shard re-partitioning.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from intelligent_video_analysis_retrieval_system_tpu.index import (  # noqa: E402
    IndexContainer,
    UnifiedIndex,
    UnifiedIndexConfig,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (  # noqa: E402
    build_ivf,
    ivf_topk,
    tail_append,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (  # noqa: E402
    quantize_rows_int8,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.topk import TILE_N  # noqa: E402
from intelligent_video_analysis_retrieval_system_tpu.parallel import (  # noqa: E402
    MeshSpec,
    create_mesh,
)
from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_ann import (  # noqa: E402
    make_sharded_ivf,
    partition_ivf_host,
    retarget_tail,
    sharded_ivf_topk,
)
from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_search import (  # noqa: E402
    sharded_topk,
)

N_DEV = 8
N, D = 4096, 32


def _ceil_to(x, m):
    return -(-x // m) * m


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n, d, n_clusters=32, noise=0.35):
    centers = _normed(rng, n_clusters, d)
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + (noise / d**0.5) * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshSpec(axis_names=("index",), shape=(N_DEV,)))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    x = _clustered(rng, N, D)
    picks = rng.choice(N, size=6, replace=False)
    q = x[picks] + (0.5 / D**0.5) * rng.standard_normal((6, D)).astype(
        np.float32
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return x, q


@pytest.fixture(scope="module")
def placed(mesh, corpus):
    """Single-device and sharded copies of the same padded corpus +
    one global IVF state built over it."""
    x, _ = corpus
    n_pad = _ceil_to(N, N_DEV * TILE_N)
    host = np.zeros((n_pad, D), np.float32)
    host[:N] = x
    sharding = NamedSharding(mesh, P("index", None))
    x_sh = jax.device_put(jnp.asarray(host), sharding)
    x_single = jnp.asarray(host)
    state, report = build_ivf(x_single, n_rows=N, nlist=64, kmeans_iters=6,
                              seed=0)
    sivf = make_sharded_ivf(mesh, "index", state, n_pad // N_DEV)
    return x_single, x_sh, state, sivf, n_pad


class TestPartition:
    def test_every_live_row_exactly_once(self, placed):
        _, _, state, _, n_pad = placed
        shard_rows = n_pad // N_DEV
        tables, tails, tcounts = partition_ivf_host(
            np.asarray(state.bucket_ids),
            np.asarray(state.tail_ids),
            int(state.tail_count),
            N_DEV,
            shard_rows,
        )
        seen = []
        for s in range(N_DEV):
            local = tables[s][tables[s] >= 0]
            assert local.max(initial=-1) < shard_rows
            seen.extend((local + s * shard_rows).tolist())
            t = tails[s][: tcounts[s]]
            assert (t >= 0).all() and (t < shard_rows).all()
            seen.extend((t + s * shard_rows).tolist())
        global_ids = np.asarray(state.bucket_ids)
        expect = set(global_ids[global_ids >= 0].tolist())
        expect |= set(
            np.asarray(state.tail_ids)[: int(state.tail_count)].tolist()
        )
        assert len(seen) == len(set(seen)), "row placed twice"
        assert set(seen) == expect

    def test_members_keep_similarity_order(self, placed):
        """Within a shard's bucket the build's centroid-similarity order is
        preserved (stable compaction)."""
        _, _, state, _, n_pad = placed
        shard_rows = n_pad // N_DEV
        tables, _, _ = partition_ivf_host(
            np.asarray(state.bucket_ids),
            np.asarray(state.tail_ids),
            int(state.tail_count),
            N_DEV,
            shard_rows,
        )
        g = np.asarray(state.bucket_ids)
        for s in range(min(N_DEV, 3)):
            for li in range(0, 64, 17):
                mine = [v for v in g[li] if v >= 0
                        and v // shard_rows == s]
                got = tables[s, li][tables[s, li] >= 0] + s * shard_rows
                assert got.tolist() == mine


class TestKernelEquality:
    @pytest.mark.parametrize("nprobe", [4, 16, 64])
    def test_matches_single_device(self, placed, corpus, mesh, nprobe):
        x_single, x_sh, state, sivf, _ = placed
        _, q = corpus
        ref = ivf_topk(x_single, state, jnp.asarray(q), 10, nprobe=nprobe,
                       n_valid=N)
        got = sharded_ivf_topk(
            mesh, x_sh, sivf, jnp.asarray(q), 10, nprobe=nprobe, n_valid=N,
        )
        np.testing.assert_array_equal(
            np.asarray(ref.indices), np.asarray(got.indices)
        )
        np.testing.assert_allclose(
            np.asarray(ref.scores), np.asarray(got.scores), atol=0
        )

    def test_full_probe_equals_dense_sharded(self, placed, corpus, mesh):
        x_single, x_sh, state, sivf, _ = placed
        _, q = corpus
        got = sharded_ivf_topk(mesh, x_sh, sivf, jnp.asarray(q), 10,
                               nprobe=64, n_valid=N)
        want = sharded_topk(mesh, x_sh, jnp.asarray(q), 10, n_valid=N,
                            use_pallas=False)
        assert set(np.asarray(got.indices)[0].tolist()) == set(
            np.asarray(want.indices)[0].tolist()
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(got.scores), axis=1),
            np.sort(np.asarray(want.scores), axis=1),
            atol=1e-5,
        )

    def test_tombstones(self, placed, corpus, mesh):
        x_single, x_sh, state, sivf, n_pad = placed
        _, q = corpus
        rng = np.random.default_rng(5)
        dead_rows = rng.choice(N, 300, replace=False)
        mask = np.zeros((n_pad, 1), np.int8)
        mask[dead_rows, 0] = 1
        dead_single = jnp.asarray(mask)
        dead_sh = jax.device_put(
            jnp.asarray(mask), NamedSharding(mesh, P("index", None))
        )
        ref = ivf_topk(x_single, state, jnp.asarray(q), 10, nprobe=16,
                       n_valid=N, deleted=dead_single)
        got = sharded_ivf_topk(mesh, x_sh, sivf, jnp.asarray(q), 10,
                               nprobe=16, n_valid=N, deleted_sharded=dead_sh)
        np.testing.assert_array_equal(
            np.asarray(ref.indices), np.asarray(got.indices)
        )
        assert not (set(np.asarray(got.indices).ravel().tolist())
                    & set(dead_rows.tolist()))

    def test_tail_appends(self, placed, mesh):
        x_single, x_sh, state, sivf, n_pad = placed
        rng = np.random.default_rng(8)
        extra = _normed(rng, 32, D)
        host = np.asarray(x_single).copy()
        host[N : N + 32] = extra
        x_single2 = jnp.asarray(host)
        x_sh2 = jax.device_put(
            jnp.asarray(host), NamedSharding(mesh, P("index", None))
        )
        state2 = tail_append(state, list(range(N, N + 32)))
        sivf2 = retarget_tail(
            sivf, mesh, "index",
            np.asarray(state2.tail_ids), int(state2.tail_count),
        )
        q = jnp.asarray(extra[:4])
        ref = ivf_topk(x_single2, state2, q, 5, nprobe=8, n_valid=N + 32)
        got = sharded_ivf_topk(mesh, x_sh2, sivf2, q, 5, nprobe=8,
                               n_valid=N + 32)
        np.testing.assert_array_equal(
            np.asarray(ref.indices), np.asarray(got.indices)
        )
        # appended rows are their own nearest neighbors via the tail
        assert np.asarray(got.indices)[:, 0].tolist() == [
            N, N + 1, N + 2, N + 3
        ]

    def test_int8_bit_exact(self, corpus, mesh):
        x, q = corpus
        q8, s8 = quantize_rows_int8(x)
        n_pad = _ceil_to(N, N_DEV * TILE_N)
        host = np.zeros((n_pad, D), np.int8)
        host[:N] = q8
        host_s = np.zeros((n_pad,), np.float32)
        host_s[:N] = s8
        sharding = NamedSharding(mesh, P("index", None))
        x_sh = jax.device_put(jnp.asarray(host), sharding)
        sc_sh = jax.device_put(jnp.asarray(host_s[:, None]), sharding)
        x_single = jnp.asarray(host)
        sc_single = jnp.asarray(host_s)
        state, _ = build_ivf(x_single, n_rows=N, x_scales=sc_single,
                             nlist=64, kmeans_iters=6, seed=0)
        sivf = make_sharded_ivf(mesh, "index", state, n_pad // N_DEV)
        for nprobe in (8, 64):
            ref = ivf_topk(x_single, state, jnp.asarray(q), 10,
                           nprobe=nprobe, n_valid=N, x_scales=sc_single)
            got = sharded_ivf_topk(mesh, x_sh, sivf, jnp.asarray(q), 10,
                                   nprobe=nprobe, n_valid=N,
                                   scales_sharded=sc_sh)
            np.testing.assert_array_equal(
                np.asarray(ref.indices), np.asarray(got.indices)
            )
            # integer metric: scores are BIT-exact across backends
            np.testing.assert_array_equal(
                np.asarray(ref.scores), np.asarray(got.scores)
            )


# ---------------------------------------------------------------------------
# UnifiedIndex mesh lifecycle
# ---------------------------------------------------------------------------


def _write_container(path, x, dtype="float32"):
    with IndexContainer(path, "w", dim=x.shape[1], dtype=dtype) as c:
        c.append_embeddings(x)
        c.append_metadata(
            [
                {"folder": "v", "image": f"{i}.jpg", "frame_id": i,
                 "row_id": i}
                for i in range(len(x))
            ]
        )
        c.flush_checkpoint()
    return path


@pytest.fixture(scope="module")
def small_corpus():
    rng = np.random.default_rng(21)
    x = _clustered(rng, 2048, D)
    q = x[rng.choice(2048, 3, replace=False)]
    return x, q


class TestUnifiedIndexMeshANN:
    @pytest.mark.parametrize("dtype", ["float32", "int8"])
    def test_build_matches_single_device_ann(
        self, tmp_path, small_corpus, mesh, dtype
    ):
        x, q = small_corpus
        path = _write_container(tmp_path / f"m_{dtype}.rvdb", x, dtype)
        cfg = dict(ann=True, ann_nlist=32, ann_nprobe=8)
        idx_m = UnifiedIndex(
            UnifiedIndexConfig(**cfg), mesh=mesh
        ).load_unified_index(path)
        idx_s = UnifiedIndex(UnifiedIndexConfig(**cfg)).load_unified_index(
            path
        )
        assert idx_m.ann_active and idx_m._sharded.ann_active
        assert idx_m.get_stats()["ann"]["nlist"] == 32
        rm = idx_m.search_vectors(q, top_k=10)
        rs = idx_s.search_vectors(q, top_k=10)
        assert [[h.metadata.row_id for h in hits] for hits in rm] == [
            [h.metadata.row_id for h in hits] for hits in rs
        ]
        idx_m.close()
        idx_s.close()

    def test_full_probe_matches_exact(self, tmp_path, small_corpus, mesh):
        x, q = small_corpus
        path = _write_container(tmp_path / "fp.rvdb", x)
        idx = UnifiedIndex(
            UnifiedIndexConfig(ann=True, ann_nlist=32, ann_nprobe=32),
            mesh=mesh,
        ).load_unified_index(path)
        approx = idx.search_vectors(q, top_k=5)
        exact = idx.search_vectors(q, top_k=5, exact=True)
        for a_hits, e_hits in zip(approx, exact):
            assert [h.metadata.row_id for h in a_hits] == [
                h.metadata.row_id for h in e_hits
            ]
        idx.close()

    def test_persistence_is_backend_portable(
        self, tmp_path, small_corpus, mesh
    ):
        """ANN built+persisted on the mesh restores on a single device and
        vice versa (the persisted format is the GLOBAL state)."""
        x, q = small_corpus
        path = _write_container(tmp_path / "port.rvdb", x)
        cfg = UnifiedIndexConfig(ann=True, ann_nlist=32, ann_nprobe=8)
        idx_m = UnifiedIndex(cfg, mesh=mesh).load_unified_index(
            path, mode="a"
        )
        rm = idx_m.search_vectors(q, top_k=5)
        idx_m.close()
        # mesh-built state -> single-device restore, NO rebuild
        idx_s = UnifiedIndex().load_unified_index(path)
        assert idx_s.ann_active
        idx_s.config.ann_nprobe = 8
        rs = idx_s.search_vectors(q, top_k=5)
        assert [[h.metadata.row_id for h in hits] for hits in rs] == [
            [h.metadata.row_id for h in hits] for hits in rm
        ]
        idx_s.close()
        # single-device persisted state -> mesh restore
        idx_m2 = UnifiedIndex(mesh=mesh).load_unified_index(path)
        assert idx_m2.ann_active and idx_m2._sharded.ann_active
        idx_m2.config.ann_nprobe = 8
        rm2 = idx_m2.search_vectors(q, top_k=5)
        assert [[h.metadata.row_id for h in hits] for hits in rm2] == [
            [h.metadata.row_id for h in hits] for hits in rm
        ]
        idx_m2.close()

    def test_append_tail_and_delete(self, tmp_path, small_corpus, mesh):
        x, _ = small_corpus
        path = _write_container(tmp_path / "mut.rvdb", x)
        idx = UnifiedIndex(
            UnifiedIndexConfig(ann=True, ann_nlist=32, ann_nprobe=8),
            mesh=mesh,
        ).load_unified_index(path, mode="a")
        rng = np.random.default_rng(77)
        new = _normed(rng, 4, D)
        idx.incremental_update(
            new,
            [
                {"folder": "w", "image": f"n{i}.jpg", "frame_id": i}
                for i in range(len(new))
            ],
        )
        assert idx.ann_active and idx._sharded.ann_active
        assert int(idx._ann.tail_count) >= 4
        hits = idx.search_vectors(new, top_k=1)
        got = [h[0].metadata.row_id for h in hits]
        assert got == [len(x) + i for i in range(len(new))]
        # delete the appended rows: tombstones respected in the ANN path
        idx.delete_rows(got)
        hits = idx.search_vectors(new, top_k=3)
        for h in hits:
            assert not (set(r.metadata.row_id for r in h) & set(got))
        idx.close()

    def test_capacity_overflow_reshard_repartitions(self, tmp_path, mesh):
        """Appending past the padded capacity forces a mesh re-shard
        (shard_rows changes, local bucket ids go stale); the ANN must be
        re-partitioned from the global state, not dropped or stale."""
        rng = np.random.default_rng(31)
        n0 = N_DEV * TILE_N - 64  # just under one capacity unit
        x = _clustered(rng, n0, D)
        path = _write_container(tmp_path / "ovf.rvdb", x)
        idx = UnifiedIndex(
            UnifiedIndexConfig(ann=True, ann_nlist=32, ann_nprobe=8),
            mesh=mesh,
        ).load_unified_index(path, mode="a")
        cap_before = idx._capacity
        new = _normed(rng, 300, D)  # 300 > 64 free -> re-shard
        idx.incremental_update(
            new,
            [
                {"folder": "w", "image": f"n{i}.jpg", "frame_id": i}
                for i in range(len(new))
            ],
        )
        assert idx._capacity > cap_before, "expected a capacity re-shard"
        assert idx.ann_active and idx._sharded.ann_active
        hits = idx.search_vectors(new[:3], top_k=1)
        assert [h[0].metadata.row_id for h in hits] == [n0, n0 + 1, n0 + 2]
        # old rows still found through the re-partitioned buckets
        hits = idx.search_vectors(x[:2], top_k=1)
        assert [h[0].metadata.row_id for h in hits] == [0, 1]
        idx.close()

    def test_large_batch_falls_back_dense(self, tmp_path, small_corpus, mesh):
        x, _ = small_corpus
        path = _write_container(tmp_path / "fb.rvdb", x)
        idx = UnifiedIndex(
            UnifiedIndexConfig(
                ann=True, ann_nlist=32, ann_nprobe=2, ann_max_batch=4
            ),
            mesh=mesh,
        ).load_unified_index(path)
        rng = np.random.default_rng(13)
        q = _normed(rng, 9, D)  # 9 > ann_max_batch -> dense sharded sweep
        got = idx.search_vectors(q, top_k=5)
        want = idx.search_vectors(q, top_k=5, exact=True)
        assert [[h.metadata.row_id for h in hits] for hits in got] == [
            [h.metadata.row_id for h in hits] for hits in want
        ]
        idx.close()


class TestMeshServingStack:
    """The whole serving stack composed over the mesh + sharded ANN:
    facade build (index_type=IndexIVFFlat, self-tuning target) -> REST
    server -> /api/search + build_ann/tune_ann maintenance over HTTP."""

    def test_facade_rest_over_mesh_ann(self, tmp_path, mesh):
        import json as _json
        import time
        import urllib.request

        from PIL import Image

        from intelligent_video_analysis_retrieval_system_tpu.models import (
            CLIPConfig,
        )
        from intelligent_video_analysis_retrieval_system_tpu.serve.rest import (
            RetrievalServer,
        )
        from intelligent_video_analysis_retrieval_system_tpu.system import (
            CLIPEmbedder,
            EnhancedRetrievalSystem,
            SearchOptions,
        )
        from intelligent_video_analysis_retrieval_system_tpu.utils.config import (
            Config,
        )

        rng = np.random.default_rng(17)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(20):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(kf / f"{n}.jpg")
        cfg = Config(
            config_file=None, base_dir=tmp_path, create_dirs=True,
            overrides={
                "index": {"chunk_size": 8, "dtype": "float32",
                          "thumbnail_size": 32,
                          "index_type": "IndexIVFFlat",
                          "ann_nlist": 4, "ann_nprobe": 4,
                          "ann_target_recall": 0.9},
                "logging": {"file": False},
            },
        )
        system = EnhancedRetrievalSystem(
            cfg,
            embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                  compute_dtype="float32"),
            mesh=mesh,
        )
        system.build_system(tmp_path / "keyframes")
        assert system.index._sharded is not None, "not mesh-backed"
        assert system.index.ann_active and system.index._sharded.ann_active
        # self-tuning ran on build (target_recall configured)
        assert 1 <= system.index.config.ann_nprobe <= 4
        assert system.search("a frame", SearchOptions(limit=3))

        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        server = RetrievalServer(system, host="127.0.0.1", port=port)
        server.run(block=False)
        time.sleep(1.0)
        base = f"http://127.0.0.1:{port}"

        def post(route, payload):
            req = urllib.request.Request(
                base + route, data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, _json.loads(r.read())

        try:
            code, res = post("/api/search", {"query": "scene", "limit": 3})
            assert code == 200 and res["success"] and res["count"] == 3
            code, out = post("/api/maintenance",
                             {"action": "build_ann", "nlist": 4})
            assert code == 200 and out["report"]["nlist"] == 4
            assert system.index._sharded.ann_active
            code, out = post(
                "/api/maintenance",
                {"action": "tune_ann", "target_recall": 0.9, "sample": 4},
            )
            assert code == 200 and out["report"]["nprobe"] >= 1
            code, res = post("/api/search", {"query": "again", "limit": 2})
            assert code == 200 and res["success"] and res["count"] == 2
        finally:
            server.stop()
            system.cleanup()


class TestShardedBatchComposition:
    """Round-4 batched union program through the mesh: a query's sharded
    results must not depend on its micro-batch peers, and single-query
    dispatch must agree with the batch."""

    def test_batch_vs_single_query(self, placed, corpus, mesh):
        x_single, x_sh, state, sivf, _ = placed
        _, q = corpus
        batch = sharded_ivf_topk(
            mesh, x_sh, sivf, jnp.asarray(q), 10, nprobe=16, n_valid=N
        )
        for i in range(len(q)):
            one = sharded_ivf_topk(
                mesh, x_sh, sivf, jnp.asarray(q[i:i + 1]), 10, nprobe=16,
                n_valid=N,
            )
            assert set(np.asarray(batch.indices[i]).tolist()) == set(
                np.asarray(one.indices[0]).tolist()
            )
            np.testing.assert_allclose(
                np.sort(np.asarray(batch.scores[i])),
                np.sort(np.asarray(one.scores[0])),
                atol=1e-5,
            )

    def test_batch_vs_single_query_small_nprobe(self, placed, corpus, mesh):
        """Regression (round-4): the union float program's phase-B rescore
        dropped the own-probe mask; at small nprobe most of a query's
        candidate row is -inf filler whose chunks hold OTHER queries'
        bucket rows, so those leaked genuine f32 scores at rescore and
        batched sharded results diverged from B=1. nprobe=2 keeps the
        finite fraction small enough to exercise the leak on every shard."""
        _, x_sh, _, sivf, _ = placed
        _, q = corpus
        batch = sharded_ivf_topk(
            mesh, x_sh, sivf, jnp.asarray(q), 10, nprobe=2, n_valid=N
        )
        for i in range(len(q)):
            one = sharded_ivf_topk(
                mesh, x_sh, sivf, jnp.asarray(q[i:i + 1]), 10, nprobe=2,
                n_valid=N,
            )
            assert set(np.asarray(batch.indices[i]).tolist()) == set(
                np.asarray(one.indices[0]).tolist()
            ), f"query {i}: sharded batched candidate set differs from B=1"
            np.testing.assert_allclose(
                np.sort(np.asarray(batch.scores[i])),
                np.sort(np.asarray(one.scores[0])),
                atol=1e-5,
            )

    def test_composition_invariance(self, placed, corpus, mesh):
        _, x_sh, _, sivf, _ = placed
        _, q = corpus
        a = sharded_ivf_topk(
            mesh, x_sh, sivf, jnp.asarray(q[[0, 1]]), 5, nprobe=16, n_valid=N
        )
        b = sharded_ivf_topk(
            mesh, x_sh, sivf, jnp.asarray(q[[0, 5, 3, 2]]), 5, nprobe=16,
            n_valid=N,
        )
        assert set(np.asarray(a.indices[0]).tolist()) == set(
            np.asarray(b.indices[0]).tolist()
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(a.scores[0])),
            np.sort(np.asarray(b.scores[0])),
            atol=1e-6,
        )
