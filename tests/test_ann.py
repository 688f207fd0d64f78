"""IVF approximate search (`ops.ann`): build invariants, exactness at full
probing, recall on clustered corpora, tombstones, tail appends, int8 metric
equality. All on the CPU backend — the IVF programs are pure XLA (no
Pallas), so the tested programs are the production programs."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from intelligent_video_analysis_retrieval_system_tpu.ops import ann
from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
    IVFState,
    build_ivf,
    default_nlist,
    ivf_topk,
    tail_append,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
    quantize_rows_int8,
    topk_search_int8,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
    topk_search,
)


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n, d, n_clusters=32, noise=0.35):
    """CLIP-like corpus: rows concentrate around cluster directions.
    ``noise`` is the TOTAL noise-vector norm relative to the unit center
    (per-dim std scales by 1/sqrt(d) — at 0.35 the intra-cluster cosine is
    ~0.94, matching measured CLIP video-frame corpora)."""
    centers = _normed(rng, n_clusters, d)
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + (noise / d**0.5) * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    """Clustered corpus + queries drawn NEAR corpus items (retrieval
    queries embed close to their matches; fully random directions in
    high-d have scattered neighbor sets no IVF can cover)."""
    rng = np.random.default_rng(7)
    x = _clustered(rng, 4096, 64)
    picks = rng.choice(len(x), size=16, replace=False)
    q = x[picks] + (0.5 / 64**0.5) * rng.standard_normal((16, 64)).astype(
        np.float32
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return x, q


@pytest.fixture(scope="module")
def ivf(corpus):
    x, _ = corpus
    state, report = build_ivf(
        jnp.asarray(x), len(x), nlist=64, kmeans_iters=6, seed=0
    )
    return state, report


class TestBuild:
    def test_default_nlist_scaling(self):
        assert default_nlist(0) == 64
        assert default_nlist(10_000) in (256, 512)
        assert 4096 <= default_nlist(10_000_000) <= 16384
        assert default_nlist(10**9) == 16384  # clamp

    def test_partition_invariant(self, corpus, ivf):
        """Every row id appears exactly once across buckets + tail."""
        x, _ = corpus
        state, report = ivf
        bucket = np.asarray(state.bucket_ids)
        tail = np.asarray(state.tail_ids)[: int(state.tail_count)]
        ids = np.concatenate([bucket[bucket >= 0].ravel(), tail])
        assert sorted(ids.tolist()) == list(range(len(x)))
        assert report.nlist == 64
        assert report.bucket_cap % 128 == 0

    def test_bucket_geometry(self, corpus, ivf):
        """Bucketed rows are near their bucket's centroid (spill keeps the
        most-similar rows in the home bucket)."""
        x, _ = corpus
        state, _ = ivf
        cent = np.asarray(state.centroids)
        assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-5)
        bucket = np.asarray(state.bucket_ids)
        # mean member->own-centroid sim must beat member->random-centroid
        own, rand = [], []
        rng = np.random.default_rng(0)
        for c in range(bucket.shape[0]):
            members = bucket[c][bucket[c] >= 0]
            if len(members) == 0:
                continue
            own.append(float(np.mean(x[members] @ cent[c])))
            rand.append(
                float(np.mean(x[members] @ cent[rng.integers(bucket.shape[0])]))
            )
        assert np.mean(own) > np.mean(rand) + 0.1

    def test_overflow_widens_caps(self):
        """Pathological distribution (all rows identical -> one cluster)
        still builds: caps widen, leftovers land in the tail."""
        rng = np.random.default_rng(1)
        base = _normed(rng, 1, 32)
        x = np.repeat(base, 600, axis=0) + 1e-4 * rng.standard_normal(
            (600, 32)
        ).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        state, report = build_ivf(
            jnp.asarray(x), len(x), nlist=64, cap_factor=1.0, kmeans_iters=3
        )
        bucket = np.asarray(state.bucket_ids)
        tail = np.asarray(state.tail_ids)[: int(state.tail_count)]
        ids = np.concatenate([bucket[bucket >= 0].ravel(), tail])
        assert sorted(ids.tolist()) == list(range(len(x)))


class TestSearch:
    def test_full_probe_is_exact(self, corpus, ivf):
        """nprobe == nlist scans every bucket + tail => exact top-k."""
        x, q = corpus
        state, _ = ivf
        xd = jnp.asarray(x)
        got = ivf_topk(xd, state, jnp.asarray(q), k=10, nprobe=64)
        want = topk_search(xd, jnp.asarray(q), k=10, use_pallas=False)
        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(want.indices)
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), atol=1e-5
        )

    def test_recall_at_moderate_nprobe(self, corpus, ivf):
        x, q = corpus
        state, _ = ivf
        xd = jnp.asarray(x)
        got = ivf_topk(xd, state, jnp.asarray(q), k=10, nprobe=8)
        want = topk_search(xd, jnp.asarray(q), k=10, use_pallas=False)
        hits = sum(
            len(set(g) & set(w))
            for g, w in zip(
                np.asarray(got.indices).tolist(),
                np.asarray(want.indices).tolist(),
            )
        )
        recall = hits / (len(q) * 10)
        assert recall >= 0.9, f"recall@10 {recall} too low at nprobe=8/64"

    def test_scores_match_dense_metric(self, corpus, ivf):
        """Returned scores equal the dense path's scores for the same ids
        (same metric — approximation is only in candidate coverage)."""
        x, q = corpus
        state, _ = ivf
        got = ivf_topk(jnp.asarray(x), state, jnp.asarray(q), k=5, nprobe=16)
        ids = np.asarray(got.indices)
        scores = np.asarray(got.scores)
        for b in range(len(q)):
            expect = x[ids[b]] @ q[b]
            np.testing.assert_allclose(scores[b], expect, atol=1e-5)

    def test_tombstones_respected(self, corpus, ivf):
        x, q = corpus
        state, _ = ivf
        xd = jnp.asarray(x)
        first = ivf_topk(xd, state, jnp.asarray(q), k=5, nprobe=64)
        kill = np.unique(np.asarray(first.indices)[:, 0])
        deleted = np.zeros((len(x), 1), np.int8)
        deleted[kill] = 1
        got = ivf_topk(
            xd, state, jnp.asarray(q), k=5, nprobe=64,
            deleted=jnp.asarray(deleted),
        )
        assert not set(np.asarray(got.indices).ravel()) & set(kill.tolist())
        want = topk_search(
            xd, jnp.asarray(q), k=5, use_pallas=False,
            deleted=jnp.asarray(deleted),
        )
        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(want.indices)
        )

    def test_n_valid_masks_padding(self, corpus, ivf):
        """Rows beyond n_valid (padded capacity) never surface."""
        x, q = corpus
        state, _ = ivf
        pad = np.concatenate([x, np.ones((128, x.shape[1]), np.float32)])
        got = ivf_topk(
            jnp.asarray(pad), state, jnp.asarray(q), k=10, nprobe=64,
            n_valid=len(x),
        )
        assert np.asarray(got.indices).max() < len(x)

    def test_k_exceeds_candidates(self, corpus, ivf):
        """k larger than live rows: finite prefix, -inf tail."""
        x, q = corpus
        state, _ = ivf
        got = ivf_topk(
            jnp.asarray(x), state, jnp.asarray(q[:2]), k=30, nprobe=2
        )
        s = np.asarray(got.scores)
        assert s.shape == (2, 30)
        assert np.isfinite(s[:, 0]).all()

    def test_empty_corpus(self, corpus, ivf):
        x, q = corpus
        state, _ = ivf
        got = ivf_topk(
            jnp.asarray(x), state, jnp.asarray(q), k=5, nprobe=4, n_valid=0
        )
        assert got.scores.shape == (len(q), 0)


class TestTail:
    def test_tail_append_rows_found(self, corpus, ivf):
        """Appended rows (registered in the tail) are searchable even at
        nprobe=1 — the tail is always scanned."""
        x, q = corpus
        state, _ = ivf
        new = q[:3]  # append the query vectors themselves
        pad = np.concatenate([x, new]).astype(np.float32)
        state2 = tail_append(state, [len(x), len(x) + 1, len(x) + 2])
        got = ivf_topk(
            jnp.asarray(pad), state2, jnp.asarray(q[:3]), k=1, nprobe=1
        )
        ids = np.asarray(got.indices)[:, 0]
        np.testing.assert_array_equal(ids, [len(x), len(x) + 1, len(x) + 2])
        np.testing.assert_allclose(
            np.asarray(got.scores)[:, 0], 1.0, atol=1e-5
        )

    def test_tail_overflow_raises(self, ivf):
        state, _ = ivf
        with pytest.raises(OverflowError):
            tail_append(state, list(range(ann.TAIL_MAX + 1)))

    def test_original_state_unchanged(self, corpus, ivf):
        state, _ = ivf
        before = int(state.tail_count)
        tail_append(state, [4096])
        assert int(state.tail_count) == before  # functional update


class TestInt8:
    def test_int8_full_probe_matches_dense_int8(self, corpus):
        """int8 IVF at full probing == dense int8 path (same integer
        metric, bit-exact)."""
        x, q = corpus
        rows, scales = quantize_rows_int8(x)
        state, _ = build_ivf(
            jnp.asarray(rows), len(x), x_scales=jnp.asarray(scales),
            nlist=64, kmeans_iters=4
        )
        got = ivf_topk(
            jnp.asarray(rows), state, jnp.asarray(q), k=10, nprobe=64,
            x_scales=jnp.asarray(scales),
        )
        want = topk_search_int8(
            jnp.asarray(rows), jnp.asarray(scales), jnp.asarray(q), k=10,
            use_pallas=False,
        )
        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(want.indices)
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), rtol=1e-6
        )

    def test_int8_recall(self, corpus):
        x, q = corpus
        rows, scales = quantize_rows_int8(x)
        state, _ = build_ivf(
            jnp.asarray(rows), len(x), x_scales=jnp.asarray(scales),
            nlist=64, kmeans_iters=4
        )
        got = ivf_topk(
            jnp.asarray(rows), state, jnp.asarray(q), k=10, nprobe=8,
            x_scales=jnp.asarray(scales),
        )
        want = topk_search_int8(
            jnp.asarray(rows), jnp.asarray(scales), jnp.asarray(q), k=10,
            use_pallas=False,
        )
        hits = sum(
            len(set(g) & set(w))
            for g, w in zip(
                np.asarray(got.indices).tolist(),
                np.asarray(want.indices).tolist(),
            )
        )
        assert hits / (len(q) * 10) >= 0.9


# ---------------------------------------------------------------------------
# UnifiedIndex integration: config plumbing, persistence, lifecycle
# ---------------------------------------------------------------------------

from intelligent_video_analysis_retrieval_system_tpu.index import (  # noqa: E402
    IndexContainer,
    UnifiedIndex,
    UnifiedIndexConfig,
)


def _make_index(tmp_path, x, dtype="float32", **cfg_kwargs):
    path = tmp_path / "ann.rvdb"
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
    defaults = dict(ann=True, ann_nlist=64, ann_nprobe=64)
    defaults.update(cfg_kwargs)
    cfg = UnifiedIndexConfig(**defaults)
    return UnifiedIndex(cfg).load_unified_index(path, mode="a")


@pytest.fixture(scope="module")
def big_corpus():
    rng = np.random.default_rng(11)
    x = _clustered(rng, 2048, 32)
    q = x[rng.choice(2048, 4, replace=False)]
    return x, q


class TestUnifiedIndexANN:
    def test_full_probe_matches_exact_path(self, tmp_path, big_corpus):
        x, q = big_corpus
        idx = _make_index(tmp_path, x)
        assert idx.ann_active
        approx = idx.search_vectors(q, top_k=5)
        exact = idx.search_vectors(q, top_k=5, exact=True)
        for a_hits, e_hits in zip(approx, exact):
            assert [h.metadata.row_id for h in a_hits] == [
                h.metadata.row_id for h in e_hits
            ]
        idx.close()

    def test_moderate_nprobe_recall(self, tmp_path, big_corpus):
        x, q = big_corpus
        idx = _make_index(tmp_path, x, ann_nprobe=8)
        approx = idx.search_vectors(q, top_k=10)
        exact = idx.search_vectors(q, top_k=10, exact=True)
        hits = sum(
            len(
                {h.metadata.row_id for h in a}
                & {h.metadata.row_id for h in e}
            )
            for a, e in zip(approx, exact)
        )
        assert hits / (len(q) * 10) >= 0.9
        idx.close()

    def test_persist_and_restore(self, tmp_path, big_corpus):
        """ANN persists in the container; a later open (even with a
        default config, matching FAISS's persisted-index-type semantics)
        restores it without a rebuild."""
        x, q = big_corpus
        idx = _make_index(tmp_path, x)
        idx.close()
        reloaded = UnifiedIndex().load_unified_index(tmp_path / "ann.rvdb")
        assert reloaded.ann_active
        stats = reloaded.get_stats()
        assert stats["ann"]["nlist"] == 64
        assert stats["ann"]["ann_rows"] == len(x)
        reloaded.close()

    def test_append_goes_to_tail_and_survives_reload(
        self, tmp_path, big_corpus
    ):
        x, _ = big_corpus
        idx = _make_index(tmp_path, x)
        # fresh random directions: appended rows are their own unique
        # nearest neighbors (querying corpus-near vectors would tie with
        # the original rows)
        rng = np.random.default_rng(99)
        new = _normed(rng, 4, x.shape[1])
        idx.incremental_update(
            new,
            [
                {"folder": "w", "image": f"n{i}.jpg", "frame_id": i}
                for i in range(len(new))
            ],
        )
        assert idx.ann_active
        hits = idx.search_vectors(new, top_k=1)
        got = [h[0].metadata.row_id for h in hits]
        assert got == [len(x) + i for i in range(len(new))]
        idx.close()
        # reload: persisted ann covers len(x) rows; the 4 appended rows
        # must re-enter the tail at restore
        re = UnifiedIndex().load_unified_index(tmp_path / "ann.rvdb")
        assert re.ann_active
        assert re.get_stats()["ann"]["ann_rows"] == len(x) + len(new)
        hits = re.search_vectors(new, top_k=1)
        assert [h[0].metadata.row_id for h in hits] == got
        re.close()

    def test_delete_respected(self, tmp_path, big_corpus):
        x, q = big_corpus
        idx = _make_index(tmp_path, x)
        top = idx.search_vectors(q[:1], top_k=1)[0][0].metadata.row_id
        idx.delete_rows([top])
        hits = idx.search_vectors(q[:1], top_k=5)[0]
        assert top not in [h.metadata.row_id for h in hits]
        idx.close()

    def test_compact_rebuilds(self, tmp_path, big_corpus):
        """Compaction shifts row ids -> persisted ANN is NOT carried; the
        post-compact reload rebuilds because config.ann is on."""
        x, q = big_corpus
        idx = _make_index(tmp_path, x)
        kill = idx.search_vectors(q[:1], top_k=3)[0]
        idx.delete_rows([h.metadata.row_id for h in kill])
        out = idx.compact()
        assert out["compacted"] == 3
        assert idx.ann_active  # rebuilt on the post-compact reload
        approx = idx.search_vectors(q, top_k=5)
        exact = idx.search_vectors(q, top_k=5, exact=True)
        for a_hits, e_hits in zip(approx, exact):
            assert [h.metadata.row_id for h in a_hits] == [
                h.metadata.row_id for h in e_hits
            ]
        idx.close()

    def test_large_batch_falls_back_dense(self, tmp_path, big_corpus):
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann_max_batch=2)
        rng = np.random.default_rng(3)
        qs = x[rng.choice(len(x), 6, replace=False)]
        # 6 > max_batch 2: dense path; equality with exact is trivial but
        # exercises the routing branch
        approx = idx.search_vectors(qs, top_k=3)
        exact = idx.search_vectors(qs, top_k=3, exact=True)
        for a_hits, e_hits in zip(approx, exact):
            assert [h.metadata.row_id for h in a_hits] == [
                h.metadata.row_id for h in e_hits
            ]
        idx.close()

    def test_int8_container_ann(self, tmp_path, big_corpus):
        x, q = big_corpus
        idx = _make_index(tmp_path, x, dtype="int8")
        assert idx.ann_active
        approx = idx.search_vectors(q, top_k=5)
        exact = idx.search_vectors(q, top_k=5, exact=True)
        for a_hits, e_hits in zip(approx, exact):
            assert [h.metadata.row_id for h in a_hits] == [
                h.metadata.row_id for h in e_hits
            ]
            for a, e in zip(a_hits, e_hits):
                assert a.similarity_score == pytest.approx(
                    e.similarity_score, rel=1e-6
                )
        idx.close()

    def test_tune_nprobe_hits_target(self, tmp_path, big_corpus):
        """tune_nprobe walks the doubling ladder against the exact path,
        stops at the first rung meeting the target, and installs it."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann_nprobe=1)
        rep = idx.tune_nprobe(target_recall=0.95, sample=12, top_k=5,
                              seed=4)
        assert idx.config.ann_nprobe == rep["nprobe"]
        assert rep["ladder"][0][0] == 4  # ladder starts at 4
        nlist = idx.get_stats()["ann"]["nlist"]
        assert rep["recall"] >= 0.95 or rep["nprobe"] == nlist
        # ladder is strictly doubling and capped at nlist
        probes = [p for p, _ in rep["ladder"]]
        assert probes == sorted(set(probes))
        assert all(p <= nlist for p in probes)
        # tuned config actually serves >= target recall on fresh queries
        rng = np.random.default_rng(6)
        qs = x[rng.choice(len(x), 4, replace=False)]
        approx = idx.search_vectors(qs, top_k=5)
        exact = idx.search_vectors(qs, top_k=5, exact=True)
        hit = sum(
            len({h.metadata.row_id for h in a}
                & {h.metadata.row_id for h in e})
            for a, e in zip(approx, exact)
        )
        assert hit / (4 * 5) >= 0.8
        idx.close()

    def test_tune_nprobe_requires_ann(self, tmp_path, big_corpus):
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann=False)
        assert not idx.ann_active
        with pytest.raises(RuntimeError, match="ANN not active"):
            idx.tune_nprobe()
        idx.close()

    def test_ann_restore_flag_and_drop(self, tmp_path, big_corpus):
        """ann_restore=False forces exact-only serving despite a persisted
        structure; drop_ann removes it durably."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x)  # builds + persists on load
        idx.close()
        path = tmp_path / "ann.rvdb"
        exact_only = UnifiedIndex(
            UnifiedIndexConfig(ann_restore=False)
        ).load_unified_index(path)
        assert not exact_only.ann_active
        exact_only.close()
        # default config: FAISS-like restore, then durable drop
        re = UnifiedIndex().load_unified_index(path, mode="a")
        assert re.ann_active
        out = re.drop_ann()
        assert out["was_active"] and out["persisted_removed"]
        assert not re.ann_active
        re.close()
        re2 = UnifiedIndex().load_unified_index(path)
        assert not re2.ann_active
        re2.close()

    def test_tuned_nprobe_persists_across_reopen(self, tmp_path,
                                                 big_corpus):
        """The tuned probe count travels with the persisted structure
        (FAISS stores nprobe inside the index file too): a default-config
        reopen serves at the tuned value, not the dataclass default."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann_nprobe=1)
        rep = idx.tune_nprobe(target_recall=0.95, sample=12, top_k=5,
                              seed=4)
        assert not rep["raced_mutation"]
        tuned = rep["nprobe"]
        idx.close()
        re = UnifiedIndex().load_unified_index(tmp_path / "ann.rvdb")
        assert re.ann_active
        assert re.config.ann_nprobe == tuned
        re.close()

    def test_measure_crossover_installs_and_persists(self, tmp_path,
                                                     big_corpus):
        """measure_ann_crossover times IVF vs dense per batch size,
        installs the crossover as config.ann_max_batch, and persists it so
        a reopened index serves with the MEASURED cap (VERDICT r4 #3).

        CPU timings at this corpus size are noisy, so the test pins the
        mechanics (ladder shape, install, persistence round-trip), not the
        crossover value itself."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann_nprobe=4)
        rep = idx.measure_ann_crossover(batch_sizes=(1, 2, 4), repeats=1)
        assert not rep["raced_mutation"]
        assert rep["nprobe"] == 4
        assert 0 <= rep["max_batch"] <= 4
        assert idx.config.ann_max_batch == rep["max_batch"]
        assert idx._ann_crossover_measured
        for rung in rep["ladder"]:
            assert rung["ann_ms"] > 0 and rung["dense_ms"] > 0
        # the last winning rung IS the installed crossover
        wins = [r["batch"] for r in rep["ladder"]
                if r["ann_ms"] < r["dense_ms"]]
        assert rep["max_batch"] == (wins[-1] if wins else 0)
        idx.close()
        re = UnifiedIndex().load_unified_index(tmp_path / "ann.rvdb")
        assert re.ann_active
        assert re.config.ann_max_batch == rep["max_batch"]
        assert re._ann_crossover_measured
        re.close()

    def test_measure_crossover_requires_ann(self, tmp_path, big_corpus):
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann=False)
        with pytest.raises(RuntimeError, match="ANN not active"):
            idx.measure_ann_crossover()
        idx.close()

    def test_explicit_nprobe_bypasses_batch_cap(self, tmp_path,
                                                big_corpus, monkeypatch):
        """An explicit per-call nprobe is an explicit request for the IVF
        path: it must probe even for batches above ann_max_batch (this is
        how measure_ann_crossover times B > cap without mutating the live
        config)."""
        import intelligent_video_analysis_retrieval_system_tpu.ops.ann as ann_mod

        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann_max_batch=2)
        rng = np.random.default_rng(3)
        qs = x[rng.choice(len(x), 6, replace=False)]
        calls = []
        real = ann_mod.ivf_topk
        monkeypatch.setattr(
            ann_mod, "ivf_topk",
            lambda *a, **kw: (calls.append(1), real(*a, **kw))[1],
        )
        idx.search_vectors(qs, top_k=3)          # 6 > cap 2: dense
        assert calls == []
        idx.search_vectors(qs, top_k=3, nprobe=64)   # explicit: probes
        assert len(calls) == 1
        idx.search_vectors(qs, top_k=3, exact=True)  # exact always wins
        assert len(calls) == 1
        idx.close()

    def test_overflow_append_defers_ann_rebuild(self, tmp_path, big_corpus):
        """A capacity-overflow append must NOT run a synchronous k-means
        rebuild under the lock: with no restorable persisted state, ANN
        degrades to dense until build_ann() is called."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x)
        assert idx.ann_active and idx._capacity == len(x)  # full to the brim
        idx._container.drop_ann()  # nothing to restore after the reload
        rng = np.random.default_rng(3)
        new = _normed(rng, 4, x.shape[1])
        idx.incremental_update(
            new,
            [{"folder": "w", "image": f"n{i}.jpg", "frame_id": i}
             for i in range(4)],
        )
        assert idx.ntotal == len(x) + 4
        assert not idx.ann_active, "append ran a synchronous ANN rebuild"
        hits = idx.search_vectors(new, top_k=1)  # dense fallback is exact
        assert [h[0].metadata.row_id for h in hits] == [
            len(x) + i for i in range(4)
        ]
        idx.build_ann()  # explicit rebuild reactivates
        assert idx.ann_active
        idx.close()


class TestOffLockBuild:
    """Round-4 serving fix: build_ann runs the k-means OFF the index lock
    (snapshot -> build -> generation-checked install) so live searches
    keep serving during a rebuild. These tests drive the reconcile paths
    deterministically by patching ``ops.ann.build_ivf`` with wrappers
    that mutate the index mid-build (same thread, no lock held — exactly
    the window a concurrent request would use)."""

    def _patch_build(self, monkeypatch, side_effect):
        from intelligent_video_analysis_retrieval_system_tpu.ops import (
            ann as ann_mod,
        )

        real = ann_mod.build_ivf
        calls = []

        def wrapper(*args, **kwargs):
            calls.append(1)
            side_effect(len(calls))
            return real(*args, **kwargs)

        monkeypatch.setattr(ann_mod, "build_ivf", wrapper)
        return calls

    def test_append_during_build_rides_tail(self, tmp_path, big_corpus,
                                            monkeypatch):
        """Rows appended between the snapshot and the install are
        registered in the FRESH state's tail — searchable via ANN
        immediately, no dense fallback, no lost rows."""
        x, _ = big_corpus
        # leave spare padded capacity: at exactly-full capacity an append
        # becomes a reload (the REMAP path, tested separately)
        x = x[: len(x) - 16]
        idx = _make_index(tmp_path, x)
        assert idx._capacity > len(x) + 3, "need in-place append headroom"
        rng = np.random.default_rng(17)
        new = _normed(rng, 3, x.shape[1])

        def mid_build_append(call_no):
            if call_no == 1:
                idx.incremental_update(
                    new,
                    [{"folder": "mid", "image": f"m{i}.jpg", "frame_id": i}
                     for i in range(3)],
                )

        calls = self._patch_build(monkeypatch, mid_build_append)
        idx.build_ann(check_recall=False)
        assert len(calls) == 1  # no retry: appends reconcile in place
        assert idx.ann_active
        assert int(idx._ann.tail_count) >= 3
        hits = idx.search_vectors(new, top_k=1)  # ANN path (B=3 <= max)
        assert [h[0].metadata.row_id for h in hits] == [
            len(x) + i for i in range(3)
        ]
        idx.close()

    def test_remap_during_build_retries(self, tmp_path, big_corpus,
                                        monkeypatch):
        """A row remap (reload/compact) mid-build makes the built state's
        ids stale: the install must detect it and rebuild."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x)

        def bump_once(call_no):
            if call_no == 1:
                idx._rows_gen += 1

        calls = self._patch_build(monkeypatch, bump_once)
        idx.build_ann(check_recall=False)
        assert len(calls) == 2  # first build discarded, second installed
        assert idx.ann_active
        idx.close()

    def test_persistent_remap_raises_and_keeps_old_state(
        self, tmp_path, big_corpus, monkeypatch
    ):
        x, _ = big_corpus
        idx = _make_index(tmp_path, x)
        old_state = idx._ann
        assert old_state is not None

        calls = self._patch_build(monkeypatch, lambda _n: setattr(
            idx, "_rows_gen", idx._rows_gen + 1
        ))
        with pytest.raises(RuntimeError, match="mid-build"):
            idx.build_ann(check_recall=False)
        assert len(calls) == 3
        assert idx._ann is old_state  # previous structure still serving
        idx.close()

    def test_nprobe_override_does_not_touch_config(self, tmp_path,
                                                   big_corpus):
        """The per-call nprobe override (tune_nprobe's ladder mechanism)
        must leave the live config untouched and equal exact at
        nprobe=nlist."""
        x, q = big_corpus
        # ann_target_recall=None: the on-load recall check would itself
        # retune ann_nprobe, which is exactly the machinery under test
        idx = _make_index(tmp_path, x, ann_nprobe=1, ann_target_recall=None)
        assert idx.config.ann_nprobe == 1
        nlist = int(idx._ann.bucket_ids.shape[0])
        got = idx.search_vectors(q, top_k=5, nprobe=nlist)
        exact = idx.search_vectors(q, top_k=5, exact=True)
        for g_hits, e_hits in zip(got, exact):
            assert {h.metadata.row_id for h in g_hits} == {
                h.metadata.row_id for h in e_hits
            }
        assert idx.config.ann_nprobe == 1  # override never installed
        rep = idx.tune_nprobe(target_recall=0.9, sample=8, top_k=5)
        assert rep["raced_mutation"] is False
        assert idx.config.ann_nprobe == rep["nprobe"]
        idx.close()

    def test_donated_snapshot_retries(self, tmp_path, big_corpus,
                                      monkeypatch):
        """The MESH backend's in-place append DONATES the old device
        buffer (parallel/sharded_search.py donate_argnums=(0,)) — the
        very array the off-lock build snapshotted. Simulate that here
        (CPU jax ignores donation, so: append via the public API — which
        rebinds the live buffer — then .delete() the snapshotted arg):
        build_ann must treat the deleted-array error like a remap and
        rebuild over the fresh buffer, appends included."""
        from intelligent_video_analysis_retrieval_system_tpu.ops import (
            ann as ann_mod,
        )

        x, _ = big_corpus
        x = x[: len(x) - 16]  # headroom for the in-place append
        idx = _make_index(tmp_path, x)
        rng = np.random.default_rng(23)
        new = _normed(rng, 3, x.shape[1])
        real = ann_mod.build_ivf
        calls = []

        def wrapper(snap_x, *args, **kwargs):
            calls.append(1)
            if len(calls) == 1:
                idx.incremental_update(
                    new,
                    [{"folder": "mid", "image": f"d{i}.jpg", "frame_id": i}
                     for i in range(3)],
                )
                assert idx._dev_x is not snap_x  # append rebound the live buffer
                snap_x.delete()  # what donation does to the old one
            return real(snap_x, *args, **kwargs)

        monkeypatch.setattr(ann_mod, "build_ivf", wrapper)
        idx.build_ann(check_recall=False)
        assert len(calls) == 2  # deleted-array build retried once
        assert idx.ann_active
        hits = idx.search_vectors(new, top_k=1)
        assert [h[0].metadata.row_id for h in hits] == [
            len(x) + i for i in range(3)
        ]
        idx.close()

    def test_raced_tune_does_not_install(self, tmp_path, big_corpus,
                                         monkeypatch):
        """A remap racing tune_nprobe's ladder deflates the recall
        estimate (stale exact ids vs new row ids) — the skewed nprobe
        must be DISCARDED, not installed with a warning."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann_nprobe=4, ann_target_recall=None)
        before = idx.config.ann_nprobe
        real = idx.search_vectors
        state = {"bumped": False}

        def racing_search(*args, **kwargs):
            out = real(*args, **kwargs)
            if not state["bumped"]:
                state["bumped"] = True
                idx.generation += 1  # what a compact/reload does
            return out

        monkeypatch.setattr(idx, "search_vectors", racing_search)
        rep = idx.tune_nprobe(target_recall=0.9, sample=8, top_k=5)
        assert rep["raced_mutation"] is True
        assert idx.config.ann_nprobe == before  # skewed value not installed
        idx.close()

    def test_ann_swap_mid_ladder_detected(self, tmp_path, big_corpus,
                                          monkeypatch):
        """build_ann installing a NEW IVF structure mid-ladder does not
        bump self.generation (ANN swaps aren't row mutations) — the
        tune must still detect it via the ANN-state generation and
        discard the mixed-structure measurement."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann_nprobe=4, ann_target_recall=None)
        before = idx.config.ann_nprobe
        real = idx.search_vectors
        state = {"swapped": False}

        def racing_search(*args, **kwargs):
            out = real(*args, **kwargs)
            if not state["swapped"]:
                state["swapped"] = True
                idx.build_ann(check_recall=False)  # concurrent rebuild
            return out

        monkeypatch.setattr(idx, "search_vectors", racing_search)
        rep = idx.tune_nprobe(target_recall=0.9, sample=8, top_k=5)
        assert rep["raced_mutation"] is True
        assert idx.config.ann_nprobe == before
        idx.close()

    def test_drop_ann_mid_ladder_detected(self, tmp_path, big_corpus,
                                          monkeypatch):
        """drop_ann mid-ladder makes the remaining rungs exact
        (recall=1.0), terminating the ladder at its first rung — the
        optimistic nprobe must be discarded, not installed."""
        x, _ = big_corpus
        idx = _make_index(tmp_path, x, ann_nprobe=8, ann_target_recall=None)
        before = idx.config.ann_nprobe
        real = idx.search_vectors
        state = {"dropped": False}

        def racing_search(*args, **kwargs):
            out = real(*args, **kwargs)
            if not state["dropped"]:
                state["dropped"] = True
                idx.drop_ann()
            return out

        monkeypatch.setattr(idx, "search_vectors", racing_search)
        rep = idx.tune_nprobe(target_recall=0.99, sample=8, top_k=5)
        assert rep["raced_mutation"] is True
        assert idx.config.ann_nprobe == before
        idx.close()

    def test_persistent_donation_raises_accurate_error(
        self, tmp_path, big_corpus, monkeypatch
    ):
        """Steady append traffic on a mesh donates (deletes) every
        snapshot: build_ann must exhaust its OWN donation budget and
        name appends as the cause — not blame 'reloads' — while the
        previous structure keeps serving."""
        from intelligent_video_analysis_retrieval_system_tpu.ops import (
            ann as ann_mod,
        )

        x, _ = big_corpus
        idx = _make_index(tmp_path, x)
        old_state = idx._ann
        assert old_state is not None
        calls = []

        def always_donated(*args, **kwargs):
            calls.append(1)
            raise RuntimeError("Array has been deleted.")

        monkeypatch.setattr(ann_mod, "build_ivf", always_donated)
        with pytest.raises(RuntimeError, match="donating"):
            idx.build_ann(check_recall=False)
        assert len(calls) == 5  # donation budget, wider than remap's 3
        assert idx._ann is old_state  # previous structure still serving
        idx.close()

    def test_nprobe_zero_rejected(self, tmp_path, big_corpus):
        """nprobe=0 must error, not silently fall back to the config."""
        x, q = big_corpus
        idx = _make_index(tmp_path, x, ann_target_recall=None)
        with pytest.raises(ValueError, match="nprobe"):
            idx.search_vectors(q[:1], top_k=5, nprobe=0)
        idx.close()


class TestBatchedSearcher:
    """The batched union-dedup program (`_build_ivf_batch_searcher`,
    round 4): per-query results must be IDENTICAL to the B=1 program
    regardless of batch composition (own-probe masking), with the int8
    metric bit-exact. This is the determinism contract that makes ANN
    safe under the serving batcher's variable micro-batches."""

    def test_dedup_probes_compacts_unique(self):
        from jax import jit

        probes = jnp.asarray([[3, 1, 3], [1, 2, 2], [7, 3, 1]], jnp.int32)
        u = jit(ann._dedup_probes, static_argnums=(1, 2))(probes, 8, 9)
        got = np.asarray(u)
        uniq = sorted({3, 1, 2, 7})
        assert list(got[: len(uniq)]) == uniq
        assert all(v == 8 for v in got[len(uniq):])  # sentinel fill

    def test_dedup_probes_slots_cap(self):
        from jax import jit

        # more flat probes than nlist: u_slots = nlist still holds all
        probes = jnp.asarray(np.random.default_rng(0).integers(
            0, 4, size=(8, 3)), jnp.int32)
        u = jit(ann._dedup_probes, static_argnums=(1, 2))(probes, 4, 4)
        assert set(np.asarray(u)) >= set(np.asarray(probes).ravel())

    @pytest.mark.parametrize("b", [2, 5, 8, 16])
    def test_batched_equals_single_float(self, corpus, ivf, b):
        x, q = corpus
        state, _ = ivf
        xd = jnp.asarray(x)
        qb = jnp.asarray(q[:b])
        got = ivf_topk(xd, state, qb, k=10, nprobe=8)
        for i in range(b):
            one = ivf_topk(xd, state, qb[i:i + 1], k=10, nprobe=8)
            # same candidate SET + scores (float ties may reorder)
            assert set(np.asarray(got.indices[i]).tolist()) == set(
                np.asarray(one.indices[0]).tolist()
            )
            np.testing.assert_allclose(
                np.sort(np.asarray(got.scores[i])),
                np.sort(np.asarray(one.scores[0])),
                atol=1e-5,
            )

    def test_batched_equals_single_int8(self, corpus, ivf):
        x, q = corpus
        state, _ = ivf
        x_i8, scales = quantize_rows_int8(jnp.asarray(x))
        qb = jnp.asarray(q)
        got = ivf_topk(x_i8, state, qb, k=10, nprobe=8, x_scales=scales)
        for i in range(len(q)):
            one = ivf_topk(
                x_i8, state, qb[i:i + 1], k=10, nprobe=8, x_scales=scales
            )
            # integer metric: bit-exact, order included (ties broken by
            # candidate id position are identical only as SETS — compare
            # sets + exact sorted scores)
            assert set(np.asarray(got.indices[i]).tolist()) == set(
                np.asarray(one.indices[0]).tolist()
            )
            np.testing.assert_array_equal(
                np.sort(np.asarray(got.scores[i])),
                np.sort(np.asarray(one.scores[0])),
            )

    def test_batched_equals_single_bf16_small_nprobe(self, corpus, ivf):
        """Regression (round-4 review): the union float program's phase-B
        rescore dropped the own-probe mask, so at small nprobe (few own
        finite chunks) other queries' bucket rows leaked genuine f32
        scores through the -inf filler chunks and batched results
        diverged from B=1 — 5/8 queries differed on this exact shape
        before the fix (bf16 storage, nprobe=2, k=16)."""
        x, q = corpus
        state, _ = ivf
        xd = jnp.asarray(x, jnp.bfloat16)
        qb = jnp.asarray(q[:8])
        got = ivf_topk(xd, state, qb, k=16, nprobe=2)
        for i in range(8):
            one = ivf_topk(xd, state, qb[i:i + 1], k=16, nprobe=2)
            assert set(np.asarray(got.indices[i]).tolist()) == set(
                np.asarray(one.indices[0]).tolist()
            ), f"query {i}: batched candidate set differs from B=1"
            np.testing.assert_allclose(
                np.sort(np.asarray(got.scores[i])),
                np.sort(np.asarray(one.scores[0])),
                atol=1e-5,
            )

    def test_batch_composition_invariance(self, corpus, ivf):
        """A query's results must not depend on WHICH other queries share
        its micro-batch (serving batches are arbitrary compositions)."""
        x, q = corpus
        state, _ = ivf
        xd = jnp.asarray(x)
        a = ivf_topk(xd, state, jnp.asarray(q[[0, 1, 2, 3]]), k=5, nprobe=8)
        b = ivf_topk(xd, state, jnp.asarray(q[[0, 9, 12, 15]]), k=5, nprobe=8)
        assert set(np.asarray(a.indices[0]).tolist()) == set(
            np.asarray(b.indices[0]).tolist()
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(a.scores[0])),
            np.sort(np.asarray(b.scores[0])),
            atol=1e-6,
        )

    def test_batched_with_deletes_and_tail(self, corpus, ivf):
        x, q = corpus
        state, _ = ivf
        # move the last 8 rows into the tail (as post-build appends would)
        state = tail_append(state, list(range(len(x) - 8, len(x))))
        xd = jnp.asarray(x)
        deleted = np.zeros((len(x), 1), np.int8)
        top0 = ivf_topk(xd, state, jnp.asarray(q[:4]), k=3, nprobe=64)
        deleted[np.asarray(top0.indices[0, 0])] = 1
        got = ivf_topk(
            xd, state, jnp.asarray(q[:4]), k=3, nprobe=64,
            deleted=jnp.asarray(deleted),
        )
        assert int(top0.indices[0, 0]) not in np.asarray(got.indices).ravel()
        for i in range(4):
            one = ivf_topk(
                xd, state, jnp.asarray(q[i:i + 1]), k=3, nprobe=64,
                deleted=jnp.asarray(deleted),
            )
            assert set(np.asarray(got.indices[i]).tolist()) == set(
                np.asarray(one.indices[0]).tolist()
            )

    def test_program_b_memory_cap(self):
        assert ann._max_program_b(8192, 2560, 768, 32, 1) >= 8
        # bf16 at the same geometry halves the cap
        assert ann._max_program_b(8192, 2560, 768, 32, 2) <= (
            ann._max_program_b(8192, 2560, 768, 32, 1)
        )
        # tiny nlist: union saturates at nlist, cap never binds
        assert ann._max_program_b(64, 256, 64, 8, 4) == ann._MAX_PROGRAM_B


class TestBuildRecallGuard:
    """Default-on build_ann recall guard (round 4, VERDICT r3 #6): the
    structureless-corpus footgun must be loud, not silent."""

    def _container_index(self, tmp_path, x, **cfg):
        return _make_index(tmp_path, x, **cfg)

    def test_uniform_corpus_tunes_to_full_probe_and_warns(self, tmp_path):
        import logging

        # capture via a handler attached DIRECTLY to the "ivars" logger:
        # earlier tests may configure it with propagate=False, which makes
        # caplog order-dependent in full-suite runs
        records = []

        class _Grab(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        grab = _Grab(level=logging.WARNING)
        log = logging.getLogger("ivars")
        log.addHandler(grab)
        try:
            rng = np.random.default_rng(0)
            x = _normed(rng, 2048, 32)  # NO cluster structure
            idx = _make_index(
                tmp_path, x, ann_nlist=32, ann_nprobe=2, ann_max_batch=4
            )
        finally:
            log.removeHandler(grab)
        # the guard must have climbed the ladder (possibly to nlist) and,
        # if it hit full probing, warned about weak structure
        assert idx.ann_active
        assert idx.config.ann_nprobe > 2, "guard did not retune nprobe"
        if idx.config.ann_nprobe >= 32:
            assert any("weak cluster structure" in m for m in records)
        # whatever it picked, served recall now meets the target
        q = _normed(rng, 8, 32)
        got = idx.search_vectors(q, top_k=5)
        want = idx.search_vectors(q, top_k=5, exact=True)
        hits = sum(
            len({h.metadata.row_id for h in g}
                & {h.metadata.row_id for h in w}) / 5
            for g, w in zip(got, want)
        ) / 8
        assert hits >= 0.85  # target 0.95 measured on perturbed samples
        idx.close()

    def test_clustered_corpus_keeps_cheap_nprobe(self, tmp_path):
        rng = np.random.default_rng(1)
        x = _clustered(rng, 2048, 32)
        idx = _make_index(tmp_path, x, ann_nlist=64, ann_nprobe=4)
        assert idx.ann_active
        assert idx.config.ann_nprobe < 64, (
            "clustered corpus should not need full probing"
        )
        idx.close()

    def test_guard_disabled(self, tmp_path):
        rng = np.random.default_rng(2)
        x = _normed(rng, 1024, 32)
        idx = _make_index(
            tmp_path, x, ann_nlist=32, ann_nprobe=2, ann_target_recall=None
        )
        assert idx.config.ann_nprobe == 2, "guard ran despite None target"
        idx.close()

    def test_report_carries_recall_check(self, tmp_path):
        rng = np.random.default_rng(3)
        x = _clustered(rng, 1024, 32)
        idx = _make_index(tmp_path, x, ann_target_recall=None)
        report = idx.build_ann(check_recall=True)
        # explicit check without a config target: skipped (target unset)
        assert "recall_check" not in report
        idx.config.ann_target_recall = 0.9
        report = idx.build_ann()
        assert report["recall_check"]["recall"] >= 0.9
        idx.close()
