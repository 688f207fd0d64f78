"""Property-based tests (hypothesis) for kernel and codec invariants.

Each property is the contract users rely on, exercised over generated
inputs rather than fixtures: the kernel must equal the oracle for ANY
shape/data, codecs must round-trip, and dedup must be prefix-stable.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from intelligent_video_analysis_retrieval_system_tpu import native
from intelligent_video_analysis_retrieval_system_tpu.ops.dedup import (
    sequential_dedup,
    sequential_dedup_carry,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
    dequantize_rows_int8,
    quantize_rows_int8,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
    topk_exact_reference,
    topk_search,
)

_COMMON = dict(deadline=None, max_examples=25)


def _normed_array(rng_seed: int, n: int, d: int) -> np.ndarray:
    rng = np.random.default_rng(rng_seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


class TestTopKProperties:
    @settings(**_COMMON)
    @given(
        seed=st.integers(0, 2**16),
        n=st.integers(1, 400),
        d=st.sampled_from([8, 32, 64]),
        b=st.integers(1, 5),
        k=st.integers(1, 30),
    )
    def test_kernel_equals_oracle_any_shape(self, seed, n, d, b, k):
        x = jnp.asarray(_normed_array(seed, n, d))
        q = jnp.asarray(_normed_array(seed + 1, b, d))
        got = topk_search(x, q, k, use_pallas=True, interpret=True)
        want = topk_exact_reference(x, q, min(k, n))
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), atol=1e-5
        )

    @settings(**_COMMON)
    @given(seed=st.integers(0, 2**16), n=st.integers(2, 200))
    def test_scores_descend_and_ids_unique(self, seed, n):
        x = jnp.asarray(_normed_array(seed, n, 16))
        got = topk_search(x, x[:2], min(10, n), use_pallas=True, interpret=True)
        scores = np.asarray(got.scores)
        assert (np.diff(scores, axis=1) <= 1e-6).all()
        for row in np.asarray(got.indices):
            assert len(set(row.tolist())) == len(row)


class TestCodecProperties:
    @settings(**_COMMON)
    @given(seed=st.integers(0, 2**16), n=st.integers(1, 64))
    def test_bf16_codec_matches_jax(self, seed, n):
        rng = np.random.default_rng(seed)
        x = (rng.standard_normal(n * 8) * 10.0 ** rng.integers(-3, 4)).astype(
            np.float32
        )
        ours = native.f32_to_bf16(x)
        theirs = np.asarray(jnp.asarray(x, jnp.bfloat16)).view(np.uint16)
        np.testing.assert_array_equal(ours, theirs)

    @settings(**_COMMON)
    @given(seed=st.integers(0, 2**16), n=st.integers(1, 50))
    def test_int8_quant_error_bound(self, seed, n):
        x = _normed_array(seed, n, 32)
        q, s = quantize_rows_int8(x)
        back = dequantize_rows_int8(q, s)
        # symmetric quantization error bound: half a step per element
        assert (np.abs(back - x) <= (s[:, None] / 2) + 1e-7).all()

    @settings(**_COMMON)
    @given(seed=st.integers(0, 2**16), n=st.integers(1, 50))
    def test_numpy_and_jnp_quantizers_in_lockstep(self, seed, n):
        """quantize_rows_int8 (numpy, storage path) and ops.quant.
        symmetric_int8 (jnp, query/W8A8 path) claim to implement the SAME
        scheme — the bit-exactness contract between stored rows and
        query-time math depends on it (guards the round-2 dedup refactor)."""
        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            symmetric_int8,
        )

        x = _normed_array(seed, n, 32)
        q_np, s_np = quantize_rows_int8(x)
        q_j, s_j = symmetric_int8(jnp.asarray(x), axis=-1)
        np.testing.assert_array_equal(q_np, np.asarray(q_j))
        np.testing.assert_allclose(
            s_np, np.asarray(s_j)[:, 0], rtol=0, atol=0
        )


class TestDedupProperties:
    @settings(**_COMMON)
    @given(seed=st.integers(0, 2**16), n=st.integers(1, 60),
           split=st.integers(1, 59))
    def test_batched_scan_equals_whole_scan(self, seed, n, split):
        """Streaming dedup with a carry must give identical decisions to a
        single whole-sequence scan, for any batch split point."""
        split = min(split, n)
        emb = _normed_array(seed, n, 16)
        whole = np.asarray(sequential_dedup(jnp.asarray(emb), threshold=0.9))
        carry = jnp.zeros((16,), jnp.float32)
        keep1, carry = sequential_dedup_carry(
            jnp.asarray(emb[:split]), carry, threshold=0.9
        )
        keep2, _ = sequential_dedup_carry(
            jnp.asarray(emb[split:]), carry, threshold=0.9
        )
        streamed = np.concatenate([np.asarray(keep1), np.asarray(keep2)])
        np.testing.assert_array_equal(streamed, whole)

    @settings(**_COMMON)
    @given(seed=st.integers(0, 2**16), n=st.integers(1, 40))
    def test_first_always_kept_and_kept_are_distinct(self, seed, n):
        emb = _normed_array(seed, n, 16)
        keep = np.asarray(sequential_dedup(jnp.asarray(emb), threshold=0.95))
        assert keep[0]
        kept = emb[keep]
        # consecutive kept frames must be below the threshold
        if len(kept) > 1:
            sims = np.sum(kept[:-1] * kept[1:], axis=-1)
            assert (sims < 0.95 + 1e-5).all()


class TestTextProperties:
    """Text analyzer / translator never crash and keep their invariants
    for ANY unicode input (queries arrive from the open web console)."""

    @given(st.text(max_size=200))
    @settings(**_COMMON)
    def test_analyze_text_total_function(self, text):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            analyze_text,
        )

        a = analyze_text(text)
        assert all(w == w.lower() for w in a.content_words)
        assert len(a.content_words) == len(set(a.content_words))
        # every extracted word appears in the input (case-insensitive)
        low = text.lower()
        assert all(w in low for w in a.content_words)

    @given(st.text(max_size=200))
    @settings(**_COMMON)
    def test_translate_query_never_raises(self, text):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            UniversalQueryTranslator,
        )

        r = UniversalQueryTranslator().translate_query(text)
        assert 0.0 <= r.confidence <= 1.0
        assert isinstance(r.clip_prompt, str)
        assert r.method in {"passthrough", "dictionary", "llm"}

    @given(st.text(max_size=120))
    @settings(**_COMMON)
    def test_expand_variants_invariants(self, text):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.textproc import (
            expand_variants,
        )

        v = expand_variants(text)
        assert len(v) <= 3
        assert len(v) == len(set(v))
        if text.strip():
            assert v[0] == text.strip()


# ---------------------------------------------------------------------------
# Stateful model check of the sharded searcher (the repo's strongest claim:
# sharded results == single-device results under ANY mutation interleaving).
# ---------------------------------------------------------------------------

from hypothesis.stateful import (  # noqa: E402
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
)

_DIM = 8


def _shared_mesh():
    """ONE process-wide mesh: the compiled-searcher caches key on mesh
    identity, so a fresh mesh per example would recompile every program."""
    global _MESH
    try:
        return _MESH
    except NameError:
        import jax
        from jax.sharding import Mesh

        _MESH = Mesh(np.array(jax.devices()[:8]), ("index",))
        return _MESH


def _int_rows(seed: int, n: int) -> np.ndarray:
    """Integer-valued f32 rows: every dot product is an exact small integer
    in f32, so model scores, single-device scores and sharded scores are
    bit-identical and ties resolve to the lowest global index in every
    program (no tolerance needed)."""
    rng = np.random.default_rng(seed)
    return rng.integers(-8, 9, (n, _DIM)).astype(np.float32)


class ShardedSearcherMachine(RuleBasedStateMachine):
    """Interleaves load/append/delete/compact/search on an 8-device
    ShardedIndexSearcher (bf16-path f32 and int8 capacity mode) against a
    plain numpy model, asserting EXACT (id, score) equality after every
    rule. Capacity overflow (append > padded capacity -> re-shard carrying
    tombstones) is forced by a dedicated rule."""

    def __init__(self):
        super().__init__()
        from intelligent_video_analysis_retrieval_system_tpu.parallel import (
            ShardedIndexSearcher,
        )

        self._cls = ShardedIndexSearcher
        self.searcher = None
        self.overflowed = False

    @initialize(
        seed=st.integers(0, 2**16),
        n=st.integers(5, 200),
        quantized=st.booleans(),
    )
    def load(self, seed, n, quantized):
        self.quantized = quantized
        self.rows = _int_rows(seed, n)          # model rows (f32 view)
        self.deleted: set[int] = set()
        self.searcher = self._cls(_shared_mesh(), dtype=jnp.float32)
        if quantized:
            rng = np.random.default_rng(seed + 1)
            self.q8 = self.rows.astype(np.int8)  # |values| <= 8 fit int8
            self.scales = 2.0 ** rng.integers(-1, 2, n).astype(np.float32)
            self.searcher.load_int8(self.q8, self.scales)
        else:
            self.searcher.load(self.rows)
        self._seed = seed

    def _append(self, new: np.ndarray, seed: int) -> None:
        if self.quantized:
            rng = np.random.default_rng(seed)
            new_q = new.astype(np.int8)
            new_s = 2.0 ** rng.integers(-1, 2, len(new)).astype(np.float32)
            self.searcher.append_quantized(new_q, new_s)
            self.q8 = np.concatenate([self.q8, new_q])
            self.scales = np.concatenate([self.scales, new_s])
        else:
            self.searcher.append(new)
        self.rows = np.concatenate([self.rows, new])

    @rule(seed=st.integers(0, 2**16), m=st.integers(1, 60))
    def append_small(self, seed, m):
        self._append(_int_rows(seed, m), seed)

    @precondition(lambda self: not self.overflowed)
    @rule(seed=st.integers(0, 2**16))
    def append_overflow(self, seed):
        """Exceed the padded capacity -> full re-shard (must carry
        tombstones and existing rows exactly)."""
        cap = int(self.searcher._x.shape[0])
        m = cap - len(self.rows) + 300
        self._append(_int_rows(seed, m), seed)
        assert int(self.searcher._x.shape[0]) > cap
        self.overflowed = True

    @rule(seed=st.integers(0, 2**16), frac=st.floats(0.0, 0.5))
    def delete_some(self, seed, frac):
        rng = np.random.default_rng(seed)
        n = len(self.rows)
        fresh = rng.choice(n, size=max(1, int(n * frac)), replace=False)
        self.deleted.update(int(r) for r in fresh)
        self.searcher.set_deleted(self.deleted)

    @precondition(lambda self: self.searcher is not None and self.deleted)
    @rule()
    def compact(self):
        """Physically drop tombstones (what UnifiedIndex.compact does to
        the device state: reload live rows, ids remap)."""
        keep = [r for r in range(len(self.rows)) if r not in self.deleted]
        self.rows = self.rows[keep]
        if self.quantized:
            self.q8 = self.q8[keep]
            self.scales = self.scales[keep]
            self.searcher.load_int8(self.q8, self.scales)
        else:
            self.searcher.load(self.rows)
        self.deleted = set()

    @precondition(
        lambda self: self.searcher is not None
        and not getattr(self, "ann_checked", False)
        and len(self.rows) - len(self.deleted) >= 5
    )
    @rule(qseed=st.integers(0, 2**16))
    def sharded_ann_full_probe_matches_model(self, qseed):
        """Build a sharded IVF over the CURRENT mutated state and check the
        full-probe (nprobe == nlist) search against the numpy model — the
        ANN partition invariant under whatever loads/appends/deletes this
        example has performed so far. One shot per example (the k-means
        build compiles per live-row count). Tie-aware: bucket candidate
        order is not id-sorted, so equal scores may legally permute ids —
        assert the score multiset and per-id score correctness instead of
        the dense invariant's positional equality."""
        from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
            build_ivf,
        )

        self.ann_checked = True
        scales = self.searcher._scales
        state, _ = build_ivf(
            self.searcher._x,
            n_rows=len(self.rows),
            x_scales=None if scales is None else scales.reshape(-1),
            nlist=8,
            kmeans_iters=2,
            sample_per_list=16,
        )
        self.searcher.set_ann(state)
        try:
            rng = np.random.default_rng(qseed)
            q = rng.integers(-8, 9, (1, _DIM)).astype(np.float32)
            res = self.searcher.search_ann(q, k=5, nprobe=8)
            scores = np.asarray(res.scores, np.float64)[0]
            ids = np.asarray(res.indices)[0]
            finite = np.isfinite(scores)
            got = list(zip(ids[finite].tolist(), scores[finite].tolist()))
            model = self._model_scores(q)
            live = [r for r in range(len(self.rows))
                    if r not in self.deleted]
            order = sorted(live, key=lambda r: (-model[r], r))[: len(got)]
            assert sorted(s for _, s in got) == sorted(
                float(model[r]) for r in order
            ), "ANN full probe: top-k score multiset differs from model"
            for r, s in got:
                assert r in set(live) and float(model[r]) == s, (
                    f"ANN returned ({r}, {s}) but model[{r}] = {model[r]}"
                )
            assert len(got) == min(5, len(live))
        finally:
            self.searcher.clear_ann()

    def _model_scores(self, q: np.ndarray) -> np.ndarray:
        """Exact per-row scores of the numpy model (the same metric the
        dense invariant asserts positionally)."""
        if self.quantized:
            qs = np.maximum(
                np.abs(q[0]).max(), np.float32(1e-12)
            ).astype(np.float32) / np.float32(127.0)
            q8 = np.clip(np.rint(q[0].astype(np.float32) / qs), -127, 127)
            int_dot = (self.q8.astype(np.float64) @ q8.astype(np.float64)
                       ).astype(np.float32)
            return ((int_dot * self.scales.astype(np.float32)) * qs
                    ).astype(np.float64)
        return self.rows.astype(np.float64) @ q[0]

    @invariant()
    def search_matches_model(self):
        if self.searcher is None:
            return
        self._seed += 1
        rng = np.random.default_rng(self._seed)
        q = rng.integers(-8, 9, (1, _DIM)).astype(np.float32)
        res = self.searcher.search(q, k=5, use_pallas=False)
        scores = np.asarray(res.scores, np.float64)[0]
        ids = np.asarray(res.indices)[0]
        finite = np.isfinite(scores)
        got = list(zip(ids[finite].tolist(), scores[finite].tolist()))
        # numpy model: exact integer dots, deleted masked, stable sort by
        # (-score, id). The int8 metric quantizes the QUERY too
        # (ops.quant.symmetric_int8); _model_scores replicates it
        # bit-for-bit, multiplying in the same f32 order as the device.
        model = self._model_scores(q)
        live = [r for r in range(len(self.rows)) if r not in self.deleted]
        order = sorted(live, key=lambda r: (-model[r], r))[: len(got)]
        want = [(r, float(model[r])) for r in order]
        assert got == want, f"sharded {got} != model {want}"
        k_expected = min(5, len(live))
        assert len(got) == k_expected


ShardedSearcherMachine.TestCase.settings = settings(
    max_examples=8, stateful_step_count=10, deadline=None
)
TestShardedSearcherStateful = ShardedSearcherMachine.TestCase


class UnifiedANNMaintenanceMachine(RuleBasedStateMachine):
    """Interleaves the round-4 off-lock ANN maintenance surface
    (build_ann / tune_nprobe / drop_ann / close+reopen) with row
    mutations (append / delete / compact) on a real container-backed
    UnifiedIndex, asserting after EVERY rule that whenever ANN is
    active its full-probe search equals the exact dense path
    positionally, and that the maintenance flags stay consistent.

    The thread-race half of this surface is covered by the serving soak
    and the targeted raced-tune/donation tests; this machine covers the
    SEQUENCING half — generation counters, tail registration,
    persistence across compact/reopen — under arbitrary interleavings.
    """

    def __init__(self):
        super().__init__()
        import shutil
        import tempfile

        self._shutil = shutil
        self._ws = tempfile.mkdtemp(prefix="annmachine_")
        self.idx = None

    def teardown(self):
        if self.idx is not None:
            self.idx.close()
        self._shutil.rmtree(self._ws, ignore_errors=True)

    @initialize(seed=st.integers(0, 2**16), n=st.integers(48, 128))
    def load(self, seed, n):
        from pathlib import Path

        from intelligent_video_analysis_retrieval_system_tpu.index.container import (
            IndexContainer,
        )
        from intelligent_video_analysis_retrieval_system_tpu.index.unified import (
            UnifiedIndex,
            UnifiedIndexConfig,
        )

        self._cfg_cls = UnifiedIndexConfig
        self._idx_cls = UnifiedIndex
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((8, _DIM)).astype(np.float32)
        x = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
            (n, _DIM)
        ).astype(np.float32)
        self.path = Path(self._ws) / "m.rvdb"
        with IndexContainer(self.path, "w", dim=_DIM,
                            dtype="float32") as c:
            c.append_embeddings(x)
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i,
                  "row_id": i} for i in range(n)]
            )
            c.flush_checkpoint()
        self._seed = seed
        self.next_frame = n
        self.idx = self._make().load_unified_index(self.path, mode="a")

    def _make(self):
        # ann=True: loads auto-build (or restore) the IVF structure
        cfg = self._cfg_cls(ann=True, ann_nlist=8, ann_nprobe=8,
                            ann_target_recall=None)
        return self._idx_cls(cfg)

    @rule(seed=st.integers(0, 2**16), m=st.integers(1, 10))
    def append(self, seed, m):
        rng = np.random.default_rng(seed)
        new = rng.standard_normal((m, _DIM)).astype(np.float32)
        metas = [{"folder": "v", "image": f"a{self.next_frame + i}.jpg",
                  "frame_id": self.next_frame + i} for i in range(m)]
        self.next_frame += m
        self.idx.incremental_update(new, metas)
        # appends ride the IVF tail; on overflow ANN may legally drop

    @precondition(lambda self: self.idx is not None
                  and self.idx.ntotal - self.idx.num_deleted > 10)
    @rule(seed=st.integers(0, 2**16))
    def delete_some(self, seed):
        rng = np.random.default_rng(seed)
        live = [r for r in range(self.idx.ntotal)
                if r not in self.idx.deleted_rows]
        picks = rng.choice(live, size=min(4, len(live) - 5),
                           replace=False)
        self.idx.delete_rows([int(r) for r in picks])

    @precondition(lambda self: self.idx is not None
                  and self.idx.num_deleted > 0)
    @rule()
    def compact(self):
        rep = self.idx.compact()
        assert rep["compacted"] > 0
        assert self.idx.num_deleted == 0

    @rule()
    def build(self):
        self.idx.build_ann(check_recall=False)
        assert self.idx.ann_active

    @precondition(lambda self: self.idx is not None and self.idx.ann_active)
    @rule()
    def tune(self):
        rep = self.idx.tune_nprobe(target_recall=0.9, sample=6, top_k=5)
        # sequential machine: nothing races, the tune must always install
        assert rep["raced_mutation"] is False
        assert self.idx.config.ann_nprobe == rep["nprobe"]

    @rule()
    def drop(self):
        self.idx.drop_ann()
        assert not self.idx.ann_active

    @rule()
    def reopen(self):
        self.idx.close()
        self.idx = self._make().load_unified_index(self.path, mode="a")

    @invariant()
    def ann_equals_exact(self):
        if self.idx is None or not self.idx.is_loaded:
            return
        live = self.idx.ntotal - self.idx.num_deleted
        if live <= 0:
            return
        self._seed += 1
        rng = np.random.default_rng(self._seed)
        q = rng.standard_normal((2, _DIM)).astype(np.float32)
        exact = self.idx.search_vectors(q, top_k=5, exact=True)
        assert all(len(h) == min(5, live) for h in exact)
        if self.idx.ann_active:
            nlist = int(self.idx._ann.bucket_ids.shape[0])
            approx = self.idx.search_vectors(q, top_k=5, nprobe=nlist)
            for a_hits, e_hits in zip(approx, exact):
                assert [h.metadata.row_id for h in a_hits] == [
                    h.metadata.row_id for h in e_hits
                ], "ANN full probe diverged from the exact path"


UnifiedANNMaintenanceMachine.TestCase.settings = settings(
    max_examples=8, stateful_step_count=12, deadline=None
)
TestUnifiedANNMaintenanceStateful = UnifiedANNMaintenanceMachine.TestCase
