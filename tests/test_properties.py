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
