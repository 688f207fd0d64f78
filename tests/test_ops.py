"""Tests for the device ops layer: topk kernel, preprocess, quality, phash, dedup.

The Pallas chunk-max sweep runs in interpreter mode on CPU here; the same
code path compiles on real TPU (exercised by bench.py / __graft_entry__).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intelligent_video_analysis_retrieval_system_tpu.ops import (
    cosine_topk,
    edge_density_scores,
    hamming_distance,
    l2_normalize,
    laplacian_blur_scores,
    perceptual_hash,
    preprocess_images,
    quality_metrics,
    sequential_dedup,
    topk_exact_reference,
    topk_search,
    windowed_dedup_mask,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.dedup import windowed_dedup_mask
from intelligent_video_analysis_retrieval_system_tpu.ops.phash import phash_dedup_mask
from intelligent_video_analysis_retrieval_system_tpu.ops.preprocess import (
    center_crop,
    normalize_images,
    resize_bilinear,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.quality import (
    adaptive_quality_mask,
)
from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
    CHUNK,
    TILE_N,
    chunk_max_sweep,
    pad_database,
)


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestL2Normalize:
    def test_unit_norms(self, rng):
        x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
        out = l2_normalize(x)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

    def test_bf16_safe(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32) * 100).astype(
            jnp.bfloat16
        )
        out = l2_normalize(x)
        assert out.dtype == jnp.bfloat16
        norms = np.linalg.norm(np.asarray(out, np.float32), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=2e-2)


class TestTopK:
    @pytest.mark.parametrize("n,b,k", [(500, 4, 10), (3000, 8, 50), (TILE_N, 1, 1)])
    def test_matches_oracle_jnp(self, rng, n, b, k):
        x = jnp.asarray(_normed(rng, n, 64))
        q = jnp.asarray(_normed(rng, b, 64))
        got = topk_search(x, q, k, use_pallas=False)
        want = topk_exact_reference(x, q, k)
        np.testing.assert_allclose(got.scores, want.scores, atol=1e-5)
        np.testing.assert_array_equal(got.indices, want.indices)

    @pytest.mark.parametrize("n,b,k", [(TILE_N, 4, 10), (2 * TILE_N + 777, 8, 25)])
    def test_pallas_interpret_matches_oracle(self, rng, n, b, k):
        x = jnp.asarray(_normed(rng, n, 64))
        q = jnp.asarray(_normed(rng, b, 64))
        got = topk_search(x, q, k, use_pallas=True, interpret=True)
        want = topk_exact_reference(x, q, k)
        np.testing.assert_allclose(got.scores, want.scores, atol=1e-5)
        np.testing.assert_array_equal(got.indices, want.indices)

    def test_chunk_max_sweep_values(self, rng):
        n, b = TILE_N, 4
        x = jnp.asarray(_normed(rng, n, 32))
        q = jnp.asarray(_normed(rng, b, 32))
        maxima = chunk_max_sweep(x, q, n_valid=n, interpret=True)
        scores = np.asarray(q @ x.T, np.float32)  # (B, N)
        want = scores.reshape(b, n // CHUNK, CHUNK).max(axis=2).T
        np.testing.assert_allclose(np.asarray(maxima), want, atol=1e-4)

    def test_padding_rows_never_returned(self, rng):
        n = TILE_N + 3  # forces a nearly-empty second tile
        # make all true scores negative so zero-pad rows would win if unmasked
        x = -np.abs(_normed(rng, n, 32))
        q = np.abs(_normed(rng, 2, 32))
        got = topk_search(jnp.asarray(x), jnp.asarray(q), 5, use_pallas=True,
                          interpret=True)
        assert int(got.indices.max()) < n
        want = topk_exact_reference(jnp.asarray(x), jnp.asarray(q), 5)
        np.testing.assert_array_equal(got.indices, want.indices)

    def test_k_larger_than_n(self, rng):
        x = jnp.asarray(_normed(rng, 7, 16))
        q = jnp.asarray(_normed(rng, 2, 16))
        got = topk_search(x, q, 20, use_pallas=False)
        assert got.scores.shape == (2, 7)

    def test_empty_database(self):
        x = jnp.zeros((0, 16), jnp.float32)
        q = jnp.ones((3, 16), jnp.float32)
        got = topk_search(x, q, 5)
        assert got.scores.shape == (3, 0)

    def test_cosine_topk_self_retrieval(self, rng):
        x = jnp.asarray(rng.standard_normal((200, 32)).astype(np.float32))
        q = x[17:19] * 3.0  # scaled copies — cosine must still rank themselves first
        got = cosine_topk(x, q, 1, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got.indices).ravel(), [17, 18])
        np.testing.assert_allclose(got.scores, 1.0, atol=1e-5)

    def test_pad_database_multiple(self, rng):
        x = jnp.asarray(_normed(rng, 100, 16))
        padded = pad_database(x)
        assert padded.shape[0] % TILE_N == 0
        np.testing.assert_array_equal(np.asarray(padded[:100]), np.asarray(x))

    def test_duplicate_scores_stable_count(self, rng):
        # ties across chunk boundaries must still return exactly k results
        x = np.tile(_normed(rng, 1, 32), (300, 1))
        q = _normed(rng, 2, 32)
        got = topk_search(jnp.asarray(x), jnp.asarray(q), 10, use_pallas=True,
                          interpret=True)
        assert got.indices.shape == (2, 10)
        assert len(set(np.asarray(got.indices)[0].tolist())) == 10


class TestPreprocess:
    def test_resize_matches_jax_image(self, rng):
        # antialiased downscale must agree with jax.image/PIL to ~1 LSB of
        # uint8 (edge handling differs slightly between implementations)
        img = rng.integers(0, 255, (2, 48, 64, 3)).astype(np.float32)
        got = resize_bilinear(jnp.asarray(img), 24, 32)
        want = jax.image.resize(jnp.asarray(img), (2, 24, 32, 3), "bilinear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1.5)

    def test_resize_matches_pil_bicubic(self, rng):
        from PIL import Image

        img = rng.integers(0, 255, (40, 56), np.uint8)
        got = resize_bilinear(
            jnp.asarray(img.astype(np.float32))[None, :, :, None],
            20, 28, method="bicubic",
        )[0, :, :, 0]
        want = np.asarray(
            Image.fromarray(img).resize((28, 20), Image.BICUBIC), np.float32
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2.0)

    def test_identity_resize(self, rng):
        img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
        out = resize_bilinear(jnp.asarray(img), 16, 16)
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)

    def test_center_crop(self):
        img = jnp.arange(5 * 6, dtype=jnp.float32).reshape(1, 5, 6, 1)
        out = center_crop(img, 3)
        assert out.shape == (1, 3, 3, 1)

    def test_normalize_values(self):
        img = jnp.full((1, 4, 4, 3), 255.0)
        out = normalize_images(img, use_pallas=False, dtype=jnp.float32)
        from intelligent_video_analysis_retrieval_system_tpu.ops import (
            CLIP_IMAGE_MEAN,
            CLIP_IMAGE_STD,
        )
        want = (1.0 - np.array(CLIP_IMAGE_MEAN)) / np.array(CLIP_IMAGE_STD)
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], want, atol=1e-5)

    def test_normalize_pallas_interpret_matches_jnp(self, rng):
        img = jnp.asarray(rng.integers(0, 255, (2, 8, 128, 3)).astype(np.float32))
        a = normalize_images(img, use_pallas=False, dtype=jnp.float32)
        b = normalize_images(img, interpret=True, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_full_pipeline_shape_dtype(self, rng):
        img = jnp.asarray(rng.integers(0, 255, (3, 100, 160, 3)), jnp.uint8)
        out = preprocess_images(img, image_size=32, dtype=jnp.float32,
                                use_pallas=False)
        assert out.shape == (3, 32, 32, 3)
        assert out.dtype == jnp.float32


class TestQuality:
    def test_blur_ranks_sharp_above_blurry(self, rng):
        sharp = rng.integers(0, 255, (32, 32, 3)).astype(np.float32)
        blurry = np.full((32, 32, 3), 128.0, np.float32)
        scores = laplacian_blur_scores(jnp.stack([jnp.asarray(sharp), jnp.asarray(blurry)]))
        assert float(scores[0]) > float(scores[1])

    def test_edge_density_detects_edges(self):
        flat = np.full((32, 32, 3), 100.0, np.float32)
        edgy = flat.copy()
        edgy[:, 16:] = 250.0
        scores = edge_density_scores(jnp.stack([jnp.asarray(edgy), jnp.asarray(flat)]))
        assert float(scores[0]) > float(scores[1]) == 0.0

    def test_quality_metrics_and_mask(self, rng):
        imgs = jnp.asarray(rng.integers(0, 255, (10, 16, 16, 3)).astype(np.float32))
        m = quality_metrics(imgs)
        mask = adaptive_quality_mask(m["blur"], m["edges"], 10.0, 10.0)
        assert mask.shape == (10,)
        assert int(mask.sum()) >= 8  # drops at most the worst ~10% per metric


class TestPhash:
    def test_identical_images_same_hash(self, rng):
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32)
        h1 = perceptual_hash(jnp.asarray(img))
        h2 = perceptual_hash(jnp.asarray(img.copy()))
        assert int(hamming_distance(h1, h2)[0, 0]) == 0

    def test_noise_robustness_vs_different_image(self, rng):
        base = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        noisy = np.clip(base + rng.normal(0, 4, base.shape), 0, 255).astype(np.float32)
        other = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        hashes = perceptual_hash(jnp.asarray(np.stack([base, noisy, other])))
        d_noise = int(hamming_distance(hashes[:1], hashes[1:2])[0, 0])
        d_other = int(hamming_distance(hashes[:1], hashes[2:3])[0, 0])
        assert d_noise < d_other
        assert d_noise <= 10

    def test_dedup_mask(self, rng):
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        other = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        hashes = perceptual_hash(jnp.asarray(np.stack([img, img, other])))
        keep = phash_dedup_mask(hashes, threshold=5)
        assert keep.tolist() == [True, False, True]


class TestDedup:
    def test_sequential_dedup_drops_near_duplicates(self, rng):
        a = _normed(rng, 1, 32)[0]
        b = _normed(rng, 1, 32)[0]
        seq = np.stack([a, a + 1e-4, b, b + 1e-4, a])
        keep = np.asarray(sequential_dedup(jnp.asarray(seq), threshold=0.98))
        assert keep.tolist() == [True, False, True, False, True]

    def test_first_frame_always_kept(self, rng):
        seq = jnp.asarray(np.tile(_normed(rng, 1, 16), (5, 1)))
        keep = np.asarray(sequential_dedup(seq, threshold=0.9))
        assert keep.tolist() == [True, False, False, False, False]

    def test_windowed_dedup(self, rng):
        a, b, c = (_normed(rng, 1, 32)[0] for _ in range(3))
        # a, b, then a again within window -> third dropped
        seq = np.stack([a, b, a])
        keep = np.asarray(windowed_dedup_mask(jnp.asarray(seq), threshold=0.95, window=5))
        assert keep.tolist() == [True, True, False]

    def test_windowed_dedup_outside_window_kept(self, rng):
        vecs = _normed(rng, 4, 32)
        a = vecs[0]
        seq = np.stack([a, vecs[1], vecs[2], vecs[3], a])  # a recurs after 3 others
        keep = np.asarray(windowed_dedup_mask(jnp.asarray(seq), threshold=0.95, window=3))
        assert keep.tolist() == [True, True, True, True, True]

    def test_empty(self):
        assert sequential_dedup(jnp.zeros((0, 8))).shape == (0,)
        assert windowed_dedup_mask(jnp.zeros((0, 8))).shape == (0,)


class TestKernelDims:
    @pytest.mark.parametrize("d", [384, 512, 200])
    def test_non_768_dims_interpret(self, rng, d):
        # DINO-S (384), ViT-B (512), and a deliberately unaligned dim (200)
        n = TILE_N + 99
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = x[:3]
        got = topk_search(jnp.asarray(x), jnp.asarray(q), 7,
                          use_pallas=True, interpret=True)
        want = topk_exact_reference(jnp.asarray(x), jnp.asarray(q), 7)
        np.testing.assert_array_equal(got.indices, want.indices)

    def test_large_k_chunk_cap(self, rng):
        # k larger than the number of chunks: k_chunks caps at num_chunks.
        # Indices may legitimately swap at last-ulp score ties (the two
        # paths accumulate in different orders), so compare scores plus
        # set-equality of ids rather than exact positions.
        n = TILE_N  # 16 chunks
        x = rng.standard_normal((n, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        got = topk_search(jnp.asarray(x), jnp.asarray(x[:2]), 500,
                          use_pallas=True, interpret=True)
        want = topk_exact_reference(jnp.asarray(x), jnp.asarray(x[:2]), 500)
        np.testing.assert_allclose(got.scores, want.scores, atol=1e-6)
        for b in range(2):
            assert set(np.asarray(got.indices)[b].tolist()) == set(
                np.asarray(want.indices)[b].tolist()
            )


class TestFusedAttention:
    def test_matches_einsum_reference(self, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.attention import (
            fused_mha_qkv,
        )

        b, t, h, dh = 2, 16, 4, 8
        d = h * dh
        qkv = rng.standard_normal((b, t, 3 * d)).astype(np.float32)
        got = np.asarray(
            fused_mha_qkv(jnp.asarray(qkv), num_heads=h, interpret=True)
        )
        # reference einsum attention
        q = qkv[:, :, :d].reshape(b, t, h, dh)
        k = qkv[:, :, d:2*d].reshape(b, t, h, dh)
        v = qkv[:, :, 2*d:].reshape(b, t, h, dh)
        logits = np.einsum("bqhd,bkhd->bhqk", q * dh**-0.5, k)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        want = np.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_bf16_dtype_preserved(self, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.attention import (
            fused_mha_qkv,
        )

        qkv = jnp.asarray(rng.standard_normal((1, 8, 96)).astype(np.float32),
                          jnp.bfloat16)
        out = fused_mha_qkv(qkv, num_heads=4, interpret=True)
        assert out.dtype == jnp.bfloat16
        assert out.shape == (1, 8, 32)


class TestFusedLnMlp:
    """ops/block.py: whole-half-block LN+MLP kernel (interpret mode)."""

    def _params(self, d=256, h=512, seed=0):
        rng = np.random.default_rng(seed)
        return dict(
            g=rng.standard_normal(d).astype(np.float32) * 0.1 + 1,
            bt=rng.standard_normal(d).astype(np.float32) * 0.1,
            w1=(rng.standard_normal((d, h)) / np.sqrt(d)).astype(np.float32),
            b1=rng.standard_normal(h).astype(np.float32) * 0.01,
            w2=(rng.standard_normal((h, d)) / np.sqrt(h)).astype(np.float32),
            b2=rng.standard_normal(d).astype(np.float32) * 0.01,
        )

    def _reference(self, x, p, act, eps=1e-5):
        from intelligent_video_analysis_retrieval_system_tpu.ops.block import (
            _act_fn,
        )

        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        ln = (x - mu) / np.sqrt(var + eps) * p["g"] + p["bt"]
        h = np.asarray(_act_fn(act)(jnp.asarray(ln @ p["w1"] + p["b1"])))
        return x + h @ p["w2"] + p["b2"]

    @pytest.mark.parametrize("act", ["quick_gelu", "gelu", "gelu_tanh"])
    def test_matches_reference_f32(self, act):
        from intelligent_video_analysis_retrieval_system_tpu.ops.block import (
            fused_ln_mlp,
        )

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 9, 256)).astype(np.float32)
        p = self._params()
        got = np.asarray(fused_ln_mlp(
            jnp.asarray(x), p["g"], p["bt"], p["w1"], p["b1"], p["w2"],
            p["b2"], act=act, interpret=True,
        ))
        np.testing.assert_allclose(got, self._reference(x, p, act), atol=2e-5)

    def test_bf16_close(self):
        from intelligent_video_analysis_retrieval_system_tpu.ops.block import (
            fused_ln_mlp,
        )

        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 7, 256)).astype(np.float32)
        p = self._params(seed=2)
        got = np.asarray(fused_ln_mlp(
            jnp.asarray(x, jnp.bfloat16), p["g"], p["bt"], p["w1"], p["b1"],
            p["w2"], p["b2"], act="quick_gelu", interpret=True,
        ), np.float32)
        want = self._reference(x, p, "quick_gelu")
        assert np.abs(got - want).max() / np.abs(want).max() < 0.03

    def test_supports_gate(self):
        from intelligent_video_analysis_retrieval_system_tpu.ops.block import (
            supports_fused_ln_mlp,
        )

        assert supports_fused_ln_mlp(1024, 4096, "quick_gelu")
        assert not supports_fused_ln_mlp(48, 192, "quick_gelu")  # tiny_test
        assert not supports_fused_ln_mlp(1024, 4096, "relu")


class TestFusedMlpBlock:
    """models.clip.TransformerBlock fused_mlp opt-in path."""

    def _block(self, fused):
        from intelligent_video_analysis_retrieval_system_tpu.models.clip import (
            TransformerBlock,
        )

        return TransformerBlock(num_heads=4, mlp_ratio=2, fused_mlp=fused)

    def test_param_tree_identical(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 8, 256)).astype(np.float32))
        p_f = self._block(True).init(jax.random.PRNGKey(0), x)["params"]
        p_u = self._block(False).init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree.structure(p_f) == jax.tree.structure(p_u)
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_u)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_fused_matches_unfused(self):
        # same params through both paths: outputs must agree (f32, CPU
        # interpret mode -> tight tolerance)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 8, 256)).astype(np.float32))
        params = self._block(False).init(jax.random.PRNGKey(1), x)["params"]
        out_u = self._block(False).apply({"params": params}, x)
        out_f = self._block(True).apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_u), atol=2e-5
        )


class TestFusedAttentionGrad:
    def test_custom_vjp_matches_einsum_grads(self, rng):
        """The Pallas MHA forward carries a custom VJP (einsum recompute);
        grads through fused_mha (interpret mode) must match grads of the
        plain einsum formulation."""
        import jax

        from intelligent_video_analysis_retrieval_system_tpu.ops.attention import (
            _einsum_attention,
            fused_mha,
        )

        b, t, h, hd = 2, 8, 2, 8
        q = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)

        def loss_fused(q, k, v):
            return jnp.sum(fused_mha(q, k, v, h, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_einsum_attention(q, k, v, h) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)

    def test_forward_unchanged_by_vjp_wrapper(self, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.attention import (
            _einsum_attention,
            fused_mha,
        )

        q = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
        out = np.asarray(fused_mha(q, k, v, 2, True))
        ref = np.asarray(_einsum_attention(q, k, v, 2))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
