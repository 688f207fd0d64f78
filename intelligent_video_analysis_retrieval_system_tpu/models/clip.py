"""CLIP text + vision towers in Flax, written TPU-first.

Architecture follows the published CLIP design (ViT tower + causal text
transformer, QuickGELU, pre-LN) so that converted ``openai/clip-vit-*``
weights reproduce the reference's embeddings (``core.py:1392,1442-1443``
uses ``openai/clip-vit-large-patch14`` through torch). Implementation is
from scratch and device-first:

- all matmuls carry an explicit ``precision`` knob: ``DEFAULT`` (bf16 MXU
  passes) for throughput, ``HIGHEST`` for the fp32 parity mode used in
  golden tests (SURVEY.md §7 "hard parts" #1);
- params stay fp32; activations run in ``compute_dtype`` (bf16 by default);
- attention is ``jax.nn.dot_product_attention``-free on purpose: a plain
  einsum formulation lets XLA pick fused flash-style lowerings on TPU and
  keeps the module dependency-light;
- no data-dependent Python control flow — the whole forward jits and pjits
  (sharding annotations are applied by ``parallel.shard_clip_params``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "CLIPVisionConfig",
    "CLIPTextConfig",
    "CLIPConfig",
    "CLIPVisionTower",
    "CLIPTextTower",
    "CLIPModel",
]


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    projection_dim: int = 768

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    projection_dim: int = 768


@dataclass(frozen=True)
class CLIPConfig:
    vision: CLIPVisionConfig = field(default_factory=CLIPVisionConfig)
    text: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    logit_scale_init: float = 2.6592  # ln(1/0.07), CLIP's published init

    @classmethod
    def vit_l_14(cls) -> "CLIPConfig":
        """openai/clip-vit-large-patch14 (the reference's model)."""
        return cls()

    @classmethod
    def vit_b_32(cls) -> "CLIPConfig":
        """openai/clip-vit-base-patch32 (reference fallback, system.py:1438)."""
        return cls(
            vision=CLIPVisionConfig(
                patch_size=32, hidden_size=768, num_layers=12, num_heads=12,
                projection_dim=512,
            ),
            text=CLIPTextConfig(hidden_size=512, num_layers=12, num_heads=8,
                                projection_dim=512),
        )

    @classmethod
    def tiny_test(cls) -> "CLIPConfig":
        """Small config for unit tests / CI."""
        return cls(
            vision=CLIPVisionConfig(
                image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                num_heads=4, projection_dim=32,
            ),
            text=CLIPTextConfig(
                vocab_size=512, max_length=16, hidden_size=48, num_layers=2,
                num_heads=4, projection_dim=32,
            ),
        )


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# Shared transformer block
# ---------------------------------------------------------------------------


def _w8a8_act_scale(
    mod: nn.Module, name: str, t: jnp.ndarray, static: bool
) -> jnp.ndarray | None:
    """Per-call-site activation-scale plumbing for W8A8 dense layers.

    Sows the observed ``max|x|`` into the ``act_stats`` collection — a
    no-op (dead-code-eliminated) unless the caller runs with
    ``mutable=["act_stats"]``, which is exactly what the calibration pass
    (``models.calibrate.calibrate_act_scales``) does. In static mode,
    reads the calibrated scalar from the ``act_scales`` collection
    (created at init with a 1/127 placeholder) and returns it; dynamic
    mode returns None (per-token scales inside ``w8a8_dense``).
    """
    if not mod.is_initializing():  # keep init output to params(+act_scales)
        amax = jnp.max(jnp.abs(t.astype(jnp.float32)))
        mod.sow(
            "act_stats", f"{name}_amax", amax,
            init_fn=lambda: jnp.float32(0.0), reduce_fn=jnp.maximum,
        )
    if not static:
        return None
    var = mod.variable(
        "act_scales", f"{name}_ascale", lambda: jnp.float32(1.0 / 127.0)
    )
    return var.value


class MultiHeadAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32
    precision: lax.Precision = lax.Precision.DEFAULT
    # opt-in W8A8 projections: int8 MXU matmuls (2.5x bf16 peak on v5e),
    # dynamic per-token activation scales; param tree unchanged (see
    # ops.quant.w8a8_dense)
    w8a8: bool = False
    # static calibrated activation scales (skips the VPU-bound per-token
    # max reduce; needs the ``act_scales`` collection from
    # models.calibrate.calibrate_act_scales)
    w8a8_static: bool = False
    # the fused Pallas MHA carries a custom VJP (einsum-recompute
    # backward, ops/attention.py), so it is differentiable and training
    # keeps the fast forward; False forces plain einsum attention
    fused_attn: bool = True
    # opt-in int8 attention math (inference-only): QK^T and PV as
    # int8 x int8 -> i32 MXU matmuls with per-token (Q, K) and per-column
    # (V) symmetric scales; softmax stays f32, probabilities quantize with
    # the fixed scale 1/127 (p in [0, 1]). MEASURED NEGATIVE on v5e at
    # ViT-L/14 B=128 (benchmarks/exp_int8_attention.py): GEMM-level, the
    # QK^T int8 matmul is 2.7x SLOWER than bf16 (1.9 vs 5.1 TFLOP/s — the
    # 64-deep head_dim contraction is too shallow for the int8 MXU to
    # pack) while PV int8 is ~neutral (7.5 vs 6.6); tower-level the
    # variant lands at 483 fps vs 1129 for int8_static+fused-bf16-MHA
    # (0.43x) AND the fixed
    # 1/127 probability quantization compounds over 24 layers to cosine
    # 0.955 (fails the 0.999 gate). Kept as a documented dead end for
    # re-evaluation on hardware with deeper int8 matmul wins.
    # SCOPE: applies only to UNMASKED attention (the vision tower). Masked
    # attention (the text tower's causal mask) falls through to the
    # standard path — enabling the flag on CLIPModel quantizes vision
    # attention only; text-side numbers are NOT int8-attention numbers.
    int8_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        d = x.shape[-1]
        head_dim = d // self.num_heads
        if self.w8a8:
            from ..ops.quant import w8a8_dense

            def dense(name):
                holder = _DenseParams(d, name=name)

                def apply(t):
                    kernel, bias = holder(t.shape[-1])
                    a_scale = _w8a8_act_scale(
                        self, name, t, self.w8a8_static
                    )
                    return w8a8_dense(t, kernel, bias, out_dtype=self.dtype,
                                      a_scale=a_scale)

                return apply
        else:
            dense = lambda name: nn.Dense(
                d, dtype=self.dtype, precision=self.precision, name=name
            )
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        if self.int8_attn and mask is None:
            from ..ops.quant import symmetric_int8

            b, t = x.shape[0], x.shape[1]
            scale = head_dim ** -0.5

            def merge(tt):
                return (
                    tt.reshape(b, t, self.num_heads, head_dim)
                    .transpose(0, 2, 1, 3)
                    .reshape(b * self.num_heads, t, head_dim)
                )

            qm, km, vm = merge(q), merge(k), merge(v)
            # 1/sqrt(d) folds into the query quantization for free
            q8, qs = symmetric_int8(qm * scale, axis=-1)   # (bh, t, 1)
            k8, ks = symmetric_int8(km, axis=-1)           # (bh, t, 1)
            logits = lax.dot_general(
                q8, k8, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * qs * jnp.transpose(ks, (0, 2, 1))
            weights = jax.nn.softmax(logits, axis=-1)
            # probs live in [0, 1]: fixed scale 1/127, no reduction needed
            p8 = jnp.round(weights * 127.0).astype(jnp.int8)
            # V scales must be constant along the contracted (token) axis
            # to factor out of the int matmul -> per-(head, column) scales
            v8, vs = symmetric_int8(vm, axis=1)            # (bh, 1, hd)
            out = lax.dot_general(
                p8, v8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (vs * (1.0 / 127.0))
            out = (
                out.astype(self.dtype)
                .reshape(b, self.num_heads, t, head_dim)
                .transpose(0, 2, 1, 3)
                .reshape(*x.shape)
            )
            return dense("out_proj")(out)

        if (
            self.fused_attn
            and mask is None
            and self.precision != lax.Precision.HIGHEST
            and jax.default_backend() == "tpu"
        ):
            # unmasked ViT attention on TPU: fused Pallas kernel that slices
            # heads inside VMEM — removes the 4 transposes + 2 reshapes the
            # einsum path pays (~60 ms per ViT-L/14 B=128 forward)
            from ..ops.attention import fused_mha

            out = fused_mha(q, k, v, self.num_heads)
            return dense("out_proj")(out)

        def split(t):
            return t.reshape(*t.shape[:-1], self.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        if self.precision == lax.Precision.HIGHEST:
            # parity mode: explicit einsum attention with f32 softmax —
            # bit-stable against the torch reference
            scale = head_dim ** -0.5
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q * scale, k, precision=self.precision
            ).astype(jnp.float32)
            if mask is not None:
                logits = logits + mask
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", weights, v, precision=self.precision
            )
        else:
            # throughput mode: batch and heads merge into one leading dim so
            # the score/apply matmuls run as large (B*H, T, T) batched GEMMs
            # with bf16 logits + f32 softmax — measured 2.1x faster than
            # jax.nn.dot_product_attention at ViT-L shapes on v5e
            b, t = x.shape[0], x.shape[1]
            scale = head_dim ** -0.5
            qm = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * self.num_heads, t, head_dim)
            km = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * self.num_heads, t, head_dim)
            vm = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * self.num_heads, t, head_dim)
            logits = jnp.einsum("bqd,bkd->bqk", qm * scale, km)
            if mask is not None:
                logits = logits + mask.reshape(1, t, t).astype(logits.dtype)
            weights = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
            out = jnp.einsum("bqk,bkd->bqd", weights, vm)
            out = out.reshape(b, self.num_heads, t, head_dim).transpose(0, 2, 1, 3)
        out = out.reshape(*x.shape)
        return dense("out_proj")(out)


def _activation(name: str):
    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return functools_gelu_exact
    if name == "gelu_tanh":
        return jax.nn.gelu
    raise ValueError(f"unknown activation {name!r}")


def functools_gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — HF ViT/DINO's default."""
    return jax.nn.gelu(x, approximate=False)


class _LNParams(nn.Module):
    """Param-holder with nn.LayerNorm's exact tree (scale, bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _DenseParams(nn.Module):
    """Param-holder with nn.Dense's exact tree (kernel, bias)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: int
    dtype: Any = jnp.float32
    precision: lax.Precision = lax.Precision.DEFAULT
    act: str = "quick_gelu"
    ln_eps: float = 1e-5
    # opt-in whole-half-block Pallas kernel (ops/block.py): LN2 + fc1 + act
    # + fc2 + residual in one grid, hidden activation never touching HBM.
    # Measured ~neutral vs XLA's chain on v5e at ViT-L shapes (see
    # RESULTS.md), so off by default; param tree is identical either way.
    fused_mlp: bool = False
    # opt-in W8A8 dense layers (q/k/v/out + MLP) on the int8 MXU; param
    # tree identical, quality gated by cosine tests (VERDICT r1 #8)
    w8a8: bool = False
    w8a8_static: bool = False
    fused_attn: bool = True
    int8_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        d = x.shape[-1]
        hidden = d * self.mlp_ratio
        # Pre-LN residual blocks; LayerNorm in f32 (param_dtype default f32).
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_1")(x)
        x = x + MultiHeadAttention(
            self.num_heads, dtype=self.dtype, precision=self.precision,
            w8a8=self.w8a8, w8a8_static=self.w8a8_static,
            fused_attn=self.fused_attn, int8_attn=self.int8_attn,
            name="attn"
        )(h, mask)

        if self.w8a8:
            from ..ops.quant import w8a8_dense

            h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                             name="ln_2")(x)
            w1, b1 = _DenseParams(hidden, name="mlp_fc")(d)
            h = w8a8_dense(
                h, w1, b1, out_dtype=self.dtype,
                a_scale=_w8a8_act_scale(self, "mlp_fc", h, self.w8a8_static),
            )
            h = _activation(self.act)(h)
            w2, b2 = _DenseParams(d, name="mlp_proj")(hidden)
            return x + w8a8_dense(
                h, w2, b2, out_dtype=self.dtype,
                a_scale=_w8a8_act_scale(self, "mlp_proj", h, self.w8a8_static),
            )

        from ..ops.block import supports_fused_ln_mlp

        if (
            self.fused_mlp
            and self.precision != lax.Precision.HIGHEST
            and supports_fused_ln_mlp(d, hidden, self.act)
        ):
            from ..ops.block import fused_ln_mlp

            # identical param tree to the unfused chain below (the holder
            # modules reuse the flax names/shapes/initializers), so
            # checkpoints are interchangeable between the two paths
            g, beta = _LNParams(d, name="ln_2")()
            w1, b1 = _DenseParams(hidden, name="mlp_fc")(d)
            w2, b2 = _DenseParams(d, name="mlp_proj")(hidden)
            return fused_ln_mlp(
                x.astype(self.dtype), g, beta, w1, b1, w2, b2,
                act=self.act, eps=self.ln_eps,
                interpret=jax.default_backend() != "tpu",
            )

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(d * self.mlp_ratio, dtype=self.dtype,
                     precision=self.precision, name="mlp_fc")(h)
        h = _activation(self.act)(h)
        h = nn.Dense(d, dtype=self.dtype, precision=self.precision,
                     name="mlp_proj")(h)
        return x + h


class Transformer(nn.Module):
    num_layers: int
    num_heads: int
    mlp_ratio: int
    dtype: Any = jnp.float32
    precision: lax.Precision = lax.Precision.DEFAULT
    remat: bool = False
    act: str = "quick_gelu"
    ln_eps: float = 1e-5
    fused_mlp: bool = False
    w8a8: bool = False
    w8a8_static: bool = False
    fused_attn: bool = True
    int8_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock)
        for i in range(self.num_layers):
            x = block_cls(
                self.num_heads, self.mlp_ratio, dtype=self.dtype,
                precision=self.precision, act=self.act, ln_eps=self.ln_eps,
                fused_mlp=self.fused_mlp, w8a8=self.w8a8,
                w8a8_static=self.w8a8_static, fused_attn=self.fused_attn,
                int8_attn=self.int8_attn, name=f"layer_{i}"
            )(x, mask)
        return x


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


class _PatchEmbedMatmul(nn.Module):
    """Strided patch conv expressed as reshape + one GEMM.

    The stride==kernel "conv" is really a block-diagonal matmul; spelling
    it as (B, P, p*p*c) @ (p*p*c, D) hands XLA one large MXU GEMM with no
    conv windowing machinery. Param tree is IDENTICAL to
    ``nn.Conv(name="patch_embed", use_bias=False)`` — one HWIO kernel
    (p, p, c, D) — so checkpoints interchange freely between the paths.
    """

    hidden_size: int
    patch_size: int
    dtype: Any = jnp.float32
    precision: lax.Precision = lax.Precision.DEFAULT

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, c = pixels.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),  # nn.Conv's default init
            (p, p, c, self.hidden_size),
        )
        gh, gw = h // p, w // p
        x = pixels.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)       # (B, gh, gw, p, p, c)
        x = x.reshape(b, gh * gw, p * p * c)
        # HWIO kernel flattens in the same (p_h, p_w, c) order as the patch
        k2 = kernel.astype(self.dtype).reshape(p * p * c, self.hidden_size)
        return jnp.dot(x, k2, precision=self.precision)


class CLIPVisionTower(nn.Module):
    config: CLIPVisionConfig
    dtype: Any = jnp.float32
    precision: lax.Precision = lax.Precision.DEFAULT
    remat: bool = False
    w8a8: bool = False
    w8a8_static: bool = False
    fused_attn: bool = True
    int8_attn: bool = False
    # patch embed as one reshaped GEMM instead of nn.Conv (identical param
    # tree; A/B measured in benchmarks/exp_vitl_profile.py)
    patch_embed_matmul: bool = False

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) normalized pixels -> (B, projection_dim) embeddings
        (unnormalized; callers L2-normalize)."""
        cfg = self.config
        b = pixels.shape[0]
        if self.patch_embed_matmul:
            x = _PatchEmbedMatmul(
                cfg.hidden_size, cfg.patch_size, dtype=self.dtype,
                precision=self.precision, name="patch_embed",
            )(pixels.astype(self.dtype))      # (B, P, D)
        else:
            x = nn.Conv(
                cfg.hidden_size,
                kernel_size=(cfg.patch_size, cfg.patch_size),
                strides=(cfg.patch_size, cfg.patch_size),
                use_bias=False,
                dtype=self.dtype,
                precision=self.precision,
                name="patch_embed",
            )(pixels.astype(self.dtype))
            x = x.reshape(b, -1, cfg.hidden_size)  # (B, P, D)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        cls_tok = jnp.broadcast_to(
            cls.astype(self.dtype), (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls_tok, x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.hidden_size),
        )
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        x = Transformer(
            cfg.num_layers, cfg.num_heads, cfg.mlp_ratio, dtype=self.dtype,
            precision=self.precision, remat=self.remat, w8a8=self.w8a8,
            w8a8_static=self.w8a8_static, fused_attn=self.fused_attn,
            int8_attn=self.int8_attn,
            name="transformer"
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj",
            nn.initializers.normal(cfg.hidden_size ** -0.5),
            (cfg.hidden_size, cfg.projection_dim),
        )
        return jnp.dot(x, proj.astype(self.dtype), precision=self.precision)


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------


class CLIPTextTower(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32
    precision: lax.Precision = lax.Precision.DEFAULT
    remat: bool = False
    w8a8: bool = False
    w8a8_static: bool = False
    fused_attn: bool = True
    int8_attn: bool = False

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray, eot_positions: jnp.ndarray | None = None) -> jnp.ndarray:
        """(B, T) int32 token ids -> (B, projection_dim).

        ``eot_positions``: index of the EOT token per row; defaults to
        argmax of token ids (CLIP's convention — EOT has the largest id).
        """
        cfg = self.config
        tok = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size),
        )
        x = tok[token_ids].astype(self.dtype)  # (B, T, D)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
        )
        t = token_ids.shape[1]
        x = x + pos[:t].astype(self.dtype)[None]
        # causal mask, additive -inf above diagonal
        mask = jnp.triu(
            jnp.full((t, t), -jnp.inf, dtype=jnp.float32), k=1
        )[None, None]
        x = Transformer(
            cfg.num_layers, cfg.num_heads, cfg.mlp_ratio, dtype=self.dtype,
            precision=self.precision, remat=self.remat, w8a8=self.w8a8,
            w8a8_static=self.w8a8_static, fused_attn=self.fused_attn,
            int8_attn=self.int8_attn,
            name="transformer"
        )(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        if eot_positions is None:
            eot_positions = jnp.argmax(token_ids, axis=-1)
        x = jnp.take_along_axis(
            x, eot_positions[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        proj = self.param(
            "proj",
            nn.initializers.normal(cfg.hidden_size ** -0.5),
            (cfg.hidden_size, cfg.projection_dim),
        )
        return jnp.dot(x, proj.astype(self.dtype), precision=self.precision)


# ---------------------------------------------------------------------------
# Combined model
# ---------------------------------------------------------------------------


class CLIPModel(nn.Module):
    """Both towers + logit scale. Methods are independently jittable."""

    config: CLIPConfig
    dtype: Any = jnp.float32
    precision: lax.Precision = lax.Precision.DEFAULT
    remat: bool = False
    w8a8: bool = False
    w8a8_static: bool = False
    fused_attn: bool = True
    int8_attn: bool = False

    def setup(self) -> None:
        self.vision = CLIPVisionTower(
            self.config.vision, dtype=self.dtype, precision=self.precision,
            remat=self.remat, w8a8=self.w8a8, w8a8_static=self.w8a8_static,
            fused_attn=self.fused_attn,
            int8_attn=self.int8_attn,
        )
        self.text = CLIPTextTower(
            self.config.text, dtype=self.dtype, precision=self.precision,
            remat=self.remat, w8a8=self.w8a8, w8a8_static=self.w8a8_static,
            fused_attn=self.fused_attn,
            int8_attn=self.int8_attn,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda _key, shape: jnp.full(shape, self.config.logit_scale_init),
            (),
        )

    def encode_image(self, pixels: jnp.ndarray) -> jnp.ndarray:
        return self.vision(pixels)

    def encode_text(self, token_ids: jnp.ndarray,
                    eot_positions: jnp.ndarray | None = None) -> jnp.ndarray:
        return self.text(token_ids, eot_positions)

    def __call__(self, pixels: jnp.ndarray, token_ids: jnp.ndarray):
        """Contrastive logits (image x text), mainly for self-tests."""
        img = self.encode_image(pixels)
        txt = self.encode_text(token_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T
