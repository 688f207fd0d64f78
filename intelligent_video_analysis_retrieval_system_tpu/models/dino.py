"""DINO ViT tower — the reference's keyframe-dedup encoder.

The reference embeds every decoded frame with ``facebook/dino-vits16``
through torch (``video_frame_filter.py:24-33``, ``filter.py:46-58``) and
keeps a frame when cosine vs the last kept drops below threshold. This is
the same tower in Flax: a plain pre-LN ViT (exact-erf GELU, LN eps 1e-6,
biased patch conv, no projection head) whose CLS embedding after the final
LayerNorm is the feature.

Converted ``transformers.ViTModel`` checkpoints reproduce torch outputs
(parity-tested like CLIP). Without a checkpoint, random init still yields
a consistent dedup metric (near-duplicates stay near-duplicates under any
fixed random features at these widths).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from .clip import Transformer

__all__ = ["DINOConfig", "DINOTower", "convert_hf_vit_params"]

# ImageNet normalization (HF ViTImageProcessor defaults for DINO).
DINO_IMAGE_MEAN = (0.485, 0.456, 0.406)
DINO_IMAGE_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class DINOConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 384     # ViT-S
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    ln_eps: float = 1e-6

    @classmethod
    def vit_s_16(cls) -> "DINOConfig":
        """facebook/dino-vits16 (the reference's model)."""
        return cls()

    @classmethod
    def tiny_test(cls) -> "DINOConfig":
        return cls(image_size=32, patch_size=8, hidden_size=48, num_layers=2,
                   num_heads=4)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class DINOTower(nn.Module):
    config: DINOConfig
    dtype: Any = jnp.float32
    precision: lax.Precision = lax.Precision.DEFAULT

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) normalized pixels -> (B, hidden) CLS embeddings."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=True,  # HF ViT patch conv has a bias (CLIP's doesn't)
            dtype=self.dtype,
            precision=self.precision,
            name="patch_embed",
        )(pixels.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), x],
            axis=1,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.hidden_size),
        )
        x = x + pos.astype(self.dtype)[None]
        x = Transformer(
            cfg.num_layers, cfg.num_heads, cfg.mlp_ratio, dtype=self.dtype,
            precision=self.precision, act="gelu", ln_eps=cfg.ln_eps,
            name="transformer",
        )(x)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="ln_final")(x)
        return x[:, 0]  # CLS


def _np(x: Any) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def convert_hf_vit_params(
    state_dict: Mapping[str, Any], config: DINOConfig
) -> dict:
    """``transformers.ViTModel.state_dict()`` -> DINOTower params."""
    sd = state_dict

    def lin(prefix: str) -> dict:
        return {
            "kernel": _t(_np(sd[f"{prefix}.weight"])),
            "bias": _np(sd[f"{prefix}.bias"]),
        }

    def ln(prefix: str) -> dict:
        return {
            "scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
        }

    layers = {}
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        layers[f"layer_{i}"] = {
            "ln_1": ln(f"{p}.layernorm_before"),
            "attn": {
                "q_proj": lin(f"{p}.attention.attention.query"),
                "k_proj": lin(f"{p}.attention.attention.key"),
                "v_proj": lin(f"{p}.attention.attention.value"),
                "out_proj": lin(f"{p}.attention.output.dense"),
            },
            "ln_2": ln(f"{p}.layernorm_after"),
            "mlp_fc": lin(f"{p}.intermediate.dense"),
            "mlp_proj": lin(f"{p}.output.dense"),
        }
    return {
        "patch_embed": {
            "kernel": np.transpose(
                _np(sd["embeddings.patch_embeddings.projection.weight"]),
                (2, 3, 1, 0),
            ),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": _np(sd["embeddings.cls_token"]).reshape(-1),
        "positional_embedding": _np(sd["embeddings.position_embeddings"])[0],
        "transformer": layers,
        "ln_final": ln("layernorm"),
    }
