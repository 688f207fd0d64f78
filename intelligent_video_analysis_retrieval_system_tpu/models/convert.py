"""HF torch CLIP checkpoint -> Flax params conversion.

The reference loads ``openai/clip-vit-large-patch14`` through torch
(``core.py:1442-1443``). This module maps that checkpoint's state dict onto
our Flax tower layout so the TPU model reproduces the same embeddings
(parity gate: cosine >= 0.999, tested against a randomly-initialized
``transformers.CLIPModel`` so the test needs no network access).

Conventions converted:
- torch ``nn.Linear.weight`` is (out, in) -> Flax Dense kernel (in, out);
- patch conv ``(out, 3, ph, pw)`` -> Flax Conv kernel ``(ph, pw, 3, out)``;
- ``text_projection.weight`` / ``visual_projection.weight`` (no bias)
  -> our ``proj`` matrices (transposed);
- HF vision pre-norm is spelled ``pre_layrnorm`` (their typo).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np

from .clip import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

__all__ = ["convert_hf_clip_params", "hf_config_to_ours", "load_clip"]


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _np(x: Any) -> np.ndarray:
    """torch tensor | np array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _convert_block(sd: Mapping[str, Any], prefix: str) -> dict:
    """One HF encoder layer -> our TransformerBlock param dict."""
    def lin(name: str) -> dict:
        return {
            "kernel": _t(_np(sd[f"{prefix}.{name}.weight"])),
            "bias": _np(sd[f"{prefix}.{name}.bias"]),
        }

    def ln(name: str) -> dict:
        return {
            "scale": _np(sd[f"{prefix}.{name}.weight"]),
            "bias": _np(sd[f"{prefix}.{name}.bias"]),
        }

    return {
        "ln_1": ln("layer_norm1"),
        "attn": {
            "q_proj": lin("self_attn.q_proj"),
            "k_proj": lin("self_attn.k_proj"),
            "v_proj": lin("self_attn.v_proj"),
            "out_proj": lin("self_attn.out_proj"),
        },
        "ln_2": ln("layer_norm2"),
        "mlp_fc": lin("mlp.fc1"),
        "mlp_proj": lin("mlp.fc2"),
    }


def convert_hf_clip_params(
    state_dict: Mapping[str, Any], config: CLIPConfig
) -> dict:
    """HF ``CLIPModel.state_dict()`` -> params for :class:`models.CLIPModel`."""
    sd = state_dict

    def ln(prefix: str) -> dict:
        return {
            "scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
        }

    vision = {
        "patch_embed": {
            "kernel": np.transpose(
                _np(sd["vision_model.embeddings.patch_embedding.weight"]),
                (2, 3, 1, 0),
            )
        },
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
        "positional_embedding": _np(
            sd["vision_model.embeddings.position_embedding.weight"]
        ),
        "ln_pre": ln("vision_model.pre_layrnorm"),
        "transformer": {
            f"layer_{i}": _convert_block(sd, f"vision_model.encoder.layers.{i}")
            for i in range(config.vision.num_layers)
        },
        "ln_post": ln("vision_model.post_layernorm"),
        "proj": _t(_np(sd["visual_projection.weight"])),
    }
    text = {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "positional_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "transformer": {
            f"layer_{i}": _convert_block(sd, f"text_model.encoder.layers.{i}")
            for i in range(config.text.num_layers)
        },
        "ln_final": ln("text_model.final_layer_norm"),
        "proj": _t(_np(sd["text_projection.weight"])),
    }
    return {
        "vision": vision,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }


def hf_config_to_ours(hf_config: Any) -> CLIPConfig:
    """``transformers.CLIPConfig`` -> our dataclass config."""
    v, t = hf_config.vision_config, hf_config.text_config
    return CLIPConfig(
        vision=CLIPVisionConfig(
            image_size=v.image_size,
            patch_size=v.patch_size,
            hidden_size=v.hidden_size,
            num_layers=v.num_hidden_layers,
            num_heads=v.num_attention_heads,
            mlp_ratio=v.intermediate_size // v.hidden_size,
            projection_dim=hf_config.projection_dim,
        ),
        text=CLIPTextConfig(
            vocab_size=t.vocab_size,
            max_length=t.max_position_embeddings,
            hidden_size=t.hidden_size,
            num_layers=t.num_hidden_layers,
            num_heads=t.num_attention_heads,
            mlp_ratio=t.intermediate_size // t.hidden_size,
            projection_dim=hf_config.projection_dim,
        ),
    )


def load_clip(
    model_name_or_path: str | Path | None = None,
    config: CLIPConfig | None = None,
    seed: int = 0,
) -> tuple[CLIPConfig, dict]:
    """Best-effort CLIP load: (config, params).

    Order: local HF checkpoint (converted) -> random init. Network access is
    never attempted (``local_files_only``): this environment has zero
    egress; users drop a checkpoint directory in place for parity.
    """
    if model_name_or_path is not None:
        try:
            import transformers

            hf = transformers.CLIPModel.from_pretrained(
                str(model_name_or_path), local_files_only=True
            )
            cfg = hf_config_to_ours(hf.config)
            return cfg, convert_hf_clip_params(hf.state_dict(), cfg)
        except Exception as exc:
            # fall through to random init — but never silently: random
            # towers mean self-similarity-only retrieval quality
            import logging

            logging.getLogger(__name__).warning(
                "could not load HF CLIP checkpoint from %r (%s: %s) — "
                "falling back to randomly-initialized towers",
                str(model_name_or_path), type(exc).__name__, exc,
            )
    cfg = config or CLIPConfig.vit_l_14()
    import jax

    from .clip import CLIPModel

    model = CLIPModel(cfg)
    dummy_px = np.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3), np.float32)
    dummy_tok = np.zeros((1, cfg.text.max_length), np.int32)
    variables = model.init(jax.random.PRNGKey(seed), dummy_px, dummy_tok)
    return cfg, variables["params"]
