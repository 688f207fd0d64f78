"""Model layer: Flax CLIP towers + tokenizer + HF weight conversion.

TPU-native replacement for the reference's torch/HF black-box encoders
(``core.py:1384-1794`` loads ``openai/clip-vit-large-patch14`` via
``transformers.CLIPModel``). Here the towers are first-party Flax modules so
they shard with pjit, run in bf16 on the MXU, and admit an fp32 parity mode.
"""

from .clip import (
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
    CLIPModel,
    CLIPTextTower,
    CLIPVisionTower,
)
from .convert import convert_hf_clip_params, load_clip
from .dino import DINOConfig, DINOTower, convert_hf_vit_params
from .tokenizer import CLIPTokenizer, SimpleTokenizer

__all__ = [
    "CLIPConfig",
    "CLIPTextConfig",
    "CLIPVisionConfig",
    "CLIPModel",
    "CLIPTextTower",
    "CLIPVisionTower",
    "convert_hf_clip_params",
    "load_clip",
    "DINOConfig",
    "DINOTower",
    "convert_hf_vit_params",
    "CLIPTokenizer",
    "SimpleTokenizer",
]
