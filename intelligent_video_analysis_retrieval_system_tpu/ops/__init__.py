"""Device compute kernels (JAX/XLA/Pallas) — the performance core.

Every hot loop identified in SURVEY.md §3 lands here as a batched device op:

- ``topk``      — fused matmul + streaming chunk-max top-k search kernel
                  (replaces FAISS ``IndexFlatIP.search``)
- ``normalize`` — L2 normalization
- ``preprocess``— image resize/crop/normalize feeding the CLIP tower
- ``quality``   — Laplacian blur + edge-density metrics as batched convs
- ``phash``     — DCT perceptual hash (batched)
- ``dedup``     — sequential cosine keyframe dedup as a ``lax.scan``
- ``ann``       — IVF approximate search over the flat row buffer
                  (opt-in latency mode; parity with the reference's
                  approximate FAISS index types, ``core.py:1213-1216``)
"""

from .ann import build_ivf, ivf_topk, IVFState
from .normalize import l2_normalize
from .topk import topk_search, topk_exact_reference, cosine_topk
from .quality import laplacian_blur_scores, edge_density_scores, quality_metrics
from .phash import perceptual_hash, hamming_distance
from .dedup import sequential_dedup, windowed_dedup_mask
from .preprocess import preprocess_images, resize_bilinear, CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

__all__ = [
    "build_ivf",
    "ivf_topk",
    "IVFState",
    "l2_normalize",
    "topk_search",
    "topk_exact_reference",
    "cosine_topk",
    "laplacian_blur_scores",
    "edge_density_scores",
    "quality_metrics",
    "perceptual_hash",
    "hamming_distance",
    "sequential_dedup",
    "windowed_dedup_mask",
    "preprocess_images",
    "resize_bilinear",
    "CLIP_IMAGE_MEAN",
    "CLIP_IMAGE_STD",
]
