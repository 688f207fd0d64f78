"""Keyframe quality metrics as batched device convolutions.

Replaces the reference's per-image OpenCV calls — Laplacian-variance blur
score (``filter.py:63-75``) and Canny edge density (``filter.py:77-92``) —
with whole-batch ``lax.conv`` ops. Canny's hysteresis stage is deliberately
simplified to a Sobel-magnitude threshold: the reference only consumes the
*density* scalar for percentile filtering, for which gradient-magnitude
density is an equivalent ranking signal, and it vectorizes cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "rgb_to_gray",
    "laplacian_blur_scores",
    "edge_density_scores",
    "quality_metrics",
    "adaptive_quality_mask",
]

# cv2.cvtColor BGR->GRAY uses ITU-R BT.601; we assume RGB input order.
_GRAY_WEIGHTS = (0.299, 0.587, 0.114)

_LAPLACIAN = jnp.array(
    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], dtype=jnp.float32
)
_SOBEL_X = jnp.array(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=jnp.float32
)
_SOBEL_Y = _SOBEL_X.T


def rgb_to_gray(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H, W) float32 luminance."""
    w = jnp.asarray(_GRAY_WEIGHTS, jnp.float32)
    return jnp.tensordot(images.astype(jnp.float32), w, axes=([-1], [0]))


def _conv2d(gray: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode 3x3 conv over (B, H, W)."""
    x = gray[:, None, :, :]                      # NCHW
    k = kernel[None, None, :, :]                 # OIHW
    out = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0]


@jax.jit
def laplacian_blur_scores(images: jnp.ndarray) -> jnp.ndarray:
    """Variance of the Laplacian per image (higher = sharper).

    Same statistic as ``cv2.Laplacian(gray, CV_64F).var()`` in the reference
    (``filter.py:63-75``).
    """
    gray = rgb_to_gray(images)
    lap = _conv2d(gray, _LAPLACIAN)
    mean = jnp.mean(lap, axis=(1, 2), keepdims=True)
    return jnp.mean((lap - mean) ** 2, axis=(1, 2))


@functools.partial(jax.jit, static_argnames=())
def edge_density_scores(
    images: jnp.ndarray, low: float = 50.0, high: float = 150.0
) -> jnp.ndarray:
    """Fraction of pixels with strong gradients (edge density proxy).

    Reference uses Canny(low, high) pixel density (``filter.py:77-92``);
    here: Sobel gradient magnitude with soft double-threshold — pixels above
    ``high`` count 1, between ``low``/``high`` count 0.5 (stand-in for
    hysteresis), below count 0.
    """
    gray = rgb_to_gray(images)
    gx = _conv2d(gray, _SOBEL_X)
    gy = _conv2d(gray, _SOBEL_Y)
    mag = jnp.sqrt(gx * gx + gy * gy)
    strong = (mag >= high).astype(jnp.float32)
    weak = ((mag >= low) & (mag < high)).astype(jnp.float32)
    return jnp.mean(strong + 0.5 * weak, axis=(1, 2))


def quality_metrics(images: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Both metrics in one pass-friendly call. (B,H,W,3) in [0,255]."""
    return {
        "blur": laplacian_blur_scores(images),
        "edges": edge_density_scores(images),
    }


def adaptive_quality_mask(
    blur: jnp.ndarray,
    edges: jnp.ndarray,
    blur_drop_percentile: float = 10.0,
    edge_drop_percentile: float = 10.0,
) -> jnp.ndarray:
    """Keep-mask dropping the worst percentile by each metric.

    Mirrors the reference's adaptive percentile thresholds
    (``filter.py:104-128``): a frame survives if it is above the p-th
    percentile on BOTH blur (sharpness) and edge density.
    """
    blur_thr = jnp.percentile(blur, blur_drop_percentile)
    edge_thr = jnp.percentile(edges, edge_drop_percentile)
    return (blur >= blur_thr) & (edges >= edge_thr)
