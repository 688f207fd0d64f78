"""Image preprocessing for the CLIP tower — resize, crop, normalize.

Replaces the reference's per-image PIL/HF-processor path
(``core.py:1585-1641``, ``unified_index.py:814-853`` — batch-of-1, CPU) with
whole-batch device ops:

- **Bilinear resize as two matmuls.** Separable interpolation weights are
  precomputed on host, and the resize becomes ``A_h @ img @ A_w^T`` — two
  MXU matmuls over the batch instead of a gather mess. Matches
  half-pixel-centers bilinear (PIL/torch ``align_corners=False``).
- **Fused scale/normalize Pallas kernel**: uint8 -> (x/255 - mean)/std in
  one VMEM pass, emitting the compute dtype the encoder wants.

Output layout is NHWC (what Flax conv patchify consumes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CLIP_IMAGE_MEAN",
    "CLIP_IMAGE_STD",
    "resize_bilinear",
    "center_crop",
    "normalize_images",
    "preprocess_images",
]

# OpenAI CLIP normalization constants (public; used by every CLIP port).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def _triangle(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic kernel, a=-0.5 (PIL's BICUBIC)."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _interp_matrix(
    out_size: int, in_size: int, method: str = "bilinear", antialias: bool = True
) -> np.ndarray:
    """Dense (out, in) separable interpolation matrix, half-pixel centers.

    With ``antialias`` (the PIL/HF behaviour) the kernel footprint is widened
    by the downscale factor, so downsampling low-pass filters correctly —
    required for numerical parity with HF CLIPImageProcessor preprocessing.
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    kernel = _triangle if method == "bilinear" else _cubic
    radius = 1.0 if method == "bilinear" else 2.0
    scale = in_size / out_size
    width = max(scale, 1.0) if antialias else 1.0
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    idx = np.arange(in_size)
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        w = kernel((idx - src) / width)
        support = np.abs(idx - src) <= radius * width + 1e-9
        w = w * support
        total = w.sum()
        if total <= 0:  # degenerate (shouldn't happen); nearest fallback
            w[int(round(min(max(src, 0), in_size - 1)))] = 1.0
            total = 1.0
        mat[o] = w / total
    return mat


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "method", "antialias")
)
def resize_bilinear(
    images: jnp.ndarray,
    out_h: int,
    out_w: int,
    method: str = "bilinear",
    antialias: bool = True,
) -> jnp.ndarray:
    """Batched separable resize (B, H, W, C) -> (B, out_h, out_w, C), f32.

    ``method`` in {"bilinear", "bicubic"}; antialiased by default (matches
    PIL / jax.image.resize). Implemented as two MXU matmuls. Jitted: every
    public ops entry point compiles — eager dispatch is pathologically slow
    on tunneled TPU backends.
    """
    _, h, w, _ = images.shape
    a_h = jnp.asarray(_interp_matrix(out_h, h, method, antialias))
    a_w = jnp.asarray(_interp_matrix(out_w, w, method, antialias))
    x = images.astype(jnp.float32)
    # HIGHEST precision: resize feeds parity-sensitive CLIP embeddings and
    # the default (bf16) matmul precision costs ~0.4% pixel error.
    from jax import lax

    x = jnp.einsum("oh,bhwc->bowc", a_h, x, precision=lax.Precision.HIGHEST)
    x = jnp.einsum("pw,bowc->bopc", a_w, x, precision=lax.Precision.HIGHEST)
    return x


def center_crop(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center-crop (B, H, W, C) to (B, size, size, C)."""
    _, h, w, _ = images.shape
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return images[:, top : top + size, left : left + size, :]


# -- fused normalize (Pallas) -------------------------------------------------


def _normalize_kernel(x_ref, out_ref, *, mean, std, out_dtype):
    # mean/std are static python floats -> inlined immediates (Pallas
    # kernels cannot capture constant arrays).
    x = x_ref[:].astype(jnp.float32) * (1.0 / 255.0)
    chans = [
        (x[..., c : c + 1] - float(mean[c])) * (1.0 / float(std[c]))
        for c in range(len(mean))
    ]
    out_ref[:] = jnp.concatenate(chans, axis=-1).astype(out_dtype)


@functools.lru_cache(maxsize=64)
def _normalize_call(shape: tuple, in_dtype_name: str, mean: tuple, std: tuple,
                    dtype_name: str, interpret: bool):
    """Compile-once pallas normalize for a static signature."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    b, h, w, c = shape
    kernel = functools.partial(
        _normalize_kernel, mean=mean, std=std, out_dtype=dtype
    )
    call = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dtype),
        interpret=interpret,
    )
    return jax.jit(call)


def normalize_images(
    images: jnp.ndarray,
    mean: tuple = CLIP_IMAGE_MEAN,
    std: tuple = CLIP_IMAGE_STD,
    dtype: jnp.dtype = jnp.bfloat16,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W, 3) pixel values in [0,255] -> normalized ``dtype`` NHWC."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        return _normalize_jnp(images, tuple(mean), tuple(std),
                              jnp.dtype(dtype).name)
    call = _normalize_call(
        tuple(images.shape), jnp.asarray(images).dtype.name, tuple(mean),
        tuple(std), jnp.dtype(dtype).name, interpret,
    )
    return call(images)


@functools.partial(jax.jit, static_argnames=("mean", "std", "dtype_name"))
def _normalize_jnp(images, mean, std, dtype_name):
    x = images.astype(jnp.float32) / 255.0
    m = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3)
    s = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3)
    return ((x - m) / s).astype(jnp.dtype(dtype_name))


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "dtype", "use_pallas", "interpret"),
)
def preprocess_images(
    images: jnp.ndarray,
    image_size: int = 224,
    dtype: jnp.dtype = jnp.bfloat16,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full CLIP preprocessing: resize shortest side -> center crop ->
    normalize. Input (B, H, W, 3) uint8/float in [0,255]; output
    (B, size, size, 3) ``dtype``.

    Mirrors HF CLIPImageProcessor semantics (resize shortest edge to
    ``image_size`` then center crop) so embeddings match the reference's
    preprocessing numerically.
    """
    _, h, w, _ = images.shape
    if h <= w:
        new_h, new_w = image_size, max(image_size, round(w * image_size / h))
    else:
        new_h, new_w = max(image_size, round(h * image_size / w)), image_size
    # bicubic+antialias = HF CLIPImageProcessor's PIL resample mode
    x = resize_bilinear(images, new_h, new_w, method="bicubic", antialias=True)
    x = center_crop(x, image_size)
    return normalize_images(
        x, dtype=dtype, use_pallas=use_pallas, interpret=interpret
    )
