"""L2 normalization of embedding batches.

Replaces the reference's torch ``F.normalize`` calls (``core.py:1176-1196``,
``core.py:1546``) and sklearn cosine plumbing. A plain jnp expression — XLA
fuses it into neighbouring ops (matmul epilogues); no Pallas needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["l2_normalize"]


@jax.jit
def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-wise L2 normalize along the last axis, in f32 accumulation.

    Normalization happens in float32 regardless of input dtype (bf16 inputs
    would lose norm precision), then casts back to the input dtype.
    """
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    return (xf / jnp.maximum(norm, eps)).astype(x.dtype)
