"""Fused multi-head attention kernel for ViT towers.

The einsum attention path spends ~60 ms per ViT-L/14 forward (B=128) on
pure layout work: 4 transposes + 2 reshapes moving (B, T, H, dh)
activations so heads become a batched-GEMM dimension. This kernel takes
the fused QKV projection output ``(B, T, 3*D)`` directly — one grid step
per image, heads sliced *inside* VMEM (static slices, no relayouts):

    per image:  for h in heads:
        s = q_h @ k_h^T * scale      (T, T) f32 in VMEM
        w = softmax(s)
        out[:, h*dh:(h+1)*dh] = w @ v_h

VMEM per step at ViT-L shapes: qkv (257, 3072) bf16 ~1.6 MB + out 0.5 MB
+ (T, T) f32 scores 0.26 MB — comfortably double-buffered.

Used by ``models.clip.MultiHeadAttention`` in throughput mode on TPU when
there is no attention mask (ViT towers); the text tower keeps the einsum
path (causal mask, tiny T).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_mha", "fused_mha_qkv"]


def _mha_kernel(q_ref, k_ref, v_ref, out_ref, *, num_heads: int,
                head_dim: int):
    scale = head_dim ** -0.5
    q_all, k_all, v_all = q_ref[0], k_ref[0], v_ref[0]  # (T, D) each
    for h in range(num_heads):
        lo = h * head_dim
        q = q_all[:, lo : lo + head_dim]
        k = k_all[:, lo : lo + head_dim]
        v = v_all[:, lo : lo + head_dim]
        scores = jnp.dot(
            q * scale, k.T, preferred_element_type=jnp.float32
        )  # (T, T) f32
        weights = jax.nn.softmax(scores, axis=-1).astype(q_all.dtype)
        out_ref[0, :, lo : lo + head_dim] = jnp.dot(
            weights, v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.lru_cache(maxsize=32)
def _build_mha(b: int, t: int, num_heads: int, head_dim: int, dtype_name: str,
               interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = num_heads * head_dim
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(
        _mha_kernel, num_heads=num_heads, head_dim=head_dim
    )
    spec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dtype),
        interpret=interpret,
    )
    return jax.jit(call)


def _einsum_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int
) -> jnp.ndarray:
    """Differentiable reference formulation matching the kernel's math
    (f32 scores + f32 softmax, activations back in the input dtype)."""
    b, t, d = q.shape
    head_dim = d // num_heads
    scale = head_dim ** -0.5

    def split(x):
        return x.reshape(b, t, num_heads, head_dim)

    qm, km, vm = split(q), split(k), split(v)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qm * scale, km,
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
        q.dtype
    )
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights, vm, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out.reshape(b, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T, D) q/k/v projections -> (B, T, D) attention output (no mask).

    Separate q/k/v inputs (not a concatenated QKV tensor): a host-level
    concat would round-trip another (B, T, 3D) activation through HBM.

    Differentiable: the Pallas kernel has no native autodiff rule, so a
    custom VJP recomputes the backward pass through the equivalent einsum
    formulation (flash-attention-style recompute — the residuals are just
    q/k/v; no (T, T) weights are saved). Forward values come from the
    kernel, gradients from the einsum math; the two agree to bf16
    tolerances (gradcheck in tests/test_ops.py).
    """
    b, t, d = q.shape
    head_dim = d // num_heads
    call = _build_mha(
        int(b), int(t), int(num_heads), int(head_dim), q.dtype.name,
        bool(interpret),
    )
    return call(q, k, v)


def _fused_mha_fwd(q, k, v, num_heads, interpret):
    return fused_mha(q, k, v, num_heads, interpret), (q, k, v)


def _fused_mha_bwd(num_heads, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: _einsum_attention(q, k, v, num_heads),
                     q, k, v)
    return vjp(g)


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def fused_mha_qkv(
    qkv: jnp.ndarray, num_heads: int, interpret: bool = False
) -> jnp.ndarray:
    """Compatibility wrapper: (B, T, 3D) fused QKV -> (B, T, D)."""
    d = qkv.shape[-1] // 3
    return fused_mha(
        qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :], num_heads,
        interpret=interpret,
    )
