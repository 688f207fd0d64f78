"""Fused LayerNorm + MLP residual block kernel for ViT towers.

The second half of every pre-LN transformer block is

    x + fc2(act(fc1(LN(x))))

which XLA executes as a serial chain: an LN loop-fusion pass, two MXU
matmuls, and a residual-add pass — with the (B, T, 4D) hidden activation
round-tripping through HBM between the matmuls. Measured on v5e the pure
elementwise passes cap at ~207 GB/s (VPU/issue-bound) while matmul
streaming reaches 710 GB/s, so the ~48 LN+residual passes of a ViT-L/14
forward cost real serial milliseconds (see RESULTS.md).

This kernel runs the whole half-block per image in one grid row: LN is
computed once into VMEM scratch, the MLP hidden dimension is tiled into
chunks so fc1/fc2 weight slices stream through VMEM, and fc2 partial
products accumulate in an f32 scratch that already holds the residual:

    grid = (B, H / CH), hidden-chunk fastest
    h == 0 :  ln     = LN(x)            (VMEM scratch, computed once)
              acc    = x_f32 + b2       (residual + bias, f32 scratch)
    every h:  a      = act(ln @ w1[:, h] + b1[h])
              acc   += a @ w2[h, :]     (MXU, f32 accumulate)
    last h :  out[b] = acc              (single HBM write)

The (B, T, 4D) hidden activation never exists in HBM, and LN / residual
/ bias / activation all ride inside the matmul pipeline instead of as
serial VPU passes. Replaces the reference's cuBLAS-chained
``CLIPVisionModel`` forward (torch, ``core.py:1442``) for the hot path.

VMEM at ViT-L shapes (T=257, D=1024, CH=512): x 0.53 MB + ln 0.53 MB +
acc f32 1.05 MB + w1/w2 chunks 2x1 MB double-buffered + out 0.53 MB
— ~7 MB, comfortably under the ~16 MB budget.

Used by ``models.clip.TransformerBlock`` on TPU in throughput mode (the
HIGHEST-precision torch-parity path keeps the unfused einsum chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["fused_ln_mlp", "supports_fused_ln_mlp"]

_ACTS = ("quick_gelu", "gelu", "gelu_tanh")


def _act_fn(name: str):
    if name == "quick_gelu":
        # hand-rolled logistic with dtype-typed constants: Mosaic rejects
        # the f32 scalar broadcasts jax.nn.sigmoid emits against bf16 vectors
        def _qg(x):
            one = jnp.asarray(1.0, x.dtype)
            c = jnp.asarray(1.702, x.dtype)
            return x / (one + jnp.exp(-c * x))

        return _qg
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {name!r}")


def supports_fused_ln_mlp(d: int, hidden: int, act: str) -> bool:
    """Shape/act gate: lane-aligned model dim, chunkable hidden dim."""
    return act in _ACTS and d % 128 == 0 and hidden % 256 == 0


def _pick_chunk(hidden: int) -> int:
    return 512 if hidden % 512 == 0 else 256


def _ln_mlp_kernel(
    x_ref, g_ref, bta_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    ln_ref, acc_ref, *, act: str, n_h: int, eps: float,
):
    import jax.experimental.pallas as pl

    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        x = x_ref[0].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        ln = (x - mu) * lax.rsqrt(var + eps) * g_ref[0] + bta_ref[0]
        ln_ref[...] = ln.astype(ln_ref.dtype)
        acc_ref[...] = x + b2_ref[0]

    pre = (
        jnp.dot(ln_ref[...], w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[0]
    )
    # activation in the model dtype (bf16 on the throughput path): the VPU
    # transcendental is the serial cost inside this kernel, and bf16 matches
    # what the unfused flax chain computes anyway
    a = _act_fn(act)(pre.astype(ln_ref.dtype))
    acc_ref[...] += jnp.dot(
        a, w2_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(h == n_h - 1)
    def _flush():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


@functools.lru_cache(maxsize=32)
def _build_ln_mlp(
    b: int, t: int, d: int, hidden: int, ch: int, act: str, eps: float,
    dtype_name: str, interpret: bool,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_h = hidden // ch
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(_ln_mlp_kernel, act=act, n_h=n_h, eps=eps)
    row = pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(b, n_h),
        in_specs=[
            row,                                                   # x
            vec_d,                                                 # ln scale
            vec_d,                                                 # ln bias
            pl.BlockSpec((d, ch), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                 # w1 chunk
            pl.BlockSpec((1, ch), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                 # b1 chunk
            pl.BlockSpec((ch, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),                 # w2 chunk
            vec_d,                                                 # b2
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, t, d), dtype),
        scratch_shapes=[
            pltpu.VMEM((t, d), dtype),        # LN(x), computed once
            pltpu.VMEM((t, d), jnp.float32),  # residual + fc2 accumulator
        ],
        interpret=interpret,
    )
    return jax.jit(call)


def fused_ln_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    act: str = "quick_gelu",
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x + fc2(act(fc1(LN(x))))`` per image, hidden never touching HBM.

    ``x``: (B, T, D); weights in flax Dense layout (``w1``: (D, H),
    ``w2``: (H, D)). LN statistics and the fc2 accumulation run in f32;
    matmul inputs are ``x.dtype`` (bf16 on the throughput path).
    """
    b, t, d = x.shape
    hidden = w1.shape[1]
    assert supports_fused_ln_mlp(d, hidden, act), (d, hidden, act)
    ch = _pick_chunk(hidden)
    call = _build_ln_mlp(
        int(b), int(t), int(d), int(hidden), ch, act, float(eps),
        x.dtype.name, bool(interpret),
    )
    dt = x.dtype
    return call(
        x,
        ln_scale.reshape(1, d).astype(jnp.float32),
        ln_bias.reshape(1, d).astype(jnp.float32),
        w1.astype(dt),
        b1.reshape(1, hidden).astype(jnp.float32),
        w2.astype(dt),
        b2.reshape(1, d).astype(jnp.float32),
    )
