"""Int8-quantized similarity search: half the memory per row.

Opt-in **capacity mode** for very large corpora: int8 rows halve HBM bytes
vs bf16, so ~2x the corpus fits per chip (10M x 768 = 7.7 GB on one v5e).
Scheme (round 2 — int8 x int8 on the MXU):

- database rows quantize symmetrically per row: ``x_i8 = round(x / s)``
  with ``s = max|x| / 127`` (rows are L2-normalized first, so s ~= 1/127);
- queries quantize the same way per query row, inside the jitted search;
- phase 1 (Pallas): int8 rows stream from HBM straight into an
  ``int8 x int8 -> int32`` MXU matmul — no in-VMEM dequantize pass. The
  (TILE_N, B) i32 output is scaled by the per-row ``s_row`` and chunk-max
  reduced. Per-query scales are NOT applied here: chunk selection is
  invariant under a positive per-query scaling, so they fold into phase 2.
- phase 2: gather candidate int8 rows, integer-rescore in f32 with the SAME
  quantized query, then apply ``s_row * s_q``.

Exactness within the quantized metric: every product |p| <= 127*127 and a
768-term sum stays < 2^24, so f32 represents all partial sums exactly —
the integer dot is bit-exact and **order-independent**, making the int8
path deterministic across programs/shardings (unlike the bf16 path, which
needs tie-aware comparisons; see CLAUDE.md). The approximations are the
int8 row AND query quantization (measured recall@10 vs exact ~1.0 for
CLIP-like embeddings; verify per-corpus with
``retrieval.evaluation.evaluate_backends``).

Backend history (measured on v5e, benchmarks/exp_int8.py and
benchmarks/exp_int8_xla_sweep.py):
- round-1 kernel (int8 -> bf16 convert in VMEM, bf16 matmul): 6.55 ms per
  2M x 768 rows — the VPU convert serializes against the MXU in-kernel;
- round-2 Pallas int8 x int8 kernel: 5.2 ms per 2M rows (~310 GB/s). Raw
  int8 DMA streams at ~805 GB/s (benchmarks/exp_stream_bw.py), so the gap
  is the Mosaic int8-matmul lowering, not bandwidth; TILE_N 4096 measured
  equal, 8192 exceeds the 16 MB scoped-VMEM limit.
- round-2 **XLA backend (current default)**: phase 1 as a plain
  ``lax.dot_general`` int8 x int8 -> i32 with the scale/mask/chunk-max as
  XLA ops — 3.37 ms full search per 2M rows (~480 GB/s effective), 2.06x
  the Pallas kernel, top-1 bit-exact MATCH. XLA's int8 matmul lowering
  (429 TFLOP/s in isolation) beats Mosaic's; the extra (N, B) i32 score
  materialization costs only ~64 MB HBM round-trip per 2M rows at B=8.
  The fused-Pallas-vs-XLA verdict is therefore dtype-specific: bf16 needs
  the fused kernel (XLA's f32-HIGHEST chain measured 180x slower), int8
  does not. Both backends share phase 2 and return identical results;
  ``backend="pallas"`` keeps the kernel for comparison.

Supports the same dynamic ``n_valid`` and tombstone mask as the exact
kernel (``ops.topk``). Replaces FAISS IndexFlatIP at 2x capacity
(reference ``core.py:1198-1234``, ``unified_index.py:503``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .topk import CHUNK, TILE_N, TopKResult, pad_queries

__all__ = [
    "symmetric_int8",
    "quantize_rows_int8",
    "dequantize_rows_int8",
    "topk_search_int8",
    "w8a8_dense",
]



def symmetric_int8(x: jnp.ndarray, axis: int, eps: float = 1e-12):
    """Symmetric per-slice int8 quantization: ``scale = max|x|/127`` along
    ``axis`` (keepdims), values ``clip(round(x/scale), -127, 127)``.

    The ONE definition of the quantization scheme — the database rows
    (:func:`quantize_rows_int8` is its numpy twin, kept in lockstep), the
    search-time query quant, and both W8A8 dense quant sites all share it;
    changing the epsilon/bounds/rounding here is the only way to change
    the scheme (drift between copies would break the bit-exactness
    contract between stored rows and query-time math).
    """
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=axis, keepdims=True), eps) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def w8a8_dense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
    a_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dense layer on the int8 MXU: activation quant x per-output-channel
    weight quant -> int32 accumulate -> dequant.

    Measured on v5e (benchmarks — /tmp probe, 8192x4096x4096): int8xint8
    runs at 429 TFLOP/s vs bf16's 169 (2.5x); the full quant+dot+dequant
    chain measures 1.6x bf16. Weight quantization happens inside the jitted
    program from the ORIGINAL f32 kernel params, so the param tree is
    identical to ``nn.Dense`` and checkpoints interchange freely with the
    bf16 path (the per-forward weight pass costs ~2-3 ms for all of
    ViT-L/14 — noise against the matmul win at batch >= 64).

    ``a_scale``: activation scale mode.
    - ``None`` (default): **dynamic** per-token symmetric scales — a max
      reduction over the feature axis per token. Robust, calibration-free.
    - scalar array: **static** calibrated scale — skips the per-token
      reduce entirely (the VPU-bound part of the quant pass; measured
      0.94 ms vs 2.70 ms dynamic at ViT-L MLP shapes,
      benchmarks/exp_w8a8_static.py). Obtain scales with
      ``models.calibrate.calibrate_act_scales``; out-of-range activations
      saturate at +-127 (symmetric clipping).

    Accuracy: symmetric int8 both sides; ViT activations after LayerNorm
    are well-conditioned for per-token scaling (cosine gate enforced in
    tests/test_models.py).

    NB: call this INSIDE a jitted program (the towers do). It is a
    building block, not a dispatch boundary — eager per-op dispatch is
    pathologically slow on tunneled TPU backends (CLAUDE.md).
    """
    w8, w_scale = symmetric_int8(kernel, axis=0)           # (1, out) scale

    x_f = x.astype(jnp.float32)
    if a_scale is None:
        x8, x_scale = symmetric_int8(x_f, axis=-1)         # (..., 1) scale
    else:
        x_scale = jnp.maximum(
            jnp.asarray(a_scale, jnp.float32), 1e-12
        )                                                  # scalar
        x8 = jnp.clip(jnp.round(x_f / x_scale), -127, 127).astype(jnp.int8)

    out = lax.dot_general(
        x8, w8,
        dimension_numbers=(((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)


def quantize_rows_int8(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, D) f32 -> (int8 rows, f32 per-row scales).

    Numpy twin of :func:`symmetric_int8` (host-side row storage path, no
    device needed) — same eps/bounds/round-half-even, kept in lockstep."""
    x = np.asarray(x, np.float32)
    scales = np.maximum(np.abs(x).max(axis=-1), 1e-12) / 127.0
    q = np.clip(np.rint(x / scales[:, None]), -127, 127).astype(np.int8)
    return q, scales.astype(np.float32)


def dequantize_rows_int8(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * np.asarray(scales, np.float32)[:, None]


def _quantize_q(q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 query quantization (jit-traceable)."""
    q_i8, qs = symmetric_int8(q, axis=-1)
    return q_i8, qs[..., 0]


def _int8_sweep_kernel(n_valid_ref, x_ref, xs_ref, q_ref, dead_ref, out_ref):
    """int8 x int8 -> i32 on the MXU; scale rows; mask; chunk max.

    No dequantize pass: the only VPU work is the (TILE_N, B) output scaling
    and masking — measured 5.2 ms vs 6.55 ms per 2M rows for the
    convert-then-bf16-matmul variant this replaced.
    """
    import jax.experimental.pallas as pl

    scores = jnp.dot(
        x_ref[:], q_ref[:].T, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * xs_ref[:]     # (TILE_N, B) * (TILE_N, 1) row scales
    row = pl.program_id(0) * x_ref.shape[0] + lax.broadcasted_iota(
        jnp.int32, scores.shape, 0
    )
    # Mosaic lacks i8 vector compares — widen the mask first
    alive = (row < n_valid_ref[0]) & (dead_ref[:].astype(jnp.int32) == 0)
    scores = jnp.where(alive, scores, -jnp.inf)
    b = scores.shape[1]
    out_ref[:] = jnp.max(scores.reshape(-1, CHUNK, b), axis=1)


@functools.lru_cache(maxsize=64)
def _build_int8_searcher(n_pad: int, d: int, b_pad: int, k: int,
                         interpret: bool, backend: str = "xla"):
    """Compile the int8 two-phase searcher.

    ``backend="xla"`` (default): phase 1 is a plain int8 x int8
    ``lax.dot_general`` + fused scale/mask/chunk-max — measured 2.06x the
    Pallas kernel on v5e (module docstring). ``backend="pallas"`` keeps the
    fused kernel; ``interpret=True`` forces the Pallas kernel in interpret
    mode (CPU test coverage of the kernel itself).
    """
    num_chunks = n_pad // CHUNK
    k_chunks = min(k, num_chunks)
    use_pallas_sweep = interpret or backend == "pallas"

    if use_pallas_sweep:
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        num_tiles = n_pad // TILE_N
        chunks_per_tile = TILE_N // CHUNK

        sweep = pl.pallas_call(
            _int8_sweep_kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),                 # n_valid
                pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),                 # x int8
                pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),                 # x scales
                pl.BlockSpec((b_pad, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),                 # q int8
                pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),                 # tombstones
            ],
            out_specs=pl.BlockSpec(
                (chunks_per_tile, b_pad), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((num_chunks, b_pad), jnp.float32),
            interpret=interpret,
        )

    @jax.jit
    def search(x_i8, x_scales, q, n_valid, deleted):
        # quantize the query ONCE and use it in BOTH phases — mixing a
        # quantized phase 1 with a full-precision phase 2 would break the
        # chunk-containment guarantee; with one metric the integer math is
        # exact (< 2^24), so containment holds with zero ulp slack
        q_i8, q_scales = _quantize_q(q)
        if use_pallas_sweep:
            n_valid_arr = jnp.asarray(n_valid, jnp.int32).reshape(1)
            chunk_max = sweep(
                n_valid_arr, x_i8, x_scales.reshape(-1, 1), q_i8, deleted,
            )
        else:
            # identical math to the kernel, op for op: i32 dot, f32 row
            # scale, mask, chunk max — so chunk_max is bit-identical and
            # the two backends select the same candidate chunks
            scores = lax.dot_general(
                x_i8, q_i8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * x_scales[:, None]         # (n_pad, B)
            row = lax.broadcasted_iota(jnp.int32, scores.shape, 0)
            alive = (row < jnp.asarray(n_valid, jnp.int32)) & (
                deleted.astype(jnp.int32) == 0
            )
            scores = jnp.where(alive, scores, -jnp.inf)
            chunk_max = jnp.max(scores.reshape(-1, CHUNK, b_pad), axis=1)
        # chunk selection is invariant to the positive per-query scale, so
        # phase 1 never needs q_scales
        _, chunk_ids = lax.top_k(chunk_max.T, k_chunks)
        row_ids = (
            chunk_ids[:, :, None] * CHUNK + jnp.arange(CHUNK)[None, None, :]
        ).reshape(b_pad, k_chunks * CHUNK)
        valid = (row_ids < n_valid) & (deleted[row_ids, 0] == 0)
        safe = jnp.where(valid, row_ids, 0)
        # integer rescore (f32-exact), then the same s_row scaling as the
        # kernel, then the per-query scale
        int_dot = jnp.einsum(
            "bd,bcd->bc",
            q_i8.astype(jnp.float32),
            x_i8[safe].astype(jnp.float32),
            precision=lax.Precision.HIGHEST,
        )
        scores = int_dot * x_scales[safe] * q_scales[:, None]
        scores = jnp.where(valid, scores, -jnp.inf)
        k_eff = min(k, scores.shape[1])
        top_scores, pos = lax.top_k(scores, k_eff)
        top_ids = jnp.take_along_axis(row_ids, pos, axis=1)
        return TopKResult(top_scores, top_ids.astype(jnp.int32))

    return search


def pad_rows_int8(
    x_i8: np.ndarray, scales: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    n = x_i8.shape[0]
    n_pad = -(-max(n, TILE_N) // TILE_N) * TILE_N
    if n_pad == n:
        return x_i8, scales
    xp = np.zeros((n_pad, x_i8.shape[1]), np.int8)
    xp[:n] = x_i8
    sp = np.zeros((n_pad,), np.float32)
    sp[:n] = scales
    return xp, sp


def topk_search_int8(
    x_i8: jnp.ndarray,
    x_scales: jnp.ndarray,
    q: jnp.ndarray,
    k: int,
    n_valid: int | None = None,
    deleted: jnp.ndarray | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
    backend: str = "xla",
) -> TopKResult:
    """Top-k over an int8-quantized database.

    ``q`` is full-precision and is quantized per-row on device (the scheme
    in the module docstring). Results are deterministic across CPU/TPU and
    shardings (integer metric) — and identical across ``backend`` choices
    ("xla" default, "pallas" keeps the fused kernel).
    """
    b = q.shape[0]
    n_live = int(x_i8.shape[0]) if n_valid is None else int(n_valid)
    if n_live == 0:
        return TopKResult(
            jnp.full((b, 0), -jnp.inf, jnp.float32), jnp.zeros((b, 0), jnp.int32)
        )
    k = min(k, n_live)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        return _int8_reference(x_i8[:n_live], x_scales[:n_live], q, k, deleted)

    n_pad = x_i8.shape[0]
    assert n_pad % TILE_N == 0, "pad with pad_rows_int8 first"
    q_p = pad_queries(jnp.asarray(q, jnp.float32))
    if deleted is None:
        dead = jnp.zeros((n_pad, 1), jnp.int8)
    else:
        dead = jnp.asarray(deleted, jnp.int8).reshape(-1, 1)
        if dead.shape[0] != n_pad:
            dead = jnp.concatenate(
                [dead, jnp.zeros((n_pad - dead.shape[0], 1), jnp.int8)]
            )
    # bucketed k: run at the power-of-two bucket, slice the exact prefix
    # (ops.topk.bucket_k rationale — varying serving k must not compile a
    # fresh program per value)
    from .topk import bucket_k

    k_run = min(bucket_k(k), n_live)
    search = _build_int8_searcher(
        int(n_pad), int(x_i8.shape[1]), int(q_p.shape[0]), int(k_run),
        bool(interpret), backend,
    )
    res = search(x_i8, jnp.asarray(x_scales, jnp.float32), q_p,
                 jnp.int32(n_live), dead)
    if q_p.shape[0] != b or res.scores.shape[1] != k:
        res = TopKResult(res.scores[:b, :k], res.indices[:b, :k])
    return res


@functools.partial(jax.jit, static_argnames=("k",))
def _int8_reference(x_i8, x_scales, q, k, deleted=None):
    """Oracle under the SAME quantized metric (CPU fallback + sharded
    per-shard path): identical scores to the Pallas searcher, bit-exact."""
    q_i8, q_scales = _quantize_q(jnp.asarray(q))
    int_dot = jnp.einsum(
        "bd,nd->bn",
        q_i8.astype(jnp.float32),
        x_i8.astype(jnp.float32),
        precision=lax.Precision.HIGHEST,
    )
    scores = int_dot * x_scales[None, :] * q_scales[:, None]
    if deleted is not None:
        mask = jnp.asarray(deleted).reshape(-1)[: x_i8.shape[0]]
        scores = jnp.where(mask[None, :] == 0, scores, -jnp.inf)
    top_scores, top_ids = lax.top_k(scores, min(k, x_i8.shape[0]))
    return TopKResult(top_scores, top_ids.astype(jnp.int32))
