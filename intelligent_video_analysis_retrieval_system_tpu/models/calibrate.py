"""Static activation-scale calibration for W8A8 towers.

The dynamic W8A8 mode (``w8a8=True``) computes a per-token max reduction
before every int8 matmul — robust but VPU-bound (the reason the ViT-L/14
W8A8 win was capped at 1.15x in round 2; see RESULTS.md). Static mode
(``w8a8_static=True``) replaces every per-token reduce with one calibrated
scalar per dense-layer input, measured 2.9x faster than dynamic at ViT-L
MLP shapes (benchmarks/exp_w8a8_static.py).

Calibration = run representative batches through the *dynamic* model while
collecting the observed ``max|x|`` at every quant site (the towers sow
these into the ``act_stats`` collection, see
``models.clip._w8a8_act_scale``), then turn each maximum into a symmetric
int8 scale ``amax * margin / 127``. Out-of-calibration activations
saturate (clip) — the ``margin`` headroom controls how often.

Usage::

    model = CLIPVisionTower(cfg.vision, dtype=jnp.bfloat16, w8a8=True)
    act_scales = calibrate_act_scales(
        model, {"params": params}, [(batch1,), (batch2,)])
    fast = CLIPVisionTower(cfg.vision, dtype=jnp.bfloat16,
                           w8a8=True, w8a8_static=True)
    out = fast.apply({"params": params, **act_scales}, pixels)

The ``params`` tree is untouched — static mode adds only the (tiny)
``act_scales`` collection, so bf16 / dynamic-int8 / static-int8 all share
one checkpoint. Quality: gate with a cosine check against the bf16 tower
on your data (tests/test_models.py does this for the tiny config).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["calibrate_act_scales", "act_stats_to_scales"]


def _map_leaves(tree: Any, fn: Callable[[str, Any], tuple[str, Any]]) -> Any:
    """Walk a nested dict, applying fn(key, leaf) -> (new_key, new_leaf)."""
    if not isinstance(tree, dict):
        raise TypeError(f"expected dict tree, got {type(tree)}")
    out = {}
    for key, val in tree.items():
        if isinstance(val, dict):
            out[key] = _map_leaves(val, fn)
        else:
            new_key, new_val = fn(key, val)
            out[new_key] = new_val
    return out


def _reduce_sown(leaf: Any) -> jnp.ndarray:
    """Flax ``sow`` stores a tuple unless a reduce_fn collapsed it."""
    if isinstance(leaf, tuple):
        vals = [jnp.asarray(v) for v in leaf]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.maximum(out, v)
        return out
    return jnp.asarray(leaf)


def act_stats_to_scales(act_stats: dict, margin: float = 1.0) -> dict:
    """``act_stats`` collection (``*_amax`` maxima) -> ``act_scales``
    collection (``*_ascale`` scalars), ``scale = amax * margin / 127``."""

    def convert(key: str, leaf: Any):
        if not key.endswith("_amax"):
            raise ValueError(f"unexpected act_stats leaf {key!r}")
        amax = jnp.maximum(_reduce_sown(leaf), 1e-6)
        return key[: -len("_amax")] + "_ascale", (
            amax.astype(jnp.float32) * margin / 127.0
        )

    return {"act_scales": _map_leaves(act_stats, convert)}


def calibrate_act_scales(
    model,
    variables: dict,
    batches: Iterable[Sequence[Any]],
    method: Any = None,
    margin: float = 1.0,
) -> dict:
    """Collect activation maxima over ``batches`` and return the
    ``{"act_scales": ...}`` collection for ``w8a8_static=True`` towers.

    ``model`` must be built with ``w8a8=True`` (dynamic or static — the
    sow sites exist either way; a static model runs its placeholder scales
    during calibration, which only affects the *observed* activations via
    quantization noise, not the recorded maxima of the inputs).
    ``batches``: iterable of positional-arg tuples for ``model.apply``.
    ``margin`` > 1 adds clipping headroom for data drift.
    """
    stats = None
    for batch in batches:
        kwargs = {"method": method} if method is not None else {}
        _, mutated = model.apply(
            variables, *batch, mutable=["act_stats"], **kwargs
        )
        batch_stats = jax.tree.map(
            _reduce_sown, mutated["act_stats"],
            is_leaf=lambda x: isinstance(x, tuple),
        )
        stats = (
            batch_stats if stats is None
            else jax.tree.map(jnp.maximum, stats, batch_stats)
        )
    if stats is None:
        raise ValueError("calibrate_act_scales needs at least one batch")
    return act_stats_to_scales(stats, margin=margin)
