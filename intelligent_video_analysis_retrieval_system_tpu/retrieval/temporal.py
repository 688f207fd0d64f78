"""Temporal analysis over embedding sequences — vectorized, device-ready.

Parity with the reference ``TemporalAnalyzer`` (``core.py:3560-3810``):
scene-boundary detection from sequential similarity, similar-sequence
search, transition-frame extraction, and frame-interval statistics.

The reference computes these with Python loops over sklearn
``cosine_similarity`` calls (O(N·M) Python-level work, ``core.py:3644-3702``).
Here every similarity is a single batched matmul under ``jit`` — the
sliding-window sequence match becomes one ``(N-M+1, M)``-windowed einsum that
XLA maps onto the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TemporalAnalyzer", "SceneBoundary"]


@dataclass(slots=True)
class SceneBoundary:
    start: int
    end: int  # exclusive
    length: int


def _l2n(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@partial(jax.jit, static_argnames=())
def _adjacent_similarity(feats: jnp.ndarray) -> jnp.ndarray:
    """cos(f[i], f[i+1]) for all i — one fused elementwise reduce."""
    f = _l2n(feats.astype(jnp.float32))
    return jnp.sum(f[:-1] * f[1:], axis=-1)


@partial(jax.jit, static_argnames=("window",))
def _windowed_sequence_scores(feats: jnp.ndarray, query: jnp.ndarray, window: int) -> jnp.ndarray:
    """Mean cosine of every length-``window`` slice of ``feats`` vs ``query``.

    Replaces the reference's Python sliding loop (core.py:3677-3688) with:
    per-frame similarity diagonal extraction + cumulative-sum windowing.
    Cost: one (N, D) x (D, window) matmul — MXU-friendly.
    """
    f = _l2n(feats.astype(jnp.float32))          # (N, D)
    q = _l2n(query.astype(jnp.float32))          # (M, D)
    sims = f @ q.T                               # (N, M)
    n = sims.shape[0]
    # score(start) = mean_j sims[start + j, j]
    idx = jnp.arange(n - window + 1)[:, None] + jnp.arange(window)[None, :]
    gathered = sims[idx, jnp.arange(window)[None, :]]  # (N-M+1, M)
    return jnp.mean(gathered, axis=1)


class TemporalAnalyzer:
    """Scene and sequence analysis over a folder's ordered embeddings."""

    def __init__(
        self,
        scene_threshold: float = 0.3,
        min_scene_length: int = 5,
    ) -> None:
        # reference defaults: threshold 0.3, min length 5 (core.py:3584-3642)
        self.scene_threshold = scene_threshold
        self.min_scene_length = min_scene_length

    # -- scene boundaries ----------------------------------------------------

    def adjacent_similarities(self, features: np.ndarray) -> np.ndarray:
        if len(features) < 2:
            return np.zeros((0,), dtype=np.float32)
        return np.asarray(_adjacent_similarity(jnp.asarray(features)))

    def detect_scene_boundaries(self, features: np.ndarray) -> list[SceneBoundary]:
        """Cut where cos(f[i], f[i+1]) < threshold; merge scenes shorter than
        ``min_scene_length`` into their predecessor (reference semantics)."""
        n = len(features)
        if n == 0:
            return []
        if n == 1:
            return [SceneBoundary(0, 1, 1)]
        sims = self.adjacent_similarities(features)
        cut_after = np.nonzero(sims < self.scene_threshold)[0]  # cut between i, i+1
        starts = [0] + [int(i) + 1 for i in cut_after]
        ends = [int(i) + 1 for i in cut_after] + [n]
        scenes: list[SceneBoundary] = []
        for s, e in zip(starts, ends):
            if scenes and (e - s) < self.min_scene_length:
                prev = scenes[-1]
                scenes[-1] = SceneBoundary(prev.start, e, e - prev.start)
            else:
                scenes.append(SceneBoundary(s, e, e - s))
        return scenes

    def assign_shot_ids(self, features: np.ndarray) -> np.ndarray:
        """Per-frame shot id from detected boundaries."""
        shots = np.zeros(len(features), dtype=np.int32)
        for i, scene in enumerate(self.detect_scene_boundaries(features)):
            shots[scene.start : scene.end] = i
        return shots

    # -- similar-sequence search (reference core.py:3644-3702) --------------

    def find_similar_sequences(
        self,
        features: np.ndarray,
        query_sequence: np.ndarray,
        top_k: int = 5,
        min_score: float = 0.0,
    ) -> list[dict[str, Any]]:
        """Top windows of ``features`` matching ``query_sequence``.

        Returns [{start, end, score}] sorted by score desc; windows overlap-
        suppressed greedily (a window is dropped if it overlaps a better one).
        """
        n, m = len(features), len(query_sequence)
        if n < m or m == 0:
            return []
        scores = np.asarray(
            _windowed_sequence_scores(jnp.asarray(features), jnp.asarray(query_sequence), m)
        )
        order = np.argsort(-scores)
        chosen: list[dict[str, Any]] = []
        taken = np.zeros(n, dtype=bool)
        for start in order:
            score = float(scores[start])
            if score < min_score or len(chosen) >= top_k:
                break
            if taken[start : start + m].any():
                continue
            taken[start : start + m] = True
            chosen.append({"start": int(start), "end": int(start + m), "score": score})
        return chosen

    # -- transition frames (reference core.py:3704-3739) --------------------

    def extract_transition_frames(self, features: np.ndarray) -> list[int]:
        """Indices right after each scene cut (first frame of each new scene,
        excluding frame 0)."""
        scenes = self.detect_scene_boundaries(features)
        return [s.start for s in scenes[1:]]

    # -- interval statistics (reference core.py:3741-3810) -------------------

    @staticmethod
    def frame_interval_stats(frame_ids: list[int] | np.ndarray) -> dict[str, float]:
        ids = np.asarray(sorted(int(i) for i in frame_ids), dtype=np.int64)
        if len(ids) < 2:
            return {"count": float(len(ids)), "mean_gap": 0.0, "std_gap": 0.0,
                    "min_gap": 0.0, "max_gap": 0.0, "regularity": 1.0}
        gaps = np.diff(ids).astype(np.float64)
        mean = float(gaps.mean())
        std = float(gaps.std())
        return {
            "count": float(len(ids)),
            "mean_gap": mean,
            "std_gap": std,
            "min_gap": float(gaps.min()),
            "max_gap": float(gaps.max()),
            # 1 = perfectly regular sampling
            "regularity": float(1.0 / (1.0 + std / mean)) if mean > 0 else 0.0,
        }
