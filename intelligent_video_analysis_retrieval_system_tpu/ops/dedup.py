"""Embedding-based keyframe deduplication as device scans.

Replaces the reference's frame-by-frame Python loops:
- ``video_frame_filter.py:63-70``: keep a frame iff cosine similarity to the
  previously *kept* frame is below a threshold (sequential dependency),
- ``filter.py:178-316``: in-scene dedup against a sliding window of kept
  frames.

Both have an inherent sequential data dependence (what is "kept" depends on
earlier decisions), so they become ``lax.scan`` over precomputed normalized
embeddings — the expensive part (the embeddings) is batched on the MXU; the
scan is O(N) cheap VPU work entirely on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .normalize import l2_normalize

__all__ = [
    "sequential_dedup",
    "sequential_dedup_carry",
    "sequential_dedup_carry_masked",
    "windowed_dedup_mask",
    "cluster_representatives_mask",
]


@functools.partial(jax.jit, static_argnames=())
def sequential_dedup(embeddings: jnp.ndarray, threshold: float = 0.98) -> jnp.ndarray:
    """Keep-mask over time-ordered embeddings.

    Frame i is kept iff cos(e_i, e_last_kept) < threshold. Frame 0 is always
    kept. Matches reference ``extract_unique_frames`` decision logic
    (``video_frame_filter.py:63-70``).
    """
    emb = l2_normalize(embeddings.astype(jnp.float32))

    def step(last_kept, e):
        sim = jnp.sum(last_kept * e)
        keep = sim < threshold
        new_last = jnp.where(keep, e, last_kept)
        return new_last, keep

    if emb.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    _, keeps = lax.scan(step, emb[0], emb[1:])
    return jnp.concatenate([jnp.ones((1,), bool), keeps])


@functools.partial(jax.jit, static_argnames=())
def sequential_dedup_carry(
    embeddings: jnp.ndarray, carry: jnp.ndarray, threshold: float = 0.98
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming variant: dedup a batch given the last-kept embedding from
    the previous batch. Returns (keep mask, new carry).

    Seed ``carry`` with zeros to make the first frame always kept (a zero
    vector has cosine 0 < threshold against anything normalized).
    """
    emb = l2_normalize(embeddings.astype(jnp.float32))

    def step(last_kept, e):
        sim = jnp.sum(last_kept * e)
        keep = sim < threshold
        new_last = jnp.where(keep, e, last_kept)
        return new_last, keep

    if emb.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool), carry
    new_carry, keeps = lax.scan(step, carry.astype(jnp.float32), emb)
    return keeps, new_carry


@functools.partial(jax.jit, static_argnames=())
def sequential_dedup_carry_masked(
    embeddings: jnp.ndarray,
    carry: jnp.ndarray,
    active: jnp.ndarray,
    threshold: float = 0.98,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`sequential_dedup_carry` with an ``active`` row mask.

    Inactive rows (padding, phash-prefiltered) are never kept and never
    touch the carry — they behave as if absent from the stream, which lets
    callers keep a FIXED batch shape (one compiled program) while dropping
    rows mid-batch.
    """
    emb = l2_normalize(embeddings.astype(jnp.float32))

    def step(last_kept, ea):
        e, a = ea
        sim = jnp.sum(last_kept * e)
        keep = (sim < threshold) & a
        new_last = jnp.where(keep, e, last_kept)
        return new_last, keep

    if emb.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool), carry
    new_carry, keeps = lax.scan(
        step, carry.astype(jnp.float32), (emb, active.astype(bool))
    )
    return keeps, new_carry


@functools.partial(jax.jit, static_argnames=("window",))
def windowed_dedup_mask(
    embeddings: jnp.ndarray, threshold: float = 0.95, window: int = 5
) -> jnp.ndarray:
    """Keep-mask: drop frame i if it is >= ``threshold`` similar to ANY of
    the last ``window`` *kept* frames (reference in-scene dedup,
    ``filter.py:178-316``).

    Carry is a ring buffer of the last ``window`` kept embeddings.
    """
    n = embeddings.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    emb = l2_normalize(embeddings.astype(jnp.float32))
    d = emb.shape[1]

    # ring buffer initialized to zeros (zero vector has cos 0 < threshold)
    init_buf = jnp.zeros((window, d), jnp.float32)
    init_pos = jnp.zeros((), jnp.int32)

    def step(carry, e):
        buf, pos = carry
        sims = buf @ e                      # (window,)
        keep = jnp.max(sims) < threshold
        buf = jnp.where(keep, buf.at[pos % window].set(e), buf)
        pos = jnp.where(keep, pos + 1, pos)
        return (buf, pos), keep

    (_, _), keeps = lax.scan(step, (init_buf, init_pos), emb)
    return keeps


def cluster_representatives_mask(
    embeddings, eps: float = 0.05, min_cluster: int = 1
):
    """Density-style dedup: cluster frames whose cosine distance is within
    ``eps`` (single-linkage connected components — the same neighborhoods
    DBSCAN(eps, min_samples=2) merges in the reference,
    ``filter_research_update.py:113-134``) and keep one representative per
    cluster: the frame nearest the cluster centroid
    (``filter_research_update.py:136-155``).

    The O(N²) similarity matrix computes on device (one matmul); the
    component walk is host-side (scenes are small). Returns a numpy keep
    mask.
    """
    import numpy as np

    n = int(embeddings.shape[0])
    if n == 0:
        return np.zeros((0,), bool)
    if n == 1:
        return np.ones((1,), bool)
    emb = l2_normalize(jnp.asarray(embeddings, jnp.float32))
    sims = np.asarray(emb @ emb.T, np.float32)
    adj = (1.0 - sims) <= eps

    # union-find over the adjacency
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    rows, cols = np.nonzero(np.triu(adj, k=1))
    for a, b in zip(rows.tolist(), cols.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    clusters: dict[int, list[int]] = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(i)

    keep = np.zeros(n, bool)
    emb_np = np.asarray(emb)
    for members in clusters.values():
        if len(members) < min_cluster:
            continue
        if len(members) == 1:
            keep[members[0]] = True
            continue
        sub = emb_np[members]
        centroid = sub.mean(axis=0)
        centroid /= max(np.linalg.norm(centroid), 1e-12)
        rep = members[int(np.argmax(sub @ centroid))]
        keep[rep] = True
    return keep
