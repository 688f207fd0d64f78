"""Hypothesis probe: IVF candidate access as random row GATHERS vs
cluster-contiguous SLAB reads.

VERDICT (measured 2026-08-17, v5e): the cluster-contiguous layout is NOT
worth the architectural cost. At 201 MB of candidates (nprobe=128):
gather_random 44.3 GB/s, gather_runs 45.6 (XLA does NOT exploit index
contiguity), slabs_bf16 60.3, slabs_int8 113.5 GB/s — contiguity buys
2.6x on the GATHER STAGE. But at the production operating points
(nprobe 16-64 = 30-95 MB of candidates) the whole variant set measures
at or under the tunnel dispatch floor (25 MB: every variant <=0.12 ms),
i.e. the gather stage is a fraction of the observed 2.8-4.7 ms e2e IVF
latency, which is dominated by dispatch floor + encode + selection. A
permuted device buffer (id remapping in every search/delete/append
path) to accelerate a sub-ms stage fails the complexity trade. Revisit
only if a no-tunnel deployment shows the gather dominating, or if
batched-ANN (B>=8, where candidate volume DOES reach GBs) becomes a
requirement — there the slab layout plus a batch-shared probe union is
the design to try first.

Original hypothesis and method: the measured IVF numbers seemed to imply
~20-30M rows/s gather throughput; storing rows REORDERED by cluster
(probes become dynamic_slice slabs) would then cut ANN latency several-
fold. This probe measures, on the same 2M int8 corpus:

  A. gather of nprobe*cap random row ids + batched dot   (current path)
  B. gather of the SAME COUNT of ids arranged as contiguous runs
     (tests whether XLA's gather recognizes contiguity)
  C. scan over nprobe dynamic_slice slabs + per-slab dot  (packed layout)

Timed fns are single jitted programs; inputs salted per dispatch
(CLAUDE.md timing discipline).

Usage: python benchmarks/exp_gather_vs_slab.py [--rows 2000000]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from bench import log, percentile_rounds, round_overhead  # noqa: E402

D = 768


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--cap", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--per-round", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    log(f"backend={jax.default_backend()}")
    n = args.rows
    nprobe, cap = args.nprobe, args.cap
    n_cand = nprobe * cap

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.randint(k1, (n, D), -127, 128, jnp.int8)
    q = jax.random.normal(k2, (256, D), jnp.float32)
    x.block_until_ready()

    rng = np.random.default_rng(3)
    # A: fully random ids (the worst case the current path can see)
    ids_rand = jnp.asarray(
        np.sort(rng.choice(n, n_cand, replace=False)).astype(np.int32)
    )
    # B: same count, contiguous runs of cap at random slab starts
    starts_np = np.sort(
        rng.choice(n // cap - 1, nprobe, replace=False)
    ).astype(np.int32) * cap
    ids_runs = jnp.asarray(
        (starts_np[:, None] + np.arange(cap)[None, :]).reshape(-1)
        .astype(np.int32)
    )
    starts = jnp.asarray(starts_np)

    overhead = round_overhead(args.per_round)
    log(f"candidates/query: {n_cand} rows ({n_cand * D / 1e6:.0f} MB int8); "
        f"overhead/round {overhead*1e3:.2f} ms")

    @jax.jit
    def by_gather(x, ids, q, i):
        qf = lax.dynamic_slice_in_dim(q, i, 1, 0)           # (1, D), salted
        rows = x[ids]                                       # (n_cand, D)
        s = lax.dot_general(
            qf, rows[None],
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return s.max()

    @jax.jit
    def by_slabs(x, starts, q, i):
        qf = lax.dynamic_slice_in_dim(q, i, 1, 0)[0]        # (D,)

        def body(carry, start):
            slab = lax.dynamic_slice_in_dim(x, start, cap, 0)  # contiguous
            s = jnp.dot(
                slab.astype(jnp.bfloat16), qf.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return jnp.maximum(carry, s.max()), None

        out, _ = lax.scan(body, jnp.float32(-np.inf), starts)
        return out

    @jax.jit
    def by_slabs_int8(x, starts, q, i):
        qf = lax.dynamic_slice_in_dim(q, i, 1, 0)[0]
        q8 = jnp.clip(jnp.rint(qf * 127), -127, 127).astype(jnp.int8)

        def body(carry, start):
            slab = lax.dynamic_slice_in_dim(x, start, cap, 0)
            s = lax.dot_general(
                slab, q8[:, None],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.maximum(carry, s.max()), None

        out, _ = lax.scan(body, jnp.int32(-(2**30)), starts)
        return out

    results = {"rows": n, "nprobe": nprobe, "cap": cap, "n_cand": n_cand}
    for name, fn, arg in (
        ("gather_random", by_gather, ids_rand),
        ("gather_runs", by_gather, ids_runs),
        ("slabs_bf16", by_slabs, starts),
        ("slabs_int8", by_slabs_int8, starts),
    ):
        fn(x, arg, q, jnp.int32(0))  # compile
        timed = functools.partial(
            lambda i, f, a: f(x, a, q, jnp.int32(i % 255)), f=fn, a=arg
        )
        p50, p95, _ = percentile_rounds(
            timed, args.rounds, args.per_round, overhead
        )
        gbs = n_cand * D / (p50 * 1e-3) / 1e9
        log(f"{name:14s}: p50 {p50:7.2f} ms  p95 {p95:7.2f} ms  "
            f"({gbs:6.1f} GB/s effective)")
        results[f"{name}_p50_ms"] = round(p50, 3)
        results[f"{name}_gbs"] = round(gbs, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
