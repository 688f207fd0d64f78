"""int4 "ultra-capacity" search probe — NEGATIVE RESULT (round 2).

Motivation: the exact one-chip 10M x 768 **int8** e2e query moves
7.73 GB of rows + ~0.64 GB of (N, 8) i32 score round-trip = 8.37 GB per
query; at the measured 805 GB/s DMA ceiling (benchmarks/exp_stream_bw.py)
that is a **10.4 ms speed-of-light floor before text encode** — the <10 ms
north star (BASELINE.json) is physically out of reach for int8 on ONE v5e
chip; its design point is v5e-8 (1.25M rows/chip ~ 2.2 ms estimate).
int4 rows would halve bytes again (3.87 GB -> ~5 ms floor, 4x corpus per
chip), hence this probe.

Measured on the v5e (2026-08-16), three approaches:

1. **s4 x s4 -> s32 ``lax.dot_general``**: compiles and is bit-exact on
   tiny shapes. BUT a *persisted* s4 array cannot be passed into another
   jitted program on this jax/plugin version — ``_array_shard_arg`` tries
   to relayout via ``api.device_put`` which recursively re-enters jit:
   ``RecursionError: Recursively calling jit ... S4[2097152,768]``.
   Pinning ``in_shardings`` to the producer's ``x.format`` does not help
   (the reported Format carries ``sub_byte_element_size_in_bits=0``, so
   format equality can never hold for sub-byte dtypes). A searchable DB
   must persist across programs -> dead end.
2. **Packed-int8 storage + in-program bitcast unpack** (persist (N, D/2)
   i8 = two nibbles/byte, then ``bitcast_convert_type -> s4 -> reshape``
   inside the search program): compiles, but XLA lowers the unpack at
   scalar grade — measured **28.5 ms per 2M x 768 (28 GB/s of packed
   reads)** vs 3.39 ms for the int8 XLA sweep. 8.4x SLOWER than int8 while
   reading half the bytes. Also the bitcast round-trip is not the identity
   (nibble-pair order swaps), which would need a host-side pack permutation
   — moot given the speed.
3. **In-Pallas nibble unpack + bf16 MXU matmul**: ruled out by the round-1
   int8->bf16 measurement (ops/quant.py history: the VPU convert pass
   serializes against the MXU in-kernel, 6.55 ms per 2M — already slower
   than the int8 XLA path, and int4 adds shift/mask VPU work on the same
   element count).

Conclusion: **int8 is the capacity floor on this stack.** Revisit if a
jax upgrade fixes s4 jit-argument passing (approach 1 is the one that
could ride the MXU's native int4 path).

Probe-methodology gotcha (re-learned here): enqueueing the SAME jitted
computation on the SAME inputs repeatedly (salt folded away by
constant-folding) reports impossible speeds (0.5 ms / "3250 GB/s" for the
2M int8 sweep) — results are cached somewhere below the dispatch. Vary the
inputs per dispatch when timing.

Run alone (single TPU process rule, CLAUDE.md):
    timeout 590 python -u benchmarks/exp_int4_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

D, N, B, CHUNK = 768, 2_097_152, 8, 512


def fetch(x) -> float:
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def timeit(fn, *args) -> float:
    """Marginal per-dispatch time between two FIFO queue depths."""
    def run(n: int) -> float:
        t0 = time.perf_counter()
        outs = [fn(*args, jnp.int32(i)) for i in range(n)]
        fetch(outs[-1])
        return time.perf_counter() - t0

    t1, t2 = run(3), run(13)
    return (t2 - t1) / 10


def pack(x4):
    """s4 (..., D) -> i8 (..., D/2) via bitcast (device-defined nibble order)."""
    return lax.bitcast_convert_type(
        x4.reshape(*x4.shape[:-1], x4.shape[-1] // 2, 2), jnp.int8
    )


def unpack(bits, d):
    x4 = lax.bitcast_convert_type(bits, jnp.int4)
    return x4.reshape(*bits.shape[:-1], d)


def main() -> None:
    print(f"backend={jax.default_backend()}", flush=True)

    # --- approach 1: s4 as a persisted jit argument -----------------------
    @jax.jit
    def gen_s4(key):
        return jax.random.randint(key, (1024, D), -7, 8, jnp.int8).astype(
            jnp.int4
        )

    x4 = gen_s4(jax.random.PRNGKey(0))
    x4.block_until_ready()

    @jax.jit
    def consume(x, salt):
        return x.astype(jnp.int32).sum() + salt

    try:
        fetch(consume(x4, jnp.int32(0)))
        print("s4 jit-arg passing: WORKS (re-evaluate approach 1!)",
              flush=True)
    except RecursionError:
        print("s4 jit-arg passing: RecursionError (known plugin bug) — "
              "approach 1 dead", flush=True)

    # --- approach 2: packed-i8 storage + in-program bitcast unpack --------
    @jax.jit
    def tiny_roundtrip(vals):
        back = unpack(pack(vals.astype(jnp.int4)), vals.shape[-1])
        return (back.astype(jnp.int8) == vals).all()

    vals = jnp.asarray(
        np.resize(np.arange(-7, 8, dtype=np.int8), (2, D)), jnp.int8
    )
    print("bitcast round-trip identity =", bool(tiny_roundtrip(vals)),
          "(False = nibble order swaps; fixable host-side, moot)", flush=True)

    @jax.jit
    def gen_packed(key):
        x = jax.random.randint(key, (N, D), -7, 8, jnp.int8).astype(jnp.int4)
        return pack(x)

    xbits = gen_packed(jax.random.PRNGKey(1))
    xbits.block_until_ready()
    scales = jnp.ones((N,), jnp.float32)
    q8 = jax.jit(
        lambda k: jax.random.randint(k, (B, D), -7, 8, jnp.int8)
    )(jax.random.PRNGKey(2))

    @jax.jit
    def sweep4(xb, s, q, salt):
        x4 = unpack(xb, D)
        q4 = (q + salt.astype(jnp.int8) * 0).astype(jnp.int4)
        scores = lax.dot_general(
            x4, q4, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * s[:, None]
        return jnp.max(scores.reshape(-1, CHUNK, B), axis=1)

    fetch(sweep4(xbits, scales, q8, jnp.int32(0)))
    dt4 = timeit(sweep4, xbits, scales, q8)
    print(
        f"int4(bitcast-unpack) sweep 2M: {dt4*1e3:.2f} ms "
        f"({N*D*0.5/dt4/1e9:.0f} GB/s of packed reads; int8 XLA sweep does "
        f"the same rows in ~3.4 ms)", flush=True,
    )


if __name__ == "__main__":
    main()
