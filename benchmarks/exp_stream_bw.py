"""Probe: pure HBM->VMEM streaming bandwidth per dtype on the real chip.

Question from exp_int8: int8 sweeps cap at ~310 GB/s while the bf16 sweep
streams at ~710 GB/s. Is the int8 DMA itself slow (tiled-layout penalty for
1-byte dtypes), or is it the compute? This kernel only DMAs each tile and
writes an 8x128 probe slice, so it measures the DMA pipeline alone.

Variants: bf16 (N, 768), int8 (N, 768), int8-viewed-as-int32 (N, 192).
Same total byte count per variant so GB/s is comparable.
"""

from __future__ import annotations

import functools
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.lru_cache(maxsize=16)
def build_probe(n_rows: int, d: int, dtype_name: str, tile_n: int):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = dict(bf16=jnp.bfloat16, i8=jnp.int8, i32=jnp.int32)[dtype_name]

    def kernel(x_ref, out_ref):
        # touch a slice of the block so the DMA cannot be elided; f32 out
        out_ref[:] = x_ref[:8, :128].astype(jnp.float32)

    probe = pl.pallas_call(
        kernel,
        grid=(n_rows // tile_n,),
        in_specs=[pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    @jax.jit
    def run(x, salt):
        return probe(x)[0, 0] + salt

    return run, dtype


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    total_bytes = 1_610_612_736  # 1.5 GiB
    cases = [
        ("bf16", 768, 2, 2048),
        ("i8", 768, 1, 2048),
        ("i8", 768, 1, 8192),
        ("i32", 192, 4, 2048),
    ]
    for name, d, isize, tile in cases:
        n = total_bytes // (d * isize)
        n -= n % tile
        run, dtype = build_probe(n, d, name, tile)
        key = jax.random.PRNGKey(0)
        if name == "bf16":
            x = jax.random.normal(key, (n, d), jnp.bfloat16)
        else:
            x = jax.random.randint(key, (n, d), -100, 100, jnp.int32).astype(dtype)
        x.block_until_ready()
        float(run(x, jnp.float32(0)))  # compile

        def run_n(k):
            t0 = time.perf_counter()
            outs = [run(x, jnp.float32(i + 1)) for i in range(k)]
            float(outs[-1])
            return time.perf_counter() - t0

        t1, t2 = run_n(10), run_n(40)
        ms = (t2 - t1) / 30 * 1e3
        gb = n * d * isize / 1e9
        log(f"{name} d={d} tile={tile}: {ms:.2f} ms for {gb:.2f} GB "
            f"-> {gb / ms * 1e3:.0f} GB/s")
        del x


if __name__ == "__main__":
    main()
