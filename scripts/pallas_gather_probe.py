"""Probe: can a Pallas per-row-DMA gather beat XLA's ~43M rows/s?

XLA's row gather moves ~11 GB/s — 1-2% of v5e HBM bandwidth — so IF the
bottleneck is per-row software overhead rather than the DMA-engine issue
rate, a deep-pipelined Pallas kernel wins. This probe measures the issue
floor directly: one kernel instance streaming row copies HBM->HBM with a
rotating semaphore pool.

Run alone on the host (concurrent processes poison timings):
    python scripts/pallas_gather_probe.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=5, warmup=1):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    float(jax.numpy.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - t0) / n * 1000.0


def make_pallas_gather(E, W, N, depth=32, dtype=None, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = dtype or jnp.bfloat16

    def kernel(idx_ref, table_ref, out_ref, sems):
        def get_dma(i):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[i], 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sems.at[jax.lax.rem(i, depth)],
            )

        def body(i, _):
            @pl.when(i >= depth)
            def _():
                get_dma(i - depth).wait()
            get_dma(i).start()
            return 0

        jax.lax.fori_loop(0, N, body, 0)

        def tail(i, _):
            get_dma(i).wait()
            return 0

        jax.lax.fori_loop(max(N - depth, 0), N, tail, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )

    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, W), dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idx, table)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--entries", type=int, default=6328832)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    E, W, N = args.entries, args.width, args.rows
    table = jax.random.uniform(jax.random.PRNGKey(0), (E, W), jnp.float32) \
        .astype(jnp.bfloat16)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, E, N), jnp.int32)

    f_xla = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    ms = timeit(lambda t, i: f_xla(t, i).sum(), table, idx)
    print(f"XLA take     : {ms:8.2f} ms  ({N/ms/1000:.1f} M rows/s)")

    for depth in (8, 16, 32, 64):
        f_pl = make_pallas_gather(E, W, N, depth=depth)
        g = jax.jit(lambda i, t: f_pl(i, t).sum())
        try:
            ms = timeit(g, idx, table)
            # correctness spot check
            out = jax.jit(f_pl)(idx, table)
            ref = jnp.take(table, idx[:1024], axis=0)
            ok = bool(jnp.all(out[:1024] == ref))
            print(f"pallas d={depth:3d}: {ms:8.2f} ms  ({N/ms/1000:.1f} M rows/s)"
                  f"  correct={ok}")
        except Exception as ex:
            print(f"pallas d={depth:3d}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:150]}")


if __name__ == "__main__":
    main()
