"""Micro-benchmarks for the hash-table gather/scatter economics on TPU.

Run: python scripts/bench_gather.py
"""
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.numpy.asarray(leaf).reshape(-1)[0])
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from nersemble_tpu.ops.hash_encoding import HashGridLevels, build_quad_table

    levels = HashGridLevels.create()  # flagship 16 levels, 2^19
    E = levels.total_entries
    rng = np.random.default_rng(0)
    print(f"E = {E}")

    key = jax.random.PRNGKey(0)
    t64_f32 = jax.random.uniform(key, (E, 64), jnp.float32)
    t128_f32 = jax.random.uniform(key, (E, 128), jnp.float32)
    t128_bf16 = t128_f32.astype(jnp.bfloat16)

    for n_rows in (524288,):
        idx = jnp.asarray(rng.integers(0, E, n_rows), jnp.int32)
        for name, tab in (("f32 [E,128]", t128_f32),
                          ("bf16 [E,128]", t128_bf16),
                          ("f32 [E,64]", t64_f32)):
            f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
            ms = timeit(f, tab, idx)
            print(f"gather {name} {n_rows} rows: {ms:8.2f} ms "
                  f"({n_rows/ms/1000:.1f} M rows/s)")
        # scatter-add f32
        for width, tabname in ((128, "f32 [E,128]"),):
            upd = jax.random.uniform(jax.random.PRNGKey(1), (n_rows, width),
                                     jnp.float32)
            f = jax.jit(lambda i, u: jnp.zeros((E, width), jnp.float32)
                        .at[i].add(u).sum())
            ms = timeit(f, idx, upd)
            print(f"scatter {tabname} {n_rows} rows: {ms:8.2f} ms "
                  f"({n_rows/ms/1000:.1f} M rows/s)")
        # scatter-add bf16 updates into bf16
        upd16 = jax.random.uniform(jax.random.PRNGKey(1), (n_rows, 128),
                                   jnp.bfloat16)
        f = jax.jit(lambda i, u: jnp.zeros((E, 128), jnp.bfloat16)
                    .at[i].add(u).sum())
        ms = timeit(f, idx, upd16)
        print(f"scatter bf16 [E,128] {n_rows} rows: {ms:8.2f} ms "
              f"({n_rows/ms/1000:.1f} M rows/s)")

    del t128_f32, t128_bf16, upd, upd16, idx, f
    # quad-table build
    f = jax.jit(lambda t: build_quad_table(t, levels, jnp.bfloat16))
    print(f"build_quad_table [E,64]->bf16 [E,256]: {timeit(f, t64_f32):8.2f} ms")

    # quad build + transpose (fold) cost
    def build_loss(t):
        p = build_quad_table(t, levels, jnp.bfloat16)
        return jnp.sum(p.astype(jnp.float32) * 1e-3)
    f = jax.jit(jax.grad(build_loss))
    print(f"build_quad_table fwd+bwd:               {timeit(f, t64_f32):8.2f} ms")

    # one-chunk blended encode fwd / fwd+bwd (current design)
    from nersemble_tpu.ops.hash_encoding import hash_encode_blended
    N = 8192
    x = jax.random.uniform(jax.random.PRNGKey(2), (N, 3), jnp.float32,
                           0.05, 0.95)
    code = jax.random.normal(jax.random.PRNGKey(3), (N, 32), jnp.float32)
    quad = build_quad_table(t64_f32, levels, jnp.bfloat16)

    f = jax.jit(lambda p, xx, c: hash_encode_blended(p, xx, c, levels, 2).sum())
    print(f"encode chunk (8192) fwd:                {timeit(f, quad, x, code):8.2f} ms")

    def enc_loss(t, xx, c):
        p = build_quad_table(t, levels, jnp.bfloat16)
        return jnp.sum(hash_encode_blended(p, xx, c, levels, 2) ** 2)
    f = jax.jit(jax.grad(enc_loss, argnums=(0, 1, 2)))
    print(f"encode chunk + build fwd+bwd:           {timeit(f, t64_f32, x, code):8.2f} ms")


if __name__ == "__main__":
    main()
