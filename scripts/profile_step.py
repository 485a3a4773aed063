"""Component-level timing of the flagship train step on the real device.

Times each hot component in isolation (fwd and fwd+bwd where meaningful) so
perf work targets the true bottleneck. Not part of the test suite; run
manually: ``python scripts/profile_step.py [--rays 4096]``.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # axon tunnel: force a scalar fetch to really synchronize
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_rays, _flagship_model_config
    from nersemble_tpu.models.nersemble import NeRSembleModel
    from nersemble_tpu.models.field import field_density
    from nersemble_tpu.models.deformation import deformation_offsets
    from nersemble_tpu.ops.sampling import march_rays
    from nersemble_tpu.ops.hash_encoding import (build_quad_table,
                                                 hash_grid_indices,
                                                 hash_encode_blended)

    config = _flagship_model_config(tiny=False)  # S=256, candidates 1024
    n_rays = args.rays
    model = NeRSembleModel(config)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    g = config.grid_resolution
    occ = rng.uniform(size=(g, g, g)) < 0.05
    c = slice(g // 2 - g // 8, g // 2 + g // 8)
    occ[c, c, c] = True
    binaries = jnp.asarray(occ)

    batch = _example_rays(n_rays, config.n_timesteps, seed=1)
    batch["rgb"] = jnp.asarray(rng.uniform(size=(n_rays, 3)).astype(np.float32))
    batch["alpha"] = jnp.asarray(rng.uniform(size=n_rays).astype(np.float32))
    batch["depth"] = jnp.asarray(rng.uniform(7.5, 9.5, n_rays).astype(np.float32))
    sched = {"window_deform": jnp.float32(7.0), "window_hash": jnp.float32(32.0),
             "eps_depth": jnp.float32(0.01)}

    S = config.sampling.max_samples_per_ray
    N = n_rays * S
    # standalone per-sample ops at the model's chunk size to avoid OOM
    Nc = min(N, config.max_n_samples_per_batch
             if config.max_n_samples_per_batch > 0 else N, 131072)
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (Nc, 3)).astype(np.float32))
    ts = jnp.asarray(rng.integers(0, config.n_timesteps, Nc), jnp.int32)
    code = jnp.asarray(rng.normal(size=(Nc, 32)).astype(np.float32))
    tc_def = jnp.asarray(rng.normal(size=(Nc, 128)).astype(np.float32))

    levels = model.levels
    table = params["field"]["table"]
    print(f"table: {table.shape} {table.dtype} "
          f"({table.size * table.dtype.itemsize / 2**30:.2f} GiB)")
    print(f"samples N = {N} ({n_rays} rays x {S} slots); "
          f"standalone ops at Nc = {Nc}")

    results = {}

    def run(name, fn, *a):
        try:
            results[name] = timeit(fn, *a, n=args.iters)
        except Exception as ex:
            results[name] = float("nan")
            print(f"{name} FAILED: {type(ex).__name__}: {str(ex)[:200]}")

    n_cand = config.sampling.max_candidates_per_ray  # auto-resolved at init
    run("march_rays fwd", jax.jit(
        lambda: march_rays(batch["origins"], batch["directions"],
                           model.aabb_min, model.aabb_max,
                           config.render_step_size, n_cand, S,
                           binaries=binaries, near_plane=config.near_plane,
                           far_plane=config.far_plane)[0].t_starts))

    run("hash_grid_indices fwd", jax.jit(
        lambda p: hash_grid_indices(p, levels)[0]), pos)

    run("build_quad_table fwd", jax.jit(
        lambda t: build_quad_table(t, levels, jnp.bfloat16)), table)

    run("hash_encode_blended (+build) fwd", jax.jit(
        lambda t, p, c_: hash_encode_blended(
            build_quad_table(t, levels, jnp.bfloat16), p, c_, levels, 2)),
        table, pos, code)

    def enc_loss(t, p, c_):
        q = build_quad_table(t, levels, jnp.bfloat16)
        return jnp.sum(hash_encode_blended(q, p, c_, levels, 2) ** 2)
    run("hash_encode_blended (+build) fwd+bwd",
        jax.jit(jax.grad(enc_loss, argnums=(0, 1, 2))), table, pos, code)

    dp = params.get("deformation")
    if dp is not None:
        run("deformation fwd", jax.jit(
            lambda d, p, t: deformation_offsets(
                d, p, t, config.deformation_field,
                window_param=sched["window_deform"],
                use_fused_mlp=config.use_fused_mlp)), dp, pos, tc_def)

        def def_loss(d, p, t):
            return jnp.sum(deformation_offsets(
                d, p, t, config.deformation_field,
                window_param=sched["window_deform"],
                use_fused_mlp=config.use_fused_mlp) ** 2)
        run("deformation fwd+bwd",
            jax.jit(jax.grad(def_loss, argnums=(0, 1))), dp, pos, tc_def)

    from nersemble_tpu.models.field import prepare_field

    def dens(p, x, t):
        tc = p["time_embedding"][t]
        fp = prepare_field(p["field"], config, levels)
        return field_density(fp, x, tc, config, levels,
                             model.aabb_min, model.aabb_max,
                             window_hash=sched["window_hash"])[0]
    run("field_density fwd", jax.jit(dens), params, pos, ts)
    run("field_density fwd+bwd",
        jax.jit(jax.grad(lambda p, x, t: jnp.sum(dens(p, x, t) ** 2),
                         argnums=(0, 1))), params, pos, ts)

    run("render_rays fwd", jax.jit(
        lambda p: model.render_rays(p, batch, binaries, sched,
                                    rng=None, train=False)["rgb"]), params)

    def loss_fn(p):
        out = model.render_rays(p, batch, binaries, sched,
                                rng=jax.random.PRNGKey(0), train=True)
        return sum(model.compute_losses(out, batch, sched).values())
    run("full loss fwd+bwd", jax.jit(jax.grad(loss_fn)), params)

    from nersemble_tpu.engine.optimizers import make_optimizer
    opt = make_optimizer()
    opt_state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    run("adam update", jax.jit(lambda g_, s: opt.update(g_, s)[0]),
        grads, opt_state)

    print()
    scale = N / Nc
    for k, v in results.items():
        note = f"  (x{scale:.0f} => {v * scale:7.1f} ms at N={N})" \
            if "fwd" in k and "render" not in k and "loss" not in k \
            and "march" not in k and not np.isnan(v) else ""
        print(f"{k:34s} {v:9.2f} ms{note}")


if __name__ == "__main__":
    main()
