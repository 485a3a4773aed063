"""Measured v5e-8 per-chip projection (VERDICT r2 next-round #1 done-(c)).

The 96 ms/step global target (BASELINE.md: 300k steps < 8 h on a v5e-8)
decomposes under ray-DP + the ZeRO-3 entry-sharded table pipeline into

  per-chip step = ray-proportional work at R = 4096/8 = 512
                + table-size-proportional per-chip constants
                  (quad build + quad-gradient fold run on the FULL entry
                   axis per chip — fold-on-shard was analyzed and rejected,
                   PERF.md round 3a; Adam runs on the E/8 shard)
                + exposed ICI comms (reduce-scatter + all-gather, bf16)

Everything except the comms is measurable on ONE chip. This script measures:

1. the full replicated train step at R=512 with the steady-state per-chip
   budget (quantized_budget of 1/8 of the converged fill) — this INCLUDES
   the full-table build + fold + full-table Adam;
2. micro: fused Adam on the full [E, W] table vs the [E/8, W] shard;
3. micro: quad build forward and the quad-gradient fold (for the record —
   they stay per-chip constants either way).

Projection = (1) - (full-table Adam - shard Adam) + comms estimate.
Comms stay an ESTIMATE (one chip here): ring reduce-scatter + all-gather of
the bf16 [E, W] table move 2 * (n-1)/n * bytes over ICI; at v5e's
~100 GB/s/link both directions overlap the fold per the trajectory plan.

Usage (real TPU, nothing else on the chip):
    python scripts/bench_projection.py [--iters 30]
"""

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=20, **kw):
    """Median wall time of a jitted call; forces a scalar fetch (axon
    tunnel: block_until_ready alone is unreliable, PERF.md)."""
    import jax
    import jax.numpy as jnp

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n-chips", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU smoke test of the script only)")
    ap.add_argument("--from-run", type=str, default=None,
                    help="trained run dir: project from its CONVERGED "
                         "occupancy grid and measured steady-state fill "
                         "(metrics.jsonl samples_per_batch tail) instead of "
                         "the synthetic 5%%-fill grid — the honest dynamic "
                         "operating point (VERDICT r4 weak #8: the round-4 "
                         "projection was static-component-based while live "
                         "dynamic steps ran ~1.5x slower)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _example_rays, _flagship_model_config
    from nersemble_tpu.engine.optimizers import (
        fused_adam_update, group_of_param, make_optimizer)
    from nersemble_tpu.models.nersemble import NeRSembleModel
    from nersemble_tpu.ops.hash_encoding import quad_from_cast
    from nersemble_tpu.ops.sampling import quantized_budget

    n = args.n_chips
    config = _flagship_model_config(tiny=args.tiny)
    model = NeRSembleModel(config)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    key_to_group = group_of_param(model.param_groups(params))

    # ---- 1. replicated train step at the per-chip operating point ----
    n_rays = 4096 // n
    g = config.grid_resolution
    rng = np.random.default_rng(0)
    source = "synthetic_5pct_grid"
    if args.from_run:
        # converged grid + measured steady-state fill of a real trained run
        import json as _json
        run_dir = Path(args.from_run)
        ckpts = sorted((run_dir / "checkpoints").glob("step-*.ckpt"))
        assert ckpts, f"no checkpoints under {run_dir}"
        with np.load(ckpts[-1], allow_pickle=False) as data:
            grid_occs = np.asarray(data["grid_occs"])
        from nersemble_tpu.ops.occupancy import occupancy_binaries
        binaries_grid = occupancy_binaries(
            jnp.asarray(grid_occs), config.occ_thre, None).reshape((g, g, g))
        tail = []
        for line in (run_dir / "metrics.jsonl").read_text().splitlines():
            rec = _json.loads(line)
            if "samples_per_batch" in rec:
                tail.append(float(rec["samples_per_batch"]))
        fill_global = int(np.mean(tail[-8:]))
        fill = fill_global // n
        source = f"{run_dir.name}@{ckpts[-1].stem}:fill={fill_global}"
        print(f"# from-run grid fill="
              f"{float(jnp.mean(binaries_grid.astype(jnp.float32))):.4f} "
              f"steady-state samples/batch={fill_global}", flush=True)
    else:
        fill = 63188 // n  # converged fill (bench.py STEADY_STATE_FILL)/n
        occ = rng.uniform(size=(g, g, g)) < 0.05
        center = slice(g // 2 - g // 8, g // 2 + g // 8)
        occ[center, center, center] = True
        binaries_grid = jnp.asarray(occ)
    budget = quantized_budget(fill, n_rays, config.sampling.max_samples_per_ray)

    batch = _example_rays(n_rays, config.n_timesteps, seed=1)
    batch["rgb"] = jnp.asarray(rng.uniform(size=(n_rays, 3)).astype(np.float32))
    batch["alpha"] = jnp.asarray(rng.uniform(size=n_rays).astype(np.float32))
    batch["depth"] = jnp.asarray(rng.uniform(7.5, 9.5, n_rays).astype(np.float32))
    sched = {"window_deform": jnp.float32(7.0), "window_hash": jnp.float32(32.0),
             "eps_depth": jnp.float32(0.01)}
    lrs = {"fields": jnp.float32(5e-3), "deformation_field": jnp.float32(1e-3),
           "embeddings": jnp.float32(5e-3)}

    def train_step(params, opt_state, binaries_grid, batch, rng_key):
        def loss_fn(p):
            out = model.render_rays(p, batch, binaries_grid, sched, rng=rng_key,
                                    train=True, budget=budget)
            losses = model.compute_losses(out, batch, sched, train=True)
            return sum(losses.values()), jnp.sum(out["num_samples_per_ray"])

        (total, n_samples), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = fused_adam_update(params, grads, opt_state,
                                              key_to_group, lrs)
        return params, opt_state, total, n_samples

    # capture the table BEFORE the donated step invalidates params' buffers
    table = jnp.array(params["field"]["table"])
    levels = model.levels

    step = jax.jit(train_step, donate_argnums=(0, 1))
    keys = [jax.device_put(k) for k in
            np.asarray(jax.random.split(jax.random.PRNGKey(1), args.iters))]
    jax.block_until_ready(keys)
    params2, opt2, total, _ = step(params, opt_state, binaries_grid, batch,
                                   keys[0])
    jax.block_until_ready(total)
    t0 = time.perf_counter()
    for k in keys:
        params2, opt2, total, _ = step(params2, opt2, binaries_grid, batch, k)
    float(total)
    step_ms = (time.perf_counter() - t0) / args.iters * 1000.0
    del params2, opt2

    # ---- 2. Adam micro: full table vs E/n shard ----
    E, W = table.shape

    def adam_micro(rows):
        p = {"fields": {"t": jnp.asarray(table[:rows])}}
        gdev = {"fields": {"t": jnp.asarray(
            (np.random.default_rng(1).standard_normal((rows, W)) * 1e-3
             ).astype(np.float32)).astype(jnp.bfloat16)}}
        st = optax.ScaleByAdamState(
            count=jnp.int32(10),
            mu={"fields": {"t": jnp.zeros((rows, W), jnp.float32)}},
            nu={"fields": {"t": jnp.zeros((rows, W), jnp.float32)}})
        fn = jax.jit(lambda p, g, s: fused_adam_update(
            p, g, s, {"fields": "fields"}, {"fields": jnp.float32(5e-3)}))
        return timed(fn, p, gdev, st) * 1000.0

    adam_full_ms = adam_micro(E)
    adam_shard_ms = adam_micro(E // n)

    # ---- 3. quad build + fold micro (per-chip constants either way) ----
    t_bf16 = table.astype(jnp.bfloat16)
    build = jax.jit(lambda t: quad_from_cast(t, levels))
    build_ms = timed(build, t_bf16) * 1000.0

    gq = jnp.asarray((np.random.default_rng(2).standard_normal(
        (E, 4 * W)) * 1e-3).astype(np.float32)).astype(jnp.bfloat16)

    def fold(t, g):
        _, pullback = jax.vjp(lambda tt: quad_from_cast(tt, levels), t)
        return pullback(g)[0]

    fold_ms = timed(jax.jit(fold), t_bf16, gq) * 1000.0

    # ---- projection ----
    table_bytes_bf16 = E * W * 2
    # ring reduce-scatter + all-gather each move (n-1)/n * bytes per chip
    ici_gbps = 100.0  # v5e per-link, one direction
    comms_ms = 2 * (n - 1) / n * table_bytes_bf16 / (ici_gbps * 1e9) * 1000.0
    projected = step_ms - (adam_full_ms - adam_shard_ms) + comms_ms

    print(json.dumps({
        "metric": "v5e8_per_chip_step_projection",
        "unit": "ms",
        "value": round(projected, 1),
        "extra": {
            "measured_step_ms_R512_full_adam": round(step_ms, 1),
            "measured_adam_full_table_ms": round(adam_full_ms, 1),
            "measured_adam_shard_ms": round(adam_shard_ms, 1),
            "measured_quad_build_ms": round(build_ms, 1),
            "measured_quad_fold_ms": round(fold_ms, 1),
            "estimated_comms_ms": round(comms_ms, 1),
            "n_rays_per_chip": n_rays,
            "budget_per_chip": budget,
            "operating_point": source,
            "table_shape": [int(E), int(W)],
            "target_ms": 96.0,
            "device": str(jax.devices()[0]).replace(" ", "_"),
        },
    }))


if __name__ == "__main__":
    main()
