"""Benchmark: train-step throughput (rays/s/chip) of the flagship model.

Runs the REAL training configuration (32-table 2^19 hash ensemble, 6x128 SE(3)
deformation field, occupancy-aware sampling, all losses) on synthetic rays on
whatever accelerator JAX finds, and prints ONE JSON line.

Baseline derivation (BASELINE.md): the reference trains 300,001 steps x 4096
rays in ~24 h on an RTX A6000 => ~14,200 rays/s. vs_baseline = ours / 14200.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # A/B knobs; defaults == the official benched configuration
    ap.add_argument("--fraction", type=float, default=None,
                    help="override sampling.global_budget_fraction")
    ap.add_argument("--chunk", type=int, default=None,
                    help="override max_n_samples_per_batch")
    ap.add_argument("--budget", type=int, default=None,
                    help="explicit compaction budget (overrides fraction); "
                         "use the quality run's measured steady-state value")
    ap.add_argument("--fill", type=float, default=None,
                    help="override the synthetic grid's random fill fraction")
    ap.add_argument("--from-run", type=str, default=None,
                    help="path to a trained run dir (e.g. the quality study's "
                         "NERS-001-quality-static): bench against its CONVERGED "
                         "occupancy grid + adapted budget instead of the "
                         "synthetic 5%%-fill grid (VERDICT r2 weak #7)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler trace of 3 steps to this dir "
                         "(analyze with scripts/analyze_trace.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_rays, _flagship_model_config
    from nersemble_tpu.engine.optimizers import (
        fused_adam_update,
        group_of_param,
        make_optimizer,
    )
    from nersemble_tpu.models.nersemble import NeRSembleModel

    config = _flagship_model_config(tiny=False)

    # Steady-state valid-sample fill measured on the CONVERGED static quality
    # run (QUALITY_r3.json drop_diagnostics_tail: ~59-63k valid samples/step
    # at R=4096, zero budget drops). The trainer's adaptive budget
    # (ops/sampling.quantized_budget: x1.15 headroom, R*S/128 quantum —
    # round 5) lands on 73,728 for that fill (round 4: 98,304, i.e. 36%
    # padding rows) — the benched default, so the bench measures the
    # steady-state step the trainer actually runs, not the cold-start one.
    STEADY_STATE_FILL = 63188
    # benchmark at the paper's batch size with the steady-state sample budget.
    # S=256 slots matches the reference train default (train_nersemble.py:84);
    # with global compaction the evaluated-sample cost is set by the budget
    # (R*S*fraction = 131,072), not by R*S, so the slot buffer is free to be
    # deep enough that no valid sample is slot-dropped (the S=64 cap measurably
    # starved center rays of surface samples — see PERF.md quality study).
    n_rays = 4096
    assert config.sampling.max_samples_per_ray == 256
    assert config.sampling.max_candidates_per_ray == -1  # auto-span (-> 768)
    if args.fraction is not None:
        config.sampling.global_budget_fraction = args.fraction
    if args.chunk is not None:
        config.max_n_samples_per_batch = args.chunk

    model = NeRSembleModel(config)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    key_to_group = group_of_param(model.param_groups(params))
    g = config.grid_resolution

    rng = np.random.default_rng(0)
    if args.from_run:
        # bench against a CONVERGED run's carved occupancy grid + its adapted
        # steady-state budget so the measured fill/compaction behavior is the
        # production one, not the synthetic grid's (VERDICT r2 weak #7)
        from pathlib import Path
        ckpts = sorted(Path(args.from_run, "checkpoints").glob("step-*.ckpt"))
        assert ckpts, f"no checkpoints under {args.from_run}"
        with np.load(ckpts[-1], allow_pickle=False) as data:
            grid_occs = np.asarray(data["grid_occs"])
            ckpt_budget = int(data["extra/sample_budget"]) \
                if "extra/sample_budget" in data.files else None
        from nersemble_tpu.ops.occupancy import occupancy_binaries
        binaries_grid = occupancy_binaries(
            jnp.asarray(grid_occs), config.occ_thre, None).reshape((g, g, g))
        print(f"# from-run grid: fill="
              f"{float(jnp.mean(binaries_grid.astype(jnp.float32))):.4f} "
              f"adapted_budget={ckpt_budget}", flush=True)
        if args.budget is None:
            args.budget = ckpt_budget
    else:
        # representative occupancy: ~5% of cells occupied around the head
        fill = args.fill if args.fill is not None else 0.05
        occ = rng.uniform(size=(g, g, g)) < fill
        center = slice(g // 2 - g // 8, g // 2 + g // 8)
        occ[center, center, center] = True
        binaries_grid = jnp.asarray(occ)

    if args.budget is None and args.fraction is None:
        from nersemble_tpu.ops.sampling import quantized_budget
        args.budget = quantized_budget(
            STEADY_STATE_FILL, n_rays, config.sampling.max_samples_per_ray)

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
                                    train=True, budget=args.budget)
            losses = model.compute_losses(out, batch, sched, train=True)
            return sum(losses.values()), jnp.sum(out["num_samples_per_ray"])

        (total, n_samples), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = fused_adam_update(params, grads, opt_state,
                                              key_to_group, lrs)
        return params, opt_state, total, n_samples

    step = jax.jit(train_step, donate_argnums=(0, 1))

    # warmup / compile
    params, opt_state, total, n_samples = step(params, opt_state, binaries_grid,
                                               batch, jax.random.PRNGKey(0))
    jax.block_until_ready(total)

    if args.trace:
        ks = [jax.device_put(k) for k in
              np.asarray(jax.random.split(jax.random.PRNGKey(9), 3))]
        jax.block_until_ready(ks)
        with jax.profiler.trace(args.trace):
            for k in ks:
                params, opt_state, total, n_samples = step(
                    params, opt_state, binaries_grid, batch, k)
            jax.block_until_ready(total)

    n_iters = args.iters
    # pre-built keys: an eager PRNGKey per iteration is a device round trip
    # through the axon tunnel that serializes with the step dispatch
    keys = [jax.device_put(k) for k in
            np.asarray(jax.random.split(jax.random.PRNGKey(1), n_iters))]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, opt_state, total, n_samples = step(params, opt_state,
                                                   binaries_grid, batch,
                                                   keys[i])
    jax.block_until_ready(total)
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * n_iters / dt
    samples_per_sec = float(n_samples) * n_iters / dt
    baseline_rays_per_sec = 300001 * 4096 / (24 * 3600)  # ~14,222 (A6000, 1 day)
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline_rays_per_sec, 3),
        "extra": {
            "ray_samples_per_sec": round(samples_per_sec, 1),
            "step_ms": round(dt / n_iters * 1000, 2),
            "n_rays": n_rays,
            "budget": args.budget,
            "n_candidates": config.sampling.max_candidates_per_ray,
            "device": str(jax.devices()[0]).replace(" ", "_"),
            "loss": float(total),
        },
    }))


if __name__ == "__main__":
    main()
