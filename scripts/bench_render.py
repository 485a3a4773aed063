"""Render-throughput benchmark: novel-view fps of the flagship model.

BASELINE.md target: render novel-view video at > 5 fps. The render CLI uses a
4x downscale of the 2200x3208 capture (reference: render_nersemble.py:80) =
550x802 = 441,100 rays/frame; fps = eval-ray throughput / rays-per-frame.

Prints ONE JSON line like bench.py. Run alone on the TPU host.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAYS_PER_FRAME = (2200 // 4) * (3208 // 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8192, help="rays per call")
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_rays, _flagship_model_config
    from nersemble_tpu.models.nersemble import NeRSembleModel

    config = _flagship_model_config(tiny=False)
    config.sampling.max_candidates_per_ray = 1024
    model = NeRSembleModel(config)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    g = config.grid_resolution
    # converged-looking occupancy: a dense head-sized blob (~3% of cells)
    occ = np.zeros((g, g, g), bool)
    c = slice(g // 2 - g // 8, g // 2 + g // 8)
    occ[c, c, c] = True
    binaries = jnp.asarray(occ)
    sched = {"window_deform": jnp.float32(7.0), "window_hash": jnp.float32(32.0),
             "eps_depth": jnp.float32(0.01)}

    batch = _example_rays(args.chunk, config.n_timesteps, seed=1)

    def render(params, batch):
        out = model.render_rays(params, batch, binaries, sched, rng=None,
                                train=False)
        return out["rgb"], out["depth"], out["accumulation"]

    f = jax.jit(render)
    out = f(params, batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = f(params, batch)
    jax.block_until_ready(out)
    float(out[0][0, 0])  # axon tunnel: force a scalar fetch
    dt = time.perf_counter() - t0

    rays_per_sec = args.chunk * args.iters / dt
    fps = rays_per_sec / RAYS_PER_FRAME
    print(json.dumps({
        "metric": "render_fps_550x802",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 5.0, 3),  # >5 fps target
        "extra": {
            "eval_rays_per_sec": round(rays_per_sec, 1),
            "chunk_ms": round(dt / args.iters * 1000, 2),
            "chunk_rays": args.chunk,
            "device": str(jax.devices()[0]).replace(" ", "_"),
        },
    }))


if __name__ == "__main__":
    main()
