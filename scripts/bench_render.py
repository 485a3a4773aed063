"""Render-throughput benchmark: novel-view fps on a trained checkpoint.

BASELINE.md north star: render novel views at > 5 fps. Loads a trained run
(default: the quality-benchmark static run under /tmp/ns_quality_models),
renders full frames along the reference's circular trajectory through the
real ``NeRSembleTrainer.render_image`` path, and reports frames/s at the
given resolution.

Usage (on the TPU host, nothing else running):
    python scripts/bench_render.py [--run NERS-004-quality-static]
        [--frames 8] [--downscale 2] [--chunk 16384]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models-root", default="/tmp/ns_quality_models")
    ap.add_argument("--data-root", default="/tmp/ns_quality_data")
    ap.add_argument("--run", default=None,
                    help="run name; default = latest quality-static run")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--downscale", type=int, default=1,
                    help="extra downscale on top of the dataset's")
    ap.add_argument("--resolution", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="render at an explicit resolution instead of the "
                         "dataset's (e.g. 802 550 = the reference render "
                         "CLI's 3208x2200 at downscale 4, ~441k rays/frame "
                         "— render_nersemble.py:20-99); intrinsics are "
                         "rescaled from the original image size")
    ap.add_argument("--chunk", type=int, default=2 ** 14)
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler trace of 2 frames to this dir")
    ap.add_argument("--orbit-distance", type=float, default=1.0,
                    help="orbit radius in calibration units (synthetic rig "
                         "cameras sit at 1.0)")
    ap.add_argument("--orbit-center", type=float, nargs=3, default=(0, 0, 0),
                    help="orbit/look-at center in calibration units (the "
                         "synthetic object is at the origin)")
    ap.add_argument("--no-cc-filter", action="store_true",
                    help="skip the occupancy CC postfilter (the render/eval "
                         "CLIs apply it by default — reference protocol, "
                         "evaluate_nersemble.py:68-73)")
    ap.add_argument("--cc-threshold", type=float, default=0.05)
    args = ap.parse_args()

    import glob
    import os

    import numpy as np

    import nersemble_tpu.env as env_module
    env_module.NERSEMBLE_DATA_PATH = args.data_root
    env_module.NERSEMBLE_MODELS_PATH = args.models_root

    run = args.run
    if run is None:
        runs = sorted(glob.glob(os.path.join(args.models_root, "nersemble",
                                             "*quality-static*")))
        if not runs:
            raise SystemExit("no quality-static run found; run "
                             "scripts/quality_benchmark.py first")
        run = os.path.basename(runs[-1])

    from nersemble_tpu.model_manager import NeRSembleModelFolder
    from nersemble_tpu.data.cameras import circle_around_axis, generate_image_rays
    from nersemble_tpu.engine.trainer import NeRSembleTrainer

    manager = NeRSembleModelFolder().open_run(run)
    config = manager.load_config()
    config.load_dir = manager.get_checkpoint_folder()
    config.vis = "none"
    trainer = NeRSembleTrainer(config, model_manager=manager,
                               data_location=args.data_root,
                               eval_only=True)
    checkpoint = trainer.start_step - 1

    if not args.no_cc_filter and not config.model.disable_occupancy_grid:
        # the reference's render/eval protocol carves the grid to its largest
        # connected component before rendering (evaluate_nersemble.py:68-73);
        # benching without it overstates marched-sample fill
        from nersemble_tpu.utils.connected_components import (
            filter_occupancy_grid_mask,
        )
        mask = filter_occupancy_grid_mask(
            np.asarray(trainer.grid_occs), config.model.grid_resolution,
            threshold=args.cc_threshold)
        trainer.apply_grid_mask(mask)

    # orbit the synthetic object (at the calibration-space origin; rig
    # cameras sit at distance 1.0 with y DOWN) — the reference CLI's
    # move=(0,-1,0)/distance=0.3 is tuned for the real capture's head
    # position and renders pure background on the synthetic scene
    poses_cv = circle_around_axis(args.frames, axis=(0, 1, 0), up=(0, -1, 0),
                                  move=tuple(args.orbit_center),
                                  distance=args.orbit_distance)
    scale = config.data.scale_factor
    out = trainer.train_outputs
    intr = trainer.dataparser.data_manager.load_camera_params().intrinsics
    if args.resolution is not None:
        # explicit target resolution: scale intrinsics by the HEIGHT ratio
        # and recenter the principal point, so the object fills the target
        # frame the way it fills the capture's. Scaling by the width ratio
        # instead (a 352-wide landscape source vs the 550x802 portrait
        # reference frame) would widen the FOV and pad the frame with cheap
        # empty-background rays — a flattering, dishonest fps.
        from nersemble_tpu.data.cameras import CameraIntrinsics
        height, width = args.resolution
        original_w = out.image_width * config.data.downscale_factor
        original_h = out.image_height * config.data.downscale_factor
        s = height / original_h
        r = intr.rescale(s)
        intr = CameraIntrinsics(r.fx, r.fy,
                                r.cx + (width - original_w * s) / 2.0,
                                r.cy + (height - original_h * s) / 2.0)
    else:
        ds = args.downscale
        intr = intr.rescale(1.0 / (config.data.downscale_factor * ds))
        width = out.image_width // ds
        height = out.image_height // ds

    def render(i):
        p = poses_cv[i % args.frames].copy() @ np.diag([1.0, -1.0, -1.0, 1.0])
        p[:3, 3] *= scale
        origins, dirs = generate_image_rays(p, intr, height, width)
        image_rays = {
            "origins": origins, "directions": dirs,
            "timesteps": np.zeros(origins.shape[0], np.int32),
            "camera_indices": np.zeros(origins.shape[0], np.int32),
            "height": height, "width": width,
        }
        return trainer.render_image(image_rays, step=checkpoint,
                                    chunk=args.chunk, budget="auto")

    # packing stats for the record: fraction of frame-0 rays that can hit
    # an occupied cell (the rest are skipped by eval ray packing)
    p0 = poses_cv[0].copy() @ np.diag([1.0, -1.0, -1.0, 1.0])
    p0[:3, 3] *= scale
    o0, d0 = generate_image_rays(p0, intr, height, width)
    hit_fraction = float(trainer._render_hit_mask(
        {"origins": o0, "directions": d0}).mean()) \
        if not config.model.disable_occupancy_grid else 1.0

    render(0)  # warmup/compile
    if args.trace:
        import jax
        with jax.profiler.trace(args.trace):
            render(1)
            render(2)
    t0 = time.perf_counter()
    acc_mean = 0.0
    for i in range(args.frames):
        frame = render(i)
        acc_mean += float(frame["accumulation"].mean()) / args.frames
    dt = time.perf_counter() - t0
    fps = args.frames / dt
    if acc_mean < 0.01:
        print("WARNING: trajectory renders (almost) nothing — acc_mean "
              f"{acc_mean:.4f}; fps below measures the empty-frame case",
              file=sys.stderr)
    print(json.dumps({
        "metric": "render_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 5.0, 3),  # README/BASELINE: >5 fps target
        "extra": {
            "resolution": [height, width],
            "rays_per_frame": height * width,
            "ms_per_frame": round(dt / args.frames * 1000, 1),
            "chunk": args.chunk,
            "auto_budget": getattr(trainer, "_auto_render_budget", None),
            "mean_accumulation": round(acc_mean, 4),
            "hit_ray_fraction": round(hit_fraction, 4),
            "cc_filter": not args.no_cc_filter,
            "run": run,
        },
    }))


if __name__ == "__main__":
    main()
