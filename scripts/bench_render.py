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
    ap.add_argument("--chunk", type=int, default=2 ** 14)
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
                               data_location=args.data_root)
    checkpoint = trainer.start_step - 1

    poses_cv = circle_around_axis(args.frames, axis=(0, 1, 0), up=(0, 0, 1),
                                  move=(0, -1, 0), distance=0.3)
    scale = config.data.scale_factor
    out = trainer.train_outputs
    intr = trainer.dataparser.data_manager.load_camera_params().intrinsics
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

    render(0)  # warmup/compile
    t0 = time.perf_counter()
    for i in range(args.frames):
        frame = render(i)
    dt = time.perf_counter() - t0
    fps = args.frames / dt
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
            "run": run,
        },
    }))


if __name__ == "__main__":
    main()
