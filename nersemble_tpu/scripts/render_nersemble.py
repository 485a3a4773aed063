"""Render CLI: circular novel-view trajectory video over the full sequence.

Reference: scripts/render/render_nersemble.py:20-99 + util/render.py:13-73.
Orbits the head (circle around axis (0,1,0), offset (0,-1,0), radius 0.3,
scaled by the world scale factor), sweeps time 0 -> 1 over seconds*fps frames,
renders rgb / depth / deformation channels at 1/downscale resolution, writes
mp4 (or PNG frames if no video backend) under NERSEMBLE_RENDERS_PATH.
"""

import argparse
from pathlib import Path

import numpy as np

from nersemble_tpu import env
from nersemble_tpu.model_manager import NeRSembleModelFolder


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_name", type=str)
    p.add_argument("--seconds", type=int, default=4)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--n-rays", type=int, default=2 ** 13)
    p.add_argument("--downscale-factor", type=int, default=4)
    p.add_argument("--render-depth", action="store_true")
    p.add_argument("--render-deformations", action="store_true")
    p.add_argument("--use-occupancy-grid-filtering", action="store_true")
    p.add_argument("--occupancy-grid-filtering-threshold", type=float, default=0.05)
    p.add_argument("--occupancy-grid-filtering-sigma-erosion", type=float, default=7)
    return p


def main(argv=None, data_location=None, original_image_size=None,
         renders_path=None):
    args = build_parser().parse_args(argv)
    manager = NeRSembleModelFolder().open_run(args.run_name)
    config = manager.load_config()
    config.load_dir = manager.get_checkpoint_folder()
    config.vis = "none"

    from nersemble_tpu.data.cameras import circle_around_axis
    from nersemble_tpu.engine.trainer import NeRSembleTrainer
    from nersemble_tpu.utils.colormaps import apply_depth_colormap, apply_scene_flow_colormap
    from nersemble_tpu.utils.videoio import write_video

    trainer = NeRSembleTrainer(config, model_manager=manager,
                               data_location=data_location,
                               original_image_size=original_image_size,
                               eval_only=True)
    checkpoint = trainer.start_step - 1

    if args.use_occupancy_grid_filtering and not config.model.disable_occupancy_grid:
        from nersemble_tpu.utils.connected_components import filter_occupancy_grid_mask
        mask = filter_occupancy_grid_mask(
            np.asarray(trainer.grid_occs), config.model.grid_resolution,
            threshold=args.occupancy_grid_filtering_threshold,
            sigma_erosion=args.occupancy_grid_filtering_sigma_erosion)
        trainer.apply_grid_mask(mask)

    # trajectory (reference: render_nersemble.py:63-77): OpenCV-convention
    # circle poses -> OpenGL/viewer-style pose with scaled translation
    n_frames = args.seconds * args.fps
    poses_cv = circle_around_axis(n_frames, axis=(0, 1, 0), up=(0, 0, 1),
                                  move=(0, -1, 0), distance=0.3)
    scale = config.data.scale_factor
    c2w = []
    for pose in poses_cv:
        p = pose.copy() @ np.diag([1.0, -1.0, -1.0, 1.0])  # OpenCV -> OpenGL axes
        p[:3, 3] *= scale
        c2w.append(p)

    out = trainer.train_outputs
    intr_full = trainer.dataparser.data_manager.load_camera_params().intrinsics
    ds = args.downscale_factor
    intr = intr_full.rescale(1.0 / ds)
    width = out.image_width * config.data.downscale_factor // ds
    height = out.image_height * config.data.downscale_factor // ds

    n_timesteps = config.data.n_timesteps
    times = np.linspace(0.0, 1.0, n_frames)
    timesteps = np.round(times * (n_timesteps - 1)).astype(np.int32)

    frames = {"rgb": []}
    if args.render_depth:
        frames["depth"] = []
    if args.render_deformations and config.model.use_deformation_field:
        frames["deformation"] = []

    from nersemble_tpu.data.cameras import generate_image_rays
    for i in range(n_frames):
        origins, dirs = generate_image_rays(c2w[i], intr, height, width)
        image_rays = {
            "origins": origins, "directions": dirs,
            "timesteps": np.full(origins.shape[0], timesteps[i], np.int32),
            "camera_indices": np.zeros(origins.shape[0], np.int32),
            "height": height, "width": width,
        }
        rendered = trainer.render_image(image_rays, step=checkpoint,
                                        chunk=args.n_rays)
        frames["rgb"].append(rendered["rgb"])
        if "depth" in frames:
            # near/far like the reference video renderer (util/render.py:44-50)
            frames["depth"].append(apply_depth_colormap(
                rendered["depth"], rendered["accumulation"],
                near=0.8 * scale, far=1.2 * scale))
        if "deformation" in frames and "deformation" in rendered:
            frames["deformation"].append(apply_scene_flow_colormap(
                rendered["deformation"]))
        if i % 8 == 0:
            print(f"[render] frame {i + 1}/{n_frames}")

    renders_path = renders_path or env.NERSEMBLE_RENDERS_PATH
    label = "_occ_grid_filtering" if args.use_occupancy_grid_filtering else ""
    label += f"_checkpoint-{checkpoint}"
    outputs = {}
    for channel, imgs in frames.items():
        path = Path(renders_path) / f"{manager.get_run_name()}_{channel}{label}.mp4"
        outputs[channel] = write_video(path, imgs, fps=args.fps)
        print(f"[render] wrote {outputs[channel]}")
    return outputs


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
