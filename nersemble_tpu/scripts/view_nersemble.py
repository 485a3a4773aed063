"""Live viewer CLI: interactively explore a trained checkpoint.

TPU-native replacement for viewing a finished run through nerfstudio's
web viewer (the reference exposes it during training via --vis viewer,
scripts/train/train_nersemble.py:56; post-training viewing goes through
``ns-viewer``). Loads the run like the render CLI (config.yml +
checkpoint), starts the orbit-camera web UI (viewer/server.py), and
services render requests on the main thread until interrupted.

Usage:
    python -m nersemble_tpu.scripts.view_nersemble NERS-XXX-name \
        [--port 7007] [--use-occupancy-grid-filtering]
"""

import argparse

import numpy as np

from nersemble_tpu.model_manager import NeRSembleModelFolder


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_name", type=str)
    p.add_argument("--port", type=int, default=7007)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--use-occupancy-grid-filtering", action="store_true")
    p.add_argument("--occupancy-grid-filtering-threshold", type=float,
                   default=0.05)
    p.add_argument("--occupancy-grid-filtering-sigma-erosion", type=float,
                   default=7)
    return p


def main(argv=None, data_location=None, original_image_size=None,
         max_requests=None):
    args = build_parser().parse_args(argv)
    manager = NeRSembleModelFolder().open_run(args.run_name)
    config = manager.load_config()
    config.load_dir = manager.get_checkpoint_folder()
    config.vis = "none"

    from nersemble_tpu.engine.trainer import NeRSembleTrainer
    from nersemble_tpu.viewer import ViewerServer

    trainer = NeRSembleTrainer(config, model_manager=manager,
                               data_location=data_location,
                               original_image_size=original_image_size,
                               eval_only=True)
    checkpoint = trainer.start_step - 1

    if args.use_occupancy_grid_filtering \
            and not config.model.disable_occupancy_grid:
        from nersemble_tpu.utils.connected_components import \
            filter_occupancy_grid_mask
        mask = filter_occupancy_grid_mask(
            np.asarray(trainer.grid_occs), config.model.grid_resolution,
            threshold=args.occupancy_grid_filtering_threshold,
            sigma_erosion=args.occupancy_grid_filtering_sigma_erosion)
        trainer.apply_grid_mask(mask)

    _, distance = trainer.viewer_defaults()
    server = ViewerServer(state={
        "run_name": manager.get_run_name(),
        "n_timesteps": config.data.n_timesteps,
        "step": checkpoint,
        "distance": distance,
    }, host=args.host, port=args.port)
    print(f"[nersemble-tpu] viewing {manager.get_run_name()} "
          f"@ step {checkpoint}: {server.url}")
    served = 0
    try:
        while max_requests is None or served < max_requests:
            if server.service(
                    lambda p: trainer.viewer_render(p, checkpoint),
                    timeout=1.0):
                served += 1
    except KeyboardInterrupt:
        pass
    finally:
        server.close()
    return served


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
