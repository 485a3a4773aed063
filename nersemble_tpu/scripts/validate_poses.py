"""Pose validation CLI: visualize the camera rig against the scene box.

Reference: scripts/validate_poses.py:9-23 (pyvista there; matplotlib here —
pyvista is not in this image). Renders the viewer-frame camera positions,
their look directions, the per-participant scene box, and (optionally) saves
to PNG for headless use.
"""

import argparse


def main(argv=None, data_location=None, output: str = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("participant_id", type=int)
    p.add_argument("sequence_name", type=str)
    p.add_argument("--scale-factor", type=float, default=9.0)
    p.add_argument("--output", type=str, default=None,
                   help="save figure instead of showing it")
    args = p.parse_args(argv)

    import matplotlib
    if args.output or output:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from nersemble_tpu.config import DataConfig
    from nersemble_tpu.data.dataparser import NeRSembleDataParser
    from nersemble_tpu.data.multi_view_data import NeRSembleDataManager

    config = DataConfig(participant_id=args.participant_id,
                        sequence_name=args.sequence_name,
                        n_timesteps=1, scale_factor=args.scale_factor)
    dm = NeRSembleDataManager(args.participant_id, args.sequence_name,
                              location=data_location)
    parser = NeRSembleDataParser(config, data_manager=dm)
    outputs = parser.generate_outputs("train")

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    centers = outputs.c2w[:, :3, 3]
    look = -outputs.c2w[:, :3, 2]  # OpenGL: camera looks along -z
    ax.scatter(*centers.T, c="tab:blue", label="train cams")
    ax.quiver(*centers.T, *look.T, length=np.linalg.norm(centers, axis=1).mean() * 0.3,
              color="tab:blue", alpha=0.5)
    box = outputs.scene_box
    for s in range(8):
        corner = [box[(s >> d) & 1][d] for d in range(3)]
        ax.scatter(*corner, c="tab:red", marker="s")
    ax.set_title(f"{args.participant_id:03d} / {args.sequence_name} "
                 f"({len(centers)} train cameras)")
    ax.legend()
    target = args.output or output
    if target:
        fig.savefig(target, dpi=120)
        print(f"[validate-poses] wrote {target}")
    else:
        plt.show()


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
