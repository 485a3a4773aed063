"""Evaluate CLI: render hold-out views, compute NVS metrics, persist artifacts.

Reference: scripts/evaluate/evaluate_nersemble.py:22-321. Renders the 4
evaluation cameras at ``max_eval_timesteps`` evenly spaced timesteps (or every
``skip_timesteps``-th with -1), computes PSNR/SSIM/MSE (+ LPIPS when VGG
weights are available, + per-camera JOD when pyfvvdp is importable — both
null otherwise) raw and alpha-masked, writes per-frame PNGs named
``frame_{original_timestep:05d}/cam_{global_cam_id}.png`` and
``evaluation_result.json`` (per_cam keyed by camera serial) in the
reference's evaluation folder layout.
"""

import argparse
from collections import defaultdict
from pathlib import Path
from statistics import mean
from typing import Optional

import numpy as np

from nersemble_tpu.model_manager import (
    NeRSembleModelFolder,
    NVSEvaluationMetrics,
    NVSEvaluationMetricsBundle,
    NVSEvaluationResult,
)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_name", type=str)
    p.add_argument("checkpoint", type=int, nargs="?", default=None)
    p.add_argument("--n-rays-eval", type=int, default=2 ** 13)
    p.add_argument("--max-eval-timesteps", type=int, default=15)
    p.add_argument("--skip-timesteps", type=int, default=None)
    p.add_argument("--use-occupancy-grid-filtering",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--occupancy-grid-filtering-threshold", type=float, default=0.05)
    p.add_argument("--occupancy-grid-filtering-sigma-erosion", type=float, default=7)
    return p


def select_eval_indices(entries, skip_timesteps: Optional[int]):
    """Eval-view subset for --skip-timesteps: the reference keeps frames
    whose ON-DISK frame number satisfies ``timestep % skip_timesteps == 0``
    (reference: evaluate_nersemble.py:139-141) — NOT every k-th evaluated
    index (the two diverge whenever start_timestep != 0 or the dataparser
    skip != 1)."""
    if skip_timesteps is None or skip_timesteps <= 1:
        return list(range(len(entries)))
    return [i for i, e in enumerate(entries)
            if e.original_timestep % skip_timesteps == 0]


def _image_metrics(pred: np.ndarray, gt: np.ndarray, alpha: Optional[np.ndarray]):
    from nersemble_tpu.utils import metrics as M

    out, masked = M.image_metrics(pred, gt, alpha)
    # video-level metric: filled per camera after the loop
    out["jod"] = None
    masked["jod"] = None
    return out, masked


def main(argv=None, data_location=None, original_image_size=None):
    args = build_parser().parse_args(argv)
    manager = NeRSembleModelFolder().open_run(args.run_name)
    config = manager.load_config()

    # eval view set (reference: evaluate_nersemble.py:62-66)
    config.data.max_eval_timesteps = args.max_eval_timesteps
    config.data.eval_num_rays_per_batch = args.n_rays_eval
    config.load_dir = manager.get_checkpoint_folder()
    config.load_step = args.checkpoint
    config.vis = "none"

    from nersemble_tpu.engine.trainer import NeRSembleTrainer
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

    artifact_kwargs = dict(max_eval_timesteps=args.max_eval_timesteps,
                           skip_timesteps=args.skip_timesteps,
                           use_occupancy_grid_filtering=args.use_occupancy_grid_filtering)

    loader = trainer.eval_loader
    indices = select_eval_indices(trainer.eval_outputs.entries,
                                  args.skip_timesteps)

    per_cam = defaultdict(lambda: {"regular": defaultdict(list),
                                   "masked": defaultdict(list)})
    frames_pred = defaultdict(list)
    frames_gt = defaultdict(list)
    frames_pred_masked = defaultdict(list)
    frames_gt_masked = defaultdict(list)
    for image_idx in indices:
        rays = loader.image_rays(image_idx)
        rendered = trainer.render_image(rays, step=checkpoint,
                                        chunk=args.n_rays_eval)
        pred = rendered["rgb"]
        gt = rays["gt_rgb"]
        alpha = rays.get("gt_alpha")
        regular, masked = _image_metrics(pred, gt, alpha)

        entry = rays["entry"]
        cam_pos = entry.cam_pos  # 0..3 within EVALUATION_CAM_IDS
        # artifacts are named by the GLOBAL cam id and the ON-DISK frame
        # number (reference: evaluate_nersemble.py:140-151)
        manager.save_evaluation_img(
            entry.cam_id, (np.clip(pred, 0, 1) * 255).round().astype(np.uint8),
            checkpoint=checkpoint, timestep=entry.original_timestep,
            **artifact_kwargs)

        # JOD frame stacks in uint8 (reference: :156-167)
        pred_u8 = (np.clip(pred, 0, 1) * 255).astype(np.uint8)
        gt_u8 = (np.clip(gt, 0, 1) * 255).astype(np.uint8)
        frames_pred[cam_pos].append(pred_u8)
        frames_gt[cam_pos].append(gt_u8)
        if alpha is not None:
            from nersemble_tpu.utils.metrics import perform_alpha_blending
            a_u8 = (np.clip(alpha, 0, 1) * 255).astype(np.uint8)
            frames_pred_masked[cam_pos].append(
                perform_alpha_blending(pred_u8, a_u8))
            frames_gt_masked[cam_pos].append(
                perform_alpha_blending(gt_u8, a_u8))

        for key, value in regular.items():
            if value is not None:
                per_cam[cam_pos]["regular"][key].append(value)
        for key, value in masked.items():
            if value is not None:
                per_cam[cam_pos]["masked"][key].append(value)
        print(f"[eval] cam {entry.cam_id} frame {entry.original_timestep}: "
              f"psnr={regular['psnr']:.2f} ssim={regular['ssim']:.3f}")

    # JOD video metric per camera (reference: evaluate_nersemble.py:206-240).
    # Evaluator resolution (utils/jod.py): real pyfvvdp if importable, else
    # the vendored FovVideoVDP-class pipeline (utils/fvvdp.py — coarsely
    # calibrated, framework-internally comparable), else null.
    from nersemble_tpu.utils.jod import (evaluation_fps, get_jod_evaluator,
                                         jod_score)
    evaluator = get_jod_evaluator()
    if evaluator is not None:
        fps = evaluation_fps(config.data.skip_timesteps,
                             config.data.n_timesteps,
                             args.max_eval_timesteps, args.skip_timesteps)
        for cam_pos in frames_pred:
            jod = jod_score(evaluator, np.stack(frames_pred[cam_pos]),
                            np.stack(frames_gt[cam_pos]), fps)
            per_cam[cam_pos]["regular"]["jod"].append(jod)
            if cam_pos in frames_pred_masked:
                jod_m = jod_score(evaluator,
                                  np.stack(frames_pred_masked[cam_pos]),
                                  np.stack(frames_gt_masked[cam_pos]), fps)
                per_cam[cam_pos]["masked"]["jod"].append(jod_m)

    def bundle(reg: dict, msk: dict) -> NVSEvaluationMetricsBundle:
        def metrics_of(d):
            return NVSEvaluationMetrics(**{k: (mean(v) if v else None)
                                           for k, v in d.items()
                                           if k in ("psnr", "ssim", "lpips",
                                                    "mse", "jod")})
        return NVSEvaluationMetricsBundle(regular=metrics_of(reg),
                                          masked=metrics_of(msk))

    from nersemble_tpu.constants import SERIALS

    def cam_key(cam_pos: int) -> str:
        """per_cam JSON keys are camera SERIALS
        (reference: evaluate_nersemble.py:287-299)."""
        cam_ids = trainer.eval_outputs.cam_ids
        return SERIALS[cam_ids[cam_pos]] if cam_pos < len(cam_ids) \
            else str(cam_pos)

    result = NVSEvaluationResult(
        mean=bundle(
            {k: sum((per_cam[c]["regular"][k] for c in per_cam), [])
             for k in ("psnr", "ssim", "lpips", "mse", "jod")},
            {k: sum((per_cam[c]["masked"][k] for c in per_cam), [])
             for k in ("psnr", "ssim", "lpips", "mse", "jod")}),
        per_cam={cam_key(c): bundle(per_cam[c]["regular"], per_cam[c]["masked"])
                 for c in sorted(per_cam)},
    )
    manager.save_evaluation_result(result, checkpoint=checkpoint, **artifact_kwargs)
    print(f"[eval] mean psnr={result.mean.regular.psnr:.2f} "
          f"ssim={result.mean.regular.ssim:.3f} -> "
          f"{manager.get_evaluation_result_path(checkpoint, **artifact_kwargs)}")
    return result


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
