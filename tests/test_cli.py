"""CLI end-to-end: train -> evaluate -> render -> resume on synthetic data.

Exercises the full user journey at smoke scale (BASELINE.json config 1
spirit: tiny static-ish model, CPU-runnable).
"""

import json
from pathlib import Path

import numpy as np
import pytest

import nersemble_tpu.env as env_module
from tests.synthetic_data import make_synthetic_dataset

SMOKE_ARGS = [
    "30", "SYN-1",
    "--max-num-iterations", "8",
    "--steps-per-save", "6",
    "--steps-per-eval-image", "0",
    "--n-train-rays", "64",
    "--num-levels", "4",
    "--log2-hashmap-size", "9",
    "--max-res", "32",
    "--grid-resolution", "16",
    "--n-hash-encodings", "4",
    "--latent-dim-time", "4",
    "--latent-dim-time-deform", "8",
    "--mlp-num-layers", "2",
    "--mlp-layer-width", "16",
    "--max-samples-per-ray", "24",
    "--max-candidates-per-ray", "64",
    "--window-deform-end", "4",
    "--window-hash-encodings-begin", "4",
    "--window-hash-encodings-end", "8",
]


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory, request):
    root = tmp_path_factory.mktemp("cli_data")
    models = tmp_path_factory.mktemp("cli_models")
    renders = tmp_path_factory.mktemp("cli_renders")
    make_synthetic_dataset(root, n_timesteps=3)
    old = (env_module.NERSEMBLE_DATA_PATH, env_module.NERSEMBLE_MODELS_PATH,
           env_module.NERSEMBLE_RENDERS_PATH)
    env_module.NERSEMBLE_DATA_PATH = str(root)
    env_module.NERSEMBLE_MODELS_PATH = str(models)
    env_module.NERSEMBLE_RENDERS_PATH = str(renders)

    def restore():
        (env_module.NERSEMBLE_DATA_PATH, env_module.NERSEMBLE_MODELS_PATH,
         env_module.NERSEMBLE_RENDERS_PATH) = old

    request.addfinalizer(restore)
    return {"data": str(root), "models": str(models), "renders": str(renders)}


@pytest.mark.slow
def test_cli_journey(cli_env):
    from nersemble_tpu.scripts import (
        evaluate_nersemble,
        render_nersemble,
        train_nersemble,
    )

    # -- train ----------------------------------------------------------
    result = train_nersemble.main(SMOKE_ARGS + ["--name", "smoke"])
    assert np.isfinite(result["loss"])

    run_dir = Path(cli_env["models"]) / "nersemble" / "NERS-001-smoke"
    assert (run_dir / "config.yml").exists()
    ckpts = list((run_dir / "checkpoints").glob("step-*.ckpt"))
    assert len(ckpts) == 1  # save_only_latest

    # -- evaluate (with a fake JOD evaluator injected) --------------------
    from nersemble_tpu.constants import EVALUATION_CAM_IDS, SERIALS
    from nersemble_tpu.utils.jod import set_jod_evaluator_factory

    class FakeJod:
        def predict(self, pred, gt, dim_order, frames_per_second):
            assert dim_order == "FHWC" and pred.dtype == np.uint8
            assert pred.shape == gt.shape and pred.ndim == 4
            assert frames_per_second >= 4.1
            return np.float32(8.5), None

    set_jod_evaluator_factory(FakeJod)
    try:
        eval_result = evaluate_nersemble.main(
            ["NERS-001-smoke", "--max-eval-timesteps", "2",
             "--n-rays-eval", "512"])
    finally:
        set_jod_evaluator_factory(None)
    assert eval_result.mean.regular.psnr is not None
    assert eval_result.mean.regular.jod == pytest.approx(8.5)
    assert eval_result.mean.masked.jod == pytest.approx(8.5)
    result_files = list((run_dir / "evaluation").rglob("evaluation_result.json"))
    assert len(result_files) == 1
    data = json.loads(result_files[0].read_text())
    assert "mean" in data and "per_cam" in data
    # per_cam keyed by camera serial (reference: evaluate_nersemble.py:287-299)
    assert set(data["per_cam"].keys()) == \
        {SERIALS[c] for c in EVALUATION_CAM_IDS}
    pngs = list((run_dir / "evaluation").rglob("cam_*.png"))
    assert len(pngs) == 8  # 4 cams x 2 timesteps
    # artifacts named frame_{original_timestep:05d}/cam_{global_cam_id}.png
    # (reference: evaluate_nersemble.py:140-151)
    names = {p.parent.name + "/" + p.name for p in pngs}
    assert names == {f"frame_{t:05d}/cam_{c}.png"
                     for t in (0, 2) for c in EVALUATION_CAM_IDS}

    # -- render ---------------------------------------------------------
    outputs = render_nersemble.main(
        ["NERS-001-smoke", "--seconds", "1", "--fps", "2",
         "--downscale-factor", "8", "--n-rays", "512", "--render-depth"])
    for channel, path in outputs.items():
        assert Path(path).exists(), channel

    # -- resume ---------------------------------------------------------
    result2 = train_nersemble.main(
        ["30", "SYN-1", "--resume-run", "NERS-001-smoke",
         "--max-num-iterations", "10"])
    assert np.isfinite(result2["loss"])


def test_validate_poses_cli(cli_env, tmp_path):
    from nersemble_tpu.scripts import validate_poses
    out = tmp_path / "poses.png"
    validate_poses.main(["30", "SYN-1", "--output", str(out)])
    assert out.exists()


def test_cli_defaults_match_benched_config():
    """The flagship CLI's default sampling configuration must equal the
    benched/quality-proven one (bench.py, __graft_entry__.py) — round 2
    shipped the measurably quality-breaking S=64 + fraction 0.5 defaults
    (PERF.md round 2b: 68% of valid samples slot-dropped, train PSNR ~13)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _flagship_model_config
    from nersemble_tpu.scripts.train_nersemble import build_config, build_parser

    args = build_parser().parse_args(["30", "SYN-1"])
    config = build_config(args, "run", "/tmp")
    flagship = _flagship_model_config(tiny=False)

    assert config.model.sampling.max_samples_per_ray \
        == flagship.sampling.max_samples_per_ray == 256
    assert config.model.sampling.global_budget_fraction \
        == flagship.sampling.global_budget_fraction == 0.125
    # -1 auto-sizes candidates to span the scene box (model __init__)
    assert config.model.sampling.max_candidates_per_ray == -1
    assert config.model.max_n_samples_per_batch \
        == flagship.max_n_samples_per_batch
    assert config.model.early_stop_eps == 0.0  # train_nersemble.py:192


def test_quality_study_args_build_valid_models():
    """The quality study's generated train-CLI args must construct a model
    without tripping config invariants (the prepared 16-table dynamic study
    once crashed at launch on latent_dim_time != n_hash_encodings)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from quality_benchmark import build_train_args
    from nersemble_tpu.models.nersemble import NeRSembleModel
    from nersemble_tpu.scripts.train_nersemble import build_config, build_parser

    for mode, n_tables, suffix in [("static", 16, ""), ("dynamic", 16, ""),
                                   ("dynamic", 32, ""),
                                   ("static", 16, "-sharp")]:
        argv = build_train_args(mode, 12000, "SYN-Q", 500, n_tables=n_tables,
                                run_suffix=suffix)
        args = build_parser().parse_args(argv)
        config = build_config(args, "run", "/tmp")
        if suffix:
            assert args.name.endswith(suffix)
        if mode == "dynamic":
            assert config.model.latent_dim_time \
                == config.model.hash_ensemble.n_hash_encodings == n_tables
        NeRSembleModel(config.model)  # raises on any config invariant break


def test_eval_skip_timesteps_by_frame_number():
    """--skip-timesteps keeps frames by ON-DISK frame number
    (reference: evaluate_nersemble.py:139-141), not by evaluated index."""
    from dataclasses import dataclass

    from nersemble_tpu.scripts.evaluate_nersemble import select_eval_indices

    @dataclass
    class E:
        original_timestep: int

    # start_timestep=1, dataparser skip=2 => on-disk frames 1,3,5,7,9
    entries = [E(t) for t in (1, 3, 5, 7, 9)]
    assert select_eval_indices(entries, 3) == [1, 4]  # frames 3 and 9
    assert select_eval_indices(entries, None) == [0, 1, 2, 3, 4]
    assert select_eval_indices(entries, 1) == [0, 1, 2, 3, 4]
    # frames 0,2,4,... with skip 2 keeps every one (all even)
    entries = [E(t) for t in (0, 2, 4, 6)]
    assert select_eval_indices(entries, 2) == [0, 1, 2, 3]
