"""Trainer schedule values match the reference's scheduler semantics."""

import jax.numpy as jnp
import numpy as np

from nersemble_tpu.config import (
    HashEncodingConfig,
    HashEnsembleConfig,
    ModelConfig,
    OptimizerConfig,
    SE3DeformationFieldConfig,
    TrainConfig,
)


class _FakeTrainer:
    """Borrow the schedule methods without building data/model."""

    from nersemble_tpu.engine.trainer import NeRSembleTrainer
    sched_values = NeRSembleTrainer.sched_values
    lr_values = NeRSembleTrainer.lr_values

    def __init__(self, config):
        self.config = config


def test_schedule_values_follow_reference_semantics():
    config = TrainConfig(
        model=ModelConfig(
            use_hash_ensemble=True,
            hash_ensemble=HashEnsembleConfig(
                n_hash_encodings=32, hash_encoding=HashEncodingConfig()),
            latent_dim_time=32,
            use_deformation_field=True,
            deformation_field=SE3DeformationFieldConfig(n_freq_pos=7),
            window_deform_begin=0, window_deform_end=20000,
            window_hash_encodings_begin=40000, window_hash_encodings_end=80000,
            lambda_empty_loss=1e-2, lambda_near_loss=1e-4,
        ),
        optimizers={
            "fields": OptimizerConfig(lr=5e-3, scheduler_step_size=20000,
                                      scheduler_gamma=0.8),
            "deformation_field": OptimizerConfig(lr=1e-3, scheduler_step_size=20000,
                                                 scheduler_gamma=0.5),
        })
    trainer = _FakeTrainer(config)

    import pytest

    s0 = {k: float(v) for k, v in trainer.sched_values(0).items()}
    assert s0["window_deform"] == pytest.approx(0.0)
    assert s0["window_hash"] == pytest.approx(1.0)
    assert s0["eps_depth"] == pytest.approx(0.9, rel=1e-6)
    s10k = {k: float(v) for k, v in trainer.sched_values(10000).items()}
    assert s10k["window_deform"] == pytest.approx(3.5)  # halfway 0 -> 7
    assert s10k["window_hash"] == pytest.approx(1.0)  # hash hasn't started
    assert s10k["eps_depth"] == pytest.approx(0.01, rel=1e-5)  # annealed
    s60k = {k: float(v) for k, v in trainer.sched_values(60000).items()}
    assert s60k["window_deform"] == pytest.approx(7.0)
    assert s60k["window_hash"] == pytest.approx(16.5)  # halfway 1 -> 32

    lrs = {k: float(v) for k, v in trainer.lr_values(40000).items()}
    assert lrs["fields"] == pytest.approx(5e-3 * 0.8 ** 2, rel=1e-6)
    assert lrs["deformation_field"] == pytest.approx(1e-3 * 0.25, rel=1e-6)


def test_eval_cli_skip_timesteps_selection():
    """--skip-timesteps keeps every k-th eval timestep (all 4 cams)."""
    n_cams, n_timesteps, skip = 4, 9, 3
    indices = range(n_cams * n_timesteps)
    keep_t = set(range(0, n_timesteps, skip))
    kept = [i for i in indices if i // n_cams in keep_t]
    assert len(kept) == 4 * 3
    assert kept[:4] == [0, 1, 2, 3]
    assert kept[4:8] == [12, 13, 14, 15]
