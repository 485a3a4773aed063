"""Tests for env/config/model-manager/quantization/se3/window foundations."""

import numpy as np
import pytest

from nersemble_tpu.config import (
    DataConfig,
    HashEnsembleConfig,
    ModelConfig,
    OptimizerConfig,
    SE3DeformationFieldConfig,
    TrainConfig,
)
from nersemble_tpu.model_manager import NeRSembleModelFolder, NVSEvaluationResult
from nersemble_tpu.model_manager.evaluation import NVSEvaluationMetrics, NVSEvaluationMetricsBundle
from nersemble_tpu.utils.quantization import DepthQuantizer, NormalsQuantizer
from nersemble_tpu.utils.windows import generic_schedule, posenc_window, step_lr


def test_config_yaml_roundtrip(tmp_path):
    config = TrainConfig(
        run_name="NERS-001",
        data=DataConfig(participant_id=30, sequence_name="EXP-2-eyes", n_timesteps=10),
        model=ModelConfig(
            n_timesteps=10,
            use_hash_ensemble=True,
            hash_ensemble=HashEnsembleConfig(n_hash_encodings=8),
            use_deformation_field=True,
            deformation_field=SE3DeformationFieldConfig(warp_code_dim=64),
            lambda_alpha_loss=1e-2,
        ),
        optimizers={"fields": OptimizerConfig(lr=1e-2)},
    )
    path = tmp_path / "config.yml"
    config.save(path)
    loaded = TrainConfig.load(path)
    assert loaded == config
    assert loaded.model.hash_ensemble.n_hash_encodings == 8
    assert isinstance(loaded.model.deformation_field.skip_connections, tuple)


def test_model_folder_run_allocation(tmp_path):
    folder = NeRSembleModelFolder(models_path=str(tmp_path))
    run1 = folder.new_run()
    run2 = folder.new_run(name="test")
    assert run1.get_run_name() == "NERS-001"
    assert run2.get_run_name() == "NERS-002-test"
    assert folder.open_run(2).get_run_name() == "NERS-002-test"
    assert folder.open_run("NERS-001").get_run_name() == "NERS-001"
    assert folder.list_run_ids() == [1, 2]


def test_evaluation_artifact_layout(tmp_path):
    folder = NeRSembleModelFolder(models_path=str(tmp_path))
    run = folder.new_run()
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    run.save_evaluation_img(2, img, checkpoint=300000, timestep=5, max_eval_timesteps=15)
    path = run.get_evaluation_img_path(2, checkpoint=300000, timestep=5, max_eval_timesteps=15)
    assert path.endswith("evaluation/checkpoint_300000_max_eval_timesteps_15/frame_00005/cam_2.png")
    assert (run.load_evaluation_img(2, checkpoint=300000, timestep=5,
                                    max_eval_timesteps=15) == img).all()

    result = NVSEvaluationResult(
        mean=NVSEvaluationMetricsBundle(regular=NVSEvaluationMetrics(psnr=31.5)),
        per_cam={"0": NVSEvaluationMetricsBundle(regular=NVSEvaluationMetrics(psnr=30.0))},
    )
    run.save_evaluation_result(result, checkpoint=300000, max_eval_timesteps=15)
    loaded = run.load_evaluation_result(checkpoint=300000, max_eval_timesteps=15)
    assert loaded.mean.regular.psnr == 31.5
    assert run.list_evaluated_checkpoint_ids() == [300000]

    # eval folder naming variants (reference: model_manager/base.py:245-272)
    assert run.get_evaluation_folder(5, max_eval_timesteps=-1, skip_timesteps=3,
                                     use_occupancy_grid_filtering=False).endswith(
        "checkpoint_5_skip_timesteps_3_no-occupancy-grid-filtering")


def test_checkpoint_paths(tmp_path):
    folder = NeRSembleModelFolder(models_path=str(tmp_path))
    run = folder.new_run()
    assert run.get_checkpoint_path(50000).endswith("checkpoints/step-000050000.ckpt")
    assert run.latest_checkpoint_step() is None


def test_depth_quantizer_roundtrip():
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.1, 1.9, size=(16, 16)).astype(np.float32)
    depth[0, :4] = 0.0  # invalid pixels
    depth[1, 0] = 2.5  # outlier -> masked
    q = DepthQuantizer()
    decoded = q.decode(q.encode(depth))
    valid = (depth > 0) & (depth <= 2.0)
    assert np.abs(decoded[valid] - depth[valid]).max() < 2.0 / (2 ** 16 - 2) + 1e-6
    assert (decoded[~valid] == 0).all()
    assert q.encode(depth).dtype == np.uint16


def test_normals_quantizer_roundtrip():
    rng = np.random.default_rng(1)
    normals = rng.normal(size=(8, 8, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    normals[..., 2] = np.abs(normals[..., 2]) * -1  # reference range: theta in [pi/3, pi]
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    q = NormalsQuantizer()
    decoded = q.decode(q.encode(normals.copy()))
    mask = np.abs(decoded).sum(-1) > 0
    cos = (decoded[mask] * normals[mask]).sum(-1)
    assert cos.min() > 0.98


def test_posenc_window():
    w = np.asarray(posenc_window(0.0, 0, 6, 7))
    assert np.allclose(w, 0.0)
    w = np.asarray(posenc_window(7.0, 0, 6, 7))
    assert np.allclose(w, 1.0)
    w = np.asarray(posenc_window(1.0, 0, 6, 7))
    assert w[0] == pytest.approx(1.0)
    assert w[1] == pytest.approx(0.0, abs=1e-6)
    # half-eased band
    w = np.asarray(posenc_window(1.5, 0, 6, 7))
    assert w[1] == pytest.approx(0.5)


def test_schedules():
    assert generic_schedule(0, 0.9, 0.01, 0, 10000) == pytest.approx(0.9)
    assert generic_schedule(5000, 0.9, 0.01, 0, 10000) == pytest.approx(0.455)
    assert generic_schedule(20000, 0.9, 0.01, 0, 10000) == pytest.approx(0.01)
    assert generic_schedule(0, 1, 32, 40000, 80000) == pytest.approx(1.0)
    assert step_lr(0, 5e-3, 20000, 0.8) == pytest.approx(5e-3)
    assert step_lr(20000, 5e-3, 20000, 0.8) == pytest.approx(4e-3)
    assert step_lr(45000, 5e-3, 20000, 0.8) == pytest.approx(5e-3 * 0.64)


def test_se3_exp_map():
    import jax.numpy as jnp

    from nersemble_tpu.utils.se3 import se3_apply, se3_exp_map, so3_exp_map

    # zero screw -> identity
    T = se3_exp_map(jnp.zeros((2, 6)))
    assert np.allclose(np.asarray(T), np.eye(4)[None].repeat(2, 0), atol=1e-6)

    # pure translation
    screw = jnp.array([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0]])
    T = np.asarray(se3_exp_map(screw))
    assert np.allclose(T[0, :3, 3], [1, 2, 3], atol=1e-6)
    assert np.allclose(T[0, :3, :3], np.eye(3), atol=1e-6)

    # pure rotation: pi/2 about z
    screw = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2]])
    T = np.asarray(se3_exp_map(screw))
    expected_R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    assert np.allclose(T[0, :3, :3], expected_R, atol=1e-6)

    # rotation matrix orthonormality for random screws
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.normal(size=(32, 3)))
    R = np.asarray(so3_exp_map(r))
    assert np.allclose(R @ R.transpose(0, 2, 1), np.eye(3)[None], atol=1e-5)
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)

    # se3_apply == matrix application
    screw = jnp.asarray(rng.normal(size=(16, 6)) * 0.3)
    pts = jnp.asarray(rng.normal(size=(16, 3)))
    T = np.asarray(se3_exp_map(screw))
    direct = np.asarray(se3_apply(screw, pts))
    via_matrix = np.einsum("bij,bj->bi", T[:, :3, :3], np.asarray(pts)) + T[:, :3, 3]
    assert np.allclose(direct, via_matrix, atol=1e-5)

    # gradient through small angles is finite
    import jax

    def f(s):
        return se3_apply(s, jnp.ones((1, 3))).sum()

    g = jax.grad(f)(jnp.zeros((1, 6)))
    assert np.isfinite(np.asarray(g)).all()


def test_tensorboard_writer(tmp_path):
    """vis=tensorboard mirrors scalars/images into TB event files."""
    import numpy as np
    from nersemble_tpu.engine.writer import (MetricsWriter,
                                             param_count_summary)

    w = MetricsWriter(tmp_path, enabled=True, mode="tensorboard")
    w.put_scalars(3, {"train_loss": 0.5})
    w.put_image(3, "probe", np.zeros((4, 4, 3), np.float32))
    w.close()
    events = list((tmp_path / "tensorboard").glob("events.*"))
    assert events and events[0].stat().st_size > 0
    assert (tmp_path / "metrics.jsonl").exists()

    import jax.numpy as jnp
    counts = param_count_summary({"field": {"a": jnp.zeros((2, 3))},
                                  "emb": jnp.zeros((4,))})
    assert counts == {"field": 6, "emb": 4, "total": 10}


def test_ray_batcher_stop_releases_blocked_worker():
    """stop() must terminate a worker blocked in queue.put (full queue)."""
    import time

    import numpy as np
    from nersemble_tpu.config import DataConfig
    from nersemble_tpu.data.ray_batcher import RayBatcher

    class _FakeEntries:
        def __init__(self, n):
            from nersemble_tpu.data.dataparser import ImageEntry
            self.entries = [ImageEntry(image_idx=i, cam_pos=0, cam_id=0,
                                       timestep_index=0, original_timestep=0,
                                       time=0.0)
                            for i in range(n)]

    class _FakeDataset:
        def __init__(self):
            class O:
                image_height, image_width = 8, 8
                intrinsics = type("I", (), {"fx": 8.0, "fy": 8.0,
                                            "cx": 4.0, "cy": 4.0})()
                c2w = np.tile(np.eye(4, dtype=np.float64)[None], (2, 1, 1))
                entries = _FakeEntries(2).entries
            self.outputs = O()

        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"rgb": np.zeros((8, 8, 3), np.float32)}

    b = RayBatcher(_FakeDataset(), DataConfig(), num_rays=4, prefetch=1)
    it = iter(b)
    next(it)  # start the worker; it will fill the queue and block in put
    time.sleep(0.1)
    t0 = time.time()
    b.stop()
    assert time.time() - t0 < 5.0
    assert not b._thread.is_alive()
