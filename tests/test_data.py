"""Data-layer tests on the synthetic reference-layout dataset."""

import numpy as np
import pytest

from nersemble_tpu.config import DataConfig
from nersemble_tpu.data.dataparser import NeRSembleDataParser
from nersemble_tpu.data.dataset import NeRSembleDataset
from nersemble_tpu.data.multi_view_data import NeRSembleDataManager
from nersemble_tpu.data.ray_batcher import EvalImageLoader, RayBatcher
from tests.synthetic_data import SPHERE_RADIUS, make_synthetic_dataset, sphere_center

SCALE = 9.0


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nsdata")
    meta = make_synthetic_dataset(root, n_timesteps=3)
    return root, meta


def data_config(**overrides):
    base = dict(participant_id=30, sequence_name="SYN-1", n_timesteps=-1,
                scale_factor=SCALE, use_alpha_maps=True, use_depth_maps=True,
                use_view_frustum_culling=True, max_eval_timesteps=2,
                train_num_rays_per_batch=64, train_num_images_to_sample_from=6,
                train_num_times_to_repeat_images=4)
    base.update(overrides)
    return DataConfig(**base)


def make_parser(root, meta, **overrides):
    config = data_config(**overrides)
    dm = NeRSembleDataManager(config.participant_id, config.sequence_name,
                              location=str(root))
    return NeRSembleDataParser(config, data_manager=dm,
                               original_image_size=meta["original_size"])


def test_data_manager_layout(dataset_root):
    root, meta = dataset_root
    dm = NeRSembleDataManager(30, "SYN-1", location=str(root))
    assert dm.get_n_timesteps() == 3
    assert dm.get_timesteps() == [0, 1, 2]
    img = dm.load_image(0, 0)
    assert img.shape == (44, 32, 3)
    alpha = dm.load_alpha_map(1, "222200044")
    assert alpha.shape == (44, 32)
    depth = dm.load_depth_map(0, 0)
    valid = depth[depth > 0]
    assert valid.size > 0
    # cameras 1.0m away, sphere radius 0.15 -> depth in [0.8, 1.05]
    assert 0.8 < valid.min() < valid.max() < 1.1
    params = dm.load_camera_params()
    assert len(params.world_2_cam) == 16
    assert params.intrinsics.fx > 0


def test_dataparser_splits_and_index_maps(dataset_root):
    root, meta = dataset_root
    parser = make_parser(root, meta)
    train = parser.generate_outputs("train")
    val = parser.generate_outputs("val")

    assert train.n_images == 12 * 3
    assert len(train.cam_ids) == 12
    assert val.n_images == 4 * 2  # max_eval_timesteps=2
    assert val.cam_ids == [3, 6, 11, 15]

    # timestep-major ordering + index maps
    e = train.entries[13]
    assert e.timestep_index == 1 and e.cam_pos == 1
    # eval timesteps evenly spaced over effective timesteps 0..2 -> [0, 2]
    assert [en.timestep_index for en in val.entries[::4]] == [0, 2]
    assert [en.time for en in val.entries[::4]] == [0.0, 1.0]

    # viewer-frame cameras: centers at SCALE * 1.0m from origin
    centers = train.c2w[:, :3, 3]
    assert np.allclose(np.linalg.norm(centers, axis=-1), SCALE, atol=1e-4)
    # intrinsics rescaled to the on-disk (2x-downscaled) resolution
    assert train.image_width == 32 and train.image_height == 44
    assert train.intrinsics.fx == pytest.approx(meta["intrinsics_full"][0, 0] / 2)
    # frustums built for train split
    assert len(train.frustums) == 12
    inside = train.frustums[0].contains_points(np.zeros((1, 3)))
    assert inside[0]

    # scene box: participant 30 entry scaled by scale/9
    assert np.allclose(train.scene_box, np.array([[-2.5, -1.8, -2.5],
                                                  [2.2, 1.8, 2.0]]))


def test_dataset_items(dataset_root):
    root, meta = dataset_root
    parser = make_parser(root, meta)
    train = parser.generate_outputs("train")
    ds = NeRSembleDataset(train, parser.config)
    item = ds[0]
    assert item["rgb"].shape == (44, 32, 3)
    assert item["alpha"].shape == (44, 32)
    assert item["depth"].shape == (44, 32)
    # background blended to white where alpha == 0
    bg = item["alpha"] < 0.01
    assert np.allclose(item["rgb"][bg], 1.0, atol=1e-3)
    # depth scaled by the world scale factor
    valid = item["depth"][item["depth"] > 0]
    assert 0.8 * SCALE < valid.min() < valid.max() < 1.1 * SCALE
    # cache hit returns same data
    again = ds[0]
    assert np.array_equal(item["rgb"], again["rgb"])


def test_ray_batcher(dataset_root):
    root, meta = dataset_root
    parser = make_parser(root, meta)
    train = parser.generate_outputs("train")
    ds = NeRSembleDataset(train, parser.config)
    batcher = RayBatcher(ds, parser.config, seed=0)
    it = iter(batcher._generator())
    batch = next(it)
    R = parser.config.train_num_rays_per_batch
    assert batch["origins"].shape == (R, 3)
    assert batch["directions"].shape == (R, 3)
    assert np.allclose(np.linalg.norm(batch["directions"], axis=-1), 1.0, atol=1e-5)
    assert batch["rgb"].shape == (R, 3)
    assert batch["alpha"].shape == (R,)
    assert batch["depth"].shape == (R,)
    assert batch["timesteps"].max() <= 2

    # geometric consistency: rays with alpha==1 pass near the (scaled) sphere
    sel = batch["alpha"] > 0.99
    if sel.any():
        o, d = batch["origins"][sel], batch["directions"][sel]
        t = batch["timesteps"][sel].astype(np.float64) / 2.0
        centers = np.stack([sphere_center(tf) for tf in t])
        # viewer swap maps calibration (x,y,z) -> (x, -z, y)
        centers = centers[:, [0, 2, 1]] * np.array([1, -1, 1]) * SCALE
        oc = o - centers
        t_closest = -(oc * d).sum(-1)
        closest = oc + d * t_closest[:, None]
        dist = np.linalg.norm(closest, axis=-1)
        assert (dist <= SPHERE_RADIUS * SCALE * 1.05).all()
        # and the GT depth matches the closest-approach distance scale
        depth = batch["depth"][sel]
        hit_depth = t_closest - np.sqrt(np.maximum(
            (SPHERE_RADIUS * SCALE) ** 2 - dist ** 2, 0.0))
        valid = depth > 0
        assert np.abs(depth[valid] - hit_depth[valid]).max() < 0.2 * SCALE

    # rays with alpha==0 miss the sphere
    sel0 = batch["alpha"] < 0.01
    if sel0.any():
        o, d = batch["origins"][sel0], batch["directions"][sel0]
        t = batch["timesteps"][sel0].astype(np.float64) / 2.0
        centers = np.stack([sphere_center(tf) for tf in t])
        centers = centers[:, [0, 2, 1]] * np.array([1, -1, 1]) * SCALE
        oc = o - centers
        t_closest = -(oc * d).sum(-1)
        closest = oc + d * t_closest[:, None]
        dist = np.linalg.norm(closest, axis=-1)
        assert (dist >= SPHERE_RADIUS * SCALE * 0.9).all()


def test_eval_image_loader(dataset_root):
    root, meta = dataset_root
    parser = make_parser(root, meta)
    val = parser.generate_outputs("val")
    ds = NeRSembleDataset(val, parser.config)
    loader = EvalImageLoader(ds)
    assert len(loader) == 8
    rays = loader.image_rays(0)
    assert rays["origins"].shape == (44 * 32, 3)
    assert rays["gt_rgb"].shape == (44, 32, 3)
    assert rays["entry"].cam_id == 3
