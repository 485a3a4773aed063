"""Tensor-parallel hash-table sharding: TP step == replicated step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nersemble_tpu.model_manager import NeRSembleModelFolder
from tests.synthetic_data import make_synthetic_dataset
from tests.test_trainer import tiny_train_config


def test_feature_sharded_encode_matches_replicated():
    """Blended encode with the table feature axis sharded over the mesh ==
    replicated (GSPMD turns the blend contraction into an all-reduce)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nersemble_tpu.ops.hash_encoding import (
        HashGridLevels,
        build_quad_table,
        hash_encode_blended,
        init_hash_table,
    )
    from nersemble_tpu.parallel.mesh import make_mesh

    levels = HashGridLevels.create(n_levels=4, log2_hashmap_size=9,
                                   base_resolution=4, per_level_scale=1.6)
    table = init_hash_table(jax.random.PRNGKey(0), levels, row_width=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 3))
    code = jax.random.normal(jax.random.PRNGKey(2), (33, 32))
    f = jax.jit(lambda t, x, c: hash_encode_blended(
        build_quad_table(t, levels, dtype=jnp.float32), x, c, levels,
        features_per_logical=2))
    out_rep = f(table, x, code)

    mesh = make_mesh(8)
    table_sharded = jax.device_put(table, NamedSharding(mesh, P(None, "data")))
    out_shard = f(table_sharded, x, code)
    np.testing.assert_allclose(np.asarray(out_shard), np.asarray(out_rep),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_table_sharded_training_matches_replicated(tmp_path_factory):
    """Full train steps with the table sharded over 8 devices == replicated."""
    from nersemble_tpu.engine.trainer import NeRSembleTrainer

    root = tmp_path_factory.mktemp("nsdata")
    models = tmp_path_factory.mktemp("nsmodels")
    meta = make_synthetic_dataset(root, n_timesteps=2)
    folder = NeRSembleModelFolder(models_path=str(models))

    results = {}
    for shard in (False, True):
        manager = folder.new_run(name=f"tp{int(shard)}")
        config = tiny_train_config(manager.get_run_name(), folder.get_location())
        # 32 logical x 2 features -> 8 physical tables: divides over 8 devices
        config.model.hash_ensemble.n_hash_encodings = 32
        config.model.latent_dim_time = 32
        # f32 gather operand: isolates SHARDING equivalence from bf16
        # scatter-accumulation rounding (order differs between layouts and
        # Adam amplifies tiny sign flips into lr-sized param diffs)
        config.model.table_dtype = "float32"
        config.max_num_iterations = 3
        config.steps_per_save = 1000
        config.parallel.data_axis_size = 8
        config.parallel.shard_hash_tables = shard
        # pin a TRUE replicated baseline (ZeRO-3 is the new default layout)
        config.parallel.shard_table_params = False
        trainer = NeRSembleTrainer(config, model_manager=manager,
                                   data_location=str(root),
                                   original_image_size=meta["original_size"])
        if shard:
            assert config.model.shard_hash_tables
            table = trainer.params["field"]["table"]
            assert not table.sharding.is_fully_replicated
        trainer.train()
        trainer.batcher.stop()
        results[shard] = jax.device_get(trainer.params)

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(results[False]),
            jax.tree_util.tree_leaves_with_path(results[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=str(path))


@pytest.mark.slow
def test_zero_sharded_optimizer_matches_replicated(tmp_path_factory):
    """ZeRO-sharded table Adam moments == replicated state (GSPMD collectives
    are math-identical), while the moments actually live sharded."""
    from nersemble_tpu.engine.trainer import NeRSembleTrainer

    root = tmp_path_factory.mktemp("nsdata_zero")
    models = tmp_path_factory.mktemp("nsmodels_zero")
    meta = make_synthetic_dataset(root, n_timesteps=2)
    folder = NeRSembleModelFolder(models_path=str(models))

    results = {}
    for shard_opt in (False, True):
        manager = folder.new_run(name=f"zero{int(shard_opt)}")
        config = tiny_train_config(manager.get_run_name(), folder.get_location())
        config.max_num_iterations = 3
        config.steps_per_save = 1000
        config.parallel.data_axis_size = 8
        config.parallel.shard_table_optimizer = shard_opt
        # this test isolates the moments-only ZeRO layer; the full ZeRO-3
        # param pipeline has its own test below
        config.parallel.shard_table_params = False
        trainer = NeRSembleTrainer(config, model_manager=manager,
                                   data_location=str(root),
                                   original_image_size=meta["original_size"])
        if shard_opt:
            mu_table = trainer.opt_state.mu["field"]["table"]
            assert not mu_table.sharding.is_fully_replicated
        trainer.train()
        trainer.batcher.stop()
        results[shard_opt] = jax.device_get(trainer.params)

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(results[False]),
            jax.tree_util.tree_leaves_with_path(results[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5, err_msg=str(path))


@pytest.mark.slow
def test_zero3_table_pipeline_matches_replicated(tmp_path_factory):
    """The entry-sharded (ZeRO-3) table-gradient pipeline — shard-local bf16
    cast -> all-gather -> quad build, backward reduce-scatter of the folded
    gradient, fold+Adam state on the [E/8, W] shard — trains numerically
    equal to the replicated layout (VERDICT r2 next-round #1 done criterion
    (a)). f32 gather operand isolates layout equivalence from bf16
    reduction-order noise."""
    from nersemble_tpu.engine.trainer import NeRSembleTrainer

    root = tmp_path_factory.mktemp("nsdata_z3")
    models = tmp_path_factory.mktemp("nsmodels_z3")
    meta = make_synthetic_dataset(root, n_timesteps=2)
    folder = NeRSembleModelFolder(models_path=str(models))

    results = {}
    for zero3 in (False, True):
        manager = folder.new_run(name=f"z3{int(zero3)}")
        config = tiny_train_config(manager.get_run_name(), folder.get_location())
        config.model.table_dtype = "float32"
        config.max_num_iterations = 3
        config.steps_per_save = 1000
        config.parallel.data_axis_size = 8
        config.parallel.shard_table_params = zero3
        trainer = NeRSembleTrainer(config, model_manager=manager,
                                   data_location=str(root),
                                   original_image_size=meta["original_size"])
        if zero3:
            assert trainer.model.table_replicate_sharding is not None
            table = trainer.params["field"]["table"]
            assert not table.sharding.is_fully_replicated
            mu = trainer.opt_state.mu["field"]["table"]
            assert not mu.sharding.is_fully_replicated
        trainer.train()
        trainer.batcher.stop()
        results[zero3] = jax.device_get(trainer.params)

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(results[False]),
            jax.tree_util.tree_leaves_with_path(results[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=str(path))
