"""Chunked per-sample evaluation == unchunked (values and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nersemble_tpu.models.nersemble import NeRSembleModel
from tests.test_model import SCHED, make_rays, tiny_model_config


@pytest.mark.slow
def test_chunked_matches_unchunked():
    rays = make_rays(8, np.random.default_rng(0))
    batch = {"rgb": jnp.ones((8, 3)) * 0.5, "alpha": jnp.ones((8,))}
    binaries = jnp.ones((16, 16, 16), bool)

    results = {}
    for chunk in (-1, 64):  # 8 rays x 32 slots = 256 samples -> 4 chunks
        model = NeRSembleModel(tiny_model_config(max_n_samples_per_batch=chunk))
        params = model.init_params(jax.random.PRNGKey(0))

        def loss_fn(p):
            out = model.render_rays(p, rays, binaries, SCHED,
                                    rng=jax.random.PRNGKey(1), train=True)
            return sum(model.compute_losses(out, batch, SCHED).values()), out["rgb"]

        (loss, rgb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        results[chunk] = (float(loss), np.asarray(rgb), jax.device_get(grads))

    loss_a, rgb_a, grads_a = results[-1]
    loss_b, rgb_b, grads_b = results[64]
    assert loss_a == pytest_approx(loss_b)
    assert np.allclose(rgb_a, rgb_b, atol=1e-5)
    for (path, ga), (_, gb) in zip(
            jax.tree_util.tree_leaves_with_path(grads_a),
            jax.tree_util.tree_leaves_with_path(grads_b)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=2e-5, rtol=1e-3, err_msg=str(path))


def pytest_approx(x, rel=1e-4):
    import pytest
    return pytest.approx(x, rel=rel)


def test_density_at_chunked():
    model = NeRSembleModel(tiny_model_config(max_n_samples_per_batch=32))
    params = model.init_params(jax.random.PRNGKey(0))
    # 100 probes -> 4 chunks with padding
    pos = jax.random.uniform(jax.random.PRNGKey(1), (100, 3), minval=-0.9,
                             maxval=0.9)
    ts = jnp.zeros((100,), jnp.int32)
    d_chunked = model.density_at(params, pos, ts, SCHED)
    model2 = NeRSembleModel(tiny_model_config(max_n_samples_per_batch=-1))
    d_full = model2.density_at(params, pos, ts, SCHED)
    assert d_chunked.shape == (100,)
    np.testing.assert_allclose(np.asarray(d_chunked), np.asarray(d_full),
                               atol=1e-5, rtol=1e-4)
