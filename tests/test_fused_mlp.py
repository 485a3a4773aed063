"""Pallas fused MLP == jnp reference (values + grads), interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nersemble_tpu.ops import fused_mlp as fm
from nersemble_tpu.ops.mlp import apply_mlp, init_mlp


@pytest.fixture(autouse=True)
def interpret_mode():
    fm.INTERPRET = True
    yield
    fm.INTERPRET = False


CASES = [
    # (in, out, layers, width, skips, bias, out_act) — the model's 3 shapes
    ("field_base", 32, 16, 2, 64, (), False, None),
    ("color_head", 18, 3, 3, 64, (), False, "sigmoid"),
    ("deform_stem", 45 + 16, 32, 4, 32, (2,), True, "relu"),
]


@pytest.mark.parametrize("name,d_in,d_out,n_layers,width,skips,bias,out_act",
                         CASES)
def test_fused_matches_reference(name, d_in, d_out, n_layers, width, skips,
                                 bias, out_act):
    rng = jax.random.PRNGKey(0)
    params = init_mlp(rng, d_in, d_out, n_layers, width,
                      skip_connections=skips, bias=bias)
    # rows chosen to exercise padding (not a multiple of the 512 tile)
    x = jax.random.normal(jax.random.PRNGKey(1), (700, d_in))

    act = {"sigmoid": jax.nn.sigmoid, "relu": jax.nn.relu, None: None}[out_act]

    def ref_loss(p, xx):
        out = apply_mlp(p, xx, out_activation=act,
                        compute_dtype=jnp.float32, skip_connections=skips)
        return jnp.sum(out ** 2), out

    def fused_loss(p, xx):
        out = fm.fused_mlp_apply(p, xx, out_activation=out_act,
                                 compute_dtype=jnp.float32,
                                 skip_connections=skips)
        return jnp.sum(out ** 2), out

    (l_ref, o_ref), g_ref = jax.value_and_grad(ref_loss, argnums=(0, 1),
                                               has_aux=True)(params, x)
    (l_f, o_f), g_f = jax.value_and_grad(fused_loss, argnums=(0, 1),
                                         has_aux=True)(params, x)

    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_ref),
                               atol=2e-5, rtol=1e-4)
    assert float(l_f) == pytest.approx(float(l_ref), rel=1e-4)
    for (path, ga), (_, gb) in zip(jax.tree_util.tree_leaves_with_path(g_f),
                                   jax.tree_util.tree_leaves_with_path(g_ref)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"{name} {path}")
