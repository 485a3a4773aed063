"""Truncated-gradient exponential for density activation.

Forward is plain ``exp``; the backward clamps the input to [-15, 15] before
differentiating, preventing gradient explosions from large densities
(reference: nerfstudio trunc_exp used at nersemble_nerfacto_field.py:292).

Inputs are cast to f32 before the exp: the reference likewise computes density
in f32 even when the MLP runs in half precision (nersemble_nerfacto_field.py:
289-293) — bf16 exp would quantize density too coarsely for stable volume
rendering.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(jnp.asarray(x, jnp.float32))


def _fwd(x):
    x32 = jnp.asarray(x, jnp.float32)
    return jnp.exp(x32), x32


def _bwd(x32, g):
    return (g * jnp.exp(jnp.clip(x32, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
