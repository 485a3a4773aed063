"""Plain-pytree MLPs with mixed-precision apply.

TPU-native replacement for tcnn's FullyFusedMLP (64-wide, bias-free,
reference: nersemble_nerfacto_field.py:142-172) and nerfstudio's biased MLP
with skip connections (used by the deformation field, reference:
deformation_field.py:50-69).

Params are stored in f32 and cast to the compute dtype (bf16 on TPU) at use;
matmuls accumulate in f32 via ``preferred_element_type`` — the bf16 analogue
of the reference's fp16 autocast (nersemble_trainer.py:182). The final layer
output is returned in f32.

These small matmul chains are fused by XLA; a Pallas fully-fused variant that
keeps activations in VMEM across layers lives in ops/fused_mlp.py and is used
on the hot path.
"""

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _kaiming_uniform(rng, in_dim, out_dim, dtype=jnp.float32):
    """torch.nn.Linear default init (kaiming uniform, a=sqrt(5))."""
    bound = math.sqrt(1.0 / in_dim)
    return jax.random.uniform(rng, (in_dim, out_dim), dtype, -bound, bound)


def init_linear(rng, in_dim: int, out_dim: int, bias: bool = True,
                weight_init_scale: Optional[float] = None, dtype=jnp.float32):
    """One linear layer. ``weight_init_scale`` overrides with U(-s, s) (used
    for near-identity heads, reference: deformation_field.py:72-75)."""
    w_rng, b_rng = jax.random.split(rng)
    if weight_init_scale is not None:
        w = jax.random.uniform(w_rng, (in_dim, out_dim), dtype,
                               -weight_init_scale, weight_init_scale)
    else:
        w = _kaiming_uniform(w_rng, in_dim, out_dim, dtype)
    layer = {"w": w}
    if bias:
        if weight_init_scale is not None:
            layer["b"] = jnp.zeros((out_dim,), dtype)
        else:
            bound = math.sqrt(1.0 / in_dim)
            layer["b"] = jax.random.uniform(b_rng, (out_dim,), dtype, -bound, bound)
    return layer


def init_mlp(rng, in_dim: int, out_dim: int, num_layers: int, layer_width: int,
             skip_connections: Sequence[int] = (), bias: bool = True,
             out_init_scale: Optional[float] = None, dtype=jnp.float32):
    """num_layers linear layers (num_layers - 1 hidden activations).

    ``num_layers == 1`` is a single in->out linear, matching nerfstudio's MLP.
    Layers listed in ``skip_connections`` receive [input, hidden] concatenated.
    """
    skips = set(skip_connections)
    layers = []
    rngs = jax.random.split(rng, num_layers)
    for i in range(num_layers):
        if num_layers == 1:
            d_in, d_out = in_dim, out_dim
        elif i == 0:
            d_in, d_out = in_dim, layer_width
        elif i in skips:
            d_in, d_out = layer_width + in_dim, layer_width
        elif i == num_layers - 1:
            d_in, d_out = layer_width, out_dim
        else:
            d_in, d_out = layer_width, layer_width
        scale = out_init_scale if i == num_layers - 1 else None
        layers.append(init_linear(rngs[i], d_in, d_out, bias=bias,
                                  weight_init_scale=scale, dtype=dtype))
    # NOTE: skip indices are NOT stored in the params pytree (ints would
    # become traced leaves under jit); pass them to apply_mlp statically.
    return {"layers": layers}


def apply_linear(layer, x, compute_dtype=jnp.bfloat16):
    w = layer["w"].astype(compute_dtype)
    out = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    if "b" in layer:
        out = out + layer["b"]
    return out


def apply_mlp(params, x, activation=jax.nn.relu, out_activation=None,
              compute_dtype=jnp.bfloat16, skip_connections=()):
    """Forward through the MLP; returns f32. ``skip_connections`` must match
    the value given to init_mlp (static python ints)."""
    layers = params["layers"]
    skips = set(skip_connections)
    x_in = x
    h = x
    n = len(layers)
    for i, layer in enumerate(layers):
        if i in skips and i > 0:
            h = jnp.concatenate([h, x_in.astype(h.dtype)], axis=-1)
        h = apply_linear(layer, h, compute_dtype)
        if i < n - 1:
            h = activation(h)
    if out_activation is not None:
        h = out_activation(h)
    return h


def mlp_param_count(params) -> int:
    return sum(int(v.size) for layer in params["layers"] for v in layer.values())
