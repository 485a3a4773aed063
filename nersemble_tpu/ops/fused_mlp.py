"""Fused MLP as a single Pallas TPU kernel (forward + custom VJP).

TPU-native equivalent of tcnn's FullyFusedMLP (reference:
nersemble_nerfacto_field.py:142-172): the entire layer chain runs inside one
kernel with weights and activations resident in VMEM, so inter-layer
activations never round-trip through HBM. The backward pass is a second kernel
that recomputes the forward activations per block (VMEM remat) and accumulates
weight/bias gradients across grid steps (TPU grids execute sequentially, so
+= accumulation into a constant-index output block is race-free).

Supports the three MLP shapes used by the model:
- field base MLP (bias-free, relu, linear out),
- color head (bias-free, relu, sigmoid out),
- deformation stem (biased, skip concat of the input at a given layer,
  relu out) + linear heads.

Falls back to the jnp implementation (ops/mlp.py) on non-TPU backends and for
unsupported configurations; `fused_mlp_apply` is a drop-in for `apply_mlp`.
"""

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from nersemble_tpu.ops.mlp import apply_mlp

try:  # Pallas import is deferred so CPU-only test envs never touch Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_TILE = 512

# Set True (e.g. in tests) to run the kernels in the Pallas interpreter on any
# backend; also makes _pallas_available() return True off-TPU.
INTERPRET = False


def _out_act(h, kind: str):
    if kind == "sigmoid":
        return jax.nn.sigmoid(h)
    if kind == "relu":
        return jax.nn.relu(h)
    return h


def _forward_math(x, weights, biases, skips, out_activation, compute_dtype):
    """The layer chain, written once and reused by both kernels."""
    x_in = x.astype(compute_dtype)
    h = x_in
    n = len(weights)
    hs = []  # post-activation inputs to each layer (after any skip concat)
    for i in range(n):
        if i in skips and i > 0:
            h = jnp.concatenate([h, x_in], axis=-1)
        hs.append(h)
        pre = jnp.dot(h, weights[i].astype(compute_dtype),
                      preferred_element_type=jnp.float32)
        if biases[i] is not None:
            pre = pre + biases[i]
        if i < n - 1:
            h = jax.nn.relu(pre).astype(compute_dtype)
        else:
            h = _out_act(pre, out_activation)
    return h, hs


def _fwd_kernel(x_ref, *refs, n_layers, has_bias, skips, out_activation,
                compute_dtype):
    out_ref = refs[-1]
    ws = list(refs[:n_layers])
    bs = list(refs[n_layers:2 * n_layers]) if has_bias else [None] * n_layers
    weights = [w[:] for w in ws]
    biases = [b[:] if b is not None else None for b in bs]
    out, _ = _forward_math(x_ref[:], weights, biases, skips, out_activation,
                           compute_dtype)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, *refs, n_layers, has_bias, skips,
                out_activation, compute_dtype):
    n_out = n_layers * (2 if has_bias else 1) + 1
    w_refs = list(refs[:n_layers])
    b_refs = list(refs[n_layers:2 * n_layers]) if has_bias else [None] * n_layers
    out_refs = refs[len(refs) - n_out:]
    dx_ref = out_refs[0]
    dw_refs = out_refs[1:1 + n_layers]
    db_refs = out_refs[1 + n_layers:] if has_bias else []

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in list(dw_refs) + list(db_refs):
            r[:] = jnp.zeros_like(r)

    weights = [w[:] for w in w_refs]
    biases = [b[:] if b is not None else None for b in b_refs]
    x = x_ref[:]
    out, hs = _forward_math(x, weights, biases, skips, out_activation,
                            compute_dtype)

    g = g_ref[:].astype(jnp.float32)
    if out_activation == "sigmoid":
        g = g * out * (1.0 - out)
    elif out_activation == "relu":
        g = g * (out > 0).astype(g.dtype)

    in_dim = x.shape[-1]
    dx_acc = jnp.zeros((x.shape[0], in_dim), jnp.float32)
    for i_layer in range(n_layers - 1, -1, -1):
        h_in = hs[i_layer].astype(jnp.float32)
        dw_refs[i_layer][:] += jnp.dot(h_in.T, g,
                                       preferred_element_type=jnp.float32
                                       ).astype(dw_refs[i_layer].dtype)
        if has_bias:
            db_refs[i_layer][:] += jnp.sum(g, axis=0).astype(db_refs[i_layer].dtype)
        dh = jnp.dot(g, weights[i_layer].astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
        if i_layer in skips and i_layer > 0:
            # split the concatenated [h, x] gradient
            dx_acc = dx_acc + dh[:, -in_dim:]
            dh = dh[:, :-in_dim]
        if i_layer > 0:
            # relu' of the previous layer's output (the non-concat part of hs);
            # compare in f32 (Mosaic lacks some sub-32-bit comparisons)
            h_prev = hs[i_layer][:, :dh.shape[-1]].astype(jnp.float32)
            g = dh * (h_prev > 0).astype(dh.dtype)
        else:
            dx_acc = dx_acc + dh
    dx_ref[:] = dx_acc.astype(dx_ref.dtype)


def _pallas_available() -> bool:
    return _PALLAS_OK and (INTERPRET or jax.default_backend() == "tpu")


def _pad_rows(x, tile):
    n = x.shape[0]
    padded = (n + tile - 1) // tile * tile
    if padded != n:
        x = jnp.concatenate([x, jnp.zeros((padded - n, x.shape[1]), x.dtype)])
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_mlp(x, weights, biases, skips, out_activation, compute_dtype_name):
    return _fused_fwd_impl(x, weights, biases, skips, out_activation,
                           compute_dtype_name)


def _fused_fwd_impl(x, weights, biases, skips, out_activation,
                    compute_dtype_name):
    compute_dtype = jnp.dtype(compute_dtype_name)
    n_layers = len(weights)
    has_bias = biases[0] is not None
    out_dim = weights[-1].shape[-1]
    xp, n = _pad_rows(x, _TILE)
    grid = (xp.shape[0] // _TILE,)

    kernel = functools.partial(_fwd_kernel, n_layers=n_layers,
                               has_bias=has_bias, skips=frozenset(skips),
                               out_activation=out_activation,
                               compute_dtype=compute_dtype)
    in_specs = [pl.BlockSpec((_TILE, xp.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    operands = [xp]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(w)
    if has_bias:
        for b in biases:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))
            operands.append(b)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TILE, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], out_dim), jnp.float32),
        interpret=INTERPRET,
    )(*operands)
    return out[:n]


def _fused_vjp_fwd(x, weights, biases, skips, out_activation,
                   compute_dtype_name):
    out = _fused_fwd_impl(x, weights, biases, skips, out_activation,
                          compute_dtype_name)
    return out, (x, weights, biases)


def _fused_vjp_bwd(skips, out_activation, compute_dtype_name, residuals, g):
    x, weights, biases = residuals
    compute_dtype = jnp.dtype(compute_dtype_name)
    n_layers = len(weights)
    has_bias = biases[0] is not None
    xp, n = _pad_rows(x, _TILE)
    gp, _ = _pad_rows(g.astype(jnp.float32), _TILE)
    grid = (xp.shape[0] // _TILE,)

    kernel = functools.partial(_bwd_kernel, n_layers=n_layers,
                               has_bias=has_bias, skips=frozenset(skips),
                               out_activation=out_activation,
                               compute_dtype=compute_dtype)
    in_specs = [
        pl.BlockSpec((_TILE, xp.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_TILE, gp.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xp, gp]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(w)
    if has_bias:
        for b in biases:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))
            operands.append(b)

    out_shapes = [jax.ShapeDtypeStruct((xp.shape[0], xp.shape[1]), jnp.float32)]
    out_specs = [pl.BlockSpec((_TILE, xp.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    if has_bias:
        for b in biases:
            out_shapes.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
            out_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                          memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=INTERPRET,
    )(*operands)

    dx = outs[0][:n]
    dws = [o.astype(w.dtype) for o, w in zip(outs[1:1 + n_layers], weights)]
    if has_bias:
        dbs = [o.astype(b.dtype)
               for o, b in zip(outs[1 + n_layers:], biases)]
    else:
        dbs = [None] * n_layers
    return dx, tuple(dws), tuple(dbs)


_fused_mlp.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_mlp_apply(params, x, out_activation: Optional[str] = None,
                    compute_dtype=jnp.bfloat16,
                    skip_connections: Sequence[int] = ()) -> jnp.ndarray:
    """Drop-in for ops.mlp.apply_mlp; uses the Pallas kernel on TPU."""
    if not _pallas_available():
        act = {"sigmoid": jax.nn.sigmoid, "relu": jax.nn.relu,
               None: None, "none": None}[out_activation]
        return apply_mlp(params, x, out_activation=act,
                         compute_dtype=compute_dtype,
                         skip_connections=skip_connections)
    layers = params["layers"]
    weights = tuple(layer["w"] for layer in layers)
    has_bias = "b" in layers[0]
    biases = tuple(layer.get("b") for layer in layers) if has_bias \
        else tuple([None] * len(layers))
    return _fused_mlp(x, weights, biases, tuple(sorted(skip_connections)),
                      out_activation or "none", jnp.dtype(compute_dtype).name)
