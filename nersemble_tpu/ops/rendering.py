"""Volume-rendering math on fixed-shape masked sample tensors.

TPU redesign of nerfacc's packed-ray kernels
(``render_weight_from_density``, ``pack_info``, ``accumulate_along_rays``;
reference: nersemble_instant_ngp.py:325-343, nersemble_deformation_renderer.py:
9-29). Samples live in a dense ``[R, S]`` layout (R rays x S sample slots,
invalid slots masked), so per-ray scans are plain ``cumsum`` along the sample
axis and segment reductions are masked sums — no packing metadata, fully
static shapes for XLA.
"""

from typing import Optional

import jax.numpy as jnp


def exclusive_cumsum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    inclusive = jnp.cumsum(x, axis=axis)
    return inclusive - x


def render_weights(sigmas: jnp.ndarray, t_starts: jnp.ndarray,
                   t_ends: jnp.ndarray, mask: jnp.ndarray):
    """Transmittance weights from density over [R, S] samples.

    ``w_i = T_i * (1 - exp(-sigma_i * delta_i))`` with
    ``T_i = exp(-sum_{j<i} sigma_j * delta_j)`` (masked slots contribute 0).
    Returns (weights [R, S], transmittance [R, S]).
    """
    mask_f = mask.astype(sigmas.dtype)
    sigma_delta = sigmas * (t_ends - t_starts) * mask_f
    trans = jnp.exp(-exclusive_cumsum(sigma_delta, axis=-1))
    alphas = 1.0 - jnp.exp(-sigma_delta)
    weights = trans * alphas * mask_f
    return weights, trans


def accumulate(weights: jnp.ndarray, values: Optional[jnp.ndarray] = None
               ) -> jnp.ndarray:
    """Per-ray reduction: [R, S] (x [R, S, C]) -> [R, C] (or [R, 1])."""
    if values is None:
        return jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.einsum("rs,rsc->rc", weights, values)


def render_rgb(weights: jnp.ndarray, rgbs: jnp.ndarray,
               background_color: jnp.ndarray) -> jnp.ndarray:
    """Composite [R, S, 3] colors over the background (reference: nerfstudio
    RGBRenderer with background_color='white')."""
    comp = accumulate(weights, rgbs)
    acc = accumulate(weights)
    return comp + (1.0 - acc) * background_color[None, :]


def render_depth_expected(weights: jnp.ndarray, t_starts: jnp.ndarray,
                          t_ends: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Expected (accumulation-normalized) depth from sample midpoints
    (reference: nerfstudio DepthRenderer(method='expected'))."""
    mids = (t_starts + t_ends) * 0.5
    depth = accumulate(weights, mids[..., None])
    acc = accumulate(weights)
    return depth / (acc + eps)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    return accumulate(weights)


def render_expected_value(weights: jnp.ndarray, values: jnp.ndarray
                          ) -> jnp.ndarray:
    """Volume-render arbitrary per-sample vectors (e.g. SE(3) offsets for the
    scene-flow visualization, reference: nersemble_deformation_renderer.py:22-25)."""
    return accumulate(weights, values)
