"""Efficient mip-NeRF-360 distortion loss, closed form over [R, S] samples.

TPU replacement for the CUDA ``flatten_eff_distloss``
(reference: models/base.py:224-249). Using prefix sums over the sorted sample
midpoints the O(S^2) pairwise term collapses to O(S) per ray:

    sum_{i != j} w_i w_j |m_i - m_j| = 2 * sum_i w_i (m_i A_i - B_i)
        with A_i = sum_{j<i} w_j,  B_i = sum_{j<i} w_j m_j   (m ascending)

plus the intra-sample term ``(1/3) sum_i w_i^2 delta_i``. The loss is averaged
over rays.
"""

import jax.numpy as jnp

from nersemble_tpu.ops.rendering import exclusive_cumsum


def distortion_loss(weights: jnp.ndarray, t_starts: jnp.ndarray,
                    t_ends: jnp.ndarray, mask: jnp.ndarray,
                    ray_mask=None) -> jnp.ndarray:
    """weights/t_starts/t_ends/mask: [R, S]; optional ray_mask [R] selects the
    subset of rays entering the loss (reference caps at dist_loss_max_rays=5000,
    models/base.py:233-235). Returns the scalar mean per-ray distortion."""
    m = mask.astype(weights.dtype)
    w = weights * m
    mids = (t_starts + t_ends) * 0.5
    deltas = (t_ends - t_starts)

    A = exclusive_cumsum(w, axis=-1)
    B = exclusive_cumsum(w * mids, axis=-1)
    bi = 2.0 * jnp.sum(w * (mids * A - B), axis=-1)
    uni = jnp.sum(w * w * deltas * m, axis=-1) / 3.0
    per_ray = bi + uni
    if ray_mask is not None:
        rm = ray_mask.astype(weights.dtype)
        return jnp.sum(per_ray * rm) / jnp.maximum(jnp.sum(rm), 1.0)
    return jnp.mean(per_ray)


def distortion_loss_reference(weights, mids, deltas):
    """O(S^2) reference for testing: single ray, [S] arrays."""
    pair = jnp.abs(mids[:, None] - mids[None, :])
    bi = jnp.sum(weights[:, None] * weights[None, :] * pair)
    uni = jnp.sum(weights * weights * deltas) / 3.0
    return bi + uni
