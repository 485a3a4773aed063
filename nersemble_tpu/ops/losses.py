"""Supervision losses for head-capture training.

TPU ports of the reference loss library (reference: models/base.py:90-249) on
the [R, S] masked-sample layout. All dynamic-count subset means are computed as
masked sums divided by clamped counts (static shapes; empty selections yield 0
instead of the reference's conditional skip, which is equivalent under the sum
since lambda * 0 contributes nothing).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(values.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(values * m) / denom


def masked_rgb_loss(rgb_pred: jnp.ndarray, rgb_gt: jnp.ndarray,
                    alpha_per_ray: Optional[jnp.ndarray],
                    use_masked: bool, alpha_mask_threshold: float) -> jnp.ndarray:
    """MSE over rays, optionally restricted to foreground rays
    (alpha > threshold; reference: models/base.py:90-118)."""
    sq = (rgb_pred - rgb_gt) ** 2  # [R, 3]
    if use_masked and alpha_per_ray is not None:
        mask = (alpha_per_ray > alpha_mask_threshold)[:, None]
        mask = jnp.broadcast_to(mask, sq.shape)
        return _masked_mean(sq, mask)
    return jnp.mean(sq)


def alpha_loss(accumulation: jnp.ndarray, alpha_per_ray: jnp.ndarray
               ) -> jnp.ndarray:
    """L1 between rendered accumulation and GT alpha on background rays
    (alpha < 1; reference: models/base.py:120-134)."""
    acc = accumulation[:, 0]
    background = alpha_per_ray < 1.0
    return _masked_mean(jnp.abs(acc - alpha_per_ray), background)


def empty_loss(weights: jnp.ndarray, t_starts: jnp.ndarray, t_ends: jnp.ndarray,
               sample_mask: jnp.ndarray, depth_per_ray: jnp.ndarray,
               eps_depth) -> jnp.ndarray:
    """Mean squared weight of samples strictly in front of the GT depth
    (midpoint < depth - eps, valid depth only; reference: models/base.py:157-163)."""
    mids = (t_starts + t_ends) * 0.5
    depth = depth_per_ray[:, None]
    sel = (depth > 0) & (mids < depth - eps_depth) & sample_mask
    return _masked_mean(weights ** 2, sel)


def _normal_cdf(x, std):
    return 0.5 * (1.0 + jax.lax.erf(x / (std * jnp.sqrt(2.0))))


def near_loss(weights: jnp.ndarray, t_starts: jnp.ndarray, t_ends: jnp.ndarray,
              sample_mask: jnp.ndarray, depth_per_ray: jnp.ndarray,
              eps_depth) -> jnp.ndarray:
    """Match per-sample accumulated transmittance to a Gaussian-CDF expected
    accumulation inside the depth +- eps band (reference: models/base.py:165-202).

    The reference builds the per-ray inclusive cumsum of weights with a
    hand-rolled packed-segment scan; in the [R, S] layout it is a plain cumsum.
    NOTE: the reference passes ``(eps/3)**2`` as the Normal's *std* (not
    variance); we reproduce that behavior for parity.
    """
    mids = (t_starts + t_ends) * 0.5
    depth = depth_per_ray[:, None]
    sel = ((depth > 0)
           & (depth - eps_depth <= mids)
           & (mids <= depth + eps_depth)
           & sample_mask)
    accumulated = jnp.cumsum(weights * sample_mask.astype(weights.dtype), axis=-1)
    std = (eps_depth / 3.0) ** 2
    expected = _normal_cdf(mids - depth, std)
    return _masked_mean((accumulated - expected) ** 2, sel)


def depth_loss(depth_pred: jnp.ndarray, depth_per_ray: jnp.ndarray) -> jnp.ndarray:
    """MSE on rays with valid GT depth (reference: models/base.py:206-222)."""
    pred = depth_pred[:, 0]
    valid = depth_per_ray > 0
    return _masked_mean((depth_per_ray - pred) ** 2, valid)
