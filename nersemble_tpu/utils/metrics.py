"""Image quality metrics in JAX: PSNR, SSIM, MSE (+ masked variants).

Replaces torchmetrics PSNR/SSIM (reference: nersemble_instant_ngp.py:158-160,
446-449). SSIM follows the torchmetrics/Wang et al. defaults: gaussian window
11x11 sigma 1.5, k1=0.01, k2=0.03, data_range=1.0, per-channel then averaged.

LPIPS requires pretrained VGG weights which cannot be downloaded in this
environment; ``lpips`` returns None unless a weights file is provided (see
utils/lpips.py for the loader).
"""

import jax
import jax.numpy as jnp
import numpy as np


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse(pred, target), 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """[H, W, C] images -> scalar SSIM (valid-window convolution)."""
    kernel = _gaussian_kernel(kernel_size, sigma)
    kernel = kernel[None, None, :, :]  # [O=1, I=1, H, W]

    def filt(img):
        # [H, W, C] -> [C, 1, H, W] depthwise valid conv
        x = jnp.moveaxis(img, -1, 0)[:, None, :, :]
        out = jax.lax.conv_general_dilated(
            x, jnp.tile(kernel, (1, 1, 1, 1)), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return out[:, 0]

    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mu_x = filt(pred)
    mu_y = filt(target)
    mu_xx = filt(pred * pred)
    mu_yy = filt(target * target)
    mu_xy = filt(pred * target)

    # In exact arithmetic 0 <= var and |cov| <= sqrt(var_x*var_y), which
    # (with the c-constants) bounds SSIM by 1. In f32 the mu_xx - mu_x**2
    # cancellation can break both (observed: a mid-training eval render
    # logged eval_all_ssim 1.0014; a flat image at amplitude ~37 measures
    # 1.058) — project the moments back to the feasible set.
    var_x = jnp.maximum(mu_xx - mu_x ** 2, 0.0)
    var_y = jnp.maximum(mu_yy - mu_y ** 2, 0.0)
    cov_bound = jnp.sqrt(var_x * var_y)
    cov = jnp.clip(mu_xy - mu_x * mu_y, -cov_bound, cov_bound)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * cov + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    return jnp.mean(num / den)


def apply_alpha_mask(image: np.ndarray, alpha: np.ndarray,
                     background: float = 1.0) -> np.ndarray:
    """Blend an [H, W, 3] float image against the background with [H, W]
    alpha — the masked-METRIC preprocessing, which the reference does in
    float (nersemble_instant_ngp.py:473-482: alpha_map/255 blend)."""
    a = alpha[..., None]
    return a * image + (1 - a) * background


def image_metrics(pred: np.ndarray, gt: np.ndarray, alpha=None):
    """(regular, masked) dicts of psnr/ssim/mse/lpips for one [H, W, 3] pair.

    The per-image metric bundle of the reference's
    ``get_image_metrics_and_images`` (nersemble_instant_ngp.py:424-500):
    the masked variants blend both images against the background with the
    GT alpha map first. ``lpips`` is None without a weights file
    (utils/lpips.py). ``masked`` values are None when ``alpha`` is None.
    Shared by the evaluate CLI and the trainer's periodic eval logging.
    """
    from nersemble_tpu.utils.lpips import lpips_or_none

    def bundle(p, g):
        return {
            "psnr": float(psnr(jnp.asarray(p), jnp.asarray(g))),
            "ssim": float(ssim(jnp.asarray(p), jnp.asarray(g))),
            "mse": float(mse(jnp.asarray(p), jnp.asarray(g))),
            "lpips": lpips_or_none(p, g),
        }

    regular = bundle(pred, gt)
    masked = {k: None for k in regular}
    if alpha is not None:
        masked = bundle(apply_alpha_mask(pred, alpha),
                        apply_alpha_mask(gt, alpha))
    return regular, masked


def perform_alpha_blending(image: np.ndarray, alpha_map: np.ndarray
                           ) -> np.ndarray:
    """uint8-quantized white-background blend — the masked-JOD frame
    preprocessing, bit-matching the reference's perform_alpha_blending
    (evaluate_nersemble.py:22-35): blend in float, clip, round back to uint8.
    """
    assert image.dtype == np.uint8 and alpha_map.dtype == np.uint8
    a = (alpha_map / 255.0)
    if a.ndim == image.ndim - 1:
        a = a[..., None]
    out = a * (image / 255.0) + (1 - a)
    return np.clip(out * 255.0, 0, 255).astype(np.uint8)
