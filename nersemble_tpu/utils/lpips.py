"""LPIPS perceptual metric — gated on locally available VGG weights.

The reference uses torchmetrics' LPIPS with pretrained VGG-16
(reference: nersemble_instant_ngp.py:160, 448). This environment has no
network egress and no torchvision, so pretrained weights cannot be downloaded.

Behavior:
- If ``NERSEMBLE_LPIPS_WEIGHTS`` points to an .npz with VGG-16 conv weights
  (keys ``features.<i>.weight``/``bias``) plus LPIPS linear layer weights
  (keys ``lin<k>.model.1.weight``), a JAX LPIPS is evaluated.
- Otherwise ``lpips_or_none`` returns None and evaluation simply omits the
  metric (the JSON schema keeps the field as null).
"""

import os
from functools import lru_cache
from typing import Optional

import numpy as np

# torchvision VGG-16 ``features`` indices: conv layers, maxpool layers, and
# the LPIPS feature taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
_VGG_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_POOLS = (4, 9, 16, 23)  # pool 30 sits after the last tap — never reached
_TAPS = (3, 8, 15, 22, 29)
# LPIPS input scaling layer constants (lpips/pretrained_networks.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@lru_cache(maxsize=1)
def _load_weights():
    path = os.environ.get("NERSEMBLE_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    return dict(np.load(path))


def lpips_available() -> bool:
    return _load_weights() is not None


def reset_lpips_cache() -> None:
    """Drop the cached weights (tests change NERSEMBLE_LPIPS_WEIGHTS)."""
    _load_weights.cache_clear()


def lpips_or_none(pred: np.ndarray, target: np.ndarray) -> Optional[float]:
    """[H, W, 3] images in [0, 1] -> LPIPS(VGG) or None if unavailable."""
    weights = _load_weights()
    if weights is None:
        return None
    import jax
    import jax.numpy as jnp

    def normalize(img):
        x = jnp.asarray(img, jnp.float32) * 2.0 - 1.0  # [-1, 1]
        x = (x - _SHIFT) / _SCALE
        return x[None].transpose(0, 3, 1, 2)  # NCHW

    def vgg_features(x):
        feats = []
        for i in range(_TAPS[-1] + 1):
            if i in _VGG_CONVS:
                w = jnp.asarray(weights[f"features.{i}.weight"])
                b = jnp.asarray(weights[f"features.{i}.bias"])
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NCHW", "OIHW", "NCHW")) + b[None, :, None, None]
            elif i in _VGG_POOLS:
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                          (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            else:
                x = jax.nn.relu(x)
            if i in _TAPS:
                feats.append(x)
        return feats

    fx = vgg_features(normalize(pred))
    fy = vgg_features(normalize(target))
    total = 0.0
    for k, (a, b) in enumerate(zip(fx, fy)):
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = jnp.asarray(weights[f"lin{k}.model.1.weight"])[:, :, 0, 0]  # [1, C]
        total += float(jnp.mean(jnp.sum(diff * lin[0][None, :, None, None], axis=1)))
    return total
