"""Windowed sinusoidal positional encoding (Nerfies/BARF-style coarse-to-fine).

Reference: src/nersemble/nerfstudio/field_components/windowed_nerf_encoding.py:
10-92. Layout matches the reference exactly:
``[sin(d0 f0), sin(d0 f1), ..., sin(dD fF), cos(d0 f0), ..., (2*pi*x if
include_input)]`` with the Hann window applied per (dim, freq) pair to both the
sin and cos halves.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

from nersemble_tpu.utils.windows import posenc_window


def windowed_posenc(x: jnp.ndarray,
                    num_frequencies: int,
                    min_freq_exp: float = 0.0,
                    max_freq_exp: Optional[float] = None,
                    include_input: bool = True,
                    window_param=None) -> jnp.ndarray:
    """Encode [..., D] -> [..., 2*D*num_frequencies (+ D)].

    ``window_param`` may be a traced scalar; ``None`` disables windowing.
    """
    if max_freq_exp is None:
        max_freq_exp = num_frequencies - 1
    scaled = 2.0 * jnp.pi * x
    # host-side constant (see windows.posenc_window: traced linspace compiles
    # to a scalar-core serialization point)
    freqs = jnp.asarray(
        2.0 ** np.linspace(min_freq_exp, max_freq_exp, num_frequencies),
        dtype=x.dtype)
    # [..., D, F] -> [..., D*F]
    angles = scaled[..., None] * freqs
    angles = angles.reshape(*angles.shape[:-2], -1)
    encoded = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)

    if window_param is not None:
        window = posenc_window(window_param, min_freq_exp, max_freq_exp,
                               num_frequencies).astype(x.dtype)  # [F]
        window = jnp.tile(window, x.shape[-1])  # [D*F], d-major like angles
        window = jnp.concatenate([window, window], axis=-1)
        encoded = window * encoded

    if include_input:
        encoded = jnp.concatenate([encoded, scaled], axis=-1)
    return encoded


def posenc_out_dim(in_dim: int, num_frequencies: int, include_input: bool = True) -> int:
    return 2 * in_dim * num_frequencies + (in_dim if include_input else 0)
