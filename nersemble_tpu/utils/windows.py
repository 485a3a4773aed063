"""Coarse-to-fine window functions and scalar schedules.

The Hann-style window eases frequency bands / hash tables in as a scheduled
parameter sweeps across them (reference: hash_ensemble.py:12-28,
windowed_nerf_encoding.py:76-92, generic_scheduler.py:4-31,
step_lr_scheduler.py:9-21).

Schedule *values* are computed on the host per step and passed into the jitted
train step as traced scalars, so changing them never retriggers compilation.
"""

import jax.numpy as jnp
import numpy as np


def posenc_window(window_param, min_band: float, max_band: float, n_bands: int) -> jnp.ndarray:
    """Truncated Hann window sliding right along the band spectrum.

    Eases band ``b`` in as ``window_param`` goes from ``b`` to ``b + 1``.
    ``window_param`` may be a traced jnp scalar.
    """
    # host-side constant: a traced jnp.linspace compiles to a tiny scalar-core
    # fusion that XLA schedules as a serialization point (measured 34 ms/step
    # pipeline bubble on v5e in the flagship train step)
    bands = jnp.asarray(np.linspace(min_band, max_band, n_bands,
                                    dtype=np.float32))
    x = jnp.clip(window_param - bands, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * x))


def generic_schedule(step, init_value: float, final_value: float,
                     begin_step: int, end_step: int) -> float:
    """Host-side linear ramp init -> final over [begin, end]
    (reference: generic_scheduler.py:14-27)."""
    if end_step <= begin_step:
        return float(final_value)
    frac = np.clip((step - begin_step) / (end_step - begin_step), 0.0, 1.0)
    return float(init_value + (final_value - init_value) * frac)


def step_lr(step, base_lr: float, step_size: int, gamma: float) -> float:
    """StepLR: base_lr * gamma^floor(step / step_size)
    (reference: step_lr_scheduler.py:9-21, train_nersemble.py:246-254)."""
    return float(base_lr * (gamma ** (step // step_size)))
