"""Hash-ensemble blend-code scheduling.

The ensemble blends H logical hash tables with a per-timestep latent code.
During coarse-to-fine warm-up a Hann window fades tables in, and two flags
control how the learned code takes over from a fixed weight-1 on table 0
(reference: hash_ensemble.py:119-156):

- ``disable_initial_hash_ensemble``: while only table 0 is active
  (window == 1) the blend weights are forced to 1, making the deformation
  field learn correspondences instead of the ensemble.
- ``use_soft_transition``: for window in [1, 2) the fixed weight lerps to the
  learned code to avoid a jump when table 1 starts fading in.

All of this composes into a single effective code (the Hann window over the
table axis commutes with the blend einsum), so the encoding kernel stays
generic: ``blended = sum_h effective_code[n,h] * emb[n,:,h]``.
"""

from typing import Optional

import jax.numpy as jnp

from nersemble_tpu.utils.windows import posenc_window


def effective_blend_code(code: jnp.ndarray,
                         window_param,
                         n_tables: int,
                         disable_initial_hash_ensemble: bool = False,
                         use_soft_transition: bool = False) -> jnp.ndarray:
    """[N, H] learned code (+ traced scalar window) -> effective blend code."""
    if window_param is None:
        return code

    w = jnp.asarray(window_param, jnp.float32)
    base = code
    if use_soft_transition:
        # window in [1, 2): lerp fixed one-hot(0)-ish weight -> learned code
        alpha = jnp.clip(w - 1.0, 0.0, 1.0)
        e0 = jnp.zeros_like(code).at[:, 0].set(1.0)
        soft = alpha * code + (1.0 - alpha) * e0
        base = jnp.where(w < 2.0, soft, code)
    if disable_initial_hash_ensemble:
        # while only table 0 is active, force all blend weights to 1
        # (reference: hash_ensemble.py:122-124 uses ones_like; tables > 0 are
        # zeroed by the window anyway)
        base = jnp.where(w <= 1.0, jnp.ones_like(code), base)

    window = posenc_window(w, 0.0, n_tables - 1, n_tables)  # [H]
    return base * window[None, :]


def level_window(window_param, n_levels: int, n_features_per_level: int
                 ) -> Optional[jnp.ndarray]:
    """Optional per-frequency-level window over the [L*F] feature axis
    (reference: hash_ensemble.py:141-149; unused by the train configs)."""
    if window_param is None:
        return None
    win = posenc_window(window_param, 0.0, n_levels - 1, n_levels)
    return jnp.repeat(win, n_features_per_level)
