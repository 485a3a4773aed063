"""Colormaps for depth / accumulation / error / scene-flow visualizations.

Replaces nerfstudio colormaps + dreifus apply_scene_flow_colormap
(reference: nersemble_instant_ngp.py:430-470, util/render.py:44-58).
"""

import numpy as np


def apply_colormap(values: np.ndarray, cmap: str = "viridis") -> np.ndarray:
    """[H, W] or [H, W, 1] values in [0, 1] -> [H, W, 3] float RGB."""
    import matplotlib
    values = np.asarray(values)
    if values.ndim == 3:
        values = values[..., 0]
    mapped = matplotlib.colormaps[cmap](np.clip(values, 0.0, 1.0))
    return mapped[..., :3].astype(np.float32)


def apply_depth_colormap(depth: np.ndarray,
                         accumulation: np.ndarray = None,
                         near: float = None, far: float = None,
                         cmap: str = "turbo") -> np.ndarray:
    """Turbo-colormapped depth, optionally alpha-scaled by accumulation
    (reference: nerfstudio apply_depth_colormap; render CLI uses
    near=0.8*9, far=1.2*9, util/render.py:44-50)."""
    depth = np.asarray(depth)
    if depth.ndim == 3:
        depth = depth[..., 0]
    if near is None:
        near = float(np.percentile(depth, 2))
    if far is None:
        far = float(np.percentile(depth, 98))
    norm = np.clip((depth - near) / max(far - near, 1e-8), 0.0, 1.0)
    colored = apply_colormap(norm, cmap)
    if accumulation is not None:
        acc = np.asarray(accumulation)
        if acc.ndim == 3:
            acc = acc[..., 0]
        colored = colored * acc[..., None]
    return colored


def apply_scene_flow_colormap(flow: np.ndarray, max_magnitude: float = None
                              ) -> np.ndarray:
    """[H, W, 3] 3D offsets -> RGB: direction encoded in hue-like channels,
    magnitude in saturation (dreifus-style scene-flow visualization)."""
    flow = np.asarray(flow, np.float32)
    if max_magnitude is None:
        max_magnitude = max(float(np.abs(flow).max()), 1e-8)
    return np.clip(flow / (2 * max_magnitude) + 0.5, 0.0, 1.0)


def apply_error_colormap(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Per-pixel squared-error image, turbo-colored
    (reference: nersemble_instant_ngp.py:439-440)."""
    err = ((np.asarray(pred) - np.asarray(gt)) ** 2).mean(-1)
    return apply_colormap(err, "turbo")
