"""Depth / normal codecs for the compressed dataset assets.

The dataset ships depth maps as 16-bit PNGs quantizing metric depth in
[0, 2] m, with bin 0 reserved as an invalid-pixel mask, and (optionally)
normals as spherical-coordinate 8-bit images
(reference: src/nersemble/util/quantization.py:31-117).
"""

from typing import Union

import numpy as np


def to_spherical(cartesian: np.ndarray) -> np.ndarray:
    x, y, z = cartesian[..., 0], cartesian[..., 1], cartesian[..., 2]
    radius = np.linalg.norm(cartesian, axis=-1, ord=2)
    theta = np.arctan2(np.sqrt(x * x + y * y), z)
    phi = np.arctan2(y, x)
    return np.stack([radius, theta, phi], axis=-1)


def to_cartesian(spherical: np.ndarray) -> np.ndarray:
    radius, theta, phi = spherical[..., 0], spherical[..., 1], spherical[..., 2]
    sin_theta = np.sin(theta)
    return np.stack([
        radius * np.cos(phi) * sin_theta,
        radius * np.sin(phi) * sin_theta,
        radius * np.cos(theta),
    ], axis=-1)


class Quantizer:
    """Uniform scalar quantizer with an optional reserved mask bin 0."""

    def __init__(self,
                 min_values: Union[np.ndarray, float],
                 max_values: Union[np.ndarray, float],
                 bits: int,
                 mask_value: float = 0,
                 separate_mask: bool = True):
        self._min_values = min_values
        self._max_values = max_values
        self._bits = bits
        self._mask_value = mask_value
        self._separate_mask = separate_mask
        self._mask_offset = 1 if separate_mask else 0
        self._n_buckets = 2 ** bits
        self._scale_factor = (self._n_buckets - 1 - self._mask_offset) / (max_values - min_values)

    def encode(self, values: np.ndarray) -> np.ndarray:
        mask = values != self._mask_value
        if mask.ndim > 2:
            mask = mask.any(axis=-1)
        scaled = np.maximum(0, values - self._min_values) * self._scale_factor + self._mask_offset
        scaled = np.asarray(scaled, dtype=np.float64)
        scaled[~mask] = 0
        return scaled.round().astype(np.uint8 if self._bits == 8 else np.uint16)

    def decode(self, quantized: np.ndarray) -> np.ndarray:
        mask = quantized == self._mask_value
        if mask.ndim > 2:
            mask = mask.all(axis=-1)
        values = (quantized.astype(np.float32) - self._mask_offset) / self._scale_factor + self._min_values
        values[mask] = self._mask_value
        return values


class DepthQuantizer(Quantizer):
    """16-bit depth codec over [0, 2] m; values > 2 m are masked as outliers."""

    def __init__(self, min_values: float = 0, max_values: float = 2,
                 bits: int = 16, separate_mask: bool = True):
        super().__init__(min_values=min_values, max_values=max_values,
                         bits=bits, separate_mask=separate_mask)

    def encode(self, values: np.ndarray) -> np.ndarray:
        values = np.array(values, copy=True)
        values[values > self._max_values] = self._mask_value
        return super().encode(values)


class NormalsQuantizer(Quantizer):
    """8-bit spherical normal codec (unused in the training path)."""

    def __init__(self):
        super().__init__(min_values=np.array([0, 1 / 3 * np.pi, -np.pi]),
                         max_values=np.array([1, np.pi, np.pi]),
                         bits=8)

    def encode(self, values: np.ndarray) -> np.ndarray:
        spherical = to_spherical(values)
        quantized = super().encode(spherical)
        mask = (values != 0).any(axis=-1) if values.ndim > 2 else values != 0
        quantized[mask][..., 0] = 1  # radius is always 1 for unit normals
        return quantized

    def decode(self, quantized: np.ndarray) -> np.ndarray:
        mask = quantized != 0
        if mask.ndim > 2:
            mask = mask.any(axis=-1)
        spherical = super().decode(quantized)
        normals = np.zeros_like(spherical)
        normals[mask] = to_cartesian(spherical[mask])
        return normals
