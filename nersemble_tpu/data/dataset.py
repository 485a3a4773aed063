"""Image dataset with bounded RAM cache, color correction, and alpha blending.

Reference: src/nersemble/nerfstudio/dataset/nersemble_dataset.py:13-128 +
nerfstudio InputDataset.get_image. Per image we produce:

- ``rgb`` [H, W, 3] f32 in [0, 1]: affine color correction (3x4 matrix per
  camera) applied in linear [0,1] space, then alpha-blended against the
  configured background color using the separately stored alpha map.
- ``alpha`` [H, W] f32 in [0, 1] (if alpha maps are enabled).
- ``depth`` [H, W] f32 metric (0 = invalid) — decoded 16-bit quantized depth,
  nearest-resized, outliers outside [0.8, 1.4] m zeroed, scaled by the world
  scale factor (reference: nersemble_dataparser.py:390-426).

The cache stores at most ``max_cached_items`` decoded items, optionally
uint8-compressed (~4x smaller, lossy) like the reference's ~200 GB RAM cache.
"""

from typing import Dict

import numpy as np

from nersemble_tpu.config import DataConfig
from nersemble_tpu.data.dataparser import DataparserOutputs

_ALPHA_BG = {"white": 1.0, "black": 0.0}


def _resize(image: np.ndarray, size, nearest: bool = False) -> np.ndarray:
    from PIL import Image
    pil = Image.fromarray(image)
    if pil.size != tuple(size):
        pil = pil.resize(tuple(size), resample=Image.NEAREST if nearest else Image.BILINEAR)
    return np.asarray(pil)


class NeRSembleDataset:
    def __init__(self, outputs: DataparserOutputs, config: DataConfig):
        self.outputs = outputs
        self.config = config
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._bg = _ALPHA_BG[config.alpha_channel_color]

    def __len__(self) -> int:
        return self.outputs.n_images

    # -- loading -------------------------------------------------------------

    def _load_item(self, image_idx: int) -> Dict[str, np.ndarray]:
        import imageio.v3 as iio

        out = self.outputs
        size = (out.image_width, out.image_height)
        rgb = iio.imread(out.image_paths[image_idx])
        if rgb.ndim == 2:
            rgb = np.repeat(rgb[:, :, None], 3, axis=2)
        rgb = _resize(rgb[..., :3], size)
        rgb = rgb.astype(np.float32) / 255.0

        if out.color_correction_paths is not None:
            cc = np.load(out.color_correction_paths[image_idx])
            rgb = rgb @ cc[:3, :3] + cc[np.newaxis, :3, 3]
            rgb = np.clip(rgb, 0.0, 1.0)
        # quantize like the reference (which re-saves uint8 after correction,
        # nersemble_dataset.py:93)
        rgb = (rgb * 255).round().astype(np.uint8).astype(np.float32) / 255.0

        item = {"rgb": rgb}

        if out.alpha_paths is not None:
            alpha = iio.imread(out.alpha_paths[image_idx])
            if alpha.ndim == 3:
                alpha = alpha[..., 0]
            alpha = _resize(alpha, size).astype(np.float32) / 255.0
            item["alpha"] = alpha
            # blend against the background color (nerfstudio get_image)
            item["rgb"] = alpha[..., None] * rgb + (1 - alpha[..., None]) * self._bg

        if out.depth_paths is not None:
            from pathlib import Path

            from nersemble_tpu.utils.quantization import DepthQuantizer
            path = out.depth_paths[image_idx]
            if not Path(path).exists():
                depth = np.zeros((out.image_height, out.image_width), np.float32)
            else:
                quantized = iio.imread(path)
                depth = DepthQuantizer().decode(quantized).astype(np.float32)
                depth = _resize(depth, size, nearest=True).copy()
                outlier = (depth < 0.8) | (depth > 1.4)
                depth[outlier] = 0.0
                depth = depth * self.config.scale_factor
            item["depth"] = depth

        return item

    def _compress(self, item):
        if not self.config.use_cache_compression:
            return item
        item = dict(item)
        item["rgb"] = (item["rgb"] * 255).round().astype(np.uint8)
        return item

    def _uncompress(self, item):
        if not self.config.use_cache_compression:
            return item
        item = dict(item)
        item["rgb"] = item["rgb"].astype(np.float32) / 255.0
        return item

    def __getitem__(self, image_idx: int) -> Dict[str, np.ndarray]:
        if image_idx in self._cache:
            return self._uncompress(self._cache[image_idx])
        item = self._load_item(image_idx)
        limit = self.config.max_cached_items
        if limit == -1 or len(self._cache) < limit:
            self._cache[image_idx] = self._compress(item)
        return item
