"""Host-side ray batching: pixel sampling -> fixed-shape device-ready batches.

Replaces the reference's CacheDataloader + NeRSemblePixelSampler + RayGenerator
chain (reference: nersemble_datamanager.py:13-106, nersemble_pixel_sampler.py:
7-69): every batch samples ``num_rays`` pixels from a working set of images
(resampled every ``repeat`` batches), gathers per-pixel supervision (rgb,
alpha, depth) and per-image metadata (timestep index, cam id, image idx), and
generates viewer-frame pinhole rays — all in numpy, double-buffered by a
prefetch thread so the TPU never waits on the host.
"""

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from nersemble_tpu.config import DataConfig
from nersemble_tpu.data.dataparser import DataparserOutputs
from nersemble_tpu.data.dataset import NeRSembleDataset


def _rays_for_pixels(outputs: DataparserOutputs, cam_pos: np.ndarray,
                     ys: np.ndarray, xs: np.ndarray):
    """Vectorized pinhole rays for per-ray camera/pixel indices."""
    intr = outputs.intrinsics
    dirs_cam = np.stack([
        (xs + 0.5 - intr.cx) / intr.fx,
        -(ys + 0.5 - intr.cy) / intr.fy,
        -np.ones_like(xs, np.float64),
    ], axis=-1)
    rot = outputs.c2w[cam_pos, :3, :3]  # [R, 3, 3]
    dirs = np.einsum("rij,rj->ri", rot, dirs_cam)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = outputs.c2w[cam_pos, :3, 3]
    return origins.astype(np.float32), dirs.astype(np.float32)


class RayBatcher:
    """Infinite iterator of training ray batches."""

    def __init__(self, dataset: NeRSembleDataset, config: DataConfig,
                 num_rays: Optional[int] = None, seed: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.outputs = dataset.outputs
        self.config = config
        self.num_rays = num_rays or config.train_num_rays_per_batch
        self.images_per_set = min(config.train_num_images_to_sample_from,
                                  len(dataset))
        self.repeat = max(config.train_num_times_to_repeat_images, 1)
        self._rng = np.random.default_rng(seed)
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # -- batch construction --------------------------------------------------

    def _make_batch(self, image_indices: np.ndarray) -> Dict[str, np.ndarray]:
        out = self.outputs
        rng = self._rng
        R = self.num_rays
        H, W = out.image_height, out.image_width

        pick = rng.integers(0, len(image_indices), R)
        img_idx = image_indices[pick]
        ys = rng.integers(0, H, R)
        xs = rng.integers(0, W, R)

        items = {int(i): self.dataset[int(i)] for i in np.unique(img_idx)}
        rgb = np.empty((R, 3), np.float32)
        has_alpha = "alpha" in next(iter(items.values()))
        has_depth = "depth" in next(iter(items.values()))
        alpha = np.empty((R,), np.float32) if has_alpha else None
        depth = np.empty((R,), np.float32) if has_depth else None
        for i, item in items.items():
            sel = img_idx == i
            rgb[sel] = item["rgb"][ys[sel], xs[sel]]
            if has_alpha:
                alpha[sel] = item["alpha"][ys[sel], xs[sel]]
            if has_depth:
                depth[sel] = item["depth"][ys[sel], xs[sel]]

        entries = out.entries
        cam_pos = np.asarray([entries[int(i)].cam_pos for i in img_idx], np.int32)
        timesteps = np.asarray([entries[int(i)].timestep_index for i in img_idx],
                               np.int32)
        cam_ids = np.asarray([entries[int(i)].cam_id for i in img_idx], np.int32)

        origins, dirs = _rays_for_pixels(out, cam_pos, ys.astype(np.float64),
                                         xs.astype(np.float64))
        batch = {
            "origins": origins,
            "directions": dirs,
            "rgb": rgb,
            "timesteps": timesteps,
            "camera_indices": img_idx.astype(np.int32),
            "cam_ids": cam_ids,
            "pixel_ys": ys.astype(np.int32),
            "pixel_xs": xs.astype(np.int32),
        }
        if alpha is not None:
            batch["alpha"] = alpha
        if depth is not None:
            batch["depth"] = depth
        return batch

    def _generator(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        while True:
            image_indices = self._rng.choice(
                n, size=min(self.images_per_set, n), replace=False)
            for _ in range(self.repeat):
                yield self._make_batch(image_indices)

    # -- prefetch ------------------------------------------------------------

    def _worker(self):
        for batch in self._generator():
            if self._stop.is_set():
                return
            self._queue.put(batch)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        while True:
            yield self._queue.get()

    def stop(self):
        """Stop the prefetch thread. Keeps draining until the worker exits so
        a worker blocked in ``queue.put`` (queue full) is always released —
        a single drain could race with one final put."""
        self._stop.set()
        import time as _time
        while self._thread is not None and self._thread.is_alive():
            try:
                self._queue.get_nowait()
            except queue.Empty:
                _time.sleep(0.005)
            self._thread.join(timeout=0.05)


class EvalImageLoader:
    """Full-image ray generation for evaluation/render
    (reference: fixed_indices_eval_dataloader usage, evaluate_nersemble.py:133)."""

    def __init__(self, dataset: NeRSembleDataset):
        self.dataset = dataset
        self.outputs = dataset.outputs

    def __len__(self):
        return len(self.dataset)

    def image_rays(self, image_idx: int) -> Dict[str, np.ndarray]:
        out = self.outputs
        entry = out.entries[image_idx]
        H, W = out.image_height, out.image_width
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        ys, xs = ys.reshape(-1), xs.reshape(-1)
        cam_pos = np.full(ys.shape, entry.cam_pos, np.int32)
        origins, dirs = _rays_for_pixels(out, cam_pos, ys.astype(np.float64),
                                         xs.astype(np.float64))
        item = self.dataset[image_idx]
        batch = {
            "origins": origins,
            "directions": dirs,
            "timesteps": np.full(ys.shape, entry.timestep_index, np.int32),
            "camera_indices": np.full(ys.shape, image_idx, np.int32),
            "gt_rgb": item["rgb"],
            "entry": entry,
            "height": H,
            "width": W,
        }
        if "alpha" in item:
            batch["gt_alpha"] = item["alpha"]
        return batch
