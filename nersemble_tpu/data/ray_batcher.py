"""Host-side ray batching: pixel sampling -> fixed-shape device-ready batches.

Replaces the reference's CacheDataloader + NeRSemblePixelSampler + RayGenerator
chain (reference: nersemble_datamanager.py:13-106, nersemble_pixel_sampler.py:
7-69): every batch samples ``num_rays`` pixels from a working set of images
(resampled every ``repeat`` batches), gathers per-pixel supervision (rgb,
alpha, depth) and per-image metadata (timestep index, cam id, image idx), and
generates viewer-frame pinhole rays — all in numpy, double-buffered by a
prefetch thread so the TPU never waits on the host.

Batches are STATELESS in the training step: batch(step) is a pure function of
(seed, step) — the per-step pixel RNG and the per-set image selection are both
derived by seeding a fresh generator with the step / set index, never by
advancing a persistent stream. This is what makes checkpoint resume
trajectory-exact: a run resumed at step k sees bit-identical batches to the
run that never crashed (round-4 finding: the old persistent-stream batcher
restarted its stream from zero on resume, the one piece of training state the
checkpoint could not capture).
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
        self.seed = seed
        self._set_cache = None  # (set_idx, image_indices)
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # -- step-indexed RNG derivation ------------------------------------------

    def _step_rng(self, step: int) -> np.random.Generator:
        """Fresh generator for one step's pixel sampling (pure in (seed, step))."""
        return np.random.default_rng([self.seed, 0x9E3779B9, step])

    def _image_set(self, set_idx: int) -> np.ndarray:
        """The working image set for steps [set_idx*repeat, (set_idx+1)*repeat)
        (reference: CacheDataloader resampling 24 images every 20 iterations,
        nersemble_datamanager.py + train_nersemble.py:153). Pure in
        (seed, set_idx); cached because consecutive steps share a set."""
        if self._set_cache is not None and self._set_cache[0] == set_idx:
            return self._set_cache[1]
        rng = np.random.default_rng([self.seed, 0x5DEECE66, set_idx])
        n = len(self.dataset)
        image_indices = rng.choice(n, size=min(self.images_per_set, n),
                                   replace=False)
        self._set_cache = (set_idx, image_indices)
        return image_indices

    # -- batch construction --------------------------------------------------

    def _make_batch(self, image_indices: np.ndarray,
                    rng: np.random.Generator) -> Dict[str, np.ndarray]:
        out = self.outputs
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

    def batch_for_step(self, step: int) -> Dict[str, np.ndarray]:
        """The batch the training loop consumes at ``step`` — pure function."""
        return self._make_batch(self._image_set(step // self.repeat),
                                self._step_rng(step))

    def _generator(self, start_step: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        step = start_step
        while True:
            yield self.batch_for_step(step)
            step += 1

    # -- prefetch ------------------------------------------------------------

    def _worker(self, start_step: int):
        for batch in self._generator(start_step):
            if self._stop.is_set():
                return
            self._queue.put(batch)

    def iter_from(self, start_step: int) -> Iterator[Dict[str, np.ndarray]]:
        """Prefetched batch stream beginning at ``start_step`` (resume picks
        up the exact batch sequence the crashed run would have seen)."""
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker,
                                            args=(start_step,), daemon=True)
            self._thread.start()
        while True:
            yield self._queue.get()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.iter_from(0)

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
