"""Metrics/observability writer.

Replaces the reference's nerfstudio writer + wandb plumbing
(reference: nersemble_trainer.py:61-88, SURVEY.md section 5) with
dependency-light sinks:

- a JSONL event stream (``metrics.jsonl``) — always written when enabled;
- per-image PNG dumps under ``train_images/`` / ``eval_images/``;
- optionally TensorBoard (``vis="tensorboard"``, via torch's bundled
  SummaryWriter) mirroring every scalar and image.

Scalars include losses, metrics, window/scheduler params, throughput
(rays/s, samples/s), step timings, and device-memory gauges.
"""

import json
import time
from pathlib import Path
from typing import Dict

import numpy as np


class MetricsWriter:
    def __init__(self, run_dir, enabled: bool = True, mode: str = "csv"):
        self.run_dir = Path(run_dir)
        self.enabled = enabled
        self._file = None
        self._tb = None
        if enabled:
            self.run_dir.mkdir(parents=True, exist_ok=True)
            self._file = open(self.run_dir / "metrics.jsonl", "a", buffering=1)
            if mode == "tensorboard":
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(str(self.run_dir / "tensorboard"))
                except Exception as ex:  # tensorboard pkg missing
                    print(f"[nersemble-tpu] tensorboard unavailable ({ex}); "
                          f"falling back to JSONL only")
        self._start = time.time()

    def put_scalars(self, step: int, scalars: Dict[str, float],
                    prefix: str = "") -> None:
        if not self.enabled:
            return
        record = {"step": int(step), "wall": round(time.time() - self._start, 3)}
        for key, value in scalars.items():
            record[f"{prefix}{key}"] = float(value)
        self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for key, value in scalars.items():
                self._tb.add_scalar(f"{prefix}{key}", float(value), int(step))

    def put_image(self, step: int, name: str, image: np.ndarray,
                  group: str = "eval_images") -> None:
        """image: [H, W, 3] float in [0, 1] or uint8."""
        if not self.enabled:
            return
        import imageio.v3 as iio
        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).round().astype(np.uint8)
        path = self.run_dir / group / f"step-{step:09d}" / f"{name}.png"
        path.parent.mkdir(parents=True, exist_ok=True)
        iio.imwrite(path, image)
        if self._tb is not None:
            self._tb.add_image(f"{group}/{name}", image, int(step),
                               dataformats="HWC")

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


def device_memory_scalars() -> Dict[str, float]:
    """Device HBM gauges (TPU analogue of the reference's
    torch.cuda.max_memory_allocated logging, nersemble_trainer.py:82-84).
    Empty on backends that expose no memory_stats (e.g. CPU)."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        stats = None
    if not stats:
        return {}
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[f"memory/{key.replace('bytes', 'gib')}"] = \
                stats[key] / 2 ** 30
    return out


def param_count_summary(params) -> Dict[str, int]:
    """Per-top-level-key parameter counts + total (the reference prints a
    torchinfo model summary at startup, train_nersemble.py:277)."""
    import jax
    counts = {}
    for key, sub in params.items():
        counts[key] = sum(int(np.prod(leaf.shape))
                          for leaf in jax.tree_util.tree_leaves(sub))
    counts["total"] = sum(counts.values())
    return counts
