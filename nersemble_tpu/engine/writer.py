"""Metrics/observability writer.

Replaces the reference's nerfstudio writer + wandb plumbing
(reference: nersemble_trainer.py:61-88, SURVEY.md section 5) with dependency-free
sinks: a JSONL event stream (``metrics.jsonl``) and per-image PNG dumps under
``train_images/`` / ``eval_images/`` in the run folder. Scalars include losses,
metrics, window/scheduler params, throughput (rays/s, samples/s), and step
timings. TensorBoard can be layered on by tailing the JSONL.
"""

import json
import time
from pathlib import Path
from typing import Dict

import numpy as np


class MetricsWriter:
    def __init__(self, run_dir, enabled: bool = True):
        self.run_dir = Path(run_dir)
        self.enabled = enabled
        self._file = None
        if enabled:
            self.run_dir.mkdir(parents=True, exist_ok=True)
            self._file = open(self.run_dir / "metrics.jsonl", "a", buffering=1)
        self._start = time.time()

    def put_scalars(self, step: int, scalars: Dict[str, float],
                    prefix: str = "") -> None:
        if not self.enabled:
            return
        record = {"step": int(step), "wall": round(time.time() - self._start, 3)}
        for key, value in scalars.items():
            record[f"{prefix}{key}"] = float(value)
        self._file.write(json.dumps(record) + "\n")

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

    def close(self) -> None:
        if self._file:
            self._file.close()
