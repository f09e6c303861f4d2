"""Scalar logging: TensorBoard + JSONL.

Replaces the reference's Lightning TensorBoard logging (self.log /
add_scalars, e.g. m2track.py:250-263) with a writer that is framework-free:
always appends JSONL (machine-readable history) and mirrors to TensorBoard
when the `tensorboard` package is importable. `tensorboard --logdir <dir>`
works exactly as the reference README describes (README.md:133-136).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class ScalarLogger:
    def __init__(self, log_dir: str, enable_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.jsonl_path = os.path.join(log_dir, "scalars.jsonl")
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception as e:
                print(
                    f"[logging] TensorBoard unavailable ({type(e).__name__}); "
                    "scalars go to scalars.jsonl only"
                )
                self._tb = None

    def log_scalars(self, scalars: Dict[str, float], step: int, prefix: str = ""):
        record = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}" if prefix else k
            v = float(v)
            record[key] = v
            if self._tb is not None:
                self._tb.add_scalar(key, v, step)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
