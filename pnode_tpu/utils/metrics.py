"""Scalar metrics writer: TensorBoard if available, JSONL always.

The reference logs Train/Loss, gradient norms, NFE and memory to TensorBoard
(/root/reference/examples-pnode/ROBER.py:442-443,
/root/reference/examples-sinode/KS/KS.py:626-630). tensorboardX may be
absent here, so every scalar is also appended to ``metrics.jsonl`` —
machine-readable for the same sweep-aggregation purposes.
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        rec = {"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
