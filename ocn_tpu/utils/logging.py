"""Scalar/metric logging — the reference uses TensorBoard SummaryWriter
(NeighborOverlap_large.py:258-261, 323-327).  This writer emits
TensorBoard-compatible output when the `torch.utils.tensorboard` package is
importable, and always appends a JSONL mirror (metrics.jsonl) so runs are
inspectable without TensorBoard."""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def scalars(self, tag: str, values: Dict[str, float], step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalars(tag, values, step)
        self._jsonl.write(
            json.dumps({"t": time.time(), "tag": tag, "step": step, **values}) + "\n"
        )
        self._jsonl.flush()

    def text(self, tag: str, value: str) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, value)
        self._jsonl.write(json.dumps({"t": time.time(), "tag": tag, "text": value}) + "\n")
        self._jsonl.flush()
