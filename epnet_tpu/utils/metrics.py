"""Scalar metrics logging.

The reference logs every loss component, lr and bn momentum to tensorboardX
(``train_utils.py:182,208-212``). Here the writer is dependency-free: a
JSONL stream (one record per step) plus an optional TensorBoard event
writer when `tensorboardX`/`torch.utils.tensorboard` happens to be
installed. JSONL is the source of truth — trivially greppable/plottable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class SummaryWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, 'scalars.jsonl'), 'a', buffering=1)
        self._tb = None
        try:  # optional TF-events mirror
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._tb = TBWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({'t': time.time(), 'tag': tag,
                                  'value': float(value), 'step': int(step)}) + '\n')
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
