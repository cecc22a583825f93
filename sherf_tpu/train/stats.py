"""Training stats collection + logging.

Replaces the reference's training_stats collector + jsonl/tensorboard sinks
(torch_utils/training_stats.py, training_loop.py:604-617) with a simple
host-side accumulator: running means per metric since the last flush,
stats.jsonl lines, optional TensorBoard, and a stdout line every report
interval (the reference prints every 100 imgs, training_loop.py:441-448).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class StatsCollector:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "stats.jsonl"), "a")
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(run_dir)
            except Exception:
                self._tb = None
        self.start_time = time.time()

    def report(self, metrics: Dict, prefix: str = ""):
        for k, v in metrics.items():
            try:
                val = float(np.asarray(v))
            except Exception:
                continue
            self._sums[prefix + k] += val
            self._counts[prefix + k] += 1

    def flush(self, step: int) -> Dict[str, float]:
        means = {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}
        rec = {"step": int(step), "time": time.time() - self.start_time, **means}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in means.items():
                self._tb.add_scalar(k, v, step)
        self._sums.clear()
        self._counts.clear()
        return means

    def report_resources(self):
        """Host + device memory scalars (reference training_loop.py:509-511
        cpumem/gpumem via psutil/torch.cuda)."""
        try:
            import resource

            rss_gb = (resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                      / 2 ** 20)  # linux ru_maxrss is KiB
            self.report({"cpu_mem_gb": rss_gb}, prefix="Resources/")
        except Exception:
            pass
        try:
            import jax

            ms = jax.local_devices()[0].memory_stats() or {}
            if "bytes_in_use" in ms:
                self.report({"device_mem_gb": ms["bytes_in_use"] / 2 ** 30,
                             "device_peak_gb": ms.get(
                                 "peak_bytes_in_use", 0) / 2 ** 30},
                            prefix="Resources/")
        except Exception:
            pass

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
