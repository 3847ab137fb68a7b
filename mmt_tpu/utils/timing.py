"""Phase timers + perf log (utils/timing_utils.py:17-37,
utils/perf_log_utils.py:18-27 semantics) and a jax.profiler surface.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict


class AverageMeter:
  """Keyed val/sum/count/avg accumulator."""

  def __init__(self):
    self.dic: Dict[str, Dict[str, float]] = {}

  def update(self, key: str, val: float, n: int = 1):
    entry = self.dic.setdefault(key, {"val": 0.0, "sum": 0.0, "count": 0,
                                      "avg": 0.0})
    entry["val"] = val
    entry["sum"] += val * n
    entry["count"] += n
    entry["avg"] = entry["sum"] / entry["count"]

  def reset(self):
    self.dic = {}

  @contextlib.contextmanager
  def time(self, key: str):
    tic = time.time()
    try:
      yield
    finally:
      self.update(key, time.time() - tic)


def update_perf_log(entries: dict, path):
  """Append one line per epoch to the perf log."""
  with open(path, "a") as f:
    f.write(json.dumps(entries, default=str) + "\n")


@contextlib.contextmanager
def profiler_trace(logdir, enabled: bool = False):
  """jax.profiler trace around a region (TPU-side phase tracing; the
  analogue of the reference's wall-clock phase timers at device level)."""
  if not enabled:
    yield
    return
  import jax
  jax.profiler.start_trace(str(logdir))
  try:
    yield
  finally:
    jax.profiler.stop_trace()
