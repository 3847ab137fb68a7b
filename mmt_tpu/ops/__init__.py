"""TPU ops: fused FFN block, attention, similarity, ranking."""

from __future__ import annotations

import os


def enable_tpu_default_kernels() -> None:
  """Turn on the measured-faster Pallas kernels when running on TPU.

  Called by the runtime entry points (train.py, serving, bench).  Each
  kernel can be vetoed with its env var (MMT_TPU_PALLAS_SIMILARITY=0,
  MMT_TPU_PALLAS_FFN=0); on non-TPU backends the ops fall back to their
  XLA paths regardless, so this is a no-op there.
  """
  import jax

  if jax.default_backend() != "tpu":
    return
  from mmt_tpu.ops import ffn, similarity
  if os.environ.get("MMT_TPU_PALLAS_SIMILARITY", "1") == "1":
    similarity.use_pallas(True)
  if os.environ.get("MMT_TPU_PALLAS_FFN", "1") == "1":
    ffn.use_pallas(True)
