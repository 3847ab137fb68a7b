"""Checkpointing: atomic msgpack pytree saves with the reference's resume
semantics.

Reproduces base/base_trainer.py:346-464 and utils/util.py:71-82:
* state = {params, batch_stats, opt_state?, epoch, n_samples, n_steps,
  monitor_best, config, arch} saved crash-safe via tmp + os.rename;
* best-model copy ``trained_model.msgpack``;
* stale-checkpoint purge keeping the newest ``num_keep_ckpts``;
* restart (same exp dir) = strict load incl. optimizer + counters;
  warm start (--load_checkpoint) = non-strict param merge, counters reset;
* cross-config transfer zero-pads ``vid_bert`` position-embedding rows so
  a 32-slot pretrain loads into a 102-slot finetune model
  (base/base_trainer.py:391-406).
"""

from __future__ import annotations

import concurrent.futures
import logging
import os
import pathlib
import re
import time
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)

# msgpack only: a reference-style .pth in the exp dir cannot be loaded
# by this runtime (convert it first, scripts/convert_checkpoint.py), so
# auto-resume must never pick one up.
CKPT_RE = r"checkpoint-epoch(\d+)\.msgpack$"


def _atomic_write(path, data: bytes):
  # pid-unique tmp name: checkpoint writes are gated to process 0 of a
  # multi-host run (trainer._save_checkpoint), but a stray concurrent
  # writer (e.g. an operator-launched eval job) must corrupt nothing.
  tmp = f"{path}._{os.getpid()}_tmp"
  with open(tmp, "wb") as f:
    f.write(data)
  os.rename(tmp, path)


def save_checkpoint(ckpt_dir, state: Dict[str, Any], epoch: int,
                    save_best: bool = False) -> str:
  """Serialize the state pytree; optionally refresh trained_model."""
  ckpt_dir = pathlib.Path(ckpt_dir)
  ckpt_dir.mkdir(parents=True, exist_ok=True)
  blob = serialization.to_bytes(state)
  path = ckpt_dir / f"checkpoint-epoch{epoch}.msgpack"
  tic = time.time()
  _atomic_write(path, blob)
  logger.info("Saved checkpoint %s in %.3fs", path, time.time() - tic)
  if save_best:
    _atomic_write(ckpt_dir / "trained_model.msgpack", blob)
  return str(path)


class AsyncCheckpointWriter:
  """Overlap checkpoint encode+write with the next epoch's compute.

  The reference blocks the training loop on ``torch.save`` every epoch
  (base/base_trainer.py:346-369).  Here the caller fetches the state to
  HOST memory first (device buffers are donated by the next train step,
  so the snapshot must complete before training resumes), then hands the
  host tree to a single background worker that does the msgpack encode
  and the atomic write — the expensive, device-independent half.

  Ordering and safety:
  * one worker thread, one job in flight: each ``save``/``purge`` first
    joins the previous job, so host memory is bounded at ~2 state copies
    and on-disk effects happen in submission order (a purge submitted
    after a save always sees the save's file);
  * worker exceptions are re-raised at the NEXT ``save``/``purge``/
    ``flush`` — a failed write cannot be silently lost;
  * ``flush()`` must be called before any read of the files (end of
    ``train()``, before final-eval checkpoint load, preemption exit).

  ``async_enabled=False`` degrades to the synchronous inline behavior.
  """

  def __init__(self, async_enabled: bool = True):
    self._pool = (concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="ckpt-writer")
                  if async_enabled else None)
    self._pending: Optional[concurrent.futures.Future] = None

  def _submit(self, fn):
    if self._pool is None:
      fn()
      return
    self.flush()
    self._pending = self._pool.submit(fn)

  def save(self, ckpt_dir, host_state: Dict[str, Any], epoch: int,
           save_best: bool = False):
    """Encode+write ``host_state`` in the background.

    ``host_state`` leaves must already be host arrays (np.ndarray) — the
    caller owns the device->host fetch; see Trainer._save_checkpoint.
    """
    self._submit(lambda: save_checkpoint(ckpt_dir, host_state, epoch,
                                         save_best=save_best))

  def purge(self, ckpt_dir, num_keep: int = 1):
    self._submit(lambda: purge_stale_checkpoints(ckpt_dir, num_keep))

  def flush(self):
    """Join the in-flight write; re-raise its exception, if any."""
    if self._pending is not None:
      pending, self._pending = self._pending, None
      pending.result()


def load_checkpoint_raw(path) -> Dict[str, Any]:
  """Deserialize without a target (nested dicts of arrays)."""
  with open(path, "rb") as f:
    return serialization.msgpack_restore(f.read())


def last_checkpoint(exp_dir) -> Optional[str]:
  """Highest-epoch checkpoint in a directory (utils/util.py:71-82)."""
  best, best_epoch = None, -1
  if not os.path.isdir(exp_dir):
    return None
  for fname in os.listdir(exp_dir):
    m = re.search(CKPT_RE, fname)
    if m and int(m.group(1)) > best_epoch:
      best_epoch = int(m.group(1))
      best = os.path.join(exp_dir, fname)
  return best


def purge_stale_checkpoints(ckpt_dir, num_keep: int = 1):
  """Drop all but the newest ``num_keep`` epoch checkpoints
  (base/base_trainer.py:299-323; trained_model is never purged)."""
  ckpt_dir = pathlib.Path(ckpt_dir)
  found = []
  for p in ckpt_dir.glob("checkpoint-epoch*.msgpack"):
    m = re.search(CKPT_RE, str(p))
    if m:
      found.append((int(m.group(1)), p))
  for epoch, path in sorted(found, key=lambda x: -x[0])[num_keep:]:
    path.unlink()
    logger.info("removed stale ckpt [epoch %d]", epoch)


def match_checkpoint_to_model(loaded_params, target_params):
  """Zero-pad vid_bert position embeddings on row-count mismatch
  (base/base_trainer.py:391-406 transfer rule)."""
  try:
    emb = loaded_params["vid_bert"]["position_embeddings"]["embedding"]
    tgt = target_params["vid_bert"]["position_embeddings"]["embedding"]
  except (KeyError, TypeError):
    return loaded_params
  if emb.shape != tgt.shape and emb.shape[0] < tgt.shape[0]:
    pad = np.zeros((tgt.shape[0] - emb.shape[0], emb.shape[1]), emb.dtype)
    loaded_params["vid_bert"]["position_embeddings"]["embedding"] = (
        np.concatenate([np.asarray(emb), pad], axis=0))
    logger.warning("vid_bert position embeddings zero-padded %s -> %s",
                   emb.shape, tgt.shape)
  return loaded_params


def merge_params(target, loaded, path="", stats=None):
  """Non-strict merge: copy loaded leaves whose path+shape match target
  (torch load_state_dict(strict=False) semantics for warm starts).

  ``stats`` (optional dict) gets ``stats["matched"]`` incremented per
  successfully copied leaf and ``stats["skipped"]`` (a list of paths)
  appended per kept-init leaf — callers that must fail loudly on an
  incomplete load (e.g. txt_bert_init) check those afterwards.
  """
  def _skip(leaf_path, target_leaf, why):
    logger.warning("warm start: %s at %s (kept init)", why, leaf_path)
    if stats is not None:
      # A missing KEY can hide a whole subtree; record one skipped entry
      # per LEAF so "N leaves kept their random init" messages (strict
      # loaders: trainer._load_txt_bert_init, scripts/serve.py) count
      # leaves, not dict keys.
      if isinstance(target_leaf, dict):
        def _walk(node, p):
          if isinstance(node, dict):
            for k, v in node.items():
              _walk(v, f"{p}/{k}")
          else:
            stats.setdefault("skipped", []).append(p)
        _walk(target_leaf, leaf_path)
      else:
        stats.setdefault("skipped", []).append(leaf_path)
    return target_leaf

  if isinstance(target, dict):
    out = {}
    for key, tgt_val in target.items():
      if isinstance(loaded, dict) and key in loaded:
        out[key] = merge_params(tgt_val, loaded[key], f"{path}/{key}", stats)
      else:
        out[key] = _skip(f"{path}/{key}", tgt_val, "missing")
    return out
  loaded_arr = np.asarray(loaded)
  if hasattr(target, "shape") and loaded_arr.shape == target.shape:
    if stats is not None:
      stats["matched"] = stats.get("matched", 0) + 1
    return loaded_arr.astype(np.asarray(target).dtype)
  return _skip(path, target,
               f"shape mismatch ({getattr(loaded_arr, 'shape', None)} vs "
               f"{getattr(target, 'shape', None)})")


def write_info(exp_dir, resume_path, epoch):
  """Provenance note for warm starts (base/base_trainer.py:459-462)."""
  with open(pathlib.Path(exp_dir) / "info_checkpoint.txt", "a") as f:
    f.write(f"This experiment is based on the checkpoint {resume_path} "
            f"loaded at epoch {epoch}\n")
