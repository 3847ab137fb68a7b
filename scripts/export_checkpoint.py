#!/usr/bin/env python
"""Export an mmt_tpu msgpack checkpoint to a reference-loadable .pth.

The inverse of convert_checkpoint.py — lets a user move a model trained in
this framework back into gabeur/mmt (or any torch re-implementation using
the reference's state-dict names):

  python scripts/export_checkpoint.py --checkpoint trained_model.msgpack \
      --out trained_model.pth [--config <experiment.json>]

The emitted file matches the reference's own save format
(base/base_trainer.py:348-374): {'arch', 'epoch', 'state_dict',
'monitor_best', 'config', 'n_samples', 'n_steps'}, with torch tensors in
state_dict, synthesized (unused) pooler weights, num_batches_tracked
counters and the transformers-3.1.0 position_ids buffer so
`load_state_dict(strict=True)` succeeds, and no optimizer state (the
reference only reads it on resume, guarded at base/base_trainer.py:442).

Every exported tensor is pushed back through the forward name map as a
self-check; leaves with no reference-side name abort the export unless
--allow-unexported is given.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger("export_checkpoint")


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--checkpoint", required=True, help="input .msgpack")
  parser.add_argument("--out", required=True, help="output .pth")
  parser.add_argument("--config", default=None,
                      help="experiment JSON embedded as the checkpoint's "
                      "'config' (reference arch-match warning only); "
                      "defaults to the config stored in the msgpack")
  parser.add_argument("--allow-unexported", action="store_true",
                      help="warn (instead of abort) on flax leaves with no "
                      "reference-side name")
  args = parser.parse_args()
  logging.basicConfig(level=logging.INFO, format="%(message)s")

  from convert_checkpoint import export_state_dict  # noqa: E402 (sibling)
  from mmt_tpu.train import checkpoint as ckpt_lib

  state = ckpt_lib.load_checkpoint_raw(args.checkpoint)
  sd, unexported = export_state_dict(state["params"],
                                     state.get("batch_stats", {}) or {})
  if unexported:
    for path in unexported:
      logger.warning("no reference-side name for %s", path)
    if not args.allow_unexported:
      logger.error("%d leaves not exported; the reference could not load "
                   "this strictly (pass --allow-unexported to force)",
                   len(unexported))
      sys.exit(1)

  if args.config is not None:
    with open(args.config) as f:
      config = json.load(f)
  else:
    stored = state.get("config")
    if isinstance(stored, dict):
      config = stored
    else:
      try:
        config = json.loads(stored) if stored else None
      except (TypeError, ValueError):
        config = None
  if not isinstance(config, dict) or "arch" not in config:
    # The reference resume reads checkpoint['config']['arch'] (and on
    # restart ['optimizer']['type'] / ['lr_scheduler']['type'])
    # UNCONDITIONALLY (base/base_trainer.py:408-441) — emitting a file
    # without a usable config would crash it before any weights load.
    logger.error("no usable experiment config (with an 'arch' entry) "
                 "stored in the msgpack; pass --config <experiment.json>")
    sys.exit(1)

  import numpy as np
  import torch

  def to_torch(a):
    try:
      return torch.from_numpy(a.copy())
    except TypeError:  # e.g. bfloat16 leaves from a mixed-precision run
      return torch.from_numpy(np.asarray(a, np.float32))

  out = {
      "arch": state.get("arch", "CENet"),
      "epoch": int(state.get("epoch", 0)),
      "state_dict": {k: to_torch(v) for k, v in sd.items()},
      "monitor_best": float(state.get("monitor_best", 0) or 0),
      "config": config,
      # The reference resume reads both unconditionally
      # (base/base_trainer.py:414-415).
      "n_samples": int(state.get("n_samples", 0) or 0),
      "n_steps": int(state.get("n_steps", 0) or 0),
  }
  torch.save(out, args.out)
  logger.info("wrote %s (%d tensors, epoch %d)", args.out, len(sd),
              out["epoch"])


if __name__ == "__main__":
  main()
