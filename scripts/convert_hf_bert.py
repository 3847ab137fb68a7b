#!/usr/bin/env python
"""Convert pretrained HuggingFace bert-base-cased weights into the
mmt_tpu text-BERT initialization checkpoint.

The reference ALWAYS builds its text tower from pretrained
bert-base-cased when txt_agg is bertftn/bertfrz (model/model.py:150-162,
``TxtBertModel.from_pretrained``) — only CENet itself is ever trained
from scratch.  In a zero-egress TPU environment the weights arrive as a
local HF checkpoint (pytorch_model.bin / model.safetensors) and this
script maps them onto our tree:

  python scripts/convert_hf_bert.py --hf_dir /path/to/bert-base-cased

The default output, ``data/txt_bert_init.msgpack``, is auto-loaded by
``train.py`` for every bertftn/bertfrz run (mirroring the reference's
unconditional from_pretrained); ``--out`` relocates it, and
``--txt_bert_init`` / ``MMT_TPU_TXT_BERT_INIT`` point train.py at a
non-default location.

The msgpack holds ``{"params": {"txt_bert": <subtree>}}`` — the same
top-level shape the warm-start loader merges (train/checkpoint.py:
merge_params), so the file also works via ``--load_checkpoint``.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.convert_checkpoint import convert_state_dict  # noqa: E402

logger = logging.getLogger("convert_hf_bert")

DEFAULT_OUT = os.path.join(os.path.dirname(__file__), "..", "data",
                           "txt_bert_init.msgpack")


def load_hf_state_dict(hf_dir):
  """Load a local HF BERT checkpoint (bin or safetensors)."""
  bin_path = os.path.join(hf_dir, "pytorch_model.bin")
  st_path = os.path.join(hf_dir, "model.safetensors")
  if os.path.exists(bin_path):
    import torch
    sd = torch.load(bin_path, map_location="cpu")
    return {k: v.numpy() for k, v in sd.items()}
  if os.path.exists(st_path):
    from safetensors.numpy import load_file
    return load_file(st_path)
  raise FileNotFoundError(f"no pytorch_model.bin/model.safetensors in {hf_dir}")


def hf_to_cenet_names(state_dict):
  """HF names ('bert.encoder...' or 'encoder...') -> 'txt_bert...'.

  Drops the MLM/NSP heads ('cls.*') and the pooler — the retrieval model
  never uses them (the reference's converter behavior too:
  model/model.py consumes sequence outputs only).
  """
  out = {}
  for key, val in state_dict.items():
    name = key
    if name.startswith("bert."):
      name = name[len("bert."):]
    if name.startswith("cls.") or name.startswith("pooler."):
      continue
    out[f"txt_bert.{name}"] = np.asarray(val)
  return out


def convert_hf_bert(state_dict, geometry=None):
  """HF state dict -> (txt_bert flax params subtree, unmapped names).

  ``geometry`` (a mmt_tpu.config.BertParams) defaults to bert-base-cased;
  tests pass tiny geometries.  Unmapped/shape-mismatched tensors are
  skipped loudly by convert_state_dict.
  """
  import jax
  from mmt_tpu.config import TEXT_BERT_BASE_CASED
  from mmt_tpu.models.bert import TextBert

  geometry = geometry or TEXT_BERT_BASE_CASED
  state_dict = hf_to_cenet_names(state_dict)

  model = TextBert(geometry)
  ids = np.zeros((1, 8), np.int32)
  variables = model.init(jax.random.PRNGKey(0), ids, np.ones_like(ids),
                         ids, np.tile(np.arange(8, dtype=np.int32), (1, 1)),
                         deterministic=True)

  # Reuse the CENet converter with the txt_bert prefix: wrap the target
  # tree one level deep so the mapped paths line up.
  params, _, unmapped = convert_state_dict(
      state_dict, {"txt_bert": variables["params"]}, {})
  return params["txt_bert"], unmapped


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--hf_dir", required=True)
  parser.add_argument("--out", default=DEFAULT_OUT,
                      help="output msgpack (default: the location train.py "
                           "auto-loads, data/txt_bert_init.msgpack)")
  args = parser.parse_args()
  logging.basicConfig(level=logging.INFO, format="%(message)s")

  tree, unmapped = convert_hf_bert(load_hf_state_dict(args.hf_dir))
  if unmapped:
    logger.warning("%d tensors had no mapping: %s", len(unmapped), unmapped)

  from flax import serialization
  out = os.path.abspath(args.out)
  os.makedirs(os.path.dirname(out), exist_ok=True)
  with open(out, "wb") as f:
    f.write(serialization.to_bytes({"params": {"txt_bert": tree}}))
  logger.info("wrote %s", out)


if __name__ == "__main__":
  main()
