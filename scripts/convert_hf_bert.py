#!/usr/bin/env python
"""Convert pretrained HuggingFace bert-base-cased weights into the
mmt_tpu TextBert parameter tree.

The reference finetunes HF's pretrained text tower
(model/model.py:161-162); in a zero-egress TPU environment the weights
arrive as a local HF checkpoint (pytorch_model.bin / model.safetensors)
and this script maps them onto our tree:

  python scripts/convert_hf_bert.py --hf_dir /path/to/bert-base-cased \
      --out txt_bert_params.msgpack

The output msgpack holds {"params": <txt_bert subtree>} and can be merged
into a CENet checkpoint or loaded at model build time.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.convert_checkpoint import build_name_map, convert_state_dict  # noqa: E402

logger = logging.getLogger("convert_hf_bert")


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
  """HF names ('bert.encoder...' or 'encoder...') -> 'txt_bert...'."""
  out = {}
  for key, val in state_dict.items():
    name = key
    if name.startswith("bert."):
      name = name[len("bert."):]
    if name.startswith("cls.") or name.startswith("pooler."):
      continue
    out[f"txt_bert.{name}"] = np.asarray(val)
  return out


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--hf_dir", required=True)
  parser.add_argument("--out", required=True)
  args = parser.parse_args()
  logging.basicConfig(level=logging.INFO, format="%(message)s")

  import jax
  from mmt_tpu.config import TEXT_BERT_BASE_CASED
  from mmt_tpu.models.bert import TextBert

  state_dict = hf_to_cenet_names(load_hf_state_dict(args.hf_dir))

  model = TextBert(TEXT_BERT_BASE_CASED)
  ids = np.zeros((1, 8), np.int32)
  variables = model.init(jax.random.PRNGKey(0), ids, np.ones_like(ids),
                         ids, np.tile(np.arange(8, dtype=np.int32), (1, 1)),
                         deterministic=True)

  # Reuse the CENet converter with the txt_bert prefix: wrap the target
  # tree one level deep so the mapped paths line up.
  params, _, _ = convert_state_dict(state_dict,
                                 {"txt_bert": variables["params"]}, {})
  from flax import serialization
  with open(args.out, "wb") as f:
    f.write(serialization.to_bytes({"params": params["txt_bert"]}))
  logger.info("wrote %s", args.out)


if __name__ == "__main__":
  main()
