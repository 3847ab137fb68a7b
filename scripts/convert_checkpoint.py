#!/usr/bin/env python
"""Convert a reference torch checkpoint (.pth) to an mmt_tpu msgpack one.

Maps the reference CENet state dict (model/model.py + model/bert.py +
HuggingFace text BERT) onto the flax parameter tree:

  python scripts/convert_checkpoint.py --config <experiment.json> \
      --checkpoint MSRVTT_jsfusion_trainval.pth --out trained_model.msgpack

Covers: both BERTs (torch Linear [out,in] -> flax kernel [in,out]
transposes, LayerNorm weight/bias -> scale/bias), gated embedding units
with BatchNorm running stats -> the batch_stats collection, per-modality
dims reducers and MoE heads, NetVLAD clusters, and the vid_bert
position-embedding zero-pad transfer rule (base/base_trainer.py:391-406).
The reference's unused pooler weights are dropped.
"""

from __future__ import annotations

import argparse
import json
import logging
import re
import sys
from typing import Dict, Tuple

import numpy as np

logger = logging.getLogger("convert_checkpoint")


def _bert_layer_map(i: int, torch_prefix: str, ours_prefix: str,
                    ln_name: str) -> Dict[str, Tuple[str, bool]]:
  """Torch name -> (flax path, transpose) for one encoder layer.

  ln_name: 'LayerNorm' for HF text BERT, 'layer_norm' for the video BERT
  (model/bert.py attribute names).
  """
  t = f"{torch_prefix}.encoder.layer.{i}"
  o = f"{ours_prefix}/encoder/layer_{i}"
  out = {}
  for src, dst in (("attention.self.query", "query"),
                   ("attention.self.key", "key"),
                   ("attention.self.value", "value"),
                   ("attention.output.dense", "attn_out"),
                   ("intermediate.dense", "ffn_inter"),
                   ("output.dense", "ffn_out")):
    out[f"{t}.{src}.weight"] = (f"{o}/{dst}/kernel", True)
    out[f"{t}.{src}.bias"] = (f"{o}/{dst}/bias", False)
  for src, dst in ((f"attention.output.{ln_name}", "attn_ln"),
                   (f"output.{ln_name}", "ffn_ln")):
    out[f"{t}.{src}.weight"] = (f"{o}/{dst}/scale", False)
    out[f"{t}.{src}.bias"] = (f"{o}/{dst}/bias", False)
  return out


def build_name_map(state_dict: Dict[str, np.ndarray]):
  """Full torch-name -> (flax params path | batch-stats path, transpose)."""
  params_map: Dict[str, Tuple[str, bool]] = {}
  stats_map: Dict[str, str] = {}

  n_txt_layers = 1 + max((int(m.group(1)) for k in state_dict
                          for m in [re.match(
                              r"txt_bert\.encoder\.layer\.(\d+)\.", k)] if m),
                         default=-1)
  n_vid_layers = 1 + max((int(m.group(1)) for k in state_dict
                          for m in [re.match(
                              r"vid_bert\.encoder\.layer\.(\d+)\.", k)] if m),
                         default=-1)

  # Text BERT embeddings (HF naming).
  for src, dst in (("word_embeddings", "word_embeddings"),
                   ("position_embeddings", "position_embeddings"),
                   ("token_type_embeddings", "token_type_embeddings")):
    params_map[f"txt_bert.embeddings.{src}.weight"] = (
        f"txt_bert/{dst}/embedding", False)
  params_map["txt_bert.embeddings.LayerNorm.weight"] = (
      "txt_bert/embeddings_ln/scale", False)
  params_map["txt_bert.embeddings.LayerNorm.bias"] = (
      "txt_bert/embeddings_ln/bias", False)
  for i in range(n_txt_layers):
    params_map.update(_bert_layer_map(i, "txt_bert", "txt_bert", "LayerNorm"))

  # Video BERT (model/bert.py naming: layer_norm).
  for src in ("position_embeddings", "token_type_embeddings"):
    params_map[f"vid_bert.embeddings.{src}.weight"] = (
        f"vid_bert/{src}/embedding", False)
  params_map["vid_bert.embeddings.layer_norm.weight"] = (
      "vid_bert/embeddings_ln/scale", False)
  params_map["vid_bert.embeddings.layer_norm.bias"] = (
      "vid_bert/embeddings_ln/bias", False)
  for i in range(n_vid_layers):
    params_map.update(_bert_layer_map(i, "vid_bert", "vid_bert",
                                      "layer_norm"))

  # Per-modality heads + misc linear modules.
  for key in state_dict:
    m = re.match(r"video_dim_reduce\.(\w+)\.fc\.(weight|bias)", key)
    if m:
      mod, wb = m.groups()
      params_map[key] = (f"video_dim_reduce_{mod}/fc/"
                         f"{'kernel' if wb == 'weight' else 'bias'}",
                         wb == "weight")
    m = re.match(r"text_GU\.(\w+)\.fc\.(weight|bias)", key)
    if m:
      mod, wb = m.groups()
      params_map[key] = (f"text_gu_{mod}/fc/"
                         f"{'kernel' if wb == 'weight' else 'bias'}",
                         wb == "weight")
    m = re.match(r"text_GU\.(\w+)\.cg\.fc\.(weight|bias)", key)
    if m:
      mod, wb = m.groups()
      params_map[key] = (f"text_gu_{mod}/cg/fc/"
                         f"{'kernel' if wb == 'weight' else 'bias'}",
                         wb == "weight")
    m = re.match(r"text_GU\.(\w+)\.cg\.batch_norm\.(\w+)", key)
    if m:
      mod, stat = m.groups()
      base = f"text_gu_{mod}/cg/batch_norm/bn"
      if stat == "weight":
        params_map[key] = (f"{base}/scale", False)
      elif stat == "bias":
        params_map[key] = (f"{base}/bias", False)
      elif stat == "running_mean":
        stats_map[key] = f"{base}/mean"
      elif stat == "running_var":
        stats_map[key] = f"{base}/var"
    m = re.match(r"video_GU\.(\w+)\.cg\.fc\.(weight|bias)", key)
    if m:
      mod, wb = m.groups()
      params_map[key] = (f"video_gu_{mod}/cg/fc/"
                         f"{'kernel' if wb == 'weight' else 'bias'}",
                         wb == "weight")
    m = re.match(r"video_GU\.(\w+)\.cg\.(batch_norm2?)\.(\w+)", key)
    if m:
      # Collaborative-gating reasoning path: batch_norm gates the mask,
      # batch_norm2 gates Wx (model/model.py:765-786).
      mod, bn, stat = m.groups()
      base = f"video_gu_{mod}/cg/{bn}/bn"
      if stat == "weight":
        params_map[key] = (f"{base}/scale", False)
      elif stat == "bias":
        params_map[key] = (f"{base}/bias", False)
      elif stat == "running_mean":
        stats_map[key] = f"{base}/mean"
      elif stat == "running_var":
        stats_map[key] = f"{base}/var"
    m = re.match(r"([gf]_reason_[12])\.(weight|bias)", key)
    if m:
      name, wb = m.groups()
      params_map[key] = (f"{name}/{'kernel' if wb == 'weight' else 'bias'}",
                         wb == "weight")
    m = re.match(r"text_pooling\.fc\.(weight|bias)", key)
    if m:
      wb = m.group(1)
      params_map[key] = (f"text_pooling/fc/"
                         f"{'kernel' if wb == 'weight' else 'bias'}",
                         wb == "weight")
    # Pseudo-keys emitted by _split_lstm_tensors (torch fuses the 4 LSTM
    # gates into one tensor; flax OptimizedLSTMCell keeps them separate).
    m = re.match(r"text_pooling\.lstm\.l(\d+)\.([ih][ifgo])\.(kernel|bias)",
                 key)
    if m:
      layer, gate, leaf = m.groups()
      params_map[key] = (
          f"text_pooling/OptimizedLSTMCell_{layer}/{gate}/{leaf}",
          leaf == "kernel")
    m = re.match(r"moe_fc_(txt|vid)\.(\w+)\.(weight|bias)", key)
    if m:
      kind, mod, wb = m.groups()
      params_map[key] = (f"moe_fc_{kind}_{mod}/"
                         f"{'kernel' if wb == 'weight' else 'bias'}",
                         wb == "weight")
    m = re.match(r"text_pooling\.clusters(2?)$", key)
    if m:
      params_map[key] = (f"text_pooling/clusters{m.group(1)}", False)
    m = re.match(r"text_pooling\.batch_norm\.(\w+)", key)
    if m:
      stat = m.group(1)
      base = "text_pooling/batch_norm/bn"
      if stat == "weight":
        params_map[key] = (f"{base}/scale", False)
      elif stat == "bias":
        params_map[key] = (f"{base}/bias", False)
      elif stat == "running_mean":
        stats_map[key] = f"{base}/mean"
      elif stat == "running_var":
        stats_map[key] = f"{base}/var"
    m = re.match(r"word_embeddings\.word_embeddings\.weight", key)
    if m:
      params_map[key] = ("word_embeddings/word_embeddings", False)

  return params_map, stats_map


def _set_path(tree: dict, path: str, value: np.ndarray, label: str):
  keys = path.split("/")
  node = tree
  for k in keys[:-1]:
    if k not in node:
      logger.warning("%s: target path %s missing (skipped)", label, path)
      return False
    node = node[k]
  leaf = keys[-1]
  if leaf not in node:
    logger.warning("%s: target leaf %s missing (skipped)", label, path)
    return False
  tgt = np.asarray(node[leaf])
  if tgt.shape != value.shape:
    logger.warning("%s: shape mismatch at %s (%s vs %s; skipped)", label,
                   path, value.shape, tgt.shape)
    return False
  node[leaf] = value.astype(tgt.dtype)
  return True


def _split_lstm_tensors(state_dict: Dict[str, np.ndarray]):
  """Split torch's fused LSTM tensors into per-gate pseudo-keys.

  torch nn.LSTM stores weight_ih_l<k> [4H, in] / weight_hh_l<k> [4H, H]
  with gate rows ordered (i, f, g, o), and two bias vectors whose SUM is
  the effective gate bias.  flax OptimizedLSTMCell keeps one dense per
  gate (ii/if/ig/io input-side, no bias; hi/hf/hg/ho hidden-side, bias).
  Both use i=sigmoid, f=sigmoid, g=tanh, o=sigmoid with c' = f*c + i*g,
  so a per-chunk copy is exact (model/lstm.py:19-71).
  """
  gates = ("i", "f", "g", "o")
  out = dict(state_dict)
  for key in list(state_dict):
    m = re.match(r"text_pooling\.lstm\.(weight|bias)_(ih|hh)_l(\d+)$", key)
    if not m:
      continue
    kind, side, layer = m.groups()
    arr = np.asarray(out.pop(key))
    h = arr.shape[0] // 4
    prefix = "i" if side == "ih" else "h"
    for gi, gate in enumerate(gates):
      chunk = arr[gi * h:(gi + 1) * h]
      if kind == "weight":
        out[f"text_pooling.lstm.l{layer}.{prefix}{gate}.kernel"] = chunk
      else:
        # Effective bias = bias_ih + bias_hh, stored on the hidden-side
        # dense (the input-side flax dense has no bias).
        name = f"text_pooling.lstm.l{layer}.h{gate}.bias"
        out[name] = out.get(name, 0) + chunk
  return out


def convert_state_dict(state_dict: Dict[str, np.ndarray], params: dict,
                       batch_stats: dict):
  """Fill (a deep copy of) the flax trees from the torch state dict.

  Returns (params, batch_stats, unmapped) where unmapped lists state-dict
  tensors that had no live mapping (pooler / bookkeeping names excluded).
  """
  import copy
  params = copy.deepcopy(jax_to_numpy(params))
  batch_stats = copy.deepcopy(jax_to_numpy(batch_stats))
  state_dict = _split_lstm_tensors(state_dict)
  params_map, stats_map = build_name_map(state_dict)

  # Position-embedding transfer rule before shape checks.
  key = "vid_bert.embeddings.position_embeddings.weight"
  if key in state_dict:
    try:
      tgt = params["vid_bert"]["position_embeddings"]["embedding"]
      src = state_dict[key]
      if src.shape[0] < tgt.shape[0]:
        pad = np.zeros((tgt.shape[0] - src.shape[0], src.shape[1]),
                       src.dtype)
        state_dict[key] = np.concatenate([src, pad], 0)
        logger.warning("zero-padded vid position embeddings %s -> %s",
                       src.shape, tgt.shape)
    except KeyError:
      pass

  used, skipped = 0, []
  for name, arr in state_dict.items():
    arr = np.asarray(arr)
    if name in params_map:
      path, transpose = params_map[name]
      if _set_path(params, path, arr.T if transpose else arr, name):
        used += 1
    elif name in stats_map:
      if _set_path(batch_stats, stats_map[name], arr, name):
        used += 1
    else:
      skipped.append(name)
  unmapped = [name for name in skipped
              if "pooler" not in name and "num_batches_tracked" not in name]
  for name in unmapped:
    logger.warning("no mapping for %s", name)
  logger.info("converted %d tensors (%d without mapping)", used,
              len(skipped))
  return params, batch_stats, unmapped


def jax_to_numpy(tree):
  import jax
  return jax.tree_util.tree_map(np.asarray, tree)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--config", required=True)
  parser.add_argument("--checkpoint", required=True, help=".pth file")
  parser.add_argument("--out", required=True, help="output .msgpack")
  args = parser.parse_args()

  logging.basicConfig(level=logging.INFO, format="%(message)s")

  import torch
  ckpt = torch.load(args.checkpoint, map_location="cpu")
  state_dict = {k: v.numpy() for k, v in ckpt["state_dict"].items()}

  import jax
  from mmt_tpu import config as config_lib
  from mmt_tpu.experts import compute_dims
  from mmt_tpu.models.cenet import CENet
  from mmt_tpu.train import checkpoint as ckpt_lib

  cfg = config_lib.load(args.config)
  expert_dims = compute_dims(cfg.raw)
  model = CENet(expert_dims=expert_dims, **cfg.arch_args)

  # Shape-only init from a dummy batch.
  from tests.conftest import make_batch  # reuse the schema builder
  batch = make_batch(expert_dims, b=2, k=1, t=8, l=4, vocab=28996)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)

  params, batch_stats, _ = convert_state_dict(
      state_dict, variables["params"], variables.get("batch_stats", {}))

  state = {
      "params": params,
      "batch_stats": batch_stats,
      "epoch": int(ckpt.get("epoch", 0)),
      "monitor_best": float(ckpt.get("monitor_best", 0) or 0),
      "n_samples": int(ckpt.get("n_samples", 0)),
      "n_steps": int(ckpt.get("n_steps", 0)),
      "config": json.dumps({}),
      "arch": "CENet",
  }
  from flax import serialization
  with open(args.out, "wb") as f:
    f.write(serialization.to_bytes(state))
  logger.info("wrote %s", args.out)


if __name__ == "__main__":
  main()
