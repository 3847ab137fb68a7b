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
              if "pooler" not in name and "num_batches_tracked" not in name
              and not name.endswith("position_ids")]
  for name in unmapped:
    logger.warning("no mapping for %s", name)
  logger.info("converted %d tensors (%d without mapping)", used,
              len(skipped))
  return params, batch_stats, unmapped


def jax_to_numpy(tree):
  import jax
  return jax.tree_util.tree_map(np.asarray, tree)


# ---------------------------------------------------------------------------
# Reverse direction: flax tree -> reference-style torch state dict.
# ---------------------------------------------------------------------------

_BERT_SUB = {"query": "attention.self.query", "key": "attention.self.key",
             "value": "attention.self.value", "attn_out": "attention.output.dense",
             "ffn_inter": "intermediate.dense", "ffn_out": "output.dense"}
_BERT_LN = {"attn_ln": "attention.output", "ffn_ln": "output"}
_LSTM_RE = re.compile(
    r"^text_pooling/OptimizedLSTMCell_(\d+)/([ih])([ifgo])/(kernel|bias)$")


def flatten_tree(tree, prefix=""):
  """Nested dict -> {'a/b/c': np.ndarray} (insertion order preserved)."""
  flat = {}
  for key, val in tree.items():
    path = f"{prefix}/{key}" if prefix else key
    if isinstance(val, dict):
      flat.update(flatten_tree(val, path))
    else:
      flat[path] = np.asarray(val)
  return flat


def _export_param_entry(path: str):
  """Flax params path -> (torch name, transpose) or None.

  The exact inverse of build_name_map's params side (LSTM gates are fused
  separately by export_state_dict)."""
  def _ln(tower):
    return "LayerNorm" if tower == "txt" else "layer_norm"

  m = re.match(r"^(txt|vid)_bert/(word|position|token_type)_embeddings"
               r"/embedding$", path)
  if m:
    return f"{m.group(1)}_bert.embeddings.{m.group(2)}_embeddings.weight", False
  m = re.match(r"^(txt|vid)_bert/embeddings_ln/(scale|bias)$", path)
  if m:
    leaf = "weight" if m.group(2) == "scale" else "bias"
    return f"{m.group(1)}_bert.embeddings.{_ln(m.group(1))}.{leaf}", False
  m = re.match(r"^(txt|vid)_bert/encoder/layer_(\d+)/"
               r"(query|key|value|attn_out|ffn_inter|ffn_out)/(kernel|bias)$",
               path)
  if m:
    tower, i, sub, leaf = m.groups()
    torch_leaf = "weight" if leaf == "kernel" else "bias"
    return (f"{tower}_bert.encoder.layer.{i}.{_BERT_SUB[sub]}.{torch_leaf}",
            leaf == "kernel")
  m = re.match(r"^(txt|vid)_bert/encoder/layer_(\d+)/(attn_ln|ffn_ln)"
               r"/(scale|bias)$", path)
  if m:
    tower, i, sub, leaf = m.groups()
    torch_leaf = "weight" if leaf == "scale" else "bias"
    return (f"{tower}_bert.encoder.layer.{i}.{_BERT_LN[sub]}"
            f".{_ln(tower)}.{torch_leaf}", False)
  m = re.match(r"^video_dim_reduce_(\w+)/fc/(kernel|bias)$", path)
  if m:
    return (f"video_dim_reduce.{m.group(1)}.fc."
            f"{'weight' if m.group(2) == 'kernel' else 'bias'}",
            m.group(2) == "kernel")
  m = re.match(r"^(text|video)_gu_(\w+)/(fc|cg/fc)/(kernel|bias)$", path)
  if m:
    kind, mod, sub, leaf = m.groups()
    return (f"{kind}_GU.{mod}.{sub.replace('/', '.')}."
            f"{'weight' if leaf == 'kernel' else 'bias'}", leaf == "kernel")
  m = re.match(r"^(text|video)_gu_(\w+)/cg/(batch_norm2?)/bn/(scale|bias)$",
               path)
  if m:
    kind, mod, bn, leaf = m.groups()
    return (f"{kind}_GU.{mod}.cg.{bn}."
            f"{'weight' if leaf == 'scale' else 'bias'}", False)
  m = re.match(r"^([gf]_reason_[12])/(kernel|bias)$", path)
  if m:
    return (f"{m.group(1)}.{'weight' if m.group(2) == 'kernel' else 'bias'}",
            m.group(2) == "kernel")
  m = re.match(r"^text_pooling/fc/(kernel|bias)$", path)
  if m:
    return (f"text_pooling.fc.{'weight' if m.group(1) == 'kernel' else 'bias'}",
            m.group(1) == "kernel")
  m = re.match(r"^text_pooling/(clusters2?)$", path)
  if m:
    return f"text_pooling.{m.group(1)}", False
  m = re.match(r"^text_pooling/batch_norm/bn/(scale|bias)$", path)
  if m:
    return (f"text_pooling.batch_norm."
            f"{'weight' if m.group(1) == 'scale' else 'bias'}", False)
  m = re.match(r"^moe_fc_(txt|vid)_(\w+)/(kernel|bias)$", path)
  if m:
    kind, mod, leaf = m.groups()
    return (f"moe_fc_{kind}.{mod}.{'weight' if leaf == 'kernel' else 'bias'}",
            leaf == "kernel")
  if path == "word_embeddings/word_embeddings":
    return "word_embeddings.word_embeddings.weight", False
  return None


def _export_stat_entry(path: str):
  """Flax batch-stats path -> torch running-stat name, or None."""
  m = re.match(r"^(text|video)_gu_(\w+)/cg/(batch_norm2?)/bn/(mean|var)$",
               path)
  if m:
    kind, mod, bn, stat = m.groups()
    return f"{kind}_GU.{mod}.cg.{bn}.running_{'mean' if stat == 'mean' else 'var'}"
  m = re.match(r"^text_pooling/batch_norm/bn/(mean|var)$", path)
  if m:
    return f"text_pooling.batch_norm.running_{'mean' if m.group(1) == 'mean' else 'var'}"
  return None


def export_state_dict(params: dict, batch_stats: dict, *,
                      with_pooler: bool = True, self_check: bool = True):
  """Flax {params, batch_stats} -> reference torch state dict (numpy values).

  Inverts the forward mapping: flax kernels [in,out] transpose back to
  torch Linear [out,in]; LayerNorm scale/bias -> weight/bias; BatchNorm
  batch_stats -> running_mean/running_var (+ num_batches_tracked=0); the
  per-gate flax LSTM denses fuse back into torch's weight_ih_l<k>/
  weight_hh_l<k> with gate rows ordered (i,f,g,o) — the converter stored
  the summed torch biases on the hidden-side denses, so the export puts
  the whole bias in bias_hh_l<k> and zeros in bias_ih_l<k> (numerically
  identical: torch adds them).  `with_pooler` synthesizes the reference's
  unused-but-present BertPooler tensors (model/bert.py:356,407 computes a
  pooled output that nothing consumes) so `load_state_dict(strict=True)`
  (base/base_trainer.py:432 with restart) finds every key.

  Returns (state_dict, unexported) where unexported lists flax leaves with
  no reference-side name.  When self_check is set, the exported dict is
  pushed back through the FORWARD name map and every tensor must land on
  the flax path it came from — any drift between the two directions raises.
  """
  flat_p = flatten_tree(jax_to_numpy(params))
  flat_s = flatten_tree(jax_to_numpy(batch_stats))
  sd: Dict[str, np.ndarray] = {}
  sources: Dict[str, Tuple[str, bool]] = {}  # pseudo/torch name -> origin
  lstm: Dict[Tuple[str, str], np.ndarray] = {}
  unexported = []

  for path, arr in flat_p.items():
    m = _LSTM_RE.match(path)
    if m:
      layer, side, gate, leaf = m.groups()
      lstm[(layer, f"{side}{gate}", leaf)] = arr
      # Pseudo-key the forward splitter produces; checked below.
      sources[f"text_pooling.lstm.l{layer}.{side}{gate}.{leaf}"] = (
          path, leaf == "kernel")
      continue
    entry = _export_param_entry(path)
    if entry is None:
      unexported.append(path)
      continue
    name, transpose = entry
    sd[name] = arr.T if transpose else arr
    sources[name] = (path, transpose)

  for path, arr in flat_s.items():
    name = _export_stat_entry(path)
    if name is None:
      unexported.append(path)
      continue
    sd[name] = arr
    sources[name] = (path, False)
    base = name.rsplit(".", 1)[0]
    sd.setdefault(f"{base}.num_batches_tracked", np.asarray(0, np.int64))

  # Fuse per-gate LSTM tensors back into torch's packed layout.
  layers = sorted({k[0] for k in lstm})
  for layer in layers:
    for side, prefix in (("ih", "i"), ("hh", "h")):
      sd[f"text_pooling.lstm.weight_{side}_l{layer}"] = np.concatenate(
          [lstm[(layer, f"{prefix}{g}", "kernel")].T for g in "ifgo"], axis=0)
    hidden_bias = np.concatenate(
        [lstm[(layer, f"h{g}", "bias")] for g in "ifgo"], axis=0)
    sd[f"text_pooling.lstm.bias_hh_l{layer}"] = hidden_bias
    sd[f"text_pooling.lstm.bias_ih_l{layer}"] = np.zeros_like(hidden_bias)

  if with_pooler:
    for tower in ("txt_bert", "vid_bert"):
      scale = flat_p.get(f"{tower}/embeddings_ln/scale")
      if scale is not None:
        h = scale.shape[0]
        sd[f"{tower}.pooler.dense.weight"] = np.eye(h, dtype=np.float32)
        sd[f"{tower}.pooler.dense.bias"] = np.zeros(h, np.float32)
    # transformers==3.1.0 (the reference's pin, requirements.txt:42)
    # registers position_ids as a PERSISTENT buffer on BertEmbeddings,
    # so it is present in every reference-saved state dict and a
    # strict restart load (base/base_trainer.py:433) requires it.  The
    # reference's own from-scratch vid_bert (model/bert.py) has no such
    # buffer.
    pos = flat_p.get("txt_bert/position_embeddings/embedding")
    if pos is not None:
      sd["txt_bert.embeddings.position_ids"] = np.arange(
          pos.shape[0], dtype=np.int64)[None]

  if self_check:
    split = _split_lstm_tensors(sd)
    params_map, stats_map = build_name_map(split)
    for name in split:
      if ("pooler" in name or "num_batches_tracked" in name
          or name.endswith("position_ids")):
        continue
      if name in params_map:
        got = params_map[name]
      elif name in stats_map:
        got = (stats_map[name], False)
      else:
        raise AssertionError(f"export/import drift: {name} has no forward "
                             "mapping")
      want = sources.get(name)
      if want is None or got != want:
        raise AssertionError(
            f"export/import drift at {name}: forward maps to {got}, "
            f"exported from {want}")
  return sd, unexported


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

  # train.py injects the tokenizer's vocab_size into a custom
  # text_bert_geometry (train.py:170-178); mirror that here from the
  # checkpoint itself — its word table IS the vocab — so the target tree
  # matches and the embeddings land instead of being shape-skipped.
  arch_args = {k: v for k, v in cfg.arch_args.items()
               if k not in ("vocab_size", "txt_bert_init")}
  txt_words = state_dict.get("txt_bert.embeddings.word_embeddings.weight")
  geom = dict(arch_args.get("text_bert_geometry") or {})
  if geom and txt_words is not None:
    geom.setdefault("vocab_size", txt_words.shape[0])
    arch_args["text_bert_geometry"] = geom
  we_words = state_dict.get("word_embeddings.word_embeddings.weight")
  if we_words is not None:
    arch_args.setdefault("we_vocab_size", we_words.shape[0])
    arch_args.setdefault("we_dim", we_words.shape[1])
  model = CENet(expert_dims=expert_dims, **arch_args)

  # Shape-only init from a dummy batch.
  from tests.conftest import make_batch  # reuse the schema builder
  vocab = int(txt_words.shape[0]) if txt_words is not None else 28996
  batch = make_batch(expert_dims, b=2, k=1, t=8, l=4,
                     vocab=min(vocab, 28996))
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)

  params, batch_stats, _ = convert_state_dict(
      state_dict, variables["params"], variables.get("batch_stats", {}))

  # The word table is the one tensor a silent shape-skip would leave
  # random (everything else is geometry-checked by the config); fail loud.
  key = "txt_bert.embeddings.word_embeddings.weight"
  if key in state_dict:
    got = np.asarray(params["txt_bert"]["word_embeddings"]["embedding"])
    if got.shape != state_dict[key].shape or not np.array_equal(
        got, np.asarray(state_dict[key], got.dtype)):
      logger.error("txt word embeddings did not land (%s vs %s) — the "
                   "model geometry does not match the checkpoint",
                   got.shape, state_dict[key].shape)
      sys.exit(1)

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
