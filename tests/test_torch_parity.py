"""Numerics parity vs torch compositions of the reference's building
blocks (erf-GELU post-LN BERT layer, gated embedding units, similarity).

These tests rebuild the reference math with torch ops *inside the test*
(the reference repo itself needs transformers==3.1 and is not importable)
and check our flax modules against it through the checkpoint-converter
name mapping — validating both the numerics and the converter in one go.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mmt_tpu.config import BertParams  # noqa: E402
from mmt_tpu.models import components as C  # noqa: E402
from mmt_tpu.models.bert import (TransformerLayer,  # noqa: E402
                                 attention_bias_from_mask)

HID, HEADS, INTER, SEQ, B = 32, 4, 48, 10, 3


def torch_gelu(x):
  return x * 0.5 * (1.0 + torch.erf(x / np.sqrt(2.0)))


def torch_bert_layer(x, bias, w):
  """Reference BertLayer semantics (model/bert.py:108-256)."""
  import math
  def lin(name, t):
    return t @ w[f"{name}.weight"].T + w[f"{name}.bias"]
  q = lin("q", x).view(B, SEQ, HEADS, HID // HEADS).permute(0, 2, 1, 3)
  k = lin("k", x).view(B, SEQ, HEADS, HID // HEADS).permute(0, 2, 1, 3)
  v = lin("v", x).view(B, SEQ, HEADS, HID // HEADS).permute(0, 2, 1, 3)
  scores = q @ k.transpose(-1, -2) / math.sqrt(HID // HEADS) + bias
  probs = torch.softmax(scores, dim=-1)
  ctx = (probs @ v).permute(0, 2, 1, 3).reshape(B, SEQ, HID)
  attn = lin("attn_out", ctx)
  h = torch.nn.functional.layer_norm(
      attn + x, (HID,), w["attn_ln.weight"], w["attn_ln.bias"], eps=1e-12)
  inter = torch_gelu(lin("ffn_inter", h))
  out = lin("ffn_out", inter)
  return torch.nn.functional.layer_norm(
      out + h, (HID,), w["ffn_ln.weight"], w["ffn_ln.bias"], eps=1e-12)


def test_transformer_layer_matches_torch(rng):
  cfg = BertParams(hidden_size=HID, num_hidden_layers=1,
                   num_attention_heads=HEADS, intermediate_size=INTER,
                   hidden_act="gelu", hidden_dropout_prob=0.0,
                   attention_probs_dropout_prob=0.0,
                   max_position_embeddings=16, type_vocab_size=2,
                   layer_norm_eps=1e-12)
  layer = TransformerLayer(cfg)
  x = rng.randn(B, SEQ, HID).astype(np.float32)
  mask = (rng.rand(B, SEQ) > 0.2).astype(np.float32)
  bias = np.asarray(attention_bias_from_mask(jnp.asarray(mask)))

  variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(bias), deterministic=True)
  p = variables["params"]

  w = {}
  for name in ("query", "key", "value", "attn_out", "ffn_inter", "ffn_out"):
    short = {"query": "q", "key": "k", "value": "v"}.get(name, name)
    w[f"{short}.weight"] = torch.tensor(np.asarray(p[name]["kernel"]).T)
    w[f"{short}.bias"] = torch.tensor(np.asarray(p[name]["bias"]))
  for name in ("attn_ln", "ffn_ln"):
    w[f"{name}.weight"] = torch.tensor(np.asarray(p[name]["scale"]))
    w[f"{name}.bias"] = torch.tensor(np.asarray(p[name]["bias"]))

  ours = np.asarray(layer.apply(variables, jnp.asarray(x),
                                jnp.asarray(bias), deterministic=True))
  theirs = torch_bert_layer(torch.tensor(x),
                            torch.tensor(bias), w).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_gated_embedding_unit_matches_torch(rng):
  """GEU eval path: Linear -> (Linear+BN frozen) -> GLU -> L2
  (model/model.py:683-750)."""
  in_dim, out_dim = 24, 16
  geu = C.GatedEmbeddingUnit(out_dim, use_bn=True, normalize=True)
  x = rng.randn(B, in_dim).astype(np.float32)
  variables = geu.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
  # put nontrivial running stats in place
  stats = variables["batch_stats"]["cg"]["batch_norm"]["bn"]
  stats["mean"] = jnp.asarray(rng.randn(out_dim).astype(np.float32) * 0.1)
  stats["var"] = jnp.asarray(np.abs(rng.randn(out_dim)).astype(np.float32)
                             + 0.5)
  p = variables["params"]

  ours = np.asarray(geu.apply(variables, jnp.asarray(x), train=False))

  xt = torch.tensor(x)
  fc_w = torch.tensor(np.asarray(p["fc"]["kernel"]).T)
  fc_b = torch.tensor(np.asarray(p["fc"]["bias"]))
  cg_w = torch.tensor(np.asarray(p["cg"]["fc"]["kernel"]).T)
  cg_b = torch.tensor(np.asarray(p["cg"]["fc"]["bias"]))
  bn_w = torch.tensor(np.asarray(p["cg"]["batch_norm"]["bn"]["scale"]))
  bn_b = torch.tensor(np.asarray(p["cg"]["batch_norm"]["bn"]["bias"]))
  mean = torch.tensor(np.asarray(stats["mean"]))
  var = torch.tensor(np.asarray(stats["var"]))

  h = xt @ fc_w.T + fc_b
  x1 = h @ cg_w.T + cg_b
  x1 = torch.nn.functional.batch_norm(x1, mean, var, bn_w, bn_b,
                                      training=False, eps=1e-5)
  cat = torch.cat((h, x1), 1)
  glu = torch.nn.functional.glu(cat, 1)
  theirs = torch.nn.functional.normalize(glu, dim=-1).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_netvlad_matches_torch(rng):
  """NetVLAD eval path (model/net_vlad.py:50-101)."""
  K, D, N = 6, 12, 9
  vlad = C.NetVLAD(cluster_size=K, feature_size=D)
  x = rng.randn(B, N, D).astype(np.float32)
  variables = vlad.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
  p = variables["params"]
  stats = variables["batch_stats"]["batch_norm"]["bn"]

  ours = np.asarray(vlad.apply(variables, jnp.asarray(x), train=False))

  xt = torch.tensor(x)
  clusters = torch.tensor(np.asarray(p["clusters"]))
  clusters2 = torch.tensor(np.asarray(p["clusters2"]))
  bn_w = torch.tensor(np.asarray(p["batch_norm"]["bn"]["scale"]))
  bn_b = torch.tensor(np.asarray(p["batch_norm"]["bn"]["bias"]))
  mean = torch.tensor(np.asarray(stats["mean"]))
  var = torch.tensor(np.asarray(stats["var"]))

  flat = xt.reshape(-1, D)
  assignment = flat @ clusters
  assignment = torch.nn.functional.batch_norm(
      assignment, mean, var, bn_w, bn_b, training=False, eps=1e-5)
  assignment = torch.softmax(assignment, dim=1).view(B, N, K)
  a = assignment.sum(dim=1, keepdim=True) * clusters2
  vlad_t = assignment.transpose(1, 2) @ xt     # B x K x D
  vlad_t = vlad_t.transpose(1, 2) - a
  vlad_t = torch.nn.functional.normalize(vlad_t, dim=1)
  vlad_t = vlad_t.reshape(-1, K * D)
  theirs = torch.nn.functional.normalize(vlad_t, dim=1).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_converter_name_mapping_roundtrip(tiny_arch, rng):
  """A reference-style state dict fully populates the flax tree and the
  converted model changes its output accordingly (i.e. tensors landed in
  live places)."""
  import sys
  sys.path.insert(0, "scripts")
  from convert_checkpoint import build_name_map, convert_state_dict
  from mmt_tpu.models.cenet import CENet
  from tests.conftest import make_batch

  model = CENet(**tiny_arch)
  batch = make_batch(tiny_arch["expert_dims"])
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  params = variables["params"]
  stats = variables["batch_stats"]

  # Build a synthetic torch-style state dict from the flax tree by
  # inverting the mapping (transpose back), with fresh random values.
  flat = {}

  def flatten(tree, prefix=""):
    for key, val in tree.items():
      path = f"{prefix}/{key}" if prefix else key
      if isinstance(val, dict):
        flatten(val, path)
      else:
        flat[path] = np.asarray(val)

  flatten(params)
  probe_map, probe_stats = build_name_map({
      # minimal probe keys so layer counts are discovered
      "txt_bert.encoder.layer.1.output.dense.weight": 0,
      "vid_bert.encoder.layer.1.output.dense.weight": 0,
      "video_dim_reduce.rgb.fc.weight": 0,
      "video_dim_reduce.s3d.fc.weight": 0,
      "text_GU.rgb.fc.weight": 0, "text_GU.rgb.cg.fc.weight": 0,
      "text_GU.rgb.cg.batch_norm.weight": 0,
      "text_GU.rgb.cg.batch_norm.running_mean": 0,
      "moe_fc_txt.rgb.weight": 0,
  })

  state_dict = {}
  filled = 0
  for torch_name, (path, transpose) in probe_map.items():
    if path in flat:
      arr = rng.randn(*flat[path].shape).astype(np.float32)
      state_dict[torch_name] = arr.T if transpose else arr
      filled += 1
  assert filled > 20, f"mapping found only {filled} targets"

  new_params, new_stats = convert_state_dict(state_dict, params, stats)
  out_before = model.apply(variables, batch, train=False)
  out_after = model.apply({"params": new_params, "batch_stats": new_stats},
                          batch, train=False)
  assert not np.allclose(np.asarray(out_before["vid_embds"]),
                         np.asarray(out_after["vid_embds"]))
  # Every mapped tensor actually landed (same value where we put it).
  q = new_params["txt_bert"]["encoder"]["layer_0"]["query"]["kernel"]
  src = state_dict["txt_bert.encoder.layer.0.attention.self.query.weight"]
  np.testing.assert_array_equal(np.asarray(q), src.T)
