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


# ---------------------------------------------------------------------------
# Full-model parity: the ENTIRE reference forward (model/model.py:312-661)
# rebuilt with torch ops, fed the same weights through the checkpoint
# converter, compared on the final similarity matrix.
# ---------------------------------------------------------------------------


def _t(sd, name):
  return torch.tensor(np.asarray(sd[name]))


def t_linear(sd, prefix, x):
  return x @ _t(sd, f"{prefix}.weight").T + _t(sd, f"{prefix}.bias")


def t_layer_norm(sd, prefix, x, eps=1e-12):
  return torch.nn.functional.layer_norm(
      x, (x.shape[-1],), _t(sd, f"{prefix}.weight"), _t(sd, f"{prefix}.bias"),
      eps=eps)


def t_bn_eval(sd, prefix, x):
  return torch.nn.functional.batch_norm(
      x, _t(sd, f"{prefix}.running_mean"), _t(sd, f"{prefix}.running_var"),
      _t(sd, f"{prefix}.weight"), _t(sd, f"{prefix}.bias"),
      training=False, eps=1e-5)


def t_encoder(sd, prefix, x, bias, heads, ln_name, n_layers):
  """Reference BertEncoder (model/bert.py:108-292): post-LN blocks,
  erf-GELU, additive mask bias."""
  import math
  bsz, seq, hid = x.shape
  for i in range(n_layers):
    p = f"{prefix}.encoder.layer.{i}"
    def proj(name):
      y = t_linear(sd, f"{p}.attention.self.{name}", x)
      return y.view(bsz, seq, heads, hid // heads).permute(0, 2, 1, 3)
    q, k, v = proj("query"), proj("key"), proj("value")
    scores = q @ k.transpose(-1, -2) / math.sqrt(hid // heads) + bias
    ctx = (torch.softmax(scores, -1) @ v).permute(0, 2, 1, 3)
    ctx = ctx.reshape(bsz, seq, hid)
    attn = t_linear(sd, f"{p}.attention.output.dense", ctx)
    x = t_layer_norm(sd, f"{p}.attention.output.{ln_name}", attn + x)
    inter = torch_gelu(t_linear(sd, f"{p}.intermediate.dense", x))
    out = t_linear(sd, f"{p}.output.dense", inter)
    x = t_layer_norm(sd, f"{p}.output.{ln_name}", out + x)
  return x


def t_mask_bias(mask):
  return ((1 - mask.float()) * -10000.0)[:, None, None, :]


def t_geu(sd, prefix, x):
  """GatedEmbeddingUnit eval path (model/model.py:683-750)."""
  h = t_linear(sd, f"{prefix}.fc", x)
  x1 = t_bn_eval(sd, f"{prefix}.cg.batch_norm",
                 t_linear(sd, f"{prefix}.cg.fc", h))
  glu = torch.nn.functional.glu(torch.cat((h, x1), -1), -1)
  return torch.nn.functional.normalize(glu, dim=-1)


def t_reduce_dim(sd, prefix, x):
  return torch.nn.functional.normalize(
      t_linear(sd, f"{prefix}.fc", x), dim=-1)


def torch_full_cenet(sd, batch, arch, expert_dims, *, pos_enc, out_tok,
                     keep_missing):
  """Torch transcription of the full eval forward
  (model/model.py:312-661) + sharded_cross_view_inner_product
  (:789-837), merge='indep'.  Written against the reference semantics,
  independent of the repo's flax code paths."""
  mods = list(expert_dims.keys())
  m = len(mods)
  hid = arch["vid_bert_params"]["hidden_size"]
  heads = arch["vid_bert_params"]["num_attention_heads"]
  n_vid_layers = arch["vid_bert_params"]["num_hidden_layers"]
  n_txt_layers = arch["text_bert_geometry"]["num_hidden_layers"]
  max_pos = arch["vid_bert_params"]["max_position_embeddings"] - 1

  token_ids = torch.tensor(batch["token_ids"])
  b, k, t, _ = token_ids.shape

  # ---- text tower (HF bert, post_agg='cls') ----
  ids = token_ids.view(b * k, t, 2)
  input_ids, attn = ids[:, :, 0].long(), ids[:, :, 1].long()
  word = _t(sd, "txt_bert.embeddings.word_embeddings.weight")[input_ids]
  pos = _t(sd, "txt_bert.embeddings.position_embeddings.weight")[
      torch.arange(t)][None]
  typ = _t(sd, "txt_bert.embeddings.token_type_embeddings.weight")[0]
  emb = t_layer_norm(sd, "txt_bert.embeddings.LayerNorm", word + pos + typ)
  last = t_encoder(sd, "txt_bert", emb, t_mask_bias(attn), heads,
                   "LayerNorm", n_txt_layers)
  text = last[:, 0]

  text_embd = {mod: t_geu(sd, f"text_GU.{mod}", text).view(b, k, -1)
               for mod in mods}

  # MoE text weights from the raw text rep (model/model.py:262-283).
  logits = torch.cat([t_linear(sd, f"moe_fc_txt.{mod}", text)
                      for mod in mods], -1)
  text_weights = torch.softmax(logits, 1).view(b, k, m)
  text_weights = torch.nn.functional.normalize(text_weights, p=1, dim=-1)

  # ---- video tower ----
  ind = {mod: torch.tensor(batch["features_ind"][mod]).max(1).values
         for mod in mods}
  maxp = {mod: t_reduce_dim(sd, f"video_dim_reduce.{mod}",
                            torch.tensor(batch["features_maxpool"][mod]))
          for mod in mods}
  mnp = {mod: t_reduce_dim(sd, f"video_dim_reduce.{mod}",
                           torch.tensor(batch["features_avgpool"][mod]))
         for mod in mods}
  temp = {mod: t_reduce_dim(sd, f"video_dim_reduce.{mod}",
                            torch.tensor(batch["features"][mod]))
          for mod in mods}

  # Token sequence: [CLS] + per modality ([AGG] + FEA frames)
  # (model/model.py:485-567).
  feats = [torch.zeros(b, 1, hid)]
  types = [torch.zeros(b, 1, dtype=torch.long)]
  positions = [torch.zeros(b, 1, dtype=torch.long)]
  mask = [torch.ones(b, 1, dtype=torch.long)]
  tok_map, tok_id = {}, 0
  for mod in mods:
    idx = expert_dims[mod]["idx"]
    tok_id += 1
    tok_map[mod] = tok_id
    feats.append({"sep": torch.zeros(b, 1, hid),
                  "mxp": maxp[mod][:, None],
                  "mnp": mnp[mod][:, None]}[out_tok])
    types.append(torch.full((b, 1), idx, dtype=torch.long))
    positions.append(torch.zeros(b, 1, dtype=torch.long))
    mask.append(ind[mod][:, None].long())
    n_tok = temp[mod].shape[1]
    feats.append(temp[mod])
    types.append(torch.full((b, n_tok), idx, dtype=torch.long))
    if pos_enc == "tint":
      positions.append(torch.tensor(batch["features_t"][mod])
                       .clamp(0, max_pos).long())
    else:  # ordr
      positions.append(torch.arange(1, n_tok + 1)[None].expand(b, n_tok))
    mask.append(torch.tensor(batch["features_ind"][mod]).long())
    tok_id += n_tok

  feats = torch.cat(feats, 1)
  types = torch.cat(types, 1)
  positions = torch.cat(positions, 1)
  mask = torch.cat(mask, 1)

  pos_emb = _t(sd, "vid_bert.embeddings.position_embeddings.weight")[positions]
  typ_emb = _t(sd, "vid_bert.embeddings.token_type_embeddings.weight")[types]
  emb = t_layer_norm(sd, "vid_bert.embeddings.layer_norm",
                     pos_emb + typ_emb + feats)
  last = t_encoder(sd, "vid_bert", emb, t_mask_bias(mask), heads,
                   "layer_norm", n_vid_layers)
  experts = {mod: last[:, tok_map[mod]] for mod in mods}

  vid_weights = torch.ones(b, m)
  if not keep_missing:
    vid_weights = vid_weights * torch.stack(
        [ind[mod].float() for mod in mods], -1)
  vid_weights = torch.nn.functional.normalize(vid_weights, p=1, dim=-1)

  experts = {mod: torch.nn.functional.normalize(v, dim=-1)
             for mod, v in experts.items()}
  text_embd = {mod: torch.nn.functional.normalize(v, dim=-1)
               for mod, v in text_embd.items()}

  # sharded_cross_view_inner_product, merge='indep' (model/model.py:789-837).
  tw = text_weights.view(b * k, m)
  vw = vid_weights.view(b, m)
  moe_w = vw[None, :, :] * tw[:, None, :]
  norm_w = moe_w.sum(2, keepdim=True)
  norm_w[norm_w == 0] = 1e-5
  moe_w = moe_w / norm_w
  sims = torch.zeros(b * k, b)
  for i, mod in enumerate(mods):
    sims += moe_w[:, :, i] * (text_embd[mod].view(b * k, -1)
                              @ experts[mod].T)
  return sims.numpy()


def _synthetic_state_dict(params, stats, expert_dims, n_layers, rng):
  """Random torch-style state dict covering every converter-mapped tensor
  (shapes derived from the flax tree by inverting the mapping)."""
  import sys
  sys.path.insert(0, "scripts")
  from convert_checkpoint import build_name_map

  probe = {}
  for tower in ("txt_bert", "vid_bert"):
    probe[f"{tower}.encoder.layer.{n_layers - 1}.output.dense.weight"] = 0
  for mod in expert_dims:
    for wb in ("weight", "bias"):
      probe[f"video_dim_reduce.{mod}.fc.{wb}"] = 0
      probe[f"moe_fc_txt.{mod}.{wb}"] = 0
    for leaf in ("fc.weight", "fc.bias", "cg.fc.weight", "cg.fc.bias",
                 "cg.batch_norm.weight", "cg.batch_norm.bias",
                 "cg.batch_norm.running_mean", "cg.batch_norm.running_var"):
      probe[f"text_GU.{mod}.{leaf}"] = 0
  params_map, stats_map = build_name_map(probe)

  def lookup(tree, path):
    node = tree
    for key in path.split("/"):
      if not isinstance(node, dict) or key not in node:
        return None
      node = node[key]
    return np.asarray(node)

  sd = {}
  for torch_name, (path, transpose) in params_map.items():
    leaf = lookup(params, path)
    if leaf is None:
      continue
    arr = (rng.randn(*leaf.shape) * 0.2).astype(np.float32)
    sd[torch_name] = arr.T if transpose else arr
  for torch_name, path in stats_map.items():
    leaf = lookup(stats, path)
    if leaf is None:
      continue
    if torch_name.endswith("running_var"):
      arr = (np.abs(rng.randn(*leaf.shape)) + 0.5).astype(np.float32)
    else:
      arr = (rng.randn(*leaf.shape) * 0.1).astype(np.float32)
    sd[torch_name] = arr
  return sd


@pytest.mark.parametrize("pos_enc,out_tok,keep_missing",
                         [("tint", "mxp", True), ("ordr", "sep", False)])
def test_full_cenet_forward_matches_torch(tiny_arch, rng, pos_enc, out_tok,
                                          keep_missing):
  """End-to-end numerics parity: the whole eval forward (both towers, seq
  assembly, MoE weights, norms, similarity) through the converter, vs an
  independent torch transcription of model/model.py:312-661 + :789-837.
  Fails if any normalization order, mask constant, or assembly index
  differs."""
  import sys
  sys.path.insert(0, "scripts")
  from convert_checkpoint import convert_state_dict
  from mmt_tpu.models.cenet import CENet, similarity_from_outputs
  from tests.conftest import make_batch

  arch = dict(tiny_arch)
  arch["vid_bert_params"] = dict(arch["vid_bert_params"],
                                 hidden_dropout_prob=0.0,
                                 attention_probs_dropout_prob=0.0)
  arch["txt_bert_params"] = {"hidden_dropout_prob": 0.0,
                             "attention_probs_dropout_prob": 0.0}
  model = CENet(**arch, pos_enc=pos_enc, out_tok=out_tok,
                keep_missing_modalities=keep_missing)
  batch = make_batch(arch["expert_dims"], b=3, k=2, t=7, l=5)

  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  params = variables["params"]
  stats = variables.get("batch_stats", {})
  n_layers = arch["vid_bert_params"]["num_hidden_layers"]
  sd = _synthetic_state_dict(jax.tree_util.tree_map(np.asarray, params),
                             jax.tree_util.tree_map(np.asarray, stats),
                             arch["expert_dims"], n_layers, rng)
  assert len(sd) > 60, f"state dict too small ({len(sd)})"
  new_params, new_stats, unmapped = convert_state_dict(dict(sd), params,
                                                       stats)
  assert not unmapped, f"unmapped tensors: {unmapped}"

  out = model.apply({"params": new_params, "batch_stats": new_stats},
                    batch, train=False)
  ours = np.asarray(similarity_from_outputs(out, merge="indep"))

  theirs = torch_full_cenet(sd, batch, arch, arch["expert_dims"],
                            pos_enc=pos_enc, out_tok=out_tok,
                            keep_missing=keep_missing)
  assert ours.shape == theirs.shape == (6, 3)
  np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_converter_lstm_family_matches_torch(rng):
  """torch nn.LSTM + fc (model/lstm.py:19-71) vs our LSTMPooler through
  the converter's fused-gate split: same output to 1e-5."""
  import sys
  sys.path.insert(0, "scripts")
  from convert_checkpoint import convert_state_dict

  in_dim, hid, out_dim, b, t = 8, 12, 10, 4, 6
  torch.manual_seed(0)
  lstm = torch.nn.LSTM(in_dim, hid, 1, batch_first=True)
  fc = torch.nn.Linear(hid, out_dim)
  sd = {f"text_pooling.lstm.{k}": v.detach().numpy()
        for k, v in lstm.named_parameters()}
  sd["text_pooling.fc.weight"] = fc.weight.detach().numpy()
  sd["text_pooling.fc.bias"] = fc.bias.detach().numpy()

  pooler = C.LSTMPooler(hidden_dim=hid, output_dim=out_dim)
  x = rng.randn(b, t, in_dim).astype(np.float32)
  lengths = np.array([6, 3, 1, 5])
  variables = pooler.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(lengths))
  wrapped, _, unmapped = convert_state_dict(
      sd, {"text_pooling": variables["params"]}, {})
  assert not unmapped, f"unmapped tensors: {unmapped}"
  ours = np.asarray(pooler.apply({"params": wrapped["text_pooling"]},
                                 jnp.asarray(x), jnp.asarray(lengths)))

  with torch.no_grad():
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), enforce_sorted=False,
        batch_first=True)
    _, (hn, _) = lstm(packed)
    theirs = fc(hn[-1]).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_converter_coll_family_roundtrip(tiny_arch, rng):
  """A synthetic coll-path state dict (video_GU + g/f_reason,
  model/model.py:109-135,753-786) converts with zero unmapped tensors and
  lands in live leaves."""
  import sys
  sys.path.insert(0, "scripts")
  from convert_checkpoint import convert_state_dict
  from mmt_tpu.models.cenet import CENet
  from tests.conftest import make_batch

  arch = dict(tiny_arch, vid_cont="coll", vid_inp="agg", out_tok="mxp")
  model = CENet(**arch)
  batch = make_batch(arch["expert_dims"])
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  params, stats = variables["params"], variables["batch_stats"]
  d = arch["same_dim"]

  sd = {}
  for name in ("g_reason_1", "f_reason_1", "f_reason_2", "g_reason_2"):
    in_d = 2 * d if name == "g_reason_1" else d
    sd[f"{name}.weight"] = rng.randn(d, in_d).astype(np.float32)
    sd[f"{name}.bias"] = rng.randn(d).astype(np.float32)
  for mod in arch["expert_dims"]:
    sd[f"video_GU.{mod}.cg.fc.weight"] = rng.randn(d, d).astype(np.float32)
    sd[f"video_GU.{mod}.cg.fc.bias"] = rng.randn(d).astype(np.float32)
    for bn in ("batch_norm", "batch_norm2"):
      sd[f"video_GU.{mod}.cg.{bn}.weight"] = rng.randn(d).astype(np.float32)
      sd[f"video_GU.{mod}.cg.{bn}.bias"] = rng.randn(d).astype(np.float32)
      sd[f"video_GU.{mod}.cg.{bn}.running_mean"] = (
          rng.randn(d).astype(np.float32) * 0.1)
      sd[f"video_GU.{mod}.cg.{bn}.running_var"] = (
          np.abs(rng.randn(d)).astype(np.float32) + 0.5)
      sd[f"video_GU.{mod}.cg.{bn}.num_batches_tracked"] = np.int64(7)

  new_params, new_stats, unmapped = convert_state_dict(sd, params, stats)
  assert not unmapped, f"unmapped tensors: {unmapped}"
  np.testing.assert_array_equal(
      np.asarray(new_params["g_reason_1"]["kernel"]),
      sd["g_reason_1.weight"].T)
  np.testing.assert_array_equal(
      np.asarray(new_params["video_gu_rgb"]["cg"]["fc"]["kernel"]),
      sd["video_GU.rgb.cg.fc.weight"].T)
  np.testing.assert_array_equal(
      np.asarray(new_stats["video_gu_rgb"]["cg"]["batch_norm2"]["bn"]["var"]),
      sd["video_GU.rgb.cg.batch_norm2.running_var"])
  # Converted weights flow into the forward.
  out = model.apply({"params": new_params, "batch_stats": new_stats},
                    batch, train=False)
  before = model.apply(variables, batch, train=False)
  assert not np.allclose(np.asarray(out["vid_embds"]),
                         np.asarray(before["vid_embds"]))


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

  new_params, new_stats, _ = convert_state_dict(state_dict, params, stats)
  out_before = model.apply(variables, batch, train=False)
  out_after = model.apply({"params": new_params, "batch_stats": new_stats},
                          batch, train=False)
  assert not np.allclose(np.asarray(out_before["vid_embds"]),
                         np.asarray(out_after["vid_embds"]))
  # Every mapped tensor actually landed (same value where we put it).
  q = new_params["txt_bert"]["encoder"]["layer_0"]["query"]["kernel"]
  src = state_dict["txt_bert.encoder.layer.0.attention.self.query.weight"]
  np.testing.assert_array_equal(np.asarray(q), src.T)
