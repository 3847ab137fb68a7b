"""CENet forward-pass tests: shapes, invariants, config switches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.models.cenet import CENet, similarity_from_outputs
from tests.conftest import make_batch


def init_and_run(arch_kwargs, batch, train=False, **overrides):
  model = CENet(**{**arch_kwargs, **overrides})
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  if train:
    out, _ = model.apply(variables, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
  else:
    out = model.apply(variables, batch, train=False)
  return model, variables, out


def test_forward_shapes(tiny_arch):
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch)
  b, k, m, d = 3, 2, 2, 48
  assert out["vid_embds"].shape == (b, m, d)
  assert out["text_embds"].shape == (b, k, m, d)
  assert out["vid_weights"].shape == (b, m)
  assert out["text_weights"].shape == (b, k, m)


def test_invariants(tiny_arch):
  """L2 norms of embeddings == 1; weights L1-normalized (model.py:607-625)."""
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch)
  np.testing.assert_allclose(
      np.linalg.norm(out["vid_embds"], axis=-1), 1.0, rtol=1e-5)
  np.testing.assert_allclose(
      np.linalg.norm(out["text_embds"], axis=-1), 1.0, rtol=1e-5)
  np.testing.assert_allclose(out["vid_weights"].sum(-1), 1.0, rtol=1e-5)
  np.testing.assert_allclose(out["text_weights"].sum(-1), 1.0, rtol=1e-5)


def test_missing_modality_zero_weight(tiny_arch):
  """keep_missing_modalities=False zeroes absent modality weights."""
  batch = make_batch(tiny_arch["expert_dims"])
  batch["features_ind"]["rgb"][0] = 0.0  # video 0 has no rgb
  _, _, out = init_and_run(tiny_arch, batch, keep_missing_modalities=False,
                           vid_wgh="none")
  mods = sorted(tiny_arch["expert_dims"])
  rgb_idx = mods.index("rgb")
  assert out["vid_weights"][0, rgb_idx] == 0.0
  np.testing.assert_allclose(out["vid_weights"][0].sum(), 1.0, rtol=1e-5)


@pytest.mark.parametrize("txt_agg,post", [("bertftn", "cls"),
                                          ("bertftnmxp", "mxp"),
                                          ("bertftnmnp", "mnp"),
                                          ("bertfrz", "cls"),
                                          ("bertfrz1", "cls")])
def test_txt_agg_bert_variants(tiny_arch, txt_agg, post):
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch, txt_agg=txt_agg, txt_inp="bertftn"
                           if "ftn" in txt_agg else "bertfrz")
  assert np.all(np.isfinite(out["text_embds"]))


@pytest.mark.parametrize("txt_agg", ["mxp", "vlad", "lstm"])
def test_txt_agg_word_embedding_variants(tiny_arch, txt_agg):
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch, txt_agg=txt_agg,
                           txt_inp="bertscr", we_vocab_size=100, we_dim=32)
  assert np.all(np.isfinite(out["text_embds"]))


@pytest.mark.parametrize("txt_pro", ["gbn", "gem", "lin"])
def test_txt_pro_variants(tiny_arch, txt_pro):
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch, txt_pro=txt_pro)
  assert np.all(np.isfinite(out["text_embds"]))


@pytest.mark.parametrize("vid_cont", ["bert", "coll", "none"])
def test_vid_cont_variants(tiny_arch, vid_cont):
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch, vid_cont=vid_cont)
  assert np.all(np.isfinite(out["vid_embds"]))


@pytest.mark.parametrize("vid_wgh", ["emb", "nrm", "none"])
def test_vid_wgh_variants(tiny_arch, vid_wgh):
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch, vid_wgh=vid_wgh)
  np.testing.assert_allclose(out["vid_weights"].sum(-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("pos_enc", ["tint", "ordr", "type", "none"])
def test_pos_enc_variants(tiny_arch, pos_enc):
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch, pos_enc=pos_enc)
  assert np.all(np.isfinite(out["vid_embds"]))


@pytest.mark.parametrize("out_tok", ["sep", "mxp", "mnp"])
def test_out_tok_variants(tiny_arch, out_tok):
  batch = make_batch(tiny_arch["expert_dims"])
  _, _, out = init_and_run(tiny_arch, batch, out_tok=out_tok)
  assert np.all(np.isfinite(out["vid_embds"]))


def test_attention_mask_blocks_padded_tokens(tiny_arch):
  """Changing a masked-out feature token must not change any output."""
  batch = make_batch(tiny_arch["expert_dims"])
  batch["features_ind"]["rgb"][:, -1] = 0.0
  model, variables, out1 = init_and_run(tiny_arch, batch)
  batch2 = {k: (dict(v) if isinstance(v, dict) else v) for k, v in batch.items()}
  batch2["features"] = dict(batch["features"])
  feats = batch["features"]["rgb"].copy()
  feats[:, -1] = 1e3
  batch2["features"]["rgb"] = feats
  out2 = model.apply(variables, batch2, train=False)
  np.testing.assert_allclose(out1["vid_embds"], out2["vid_embds"],
                             atol=1e-5)


def test_train_step_gradients_flow(tiny_arch):
  """End-to-end gradient through similarity + loss is finite and nonzero."""
  from mmt_tpu.train.losses import max_margin_ranking_loss
  batch = make_batch(tiny_arch["expert_dims"], b=4)
  model = CENet(**tiny_arch)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  loss_fn = max_margin_ranking_loss(margin=0.05, fix_norm=True)

  def loss(params):
    out, _ = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        batch, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    sims = similarity_from_outputs(out, merge="avg")
    return loss_fn(sims)

  g = jax.grad(loss)(variables["params"])
  leaves = jax.tree_util.tree_leaves(g)
  assert all(np.all(np.isfinite(l)) for l in leaves)
  total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
  assert total > 0


def test_batched_heads_match_per_modality_loop(tiny_arch, monkeypatch):
  """The batched per-modality heads (stacked-weight einsums,
  components.py:batched_*) must equal the per-modality loop over the
  SAME parameter holders — outputs, train-mode batch_stats updates, and
  gradients.  MMT_TPU_BATCHED_HEADS toggles the routing (read in
  CENet.setup, i.e. per apply)."""
  batch = make_batch(tiny_arch["expert_dims"], b=6)
  model = CENet(**{**tiny_arch, "vid_wgh": "emb", "txt_wgh": "emb"})
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)

  def run(train):
    if train:
      out, mut = model.apply(variables, batch, train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
      return out, mut["batch_stats"]
    return model.apply(variables, batch, train=False), None

  def grads():
    def loss(params):
      out = model.apply({**variables, "params": params}, batch, train=False)
      return jnp.sum(similarity_from_outputs(out, merge="avg") ** 2)
    return jax.grad(loss)(variables["params"])

  monkeypatch.setenv("MMT_TPU_BATCHED_HEADS", "1")
  eval_b, _ = run(False), None
  train_b, bs_b = run(True)
  g_b = grads()
  monkeypatch.setenv("MMT_TPU_BATCHED_HEADS", "0")
  eval_l, _ = run(False), None
  train_l, bs_l = run(True)
  g_l = grads()

  for key in ("text_embds", "text_weights", "vid_embds", "vid_weights"):
    np.testing.assert_allclose(np.asarray(eval_b[0][key]),
                               np.asarray(eval_l[0][key]),
                               rtol=1e-5, atol=1e-6, err_msg=f"eval {key}")
    np.testing.assert_allclose(np.asarray(train_b[key]),
                               np.asarray(train_l[key]),
                               rtol=1e-5, atol=1e-6, err_msg=f"train {key}")
  def flat(tree):
    pairs = jax.tree_util.tree_flatten_with_path(tree)[0]
    return sorted((jax.tree_util.keystr(p), v) for p, v in pairs)

  for (pa, a), (pb, b) in zip(flat(bs_b), flat(bs_l)):
    assert pa == pb
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6, err_msg=pa)
  for (pa, a), (pb, b) in zip(flat(g_b), flat(g_l)):
    assert pa == pb
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6, err_msg=pa)
