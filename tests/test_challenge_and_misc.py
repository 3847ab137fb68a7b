"""Challenge (pkl) corpus path, curriculum selection, predictions export,
bf16 parity, and attention behavior."""

import numpy as np
import pytest

from mmt_tpu import tokenization
from mmt_tpu.data import synthetic
from mmt_tpu.data.datasets import ExpertDataset
from mmt_tpu.data.readers import discover_expert_paths

C_EXPERTS = {"i3d": 64, "r2p1d": 32}


@pytest.fixture(scope="module")
def challenge_corpus(tmp_path_factory):
  root = tmp_path_factory.mktemp("challenge")
  data_dir = synthetic.generate(root, num_videos=10, num_test=4,
                                experts=C_EXPERTS, captions_per_video=2,
                                cut="c")
  tok = tokenization.WordPieceTokenizer(root / "vocab.txt")
  return data_dir, tok


def c_dims():
  return {m: {"dim": d, "idx": i + 1}
          for i, (m, d) in enumerate(C_EXPERTS.items())}


def test_discover_expert_paths(challenge_corpus):
  data_dir, _ = challenge_corpus
  paths = discover_expert_paths(data_dir)
  assert "raw_captions" in paths
  for e in C_EXPERTS:
    assert set(paths[e]) == {"fixed_seg", "avg", "max"}


def test_challenge_dataset_reads(challenge_corpus, legacy_assembly):
  data_dir, tok = challenge_corpus
  ds = ExpertDataset("MSRVTT", "c", "trainval", str(data_dir), c_dims(),
                     training=False, tokenizer=tok, max_text_words=10,
                     max_expert_tokens=4, captions_per_video=2)
  assert ds.num_train == 10
  s = ds[0]
  assert s["text_tensors"]["token_ids"].shape == (1, 2, 10, 2)
  for m, d in C_EXPERTS.items():
    assert s["vid_tensors"]["features"][m].shape == (1, 4, d)
    # provided avg/max pools are used
    assert s["vid_tensors"]["features_avgpool"][m].shape == (1, d)


def test_challenge_public_server_split(challenge_corpus):
  data_dir, tok = challenge_corpus
  ds = ExpertDataset("MSRVTT", "c", "test1", str(data_dir), c_dims(),
                     training=False, tokenizer=tok, max_text_words=10,
                     max_expert_tokens=4, captions_per_video=2)
  assert ds.num_train == 4


def test_compress_predictions(rng):
  from mmt_tpu.train.trainer import compress_predictions
  nv, caps = 6, 3
  sims = rng.randn(nv * caps, nv)
  masks = np.ones((nv, caps))
  masks[1, 2] = 0
  preds = compress_predictions(masks, sims, topk=4)
  assert preds.shape == (nv * caps - 1, 4)
  # top-1 is the argmax video of each valid query
  valid_rows = sims[masks.flatten().astype(bool)]
  np.testing.assert_array_equal(preds[:, 0], np.argmax(valid_rows, 1))


def test_curriculum_until_epoch(tmp_path):
  """Two train sets: the first is used until its until_epoch, then the
  next (trainer/trainer.py:137-143)."""

  class FakeEntry:
    def __init__(self, until): self.until_epoch = until

  import types

  from mmt_tpu.train.trainer import Trainer
  sets = [FakeEntry(3), FakeEntry(7)]
  self_like = types.SimpleNamespace(data_loaders={"train_sets": sets})
  picked = [sets.index(Trainer._select_train_set(self_like, epoch))
            for epoch in (1, 3, 4, 7, 10, 99)]
  # Past the last until_epoch the final set keeps being used (the
  # reference IndexErrors there, trainer/trainer.py:137-143).
  assert picked == [0, 0, 1, 1, 1, 1]


def test_bf16_eval_close_to_fp32(tiny_arch):
  """bf16 compute keeps eval similarities close to fp32 (final norms &
  similarity run in fp32)."""
  import jax
  import jax.numpy as jnp
  from mmt_tpu.models.cenet import CENet, similarity_from_outputs
  from tests.conftest import make_batch

  batch = make_batch(tiny_arch["expert_dims"], b=6)
  model32 = CENet(**tiny_arch)
  variables = model32.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  model16 = CENet(**{**tiny_arch, "compute_dtype": jnp.bfloat16})

  s32 = np.asarray(similarity_from_outputs(
      model32.apply(variables, batch, train=False), merge="indep"))
  s16 = np.asarray(similarity_from_outputs(
      model16.apply(variables, batch, train=False), merge="indep"))
  # unit-norm embeddings -> sims in [-1, 1]; bf16 towers stay within a
  # few centi-units of fp32
  assert np.max(np.abs(s32 - s16)) < 0.05


def test_attention_dropout_path_normalizes(rng):
  """Train-time attention dropout keeps row normalization in expectation
  (the deterministic path is covered by the torch-parity layer test)."""
  import jax
  import jax.numpy as jnp
  from mmt_tpu.models.bert import attention_bias_from_mask
  from mmt_tpu.ops import attention

  b, s, d, h = 2, 16, 32, 4
  q = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
  k = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
  v = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
  bias = attention_bias_from_mask(
      jnp.asarray((rng.rand(b, s) > 0.3).astype(np.float32)))
  det = attention.multi_head_attention(q, k, v, num_heads=h, attn_bias=bias)
  outs = [attention.multi_head_attention(
      q, k, v, num_heads=h, attn_bias=bias, dropout_rate=0.3,
      deterministic=False,
      dropout_rng_fn=lambda i=i: jax.random.PRNGKey(i))
      for i in range(64)]
  avg = np.mean([np.asarray(o) for o in outs], axis=0)
  # dropout is unbiased: the mean over draws approaches the det output
  # (64 draws -> loose per-element bound, tight mean bound)
  err = np.abs(avg - np.asarray(det))
  assert err.max() < 0.5, err.max()
  assert err.mean() < 0.05, err.mean()


def test_checkify_batch_validation(tiny_arch):
  from mmt_tpu.utils.checks import validate_batch
  from tests.conftest import make_batch

  batch = make_batch(tiny_arch["expert_dims"])
  # make padded rows actually zero (make_batch fills them randomly)
  for m in batch["features"]:
    batch["features"][m] *= batch["features_ind"][m][..., None]
  validate_batch(batch)  # clean batch passes

  bad = {k: (dict(v) if isinstance(v, dict) else v) for k, v in batch.items()}
  bad["features"] = dict(batch["features"])
  feats = batch["features"]["rgb"].copy()
  feats[0, 0, 0] = np.nan
  bad["features"]["rgb"] = feats
  with pytest.raises(ValueError, match="validation"):
    validate_batch(bad)


def test_reference_config_builds_model():
  """The reference's own MSRVTT config constructs our CENet unmodified."""
  from mmt_tpu import config as config_lib
  from mmt_tpu.experts import compute_dims
  from mmt_tpu.models.cenet import CENet

  cfg = config_lib.load(
      "/root/reference/configs_pub/eccv20/MSRVTT_jsfusion_trainval.json")
  expert_dims = compute_dims(cfg.raw)
  model = CENet(expert_dims=expert_dims, **cfg.arch_args)
  assert model.video_seq_len(max_expert_tokens=30) == 1 + 7 * 31
  assert model.modalities == sorted(cfg.raw["experts"]["modalities"])
