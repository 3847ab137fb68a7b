"""Pretrained text-BERT initialization (VERDICT r3 missing #2).

The reference always builds its text tower from pretrained
bert-base-cased (model/model.py:150-162, from_pretrained) — only CENet
is ever from scratch.  These tests cover the whole chain:

  HF-style state dict -> scripts/convert_hf_bert.convert_hf_bert ->
  msgpack -> train.py --txt_bert_init / auto-default ->
  Trainer._load_txt_bert_init (checkpoint still wins over the init).
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY = dict(hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=40,
            type_vocab_size=2, vocab_size=57)


def make_hf_style_state_dict(rng, geom=TINY, prefix="bert."):
  """Random tensors under HuggingFace BertModel names (+ heads/pooler
  that the converter must drop)."""
  hid, inter = geom["hidden_size"], geom["intermediate_size"]
  sd = {}

  def lin(name, i, o):
    sd[f"{prefix}{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.05
    sd[f"{prefix}{name}.bias"] = rng.randn(o).astype(np.float32) * 0.01

  def ln(name):
    sd[f"{prefix}{name}.weight"] = (
        1.0 + rng.randn(hid).astype(np.float32) * 0.01)
    sd[f"{prefix}{name}.bias"] = rng.randn(hid).astype(np.float32) * 0.01

  sd[f"{prefix}embeddings.word_embeddings.weight"] = (
      rng.randn(geom["vocab_size"], hid).astype(np.float32) * 0.05)
  sd[f"{prefix}embeddings.position_embeddings.weight"] = (
      rng.randn(geom["max_position_embeddings"], hid).astype(np.float32)
      * 0.05)
  sd[f"{prefix}embeddings.token_type_embeddings.weight"] = (
      rng.randn(geom["type_vocab_size"], hid).astype(np.float32) * 0.05)
  ln("embeddings.LayerNorm")
  for i in range(geom["num_hidden_layers"]):
    base = f"encoder.layer.{i}"
    for mod in ("attention.self.query", "attention.self.key",
                "attention.self.value", "attention.output.dense"):
      lin(f"{base}.{mod}", hid, hid)
    ln(f"{base}.attention.output.LayerNorm")
    lin(f"{base}.intermediate.dense", hid, inter)
    lin(f"{base}.output.dense", inter, hid)
    ln(f"{base}.output.LayerNorm")
  # Present in real HF checkpoints; must be dropped, not warned about.
  lin("pooler.dense", hid, hid)
  sd["cls.predictions.bias"] = np.zeros(geom["vocab_size"], np.float32)
  return sd


def tiny_geometry():
  from mmt_tpu.config import BertParams
  return BertParams(hidden_act="gelu", layer_norm_eps=1e-12, **TINY)


def test_convert_hf_bert_tree_and_forward_parity():
  """Converted tree: every tensor mapped; forward == torch transcription."""
  import jax
  from scripts.convert_hf_bert import convert_hf_bert, hf_to_cenet_names
  from mmt_tpu.models.bert import TextBert
  from test_torch_parity import t_encoder, t_layer_norm, t_mask_bias

  rng = np.random.RandomState(0)
  sd = make_hf_style_state_dict(rng)
  tree, unmapped = convert_hf_bert(sd, geometry=tiny_geometry())
  assert unmapped == [], unmapped

  # Leaf-level checks (torch Linear [out,in] -> flax kernel [in,out]).
  np.testing.assert_array_equal(
      np.asarray(tree["encoder"]["layer_0"]["query"]["kernel"]),
      sd["bert.encoder.layer.0.attention.self.query.weight"].T)
  np.testing.assert_array_equal(
      np.asarray(tree["word_embeddings"]["embedding"]),
      sd["bert.embeddings.word_embeddings.weight"])
  np.testing.assert_array_equal(
      np.asarray(tree["embeddings_ln"]["scale"]),
      sd["bert.embeddings.LayerNorm.weight"])

  # Forward parity vs a torch transcription of HF BertModel.
  b, s = 2, 9
  ids = rng.randint(0, TINY["vocab_size"], (b, s)).astype(np.int32)
  mask = np.ones((b, s), np.int32)
  mask[1, 6:] = 0
  types = np.zeros((b, s), np.int32)
  pos = np.tile(np.arange(s, dtype=np.int32), (b, 1))

  model = TextBert(tiny_geometry())
  ours = np.asarray(model.apply({"params": tree}, ids, mask, types, pos,
                                deterministic=True))

  tsd = hf_to_cenet_names(sd)  # 'txt_bert.' names for the t_* helpers
  emb = (torch.tensor(tsd["txt_bert.embeddings.word_embeddings.weight"])[
      torch.tensor(ids.astype(np.int64))]
      + torch.tensor(tsd["txt_bert.embeddings.position_embeddings.weight"])[
          torch.tensor(pos.astype(np.int64))]
      + torch.tensor(tsd["txt_bert.embeddings.token_type_embeddings.weight"])[
          torch.tensor(types.astype(np.int64))])
  emb = t_layer_norm(tsd, "txt_bert.embeddings.LayerNorm", emb)
  ref = t_encoder(tsd, "txt_bert", emb, t_mask_bias(torch.tensor(mask)),
                  TINY["num_attention_heads"], "LayerNorm",
                  TINY["num_hidden_layers"]).numpy()
  np.testing.assert_allclose(ours, ref, atol=2e-5)


def write_init_msgpack(tree, path):
  from flax import serialization
  path.write_bytes(serialization.to_bytes({"params": {"txt_bert": tree}}))


def test_trainer_loads_init_and_checkpoint_wins(tmp_path, tmp_path_factory):
  """e2e: --txt_bert_init lands in trainer.params; a warm-start
  checkpoint loaded on top of a (different) init wins."""
  import train as train_cli
  from mmt_tpu.data import synthetic
  from scripts.convert_hf_bert import convert_hf_bert
  from test_train_e2e import make_config

  rng = np.random.RandomState(1)
  data_dir = synthetic.generate(tmp_path, num_videos=10, num_test=4,
                                experts={"rgb": 2048, "s3d": 1024})
  os.environ["MMT_TPU_BERT_VOCAB"] = str(tmp_path / "vocab.txt")
  from mmt_tpu.tokenization import WordPieceTokenizer
  vocab = WordPieceTokenizer(tmp_path / "vocab.txt").vocab_size

  geom = dict(TINY, vocab_size=vocab)
  from mmt_tpu.config import BertParams
  tree, unmapped = convert_hf_bert(
      make_hf_style_state_dict(rng, geom=geom),
      geometry=BertParams(hidden_act="gelu", layer_norm_eps=1e-12, **geom))
  assert unmapped == []
  init_path = tmp_path / "txt_bert_init.msgpack"
  write_init_msgpack(tree, init_path)

  cfg = make_config(tmp_path, data_dir, tmp_path / "exps" / "init")
  cfg["arch"]["args"]["text_bert_geometry"]["vocab_size"] = vocab
  cfg["trainer"]["epochs"] = 1
  cfg_path = tmp_path / "cfg.json"
  cfg_path.write_text(json.dumps(cfg))

  trainer = train_cli.main(["--config", str(cfg_path),
                            "--txt_bert_init", str(init_path)])
  del trainer
  ckpt = tmp_path / "exps" / "init" / "trained_model.msgpack"
  assert ckpt.exists()

  # Fresh --only_eval run: params must EQUAL the converted init exactly.
  cfg2 = make_config(tmp_path, data_dir, tmp_path / "exps" / "evalonly")
  cfg2["arch"]["args"]["text_bert_geometry"]["vocab_size"] = vocab
  cfg2_path = tmp_path / "cfg2.json"
  cfg2_path.write_text(json.dumps(cfg2))
  ev = train_cli.main(["--config", str(cfg2_path), "--only_eval",
                       "--txt_bert_init", str(init_path)])
  np.testing.assert_array_equal(
      np.asarray(ev.params["txt_bert"]["encoder"]["layer_0"]["query"]
                 ["kernel"]),
      np.asarray(tree["encoder"]["layer_0"]["query"]["kernel"]))

  # Checkpoint wins over a different init: load the trained checkpoint
  # on top of a ZERO init — params must match the checkpoint, not zeros.
  import jax
  zero_tree = jax.tree_util.tree_map(np.zeros_like, tree)
  zero_path = tmp_path / "zero_init.msgpack"
  write_init_msgpack(zero_tree, zero_path)

  cfg3 = make_config(tmp_path, data_dir, tmp_path / "exps" / "warm")
  cfg3["arch"]["args"]["text_bert_geometry"]["vocab_size"] = vocab
  cfg3_path = tmp_path / "cfg3.json"
  cfg3_path.write_text(json.dumps(cfg3))
  wm = train_cli.main(["--config", str(cfg3_path), "--only_eval",
                       "--load_checkpoint", str(ckpt),
                       "--txt_bert_init", str(zero_path)])
  got = np.asarray(wm.params["txt_bert"]["encoder"]["layer_0"]["query"]
                   ["kernel"])
  from flax import serialization
  saved = serialization.msgpack_restore(ckpt.read_bytes())
  want = np.asarray(saved["params"]["txt_bert"]["encoder"]["layer_0"]
                    ["query"]["kernel"])
  np.testing.assert_array_equal(got, want)
  assert np.abs(got).sum() > 0  # i.e. not the zero init


def test_no_match_raises(tmp_path):
  """A nothing-matched init (wrong geometry) is an error, not a no-op."""
  from flax import serialization
  from mmt_tpu.train.trainer import Trainer

  class Holder:
    pass

  holder = Holder()
  holder.params = {"txt_bert": {"embeddings_ln": {
      "scale": np.ones(48, np.float32)}}}
  bad = tmp_path / "bad.msgpack"
  bad.write_bytes(serialization.to_bytes(
      {"params": {"txt_bert": {"embeddings_ln": {
          "scale": np.ones(16, np.float32)}}}}))
  with pytest.raises(ValueError, match="no leaf matched"):
    Trainer._load_txt_bert_init(holder, str(bad))


def test_resolve_priorities(tmp_path, monkeypatch):
  import train as train_cli

  class Cfg:
    resume = None
    txt_bert_init = None

  f_cli = tmp_path / "cli.msgpack"
  f_env = tmp_path / "env.msgpack"
  f_arch = tmp_path / "arch.msgpack"
  f_def = tmp_path / "default.msgpack"
  for f in (f_cli, f_env, f_arch, f_def):
    f.write_bytes(b"x")
  monkeypatch.setattr(train_cli, "TXT_BERT_INIT_DEFAULT", str(f_def))
  monkeypatch.delenv("MMT_TPU_TXT_BERT_INIT", raising=False)

  cfg = Cfg()
  # default auto-load (stock geometry, bertftn)
  assert train_cli.resolve_txt_bert_init(cfg, None, "bertftn") == str(f_def)
  # custom geometry blocks the default
  assert train_cli.resolve_txt_bert_init(cfg, None, "bertftn",
                                         custom_geometry=True) is None
  # bertscr never auto-loads (reference trains it from random init)
  assert train_cli.resolve_txt_bert_init(cfg, None, "bertscr") is None
  # non-bert towers never auto-load
  assert train_cli.resolve_txt_bert_init(cfg, None, "vlad") is None
  # arch.args beats default
  assert train_cli.resolve_txt_bert_init(cfg, str(f_arch),
                                         "bertftn") == str(f_arch)
  # env beats arch.args
  monkeypatch.setenv("MMT_TPU_TXT_BERT_INIT", str(f_env))
  assert train_cli.resolve_txt_bert_init(cfg, str(f_arch),
                                         "bertftn") == str(f_env)
  # CLI beats env
  cfg.txt_bert_init = str(f_cli)
  assert train_cli.resolve_txt_bert_init(cfg, str(f_arch),
                                         "bertftn") == str(f_cli)
  # explicit-but-missing is an error
  cfg.txt_bert_init = str(tmp_path / "absent.msgpack")
  with pytest.raises(FileNotFoundError):
    train_cli.resolve_txt_bert_init(cfg, None, "bertftn")


def test_non_pretrained_towers_reject_or_ignore_init(tmp_path, monkeypatch):
  """bertscr/vlad towers stay random (model/model.py:150 applies
  from_pretrained only for ftn/frz): an explicit CLI/config init is a
  contradiction (raise), an ambient env var is ignored."""
  import train as train_cli

  class Cfg:
    resume = None
    txt_bert_init = None

  f = tmp_path / "init.msgpack"
  f.write_bytes(b"x")
  monkeypatch.delenv("MMT_TPU_TXT_BERT_INIT", raising=False)

  # Ambient env var must NOT turn a from-scratch ablation pretrained.
  monkeypatch.setenv("MMT_TPU_TXT_BERT_INIT", str(f))
  assert train_cli.resolve_txt_bert_init(Cfg(), None, "bertscr") is None
  assert train_cli.resolve_txt_bert_init(Cfg(), None, "vlad") is None
  monkeypatch.delenv("MMT_TPU_TXT_BERT_INIT")

  # Explicit CLI / arch.args requests contradict the architecture: loud.
  cfg = Cfg()
  cfg.txt_bert_init = str(f)
  with pytest.raises(ValueError, match="conflicts with txt_agg"):
    train_cli.resolve_txt_bert_init(cfg, None, "bertscr")
  with pytest.raises(ValueError, match="conflicts with txt_agg"):
    train_cli.resolve_txt_bert_init(Cfg(), str(f), "mxp")


def test_is_custom_text_geometry():
  """The auto-load gate must see the EFFECTIVE geometry: an injected
  {'vocab_size': stock} is still stock; any departing value is custom
  (so the bert-base-cased asset can't silently part-load over it)."""
  import train as train_cli

  assert not train_cli._is_custom_text_geometry(None)
  assert not train_cli._is_custom_text_geometry({})
  assert not train_cli._is_custom_text_geometry({"vocab_size": 28996})
  assert train_cli._is_custom_text_geometry({"vocab_size": 128})
  assert train_cli._is_custom_text_geometry({"num_hidden_layers": 2})


def test_partial_match_raises(tmp_path):
  """An init asset that fills the encoder but not the word table (custom
  vocab against the stock asset) must raise — a pretrained encoder over
  a random word table is the worst silent failure mode."""
  from flax import serialization
  from mmt_tpu.train.trainer import Trainer

  class Holder:
    pass

  holder = Holder()
  holder.params = {"txt_bert": {
      "embeddings_ln": {"scale": np.ones(48, np.float32)},
      "word_embeddings": {"embedding": np.zeros((100, 48), np.float32)},
  }}
  asset = tmp_path / "partial.msgpack"
  asset.write_bytes(serialization.to_bytes(
      {"params": {"txt_bert": {
          "embeddings_ln": {"scale": np.ones(48, np.float32)},
          # stock-sized word table vs the model's 100-row custom vocab
          "word_embeddings": {"embedding": np.zeros((28996, 48),
                                                    np.float32)},
      }}}))
  with pytest.raises(ValueError, match="could not be initialized"):
    Trainer._load_txt_bert_init(holder, str(asset))
