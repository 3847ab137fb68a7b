"""Converter CLI end-to-end: a reference-shaped torch .pth checkpoint
(full CENet state-dict names, tiny geometry) -> msgpack -> --only_eval.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def make_reference_style_state_dict(rng, n_txt_layers=2, n_vid_layers=2,
                                    txt_hid=48, vid_hid=48, inter=64,
                                    vocab=None, modalities=("rgb", "s3d"),
                                    mod_dims=(2048, 1024), text_max_pos=40,
                                    vid_max_pos=32):
  """Random tensors under the reference's torch module names."""
  sd = {}

  def lin(prefix, i, o):
    sd[f"{prefix}.weight"] = torch.tensor(
        rng.randn(o, i).astype(np.float32) * 0.02)
    sd[f"{prefix}.bias"] = torch.tensor(np.zeros(o, np.float32))

  def ln(prefix, d):
    sd[f"{prefix}.weight"] = torch.tensor(np.ones(d, np.float32))
    sd[f"{prefix}.bias"] = torch.tensor(np.zeros(d, np.float32))

  def bert(prefix, layers, hid, ln_name, with_words=False, max_pos=40):
    if with_words:
      sd[f"{prefix}.embeddings.word_embeddings.weight"] = torch.tensor(
          rng.randn(vocab, hid).astype(np.float32) * 0.02)
    sd[f"{prefix}.embeddings.position_embeddings.weight"] = torch.tensor(
        rng.randn(max_pos, hid).astype(np.float32) * 0.02)
    sd[f"{prefix}.embeddings.token_type_embeddings.weight"] = torch.tensor(
        rng.randn(19 if prefix == "vid_bert" else 2,
                  hid).astype(np.float32) * 0.02)
    ln(f"{prefix}.embeddings.{ln_name}", hid)
    for i in range(layers):
      base = f"{prefix}.encoder.layer.{i}"
      for mod in ("attention.self.query", "attention.self.key",
                  "attention.self.value", "attention.output.dense"):
        lin(f"{base}.{mod}", hid, hid)
      ln(f"{base}.attention.output.{ln_name}", hid)
      lin(f"{base}.intermediate.dense", hid, inter)
      lin(f"{base}.output.dense", inter, hid)
      ln(f"{base}.output.{ln_name}", hid)
    # poolers exist in reference ckpts but are unused
    lin(f"{prefix}.pooler.dense", hid, hid)

  bert("txt_bert", n_txt_layers, txt_hid, "LayerNorm", with_words=True,
       max_pos=text_max_pos)
  bert("vid_bert", n_vid_layers, vid_hid, "layer_norm", max_pos=vid_max_pos)

  for mod, dim in zip(modalities, mod_dims):
    lin(f"video_dim_reduce.{mod}.fc", dim, vid_hid)
    lin(f"text_GU.{mod}.fc", txt_hid, vid_hid)
    lin(f"text_GU.{mod}.cg.fc", vid_hid, vid_hid)
    sd[f"text_GU.{mod}.cg.batch_norm.weight"] = torch.tensor(
        np.ones(vid_hid, np.float32))
    sd[f"text_GU.{mod}.cg.batch_norm.bias"] = torch.tensor(
        np.zeros(vid_hid, np.float32))
    sd[f"text_GU.{mod}.cg.batch_norm.running_mean"] = torch.tensor(
        rng.randn(vid_hid).astype(np.float32) * 0.01)
    sd[f"text_GU.{mod}.cg.batch_norm.running_var"] = torch.tensor(
        np.ones(vid_hid, np.float32))
    sd[f"text_GU.{mod}.cg.batch_norm.num_batches_tracked"] = torch.tensor(0)
    lin(f"moe_fc_txt.{mod}", txt_hid, 1)
  return sd


def test_pth_convert_and_eval(tmp_path):
  sys.path.insert(0, os.path.dirname(__file__))
  import train as train_cli
  from mmt_tpu.data import synthetic
  from test_train_e2e import make_config

  rng = np.random.RandomState(0)
  data_dir = synthetic.generate(tmp_path, num_videos=10, num_test=4,
                                experts={"rgb": 2048, "s3d": 1024})
  os.environ["MMT_TPU_BERT_VOCAB"] = str(tmp_path / "vocab.txt")

  # vocab size must match the tokenizer's for the tiny geometry
  from mmt_tpu.tokenization import WordPieceTokenizer
  vocab = WordPieceTokenizer(tmp_path / "vocab.txt").vocab_size

  cfg = make_config(tmp_path, data_dir, tmp_path / "exps" / "conv")
  cfg["arch"]["args"]["text_bert_geometry"]["vocab_size"] = vocab
  cfg_path = tmp_path / "cfg.json"
  cfg_path.write_text(json.dumps(cfg))

  sd = make_reference_style_state_dict(rng, vocab=vocab)
  ckpt = {"arch": "CENet", "epoch": 7, "state_dict": sd,
          "monitor_best": 0.0, "config": {}, "n_samples": 123,
          "n_steps": 45}
  pth = tmp_path / "ref_ckpt.pth"
  torch.save(ckpt, pth)

  out = tmp_path / "converted.msgpack"
  env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
             PYTHONPATH=f"{os.getcwd()}:{os.getcwd()}/tests")
  proc = subprocess.run(
      [sys.executable, "scripts/convert_checkpoint.py",
       "--config", str(cfg_path), "--checkpoint", str(pth),
       "--out", str(out)],
      capture_output=True, text=True, env=env, cwd=os.getcwd())
  assert proc.returncode == 0, proc.stderr[-2000:]
  assert out.exists()
  # every reference tensor except the poolers/counters must have mapped
  assert "no mapping for" not in proc.stderr + proc.stdout, (
      proc.stderr[-1500:] + proc.stdout[-1500:])

  trainer = train_cli.main(["--config", str(cfg_path), "--only_eval",
                            "--load_checkpoint", str(out)])
  # converted weights actually live in the model: spot-check one tensor
  got = np.asarray(
      trainer.params["txt_bert"]["encoder"]["layer_0"]["query"]["kernel"])
  want = sd["txt_bert.encoder.layer.0.attention.self.query.weight"].numpy().T
  np.testing.assert_array_equal(got, want)
  got_bn = np.asarray(
      trainer.batch_stats["text_gu_rgb"]["cg"]["batch_norm"]["bn"]["mean"])
  np.testing.assert_array_equal(
      got_bn, sd["text_GU.rgb.cg.batch_norm.running_mean"].numpy())
