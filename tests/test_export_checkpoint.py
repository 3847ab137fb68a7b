"""Reverse-converter tests: flax tree -> reference .pth -> flax tree.

The exporter (scripts/convert_checkpoint.py:export_state_dict) must be the
exact inverse of the forward converter for every leaf family, across the
txt_agg/vid_cont variants that change the parameter tree shape, and the
CLI (scripts/export_checkpoint.py) must emit a file shaped like the
reference's own saves (base/base_trainer.py:348-374) including the
strict-load-only tensors (pooler, num_batches_tracked, and the
transformers-3.1.0 position_ids buffer)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
from convert_checkpoint import convert_state_dict, export_state_dict  # noqa: E402

from mmt_tpu.models.cenet import CENet  # noqa: E402
from tests.conftest import make_batch  # noqa: E402


def _init_variables(arch):
  model = CENet(**arch)
  batch = make_batch(arch["expert_dims"])
  return model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)


def _randomize(tree, rng):
  """Fresh random values so round-trip equality is meaningful (init leaves
  many biases at zero, which would mask transpose/mapping errors)."""
  return jax.tree_util.tree_map(
      lambda a: (rng.standard_normal(np.shape(a)) * 0.3 + 0.1).astype(
          np.asarray(a).dtype), tree)


VARIANTS = [
    {},  # bertftn + bert: default heads, both BERTs
    {"txt_agg": "vlad", "vid_cont": "coll", "we_vocab_size": 50},
    {"txt_agg": "lstm", "we_vocab_size": 50},
]


@pytest.mark.parametrize("extra", VARIANTS,
                         ids=["default", "vlad+coll", "lstm"])
def test_export_roundtrip_exact(tiny_arch, rng, extra):
  """export -> forward convert reproduces every leaf bit-exactly, with
  zero unexported leaves and zero unmapped tensors."""
  arch = dict(tiny_arch, **extra)
  variables = _init_variables(arch)
  rs = np.random.default_rng(0)
  params = _randomize(variables["params"], rs)
  stats = _randomize(variables.get("batch_stats", {}), rs)

  sd, unexported = export_state_dict(params, stats)
  assert not unexported, f"leaves without a reference name: {unexported}"

  back_params, back_stats, unmapped = convert_state_dict(
      dict(sd), variables["params"], variables.get("batch_stats", {}))
  assert not unmapped, f"exported tensors the importer rejects: {unmapped}"

  flat_want = jax.tree_util.tree_leaves_with_path(params)
  got = {"params": back_params, "batch_stats": back_stats}
  want = {"params": params, "batch_stats": stats}
  for path, leaf in jax.tree_util.tree_leaves_with_path(want):
    node = got
    for k in path:
      node = node[k.key]
    np.testing.assert_array_equal(
        np.asarray(node), np.asarray(leaf),
        err_msg=f"round-trip mismatch at {jax.tree_util.keystr(path)}")
  assert len(flat_want) > 40


def test_export_strict_load_tensors(tiny_arch):
  """The exported dict carries the reference-only tensors a strict
  load_state_dict needs: both poolers (model/bert.py:356) and one
  num_batches_tracked per BatchNorm."""
  variables = _init_variables(tiny_arch)
  sd, _ = export_state_dict(variables["params"],
                            variables.get("batch_stats", {}))
  h = tiny_arch["vid_bert_params"]["hidden_size"]
  for tower in ("txt_bert", "vid_bert"):
    assert sd[f"{tower}.pooler.dense.weight"].shape == (h, h)
    assert sd[f"{tower}.pooler.dense.bias"].shape == (h,)
  n_bn = sum(1 for k in sd if k.endswith("num_batches_tracked"))
  n_mean = sum(1 for k in sd if k.endswith("running_mean"))
  assert n_bn == n_mean > 0
  # transformers==3.1.0 registers position_ids as a persistent buffer on
  # the text tower, so the reference's strict restart load requires it;
  # the reference's own vid_bert has no such buffer.
  pos_ids = sd["txt_bert.embeddings.position_ids"]
  max_pos = tiny_arch["text_bert_geometry"]["max_position_embeddings"]
  assert pos_ids.shape == (1, max_pos) and pos_ids.dtype == np.int64
  np.testing.assert_array_equal(pos_ids[0], np.arange(max_pos))
  assert "vid_bert.embeddings.position_ids" not in sd


def test_export_torch_lstm_numerics(rng):
  """Exported fused LSTM tensors drive torch's nn.LSTM to the same output
  as our LSTMPooler (the inverse of test_converter_lstm_family_matches
  _torch): proves the (i,f,g,o) gate order and bias split are right for
  torch consumption, not just for our own importer."""
  torch = pytest.importorskip("torch")
  import mmt_tpu.models.components as C

  in_dim, hid, out_dim, b, t = 8, 12, 10, 4, 6
  pooler = C.LSTMPooler(hidden_dim=hid, output_dim=out_dim)
  x = rng.randn(b, t, in_dim).astype(np.float32)
  lengths = np.array([6, 3, 1, 5])
  variables = pooler.init(jax.random.PRNGKey(3), np.asarray(x),
                          np.asarray(lengths))
  rs = np.random.default_rng(1)
  params = _randomize(variables["params"], rs)
  ours = np.asarray(pooler.apply({"params": params}, np.asarray(x),
                                 np.asarray(lengths)))

  sd, unexported = export_state_dict({"text_pooling": params}, {})
  assert not unexported

  lstm = torch.nn.LSTM(in_dim, hid, 1, batch_first=True)
  fc = torch.nn.Linear(hid, out_dim)
  with torch.no_grad():
    for name, p in lstm.named_parameters():
      p.copy_(torch.from_numpy(sd[f"text_pooling.lstm.{name}"]))
    fc.weight.copy_(torch.from_numpy(sd["text_pooling.fc.weight"]))
    fc.bias.copy_(torch.from_numpy(sd["text_pooling.fc.bias"]))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), enforce_sorted=False,
        batch_first=True)
    _, (hn, _) = lstm(packed)
    theirs = fc(hn[-1]).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_export_cli_roundtrip(tiny_arch, tmp_path):
  """msgpack -> scripts/export_checkpoint.py -> .pth shaped like the
  reference's saves, loadable by torch and re-importable bit-exactly."""
  torch = pytest.importorskip("torch")
  from flax import serialization

  variables = _init_variables(tiny_arch)
  rs = np.random.default_rng(2)
  params = _randomize(variables["params"], rs)
  state = {
      "params": jax.tree_util.tree_map(np.asarray, params),
      "batch_stats": jax.tree_util.tree_map(
          np.asarray, variables.get("batch_stats", {})),
      "epoch": 7,
      "monitor_best": 24.5,
      "config": json.dumps({"arch": {"type": "CENet"}}),
      "arch": "CENet",
      "n_samples": 224,
      "n_steps": 56,
  }
  msgpack = tmp_path / "model.msgpack"
  msgpack.write_bytes(serialization.to_bytes(state))

  out = tmp_path / "model.pth"
  subprocess.run(
      [sys.executable, "scripts/export_checkpoint.py",
       "--checkpoint", str(msgpack), "--out", str(out)],
      check=True, timeout=600)

  ckpt = torch.load(out, map_location="cpu", weights_only=False)
  assert ckpt["arch"] == "CENet" and ckpt["epoch"] == 7
  assert ckpt["monitor_best"] == 24.5
  assert ckpt["config"] == {"arch": {"type": "CENet"}}
  # The reference resume reads these unconditionally
  # (base/base_trainer.py:414-415).
  assert ckpt["n_samples"] == 224 and ckpt["n_steps"] == 56
  assert "txt_bert.embeddings.position_ids" in ckpt["state_dict"]
  sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()
        if v.dtype != torch.int64}
  back_params, _, unmapped = convert_state_dict(
      sd, variables["params"], variables.get("batch_stats", {}))
  assert not unmapped
  q_want = np.asarray(params["txt_bert"]["encoder"]["layer_0"]["query"]
                      ["kernel"])
  np.testing.assert_array_equal(
      np.asarray(back_params["txt_bert"]["encoder"]["layer_0"]["query"]
                 ["kernel"]), q_want)


def test_export_cli_refuses_missing_config(tiny_arch, tmp_path):
  """A .pth without a usable config would crash the reference resume on
  checkpoint['config']['arch'] before any weights load — the exporter
  must refuse, not emit it."""
  from flax import serialization

  variables = _init_variables(tiny_arch)
  state = {
      "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
      "batch_stats": jax.tree_util.tree_map(
          np.asarray, variables.get("batch_stats", {})),
      "epoch": 1, "monitor_best": 0.0, "arch": "CENet",
  }
  msgpack = tmp_path / "noconfig.msgpack"
  msgpack.write_bytes(serialization.to_bytes(state))
  out = tmp_path / "noconfig.pth"
  r = subprocess.run(
      [sys.executable, "scripts/export_checkpoint.py",
       "--checkpoint", str(msgpack), "--out", str(out)],
      capture_output=True, text=True, timeout=600)
  assert r.returncode != 0
  assert "config" in (r.stderr + r.stdout)
  assert not out.exists()
