"""Utility-layer tests: timers, perf log, hparams, visualizer/HTML,
checkpoint primitives."""

import json
import time

import numpy as np
import pytest

from mmt_tpu.utils.hparams import get_hparams_from_config
from mmt_tpu.utils.html_report import HTMLReport
from mmt_tpu.utils.timing import AverageMeter, update_perf_log
from mmt_tpu.utils.visualizer import Visualizer


def test_average_meter():
  m = AverageMeter()
  m.update("x", 1.0)
  m.update("x", 3.0)
  assert m.dic["x"]["val"] == 3.0
  assert m.dic["x"]["sum"] == 4.0
  assert m.dic["x"]["avg"] == 2.0
  with m.time("y"):
    time.sleep(0.01)
  assert m.dic["y"]["val"] >= 0.01
  m.reset()
  assert not m.dic


def test_perf_log(tmp_path):
  path = tmp_path / "perf_log.txt"
  update_perf_log({"epoch": 1, "loss": 0.5}, path)
  update_perf_log({"epoch": 2, "loss": 0.25}, path)
  lines = [json.loads(l) for l in path.read_text().splitlines()]
  assert lines[1]["epoch"] == 2 and lines[1]["loss"] == 0.25


def test_hparams_extraction():
  cfg = {
      "seed": 3,
      "experts": {"modalities": ["rgb", "s3d"]},
      "arch": {"args": {
          "vid_cont": "bert", "txt_agg": "bertftn", "txt_inp": "bertftn",
          "txt_pro": "gbn", "txt_wgh": "emb", "vid_wgh": "none",
          "vid_inp": "both", "pos_enc": "tint", "out_tok": "mxp",
          "keep_missing_modalities": True,
          "vid_bert_params": {"num_hidden_layers": 4,
                              "num_attention_heads": 4,
                              "hidden_dropout_prob": 0.1,
                              "attention_probs_dropout_prob": 0.1,
                              "max_position_embeddings": 32},
          "txt_bert_params": {"hidden_dropout_prob": 0.1,
                              "attention_probs_dropout_prob": 0.1},
      }},
      "train_sets": [{"args": {"batch_size": 32, "mix": [
          {"dataset_name": "MSRVTT", "mix_weight": 1.0,
           "query_shuffling": "shufk1", "max_text_words": 30}]}}],
      "continuous_eval_sets": [], "final_eval_sets": [],
      "optimizer": {"args": {"lr": 5e-5, "weight_decay": 0}},
      "lr_scheduler": {"args": {"gamma": 0.95}},
      "loss": {"type": "MaxMarginRankingLoss", "args": {"margin": 0.05}},
      "trainer": {"epochs": 50, "max_samples_per_epoch": 32000},
  }
  h = get_hparams_from_config(cfg)
  assert h["seed"] == 3
  assert h["weight_MSRVTT"] == 1
  assert h["vid/num_hidden_layers"] == 4
  assert h["margin"] == 0.05
  assert h["batch_size"] == 32
  assert h["query_shuffling"] == "shufk1"


def test_html_report(tmp_path):
  report = HTMLReport(tmp_path, "test page")
  report.add_query("a man cooking", [0.7, 0.3], ["rgb", "s3d"],
                   gt_rank=0, gt_sim=0.91,
                   rows=[{"path": "v1.mp4", "rank": 0, "sim": 0.91,
                          "is_gt": True, "vid_weights": [0.5, 0.5]},
                         {"path": "v2.mp4", "rank": 1, "sim": 0.4,
                          "is_gt": False, "vid_weights": [0.6, 0.4]}])
  out = report.save("page.html")
  html = open(out).read()
  assert "a man cooking" in html
  assert "v1.mp4" in html and 'class="gt"' in html
  assert "rgb:0.700" in html


def test_visualizer_sampling(tmp_path, rng):
  vis = Visualizer(exp_name="t", web_dirs=[tmp_path], vis_vid_freq=2,
                   num_samples=3)
  assert vis.should_visualize(2, "continuous_eval")
  assert not vis.should_visualize(3, "continuous_eval")
  assert vis.should_visualize(3, "final_eval")
  nv, caps = 6, 2
  sims = rng.randn(nv * caps, nv)
  masks = np.ones((nv, caps))
  vis.visualize_ranking(
      sims=sims, query_masks=masks, epoch=2,
      meta={"paths": [f"v{i}.mp4" for i in range(nv)],
            "raw_captions": [[np.array(["hello", "world"])] * caps] * nv,
            "vid_weights": np.abs(rng.rand(nv, 2)),
            "text_weights": np.abs(rng.rand(nv * caps, 2))},
      nested_metrics={}, modalities=["rgb", "s3d"],
      subdir_name="test_continuous_eval", sets="continuous_eval")
  pages = list(tmp_path.rglob("*.html"))
  assert pages


def test_checkpoint_roundtrip(tmp_path, rng):
  from mmt_tpu.train import checkpoint as ckpt

  state = {"params": {"w": rng.randn(3, 3).astype(np.float32)},
           "epoch": 5, "n_steps": 17}
  path = ckpt.save_checkpoint(tmp_path, state, epoch=5)
  assert path.endswith("checkpoint-epoch5.msgpack")
  raw = ckpt.load_checkpoint_raw(path)
  np.testing.assert_array_equal(raw["params"]["w"], state["params"]["w"])
  assert raw["epoch"] == 5

  ckpt.save_checkpoint(tmp_path, state, epoch=7)
  ckpt.save_checkpoint(tmp_path, state, epoch=6)
  assert ckpt.last_checkpoint(tmp_path).endswith("epoch7.msgpack")
  ckpt.purge_stale_checkpoints(tmp_path, num_keep=1)
  import pathlib
  left = sorted(p.name for p in pathlib.Path(tmp_path).glob("checkpoint-*"))
  assert left == ["checkpoint-epoch7.msgpack"]


def test_async_checkpoint_writer_matches_sync(tmp_path, rng):
  from mmt_tpu.train import checkpoint as ckpt

  state = {"params": {"w": rng.randn(4, 4).astype(np.float32)},
           "epoch": 3, "n_steps": 9}
  sync_dir, async_dir = tmp_path / "sync", tmp_path / "async"
  ckpt.save_checkpoint(sync_dir, state, epoch=3, save_best=True)

  writer = ckpt.AsyncCheckpointWriter(async_enabled=True)
  writer.save(async_dir, state, epoch=3, save_best=True)
  writer.flush()
  for name in ("checkpoint-epoch3.msgpack", "trained_model.msgpack"):
    assert (async_dir / name).read_bytes() == (sync_dir / name).read_bytes()


def test_async_checkpoint_writer_orders_purge_after_save(tmp_path, rng):
  from mmt_tpu.train import checkpoint as ckpt

  state = {"params": {"w": rng.randn(2, 2).astype(np.float32)}}
  writer = ckpt.AsyncCheckpointWriter(async_enabled=True)
  writer.save(tmp_path, state, epoch=1)
  writer.save(tmp_path, state, epoch=2)
  writer.purge(tmp_path, num_keep=1)  # must see epoch 2's file
  writer.flush()
  import pathlib
  left = sorted(p.name for p in pathlib.Path(tmp_path).glob("checkpoint-*"))
  assert left == ["checkpoint-epoch2.msgpack"]


def test_async_checkpoint_writer_propagates_errors(tmp_path, rng):
  from mmt_tpu.train import checkpoint as ckpt

  # ckpt_dir is an existing FILE: mkdir(parents=True) in the worker fails.
  blocker = tmp_path / "not_a_dir"
  blocker.write_text("x")
  writer = ckpt.AsyncCheckpointWriter(async_enabled=True)
  writer.save(blocker, {"params": {}}, epoch=1)
  with pytest.raises(Exception):
    writer.flush()
  # A flushed error is consumed: the writer stays usable.
  writer.save(tmp_path, {"params": {}}, epoch=2)
  writer.flush()
  assert (tmp_path / "checkpoint-epoch2.msgpack").exists()


def test_position_embedding_pad_rule(rng):
  from mmt_tpu.train.checkpoint import match_checkpoint_to_model

  small = rng.randn(32, 8).astype(np.float32)
  loaded = {"vid_bert": {"position_embeddings": {"embedding": small}}}
  target = {"vid_bert": {"position_embeddings": {
      "embedding": np.zeros((102, 8), np.float32)}}}
  out = match_checkpoint_to_model(loaded, target)
  emb = out["vid_bert"]["position_embeddings"]["embedding"]
  assert emb.shape == (102, 8)
  np.testing.assert_array_equal(emb[:32], small)
  assert np.all(emb[32:] == 0)
