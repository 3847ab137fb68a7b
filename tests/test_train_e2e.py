"""End-to-end CLI test: train 2 epochs on the synthetic corpus + eval.

The TPU-world analogue of the reference's golden-number regression runs
(SURVEY.md §4): a tiny corpus with learnable caption/video structure, a
tiny CENet, real checkpoints, real artifacts.
"""

import json
import os
import pathlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
  from mmt_tpu.data import synthetic
  root = tmp_path_factory.mktemp("e2e")
  data_dir = synthetic.generate(root, num_videos=14, num_test=6,
                                experts={"rgb": 2048, "s3d": 1024},
                                captions_per_video=3)
  os.environ["MMT_TPU_BERT_VOCAB"] = str(root / "vocab.txt")
  return root, data_dir


def make_config(root, data_dir, exp_root, **overrides):
  mix_common = {
      "dataset_name": "MSRVTT", "cut_name": "jsfusion",
      "data_dir": str(data_dir), "max_text_words": 12,
      "max_expert_tokens": 4,
  }
  arch_args = {
      "keep_missing_modalities": True,
      "test_caption_mode": "indep",
      "txt_inp": "bertftn", "txt_agg": "bertftn", "txt_wgh": "emb",
      "vid_wgh": "none", "vid_cont": "bert", "vid_inp": "both",
      "pos_enc": "tint", "out_tok": "mxp", "l2renorm": False,
      "txt_pro": "gbn", "same_dim": 48,
      "vid_bert_params": {
          "hidden_size": 48, "num_hidden_layers": 2,
          "num_attention_heads": 4, "intermediate_size": 64,
          "hidden_act": "gelu", "hidden_dropout_prob": 0.1,
          "attention_probs_dropout_prob": 0.1,
          "max_position_embeddings": 32, "type_vocab_size": 19,
          "initializer_range": 0.02, "layer_norm_eps": 1e-12,
      },
      "txt_bert_params": {"hidden_dropout_prob": 0.1,
                          "attention_probs_dropout_prob": 0.1},
      "text_bert_geometry": {
          "hidden_size": 48, "num_hidden_layers": 2,
          "num_attention_heads": 4, "intermediate_size": 64,
          "max_position_embeddings": 40,
      },
  }
  cfg = {
      "n_gpu": 1, "seed": 0, "cross_seed": 0,
      "experts": {"modalities": ["rgb", "s3d"]},
      "arch": {"type": "CENet", "args": arch_args},
      "train_sets": [{
          "type": "ExpertDataLoader",
          "args": {"mix": [{**mix_common, "split_name": "trainval",
                            "query_shuffling": "shufk1"}],
                   "batch_size": 4, "num_workers": 0},
      }],
      "continuous_eval_sets": [{
          "type": "ExpertDataLoader",
          "args": {"mix": [{**mix_common, "split_name": "test",
                            "captions_per_video": 1,
                            "query_shuffling": "indiv"}],
                   "batch_size": 6, "num_workers": 0},
      }],
      "final_eval_sets": [{
          "type": "ExpertDataLoader",
          "args": {"mix": [{**mix_common, "split_name": "test",
                            "captions_per_video": 1,
                            "query_shuffling": "indiv"}],
                   "batch_size": 6, "num_workers": 0},
      }],
      "optimizer": {"type": "Adam", "args": {"lr": 1e-3,
                                             "weight_decay": 0}},
      "loss": {"type": "MaxMarginRankingLoss",
               "args": {"margin": 0.05, "fix_norm": True}},
      "metrics": ["t2v_metrics", "v2t_metrics"],
      "lr_scheduler": {"type": "StepLR",
                       "args": {"step_size": 1, "gamma": 0.95}},
      "trainer": {"epochs": 2, "max_samples_per_epoch": 16,
                  "save_period": 1, "monitor": "max epoch",
                  "include_optim_in_ckpts": True,
                  "save_dir": str(exp_root)},
      "visualizer": {"type": "Visualizer",
                     "args": {"vis_vid_freq": 1, "num_samples": 3}},
  }
  cfg.update(overrides)
  return cfg


@pytest.fixture(scope="module")
def trained(workspace, tmp_path_factory):
  """Train once; several tests inspect the artifacts."""
  import train as train_cli
  root, data_dir = workspace
  exp_root = tmp_path_factory.mktemp("exps") / "tiny"
  cfg = make_config(root, data_dir, exp_root)
  cfg_path = root / "tiny_config.json"
  cfg_path.write_text(json.dumps(cfg))
  trainer = train_cli.main(["--config", str(cfg_path)])
  return trainer, exp_root, cfg_path, root, data_dir


def test_training_runs_and_saves(trained):
  trainer, exp_root, *_ = trained
  assert (exp_root / "config.json").exists()
  assert (exp_root / "trained_model.msgpack").exists()
  assert (exp_root / "exp_results.json").exists()
  assert (exp_root / "exp_completed_flag.txt").exists()
  assert (exp_root / "perf_log.txt").exists()
  # final-eval sims artifact
  assert (exp_root / "MSRVTT-test-sims.npy").exists()


def test_metrics_recorded(trained):
  trainer, exp_root, *_ = trained
  with open(exp_root / "exp_results.json") as f:
    res = json.load(f)
  perfs = res["perfs"]["MSRVTT_jsfusion_test"]
  assert "t2v_metrics/R1/final_eval" in perfs
  assert 0 <= perfs["t2v_metrics/R1/final_eval"] <= 100


def test_checkpoint_purge(trained):
  trainer, exp_root, *_ = trained
  ckpts = list(exp_root.glob("checkpoint-epoch*.msgpack"))
  assert len(ckpts) <= trainer.num_keep_ckpts


def test_visualizer_output(trained):
  trainer, exp_root, *_ = trained
  pages = list((exp_root / "visualisations").rglob("*.html"))
  assert pages, "expected HTML ranking pages"


def test_only_eval_resume(trained):
  """--only_eval + --load_checkpoint reproduces the eval without training
  (warm-start path, base/base_trainer.py:452-462)."""
  import train as train_cli
  trainer, exp_root, cfg_path, root, data_dir = trained
  cfg = make_config(root, data_dir, exp_root.parent / "tiny_eval")
  cfg_path2 = root / "tiny_eval_config.json"
  cfg_path2.write_text(json.dumps(cfg))
  t2 = train_cli.main(["--config", str(cfg_path2), "--only_eval",
                       "--load_checkpoint",
                       str(exp_root / "trained_model.msgpack")])
  with open(exp_root.parent / "tiny_eval" / "exp_results.json") as f:
    res2 = json.load(f)
  with open(exp_root / "exp_results.json") as f:
    res1 = json.load(f)
  a = res1["perfs"]["MSRVTT_jsfusion_test"]["t2v_metrics/R1/final_eval"]
  b = res2["perfs"]["MSRVTT_jsfusion_test"]["t2v_metrics/R1/final_eval"]
  assert a == b, "eval after checkpoint reload must reproduce metrics"
  # warm-start provenance note
  assert (exp_root.parent / "tiny_eval" / "info_checkpoint.txt").exists()


def test_loss_decreases(trained):
  trainer, exp_root, *_ = trained
  losses = []
  with open(exp_root / "perf_log.txt") as f:
    for line in f:
      entry = json.loads(line)
      if entry.get("loss"):
        losses.append(entry["loss"])
  assert len(losses) >= 2
  assert all(np.isfinite(l) for l in losses)


def test_resume_restores_rng_stream(trained, tmp_path):
  """Restart resume restores counters AND the model RNG key (exact
  dropout-stream continuation — beyond the reference, which loses torch
  RNG state across --resume)."""
  import jax
  import train as train_cli
  trainer, exp_root, cfg_path, root, data_dir = trained
  rng_before = jax.random.key_data(trainer.rng)

  cfg = make_config(root, data_dir, exp_root)  # same exp dir => restart
  cfg["trainer"]["epochs"] = 2                 # already done; eval only
  cfg_path3 = root / "resume_cfg.json"
  cfg_path3.write_text(json.dumps(cfg))
  t2 = train_cli.main(["--resume", str(exp_root)])
  assert t2.start_epoch == trainer.epoch + 1
  assert t2.n_steps == trainer.n_steps
  np.testing.assert_array_equal(
      np.asarray(jax.random.key_data(t2.rng)), np.asarray(rng_before))


def test_fused_eval_matches_matrix_path(trained):
  """Continuous eval through the fused no-matrix ranking path produces
  the same metrics as the materialized-similarity path."""
  trainer = trained[0]
  old = trainer.fused_eval_from_videos
  try:
    trainer.fused_eval_from_videos = 0
    res_matrix = trainer._valid_epoch(epoch=0, sets="continuous_eval")
    trainer.fused_eval_from_videos = 1   # force the fused path
    res_fused = trainer._valid_epoch(epoch=0, sets="continuous_eval")
  finally:
    trainer.fused_eval_from_videos = old
  for ds, nested in res_matrix["metrics"].items():
    for metric_name, vals in nested.items():
      for key in ("R1", "R5", "R10", "MedR", "MeanR"):
        np.testing.assert_allclose(
            res_fused["metrics"][ds][metric_name][key], vals[key],
            err_msg=f"{ds}/{metric_name}/{key}")


def test_preemption_defers_and_stamps_completed_epoch(trained):
  """SIGTERM must not save inside a step (donated buffers) — the handler
  only sets a flag; _maybe_preempt_exit then checkpoints stamped with
  the last COMPLETED epoch so restart re-runs the interrupted one."""
  import signal

  from mmt_tpu.train import checkpoint as ckpt_lib

  trainer, exp_root, cfg_path, root, data_dir = trained
  # Other tests may have installed handlers bound to their own trainers;
  # bind the signal back to this one.
  trainer._install_preemption_handler()
  handler = signal.getsignal(signal.SIGTERM)
  assert callable(handler)
  trainer._preempt_requested = False
  handler(signal.SIGTERM, None)          # must NOT raise or save
  assert trainer._preempt_requested

  with pytest.raises(SystemExit) as exc:
    trainer._maybe_preempt_exit(1)       # mid-epoch-2: epoch 1 completed
  assert exc.value.code == 143
  path = pathlib.Path(trainer.exp_dir) / "checkpoint-epoch1.msgpack"
  assert path.exists()
  state = ckpt_lib.load_checkpoint_raw(path)
  assert int(state["epoch"]) == 1, "restart must re-run the cut epoch"
  # flag cleared path: no request -> no exit
  trainer._preempt_requested = False
  trainer._maybe_preempt_exit(1)         # returns quietly


def test_monitor_key_validated_at_startup(trained):
  """A monitor string the epoch log can never contain must raise at
  Trainer construction, not silently disable early stopping mid-run
  (the reference's behavior, base/base_trainer.py:150-177 — exceeded
  here).  Valid metric keys and scalar keys are both accepted."""
  import train as train_cli

  trainer, exp_root, cfg_path, root, data_dir = trained
  cfg = json.loads(cfg_path.read_text())

  good = dict(cfg)
  good["trainer"] = {**cfg["trainer"],
                    "monitor": "max MSRVTT_jsfusion_test/t2v_metrics/R1",
                    "epochs": 1, "max_samples_per_epoch": 4,
                    "save_dir": str(exp_root / "mon_good")}
  good_path = root / "mon_good.json"
  good_path.write_text(json.dumps(good))
  train_cli.main(["--config", str(good_path)])   # must construct + run

  bad = dict(cfg)
  bad["trainer"] = {**cfg["trainer"],
                    "monitor": "max MSRVTT_jsfusion_test/t2v_metrics/R2",
                    "save_dir": str(exp_root / "mon_bad")}
  bad_path = root / "mon_bad.json"
  bad_path.write_text(json.dumps(bad))
  with pytest.raises(ValueError, match="will never appear"):
    train_cli.main(["--config", str(bad_path)])


def test_last_checkpoint_ignores_unloadable_pth(tmp_path):
  """Auto-resume discovery must never return a torch .pth (this runtime
  cannot deserialize it; convert first)."""
  from mmt_tpu.train.checkpoint import last_checkpoint

  (tmp_path / "checkpoint-epoch7.pth").write_bytes(b"torchzip")
  assert last_checkpoint(tmp_path) is None
  (tmp_path / "checkpoint-epoch5.msgpack").write_bytes(b"x")
  got = last_checkpoint(tmp_path)
  assert got is not None and got.endswith("checkpoint-epoch5.msgpack")
