"""Config-matrix smoke e2e: alternative architectures/optimizers/losses
train one epoch + eval through the real CLI (the reference's config
surface, exercised combination by combination)."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
  from mmt_tpu.data import synthetic
  root = tmp_path_factory.mktemp("matrix")
  data_dir = synthetic.generate(root, num_videos=10, num_test=4,
                                experts={"rgb": 2048, "s3d": 1024},
                                captions_per_video=2)
  os.environ["MMT_TPU_BERT_VOCAB"] = str(root / "vocab.txt")
  return root, data_dir


def run_cfg(root, data_dir, tmp_path, name, **tweaks):
  import sys
  sys.path.insert(0, os.path.dirname(__file__))
  import train as train_cli
  from test_train_e2e import make_config

  cfg = make_config(root, data_dir, tmp_path / name)
  cfg["trainer"].update({"epochs": 1, "max_samples_per_epoch": 8})
  arch = tweaks.pop("arch", {})
  cfg["arch"]["args"].update(arch)
  cfg.update(tweaks)
  path = tmp_path / f"{name}.json"
  path.write_text(json.dumps(cfg))
  trainer = train_cli.main(["--config", str(path)])
  res_path = tmp_path / name / "exp_results.json"
  assert res_path.exists()
  with open(res_path) as f:
    res = json.load(f)
  r1 = res["perfs"]["MSRVTT_jsfusion_test"]["t2v_metrics/R1/final_eval"]
  assert 0 <= r1 <= 100
  return trainer


def test_infonce_ranger(workspace, tmp_path):
  root, data_dir = workspace
  run_cfg(root, data_dir, tmp_path, "infonce_ranger",
          loss={"type": "InfoNceLoss", "args": {}},
          optimizer={"type": "Ranger", "args": {"lr": 1e-3}})


def test_coll_gating(workspace, tmp_path):
  root, data_dir = workspace
  run_cfg(root, data_dir, tmp_path, "coll",
          arch={"vid_cont": "coll", "vid_inp": "agg", "vid_wgh": "nrm"})


def test_vid_cont_none_gem(workspace, tmp_path):
  root, data_dir = workspace
  run_cfg(root, data_dir, tmp_path, "none_gem",
          arch={"vid_cont": "none", "vid_inp": "agg", "txt_pro": "gem",
                "txt_wgh": "none", "vid_wgh": "nrm"})


def test_vid_wgh_emb_requires_bert(workspace, tmp_path):
  """vid_wgh='emb' without the video transformer is a config error (the
  reference would crash with a NameError; we fail fast)."""
  root, data_dir = workspace
  with pytest.raises(Exception, match="vid_wgh='emb'"):
    run_cfg(root, data_dir, tmp_path, "bad_emb",
            arch={"vid_cont": "none", "vid_inp": "agg", "vid_wgh": "emb"})


def test_bert_maxpool_ordr(workspace, tmp_path):
  root, data_dir = workspace
  run_cfg(root, data_dir, tmp_path, "mxp_ordr",
          arch={"txt_agg": "bertftnmxp", "pos_enc": "ordr",
                "out_tok": "mnp"})


def test_frozen_text_bert(workspace, tmp_path):
  """bertfrz + txt_inp=bertfrz through the CLI freeze-mask path; frozen
  encoder params must not move."""
  import numpy as np
  import jax
  root, data_dir = workspace
  trainer = run_cfg(root, data_dir, tmp_path, "frozen",
                    arch={"txt_agg": "bertfrz", "txt_inp": "bertfrz"})
  # Re-derive the trainer's init params (same rng chain as
  # Trainer._init_state: PRNGKey(seed) split 3 ways).
  _, init_rng, drop_rng = jax.random.split(jax.random.PRNGKey(0), 3)
  init = trainer.model.init(
      {"params": init_rng, "dropout": drop_rng},
      _probe_batch(trainer), train=False)["params"]
  for layer in ("layer_0", "layer_1"):
    a = trainer.params["txt_bert"]["encoder"][layer]["query"]["kernel"]
    b = init["txt_bert"]["encoder"][layer]["query"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  # something else did train
  moved = np.abs(np.asarray(trainer.params["vid_bert"]["encoder"]["layer_0"]
                            ["query"]["kernel"])
                 - np.asarray(init["vid_bert"]["encoder"]["layer_0"]
                              ["query"]["kernel"])).sum()
  assert moved > 0


def _probe_batch(trainer):
  loader = trainer.data_loaders["final_eval_sets"][0]["loader"]
  from mmt_tpu.train.trainer import model_batch
  return model_batch(next(iter(loader)))


def test_activitynet_style_cat(workspace, tmp_path):
  """'cat' query shuffling with longer text (ActivityNet paragraph
  style)."""
  import sys
  sys.path.insert(0, os.path.dirname(__file__))
  import train as train_cli
  from test_train_e2e import make_config
  root, data_dir = workspace
  cfg = make_config(root, data_dir, tmp_path / "anet")
  cfg["trainer"].update({"epochs": 1, "max_samples_per_epoch": 8})
  for key in ("train_sets", "continuous_eval_sets", "final_eval_sets"):
    for entry in cfg[key]:
      for m in entry["args"]["mix"]:
        m["query_shuffling"] = "cat"
        m["max_text_words"] = 20
  path = tmp_path / "anet.json"
  path.write_text(json.dumps(cfg))
  train_cli.main(["--config", str(path)])
  assert (tmp_path / "anet" / "exp_completed_flag.txt").exists()


def test_n_pairs_and_clip_windows(workspace, tmp_path):
  """HowTo100M-style sampling: n_pairs clips per video with bounded
  clip_duration / caption_length windows."""
  import sys
  sys.path.insert(0, os.path.dirname(__file__))
  import train as train_cli
  from test_train_e2e import make_config
  root, data_dir = workspace
  cfg = make_config(root, data_dir, tmp_path / "pairs")
  cfg["trainer"].update({"epochs": 1, "max_samples_per_epoch": 16})
  for entry in cfg["train_sets"]:
    entry["args"]["n_pairs"] = 2
    for m in entry["args"]["mix"]:
      m["clip_duration"] = 5
      m["caption_length"] = 2
  path = tmp_path / "pairs.json"
  path.write_text(json.dumps(cfg))
  train_cli.main(["--config", str(path)])
  assert (tmp_path / "pairs" / "exp_completed_flag.txt").exists()


def test_wo2v_vlad_pipeline(workspace, tmp_path):
  """Word-vector tokenizer + NetVLAD text path through the CLI
  (utils/nlp_utils.py:33-39 + model/model.py:196-217 semantics)."""
  import sys
  sys.path.insert(0, os.path.dirname(__file__))
  import numpy as np
  import train as train_cli
  from test_train_e2e import make_config
  from mmt_tpu.data.synthetic import TOPICS, FILLER

  root, data_dir = workspace
  # word2vec text-format vectors covering the synthetic vocabulary
  words = sorted(set(TOPICS + FILLER))
  rng = np.random.RandomState(0)
  lines = [f"{len(words)} 16"]
  for w in words:
    vec = " ".join(f"{x:.4f}" for x in rng.randn(16))
    lines.append(f"{w} {vec}")
  wv_path = tmp_path / "vectors.txt"
  wv_path.write_text("\n".join(lines) + "\n")
  os.environ["MMT_TPU_WORD_VECTORS"] = str(wv_path)

  cfg = make_config(root, data_dir, tmp_path / "wo2v")
  cfg["trainer"].update({"epochs": 1, "max_samples_per_epoch": 8})
  cfg["arch"]["args"].update({"txt_agg": "vlad", "txt_inp": "wo2vfrz"})
  path = tmp_path / "wo2v.json"
  path.write_text(json.dumps(cfg))
  trainer = train_cli.main(["--config", str(path)])
  assert (tmp_path / "wo2v" / "exp_completed_flag.txt").exists()
  # pretrained table was injected ([PAD]/[UNK] rows zero) and stayed
  # frozen (wo2vfrz)
  table = np.asarray(trainer.params["word_embeddings"]["word_embeddings"])
  assert np.all(table[:2] == 0)
  np.testing.assert_array_equal(table, trainer.tokenizer.weights)


def test_curriculum_two_train_sets(workspace, tmp_path):
  """Pretrain->finetune curriculum: first train set used until its
  until_epoch, then the second (trainer/trainer.py:137-143)."""
  import sys
  sys.path.insert(0, os.path.dirname(__file__))
  import train as train_cli
  from test_train_e2e import make_config

  root, data_dir = workspace
  cfg = make_config(root, data_dir, tmp_path / "curr")
  cfg["trainer"].update({"epochs": 3, "max_samples_per_epoch": 8})
  first = json.loads(json.dumps(cfg["train_sets"][0]))
  first["args"]["until_epoch"] = 1
  first["args"]["batch_size"] = 2
  cfg["train_sets"] = [first, cfg["train_sets"][0]]
  path = tmp_path / "curr.json"
  path.write_text(json.dumps(cfg))
  trainer = train_cli.main(["--config", str(path)])
  assert (tmp_path / "curr" / "exp_completed_flag.txt").exists()
  log = (tmp_path / "curr" / "log.txt").read_text()
  # epoch 1 runs 4 batches of 2; epochs 2-3 run 2 batches of 4
  assert "Train Epoch: 1 [1/4]" in log
  assert "Train Epoch: 2 [1/2]" in log
