"""Challenge-cut final eval through the CLI: pkl corpus, public-server
split, predictions CSV export (trainer/trainer.py:411-437 semantics)."""

import json
import os

import numpy as np
import pytest


def test_challenge_final_eval_writes_predictions(tmp_path):
  import sys
  sys.path.insert(0, os.path.dirname(__file__))
  import train as train_cli
  from mmt_tpu.data import synthetic
  from test_train_e2e import make_config

  experts = {"i3d": 1024, "r2p1d": 512}
  root = tmp_path
  data_dir = synthetic.generate(root, num_videos=8, num_test=4,
                                experts=experts, captions_per_video=2,
                                cut="c")
  os.environ["MMT_TPU_BERT_VOCAB"] = str(root / "vocab.txt")

  cfg = make_config(root, data_dir, root / "exps" / "chal")
  cfg["experts"] = {"modalities": ["i3d", "r2p1d"]}
  cfg["trainer"].update({"epochs": 1, "max_samples_per_epoch": 8})
  for key, split in (("train_sets", "trainval"),
                     ("continuous_eval_sets", "val"),
                     ("final_eval_sets", "test1")):
    for entry in cfg[key]:
      for m in entry["args"]["mix"]:
        m["cut_name"] = "c"
        m["split_name"] = split
        m["captions_per_video"] = 2 if split == "test1" else m.get(
            "captions_per_video", 1)
  path = root / "chal.json"
  path.write_text(json.dumps(cfg))
  train_cli.main(["--config", str(path)])

  exp = root / "exps" / "chal"
  pred_path = exp / "MSRVTT-public_server_val-predictions.csv"
  assert pred_path.exists(), "challenge predictions CSV missing"
  preds = np.loadtxt(pred_path, delimiter=",", dtype=int)
  assert preds.shape == (4 * 2, 4)  # valid queries x top-k (4 videos)
  assert (exp / "MSRVTT-test1-sims.npy").exists()
