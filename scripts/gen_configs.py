#!/usr/bin/env python
"""Generate the published experiment configs.

Emits mmt_tpu experiment JSONs semantically equivalent to the reference's
configs_pub/eccv20 set (same schema — the reference's own config files
also load directly).  Generated, not copied: one parametrized template
per corpus.

  python scripts/gen_configs.py [--out configs/eccv20]
"""

from __future__ import annotations

import argparse
import json
import os

ECCV20_SEVEN_EXPERTS = ["face", "ocr", "rgb", "s3d", "scene", "speech",
                        "vggish"]
SV_EXPERTS = ["s3d", "vggish"]


def vid_bert(max_pos=32, type_vocab=19):
  return {
      "hidden_size": 512,
      "num_hidden_layers": 4,
      "num_attention_heads": 4,
      "intermediate_size": 3072,
      "hidden_act": "gelu",
      "hidden_dropout_prob": 0.1,
      "attention_probs_dropout_prob": 0.1,
      "max_position_embeddings": max_pos,
      "type_vocab_size": type_vocab,
      "initializer_range": 0.02,
      "layer_norm_eps": 1e-12,
  }


def arch(max_pos=32, type_vocab=19):
  return {
      "type": "CENet",
      "args": {
          "keep_missing_modalities": True,
          "test_caption_mode": "indep",
          "txt_inp": "bertftn",
          "txt_agg": "bertftn",
          "txt_pro": "gbn",
          "txt_wgh": "emb",
          "vid_inp": "both",
          "vid_cont": "bert",
          "vid_wgh": "none",
          "pos_enc": "tint",
          "out_tok": "mxp",
          "l2renorm": False,
          "vid_bert_params": vid_bert(max_pos, type_vocab),
          "txt_bert_params": {"hidden_dropout_prob": 0.1,
                              "attention_probs_dropout_prob": 0.1},
      },
  }


def loader(mix, batch_size, num_workers=8, **extra):
  args = {"mix": mix, "batch_size": batch_size, "num_workers": num_workers}
  args.update(extra)
  return {"type": "ExpertDataLoader", "args": args}


def mix_entry(dataset, cut, split, data_dir, **kw):
  entry = {"dataset_name": dataset, "cut_name": cut, "split_name": split,
           "data_dir": data_dir, "temporal_encoding_window": 1,
           "max_text_words": 30, "max_expert_tokens": 30}
  entry.update(kw)
  return entry


def base_config(modalities, face_dim=512, gamma=0.95, epochs=50,
                max_samples=32000, vis_freq=25.0, max_pos=32, type_vocab=19):
  return {
      "seed": 0,
      "cross_seed": 0,
      "experts": {"face_dim": face_dim, "modalities": modalities},
      "arch": arch(max_pos, type_vocab),
      "optimizer": {"type": "Adam", "args": {"lr": 5e-05,
                                             "weight_decay": 0}},
      "loss": {"type": "MaxMarginRankingLoss",
               "args": {"margin": 0.05, "fix_norm": True}},
      "metrics": ["t2v_metrics", "v2t_metrics"],
      "lr_scheduler": {"type": "StepLR", "args": {"step_size": 1,
                                                  "gamma": gamma}},
      "visualizer": {"type": "Visualizer",
                     "args": {"vis_vid_freq": vis_freq, "num_samples": 20}},
      "trainer": {"epochs": epochs, "max_samples_per_epoch": max_samples,
                  "save_period": 1, "skip_first_n_saves": 0,
                  "include_optim_in_ckpts": True, "monitor": "max epoch"},
  }


def msrvtt(cut):
  data_dir = "data/MSRVTT/symlinked-feats"
  cfg = base_config(ECCV20_SEVEN_EXPERTS)
  train = mix_entry("MSRVTT", cut, "trainval", data_dir, mix_weight=1.0,
                    query_shuffling="shufk1")
  ev = lambda split, workers: loader(
      [mix_entry("MSRVTT", cut, split, data_dir, captions_per_video=1,
                 query_shuffling="indiv")], 32, num_workers=workers)
  cfg["train_sets"] = [loader([train], 32)]
  cfg["continuous_eval_sets"] = [ev("trn", 8), ev("test", 8)]
  cfg["final_eval_sets"] = [ev("test", 0)]
  return cfg


def lsmdc():
  data_dir = "data/LSMDC"
  cfg = base_config(ECCV20_SEVEN_EXPERTS, face_dim=128)
  train = mix_entry("LSMDC", "full", "trainval", data_dir, mix_weight=1.0,
                    query_shuffling="cat")
  ev = lambda workers: loader(
      [mix_entry("LSMDC", "full", "test", data_dir, captions_per_video=1,
                 query_shuffling="cat")], 32, num_workers=workers)
  cfg["train_sets"] = [loader([train], 32)]
  cfg["continuous_eval_sets"] = [ev(8)]
  cfg["final_eval_sets"] = [ev(0)]
  # LSMDC's video-type table only needs the base ids
  cfg["arch"]["args"]["vid_bert_params"]["type_vocab_size"] = 10
  return cfg


def activitynet(batch_size=32):
  data_dir = "data/ActivityNet"
  cfg = base_config(SV_EXPERTS, gamma=0.9, max_pos=102, type_vocab=19)
  common = dict(query_shuffling="cat", max_text_words=100,
                max_expert_tokens=100)
  train = mix_entry("ActivityNet", "val1", "trainval", data_dir,
                    mix_weight=1.0, **common)
  ev = lambda workers: loader(
      [mix_entry("ActivityNet", "val1", "test", data_dir,
                 captions_per_video=1, **common)],
      batch_size, num_workers=workers)
  cfg["train_sets"] = [loader([train], batch_size)]
  cfg["continuous_eval_sets"] = [ev(8)]
  cfg["final_eval_sets"] = [ev(0)]
  return cfg


def howto100m():
  data_dir = "data/HowTo100M"
  cfg = base_config(SV_EXPERTS, gamma=0.98, epochs=200, max_samples=640000,
                    vis_freq=50)
  common = dict(query_shuffling="indiv", clip_duration=30,
                caption_length=30)
  cfg["train_sets"] = [loader(
      [mix_entry("HowTo100M", "full", "train", data_dir, mix_weight=1.0,
                 **common)], 64)]
  cfg["continuous_eval_sets"] = [
      loader([mix_entry("HowTo100M", "full", split, data_dir,
                        mix_weight=1.0, captions_per_video=1, **common)],
             64, num_workers=8)
      for split in ("trn", "val", "test")
  ] + [loader([mix_entry("MSRVTT", "jsfusion", "test",
                         "data/MSRVTT/symlinked-feats",
                         captions_per_video=1, query_shuffling="indiv")],
              32, num_workers=0)]
  cfg["final_eval_sets"] = [loader(
      [mix_entry("HowTo100M", "full", "test", data_dir, mix_weight=1.0,
                 captions_per_video=1, **common)], 64, num_workers=8)]
  return cfg


CONFIGS = {
    "msrvtt_jsfusion_trainval.json": lambda: msrvtt("jsfusion"),
    "msrvtt_miech_trainval.json": lambda: msrvtt("miech"),
    # finetune config used with --load_checkpoint <HowTo100M pretrain>
    "prtrn_msrvtt_jsfusion_trainval.json": lambda: msrvtt("jsfusion"),
    "lsmdc_full_trainval.json": lsmdc,
    "activitynet_val1_trainval.json": lambda: activitynet(32),
    "activitynet_val1_trainval_bs24.json": lambda: activitynet(24),
    "howto100m_full_train.json": howto100m,
}


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--out", default="configs/eccv20")
  args = parser.parse_args()
  os.makedirs(args.out, exist_ok=True)
  for name, fn in CONFIGS.items():
    path = os.path.join(args.out, name)
    with open(path, "w") as f:
      json.dump(fn(), f, indent=2, sort_keys=True)
      f.write("\n")
    print("wrote", path)


if __name__ == "__main__":
  main()
