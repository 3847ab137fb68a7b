"""Sustained end-to-end training throughput through the REAL trainer.

The documented train-step numbers (bench.py: ~28 ms b32 device-chained)
measure the jitted step alone; this harness measures what a user
actually gets: a full epoch through ``Trainer._train_epoch`` — sample
assembly (synthetic 7-expert flagship corpus, random-pick path), the
2-deep device prefetch (data/loader.py:device_prefetch), H2D transfer,
the donated train step, and the trainer's own loss bookkeeping — at
flagship geometry (512-wide video BERT, stock bert-base text tower over
a ~29k-entry vocab) on the real chip (round-4 VERDICT item 2).

Protocol: one epoch of --samples samples (default 16384) at --batch 32
or 128, --workers assembly threads.  Reports wall samples/s next to the
step-only rate implied by bench.py, plus the tunnel RTT so the fixed
dispatch overhead a local runtime would not pay is quantified.

Run on the tunneled TPU (serialize with other TPU jobs):
  nohup python scripts/bench_sustained.py --batch 32 > /tmp/sus32.log &
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP_EXPERTS = {"face": 512, "ocr": 300, "rgb": 2048, "s3d": 1024,
                    "scene": 2208, "speech": 300, "vggish": 128}


def make_flagship_config(root, data_dir, exp_root, batch_size, samples,
                         workers, tiny=False):
  mix = {"dataset_name": "MSRVTT", "cut_name": "jsfusion",
         "data_dir": str(data_dir), "max_text_words": 30,
         "max_expert_tokens": 30, "split_name": "trainval",
         "query_shuffling": "shufk1"}
  hidden = 48 if tiny else 512
  arch_args = {
      "keep_missing_modalities": True, "test_caption_mode": "indep",
      "txt_inp": "bertftn", "txt_agg": "bertftn", "txt_wgh": "emb",
      "vid_wgh": "none", "vid_cont": "bert", "vid_inp": "both",
      "pos_enc": "tint", "out_tok": "mxp", "l2renorm": False,
      "txt_pro": "gbn", "same_dim": hidden,
      "compute_dtype": "float32" if tiny else "bfloat16",
      "vid_bert_params": {
          "hidden_size": hidden, "num_hidden_layers": 2 if tiny else 4,
          "num_attention_heads": 4,
          "intermediate_size": 64 if tiny else 3072,
          "hidden_act": "gelu", "hidden_dropout_prob": 0.1,
          "attention_probs_dropout_prob": 0.1,
          "max_position_embeddings": 32, "type_vocab_size": 19,
          "initializer_range": 0.02, "layer_norm_eps": 1e-12,
      },
      "txt_bert_params": {"hidden_dropout_prob": 0.1,
                          "attention_probs_dropout_prob": 0.1},
  }
  if tiny:
    arch_args["text_bert_geometry"] = {
        "hidden_size": hidden, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 40}
  return {
      "n_gpu": 1, "seed": 0, "cross_seed": 0,
      "experts": {"face_dim": 512,
                  "modalities": sorted(FLAGSHIP_EXPERTS)},
      "arch": {"type": "CENet", "args": arch_args},
      "train_sets": [{
          "type": "ExpertDataLoader",
          "args": {"mix": [dict(mix)], "batch_size": batch_size,
                   "num_workers": workers},
      }],
      "continuous_eval_sets": [],
      "final_eval_sets": [{
          "type": "ExpertDataLoader",
          "args": {"mix": [{**mix, "split_name": "test",
                            "captions_per_video": 1,
                            "query_shuffling": "indiv"}],
                   "batch_size": 8, "num_workers": 0},
      }],
      "optimizer": {"type": "Adam", "args": {"lr": 1e-4,
                                             "weight_decay": 0}},
      "loss": {"type": "MaxMarginRankingLoss",
               "args": {"margin": 0.05, "fix_norm": True}},
      "metrics": ["t2v_metrics"],
      "lr_scheduler": {"type": "StepLR",
                       "args": {"step_size": 1, "gamma": 0.95}},
      "trainer": {"epochs": 1, "max_samples_per_epoch": samples,
                  "save_period": 100, "monitor": "off",
                  "save_dir": str(exp_root), "include_optim": False,
                  "async_checkpoint": True},
      "name": f"sustained_b{batch_size}",
  }


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--batch", type=int, default=32)
  ap.add_argument("--samples", type=int, default=16384)
  ap.add_argument("--workers", type=int, default=1)
  ap.add_argument("--videos", type=int, default=200)
  ap.add_argument("--tiny", action="store_true",
                  help="CPU smoke geometry (hidden 48, fp32)")
  ap.add_argument("--prestage", type=int, default=0,
                  help="pre-assemble + device_put N distinct batches and "
                       "cycle them through the REAL epoch loop: removes "
                       "the tunnel's per-batch H2D (which a real PCIe "
                       "host would overlap trivially) so the trainer-loop "
                       "overhead itself is measured at device speed")
  args = ap.parse_args(argv)

  import jax

  from mmt_tpu.data import synthetic
  from mmt_tpu.ops import enable_tpu_default_kernels
  enable_tpu_default_kernels()
  import train as train_cli

  root = pathlib.Path(tempfile.mkdtemp(prefix="mmt_sustained"))
  data_dir = synthetic.generate(root, num_videos=args.videos, num_test=8,
                                experts=FLAGSHIP_EXPERTS,
                                captions_per_video=3, max_feats=40)
  vocab = root / "vocab.txt"
  if not args.tiny:
    # bert-base-cased-scale vocab so the text embedding table (and the
    # optimizer pass over it) is flagship-sized.
    synthetic.write_large_vocab(vocab, n_words=20000, n_pieces=8300)
  os.environ["MMT_TPU_BERT_VOCAB"] = str(vocab)

  cfg = make_flagship_config(root, data_dir, root / "exps", args.batch,
                             args.samples, args.workers, tiny=args.tiny)
  cfg_path = root / "cfg.json"
  cfg_path.write_text(json.dumps(cfg))

  # Build the full Trainer via the CLI path, but drive the epoch
  # ourselves so compile time and the final eval are excluded from the
  # sustained-throughput window.
  import types
  from mmt_tpu import config as config_lib
  ns = types.SimpleNamespace(config=str(cfg_path), resume=None,
                             load_checkpoint=None, txt_bert_init=None,
                             device=None, only_eval=False, verbose=False)
  trainer = train_cli.build_trainer(config_lib.from_args(ns, primary=True))

  # Warm: compile the train step + fill the record cache with one short
  # pre-epoch (the measured epoch is cache-hot, like steady-state
  # training from the second epoch on).
  # Prestaged runs only need the compile (the measured epoch never
  # touches the real loader), so keep the warm epoch to one batch —
  # each flagship b128 batch is ~107 MB of tunnel H2D.
  trainer.max_samples_per_epoch = (1 if args.prestage else 4) * args.batch
  trainer._train_epoch(1)
  trainer.max_samples_per_epoch = args.samples

  h2d_mb = h2d_ms = None
  if args.prestage:
    from mmt_tpu.train.trainer import model_batch
    entry = trainer.data_loaders["train_sets"][0]
    real_loader = entry["loader"]
    host = []
    it = iter(real_loader)
    for _ in range(args.prestage):
      host.append(model_batch(next(it)))
    h2d_mb = sum(x.nbytes for b in host
                 for x in jax.tree_util.tree_leaves(b)
                 if hasattr(x, "nbytes")) / len(host) / 1e6
    # Raw tunnel H2D floor per batch: time every staging put and take
    # the MIN — tunnel bandwidth swings >10x between runs, so a
    # one-shot sample is noise.
    staged, puts = [], []
    for b in host:
      tic = time.perf_counter()
      arr = jax.device_put(b)
      float(jax.tree_util.tree_leaves(arr)[0].sum())   # sync this put
      puts.append((time.perf_counter() - tic) * 1000)
      staged.append(arr)
    h2d_ms = min(puts)

    class _Cycle:
      def __len__(self):
        return 10 ** 9
      def __iter__(self):
        import itertools
        return itertools.cycle(staged)

    entry.dataloaders["loader"] = _Cycle()

  tic = time.perf_counter()
  log = trainer._train_epoch(1)
  wall = time.perf_counter() - tic
  n = args.samples - args.samples % args.batch

  bare_ms = None
  if args.prestage:
    # Control: bare per-step dispatches of the SAME jitted step on the
    # same staged batch, one at a time with a final host read — the
    # floor ANY per-step (non-device-chained) dispatcher pays through
    # this runtime.  Sustained-vs-this isolates what the trainer loop
    # itself adds; sustained-vs-device-chained additionally includes the
    # per-dispatch tunnel overhead a local runtime would not pay.
    params, bs, opt = trainer.params, trainer.batch_stats, trainer.opt_state
    rng = jax.random.PRNGKey(123)
    CH = 32
    # One untimed warm call with the EXACT control signature (lr as a
    # Python float, matching the epoch loop) so a jit-cache miss (a
    # remote recompile is ~80 s over the tunnel) can't land inside the
    # timed window.
    rng, srng = jax.random.split(rng)
    params, bs, opt, loss = trainer.train_step(
        params, bs, opt, staged[0], 1e-4, srng)
    float(loss)
    tic = time.perf_counter()
    for i in range(CH):
      rng, srng = jax.random.split(rng)
      params, bs, opt, loss = trainer.train_step(
          params, bs, opt, staged[i % len(staged)], 1e-4, srng)
    float(loss)
    bare_ms = (time.perf_counter() - tic) * 1000 / CH
    trainer.params, trainer.batch_stats, trainer.opt_state = params, bs, opt

  tiny_fn = jax.jit(lambda a: a.sum())
  x = jax.device_put(np.ones((8, 8), np.float32))
  float(tiny_fn(x))
  rtt = min(_timed(lambda: float(tiny_fn(x))) for _ in range(10))

  out = {
      "metric": "sustained_train_samples_per_sec_per_chip",
      "batch": args.batch,
      "workers": args.workers,
      "samples": n,
      "wall_s": round(wall, 2),
      "samples_per_sec": round(n / wall, 1),
      "step_ms_implied": round(1000 * wall / (n / args.batch), 2),
      "dispatch_rtt_s": round(rtt, 4),
      "loss": round(float(log["loss"]), 5),
      "backend": jax.default_backend(),
  }
  if args.prestage:
    out.update(prestage_batches=args.prestage,
               batch_mbytes=round(h2d_mb, 1),
               tunnel_h2d_ms_per_batch=round(h2d_ms, 1),
               bare_per_step_dispatch_ms=round(bare_ms, 2))
  print(json.dumps(out))


def _timed(fn):
  tic = time.perf_counter()
  fn()
  return time.perf_counter() - tic


if __name__ == "__main__":
  main()
