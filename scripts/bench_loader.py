#!/usr/bin/env python
"""Input-pipeline throughput benchmark (the docs/DATA.md numbers).

Measures cache-hot train-mode loader throughput at the flagship
7-expert geometry with random row picks (max_feats > max_expert_tokens
— the path the feat-block memo can never cache), Python vs native
assembly, 0 vs 2 worker threads.

The reference has no loader benchmark; its input path is 64 fork()ed
torch DataLoader workers (/root/reference/data_loader/data_loaders.py:
23-70).  A TPU host feeding one chip gets one core, so the per-sample
cost itself is what this measures.

Run on CPU (no TPU needed, and the tunnel stays free):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/bench_loader.py
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP_EXPERTS = {"face": 512, "ocr": 300, "rgb": 2048, "s3d": 1024,
                    "scene": 2208, "speech": 300, "vggish": 128}


def build_corpus(root, num_videos, max_feats):
  from mmt_tpu.data import synthetic
  return synthetic.generate(root, num_videos=num_videos, num_test=8,
                            experts=FLAGSHIP_EXPERTS,
                            captions_per_video=3, max_feats=max_feats)


def run(data_dir, tok, native, workers, batch_size, batches, warm):
  from mmt_tpu.data import native_assembler as nasm
  from mmt_tpu.data.loader import ExpertDataLoader
  nasm.set_enabled(native)
  np.random.seed(0)
  mix = [{"dataset_name": "MSRVTT", "cut_name": "jsfusion",
          "data_dir": str(data_dir), "split_name": "trainval",
          "max_text_words": 30, "max_expert_tokens": 30,
          "query_shuffling": "shufk1",
          "temporal_encoding_window": 1, "mix_weight": 1.0}]
  ldr = ExpertDataLoader(mix=mix, num_workers=workers,
                         batch_size=batch_size,
                         raw_input_dims=FLAGSHIP_EXPERTS, training=True,
                         tokenizer=tok, loaded_data={})
  it = iter(ldr["loader"])
  for _ in range(warm):       # fill the record cache: all epochs sweep it
    next(it)
  t0 = time.perf_counter()
  for _ in range(batches):
    next(it)
  dt = time.perf_counter() - t0
  nasm.set_enabled(None)
  return batches * batch_size / dt


def main():
  ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
  ap.add_argument("--videos", type=int, default=200)
  ap.add_argument("--max_feats", type=int, default=40,
                  help="> max_expert_tokens(30): forces random-pick "
                       "training assembly, the memo-proof path")
  ap.add_argument("--batch_size", type=int, default=32)
  ap.add_argument("--batches", type=int, default=100)
  ap.add_argument("--warm", type=int, default=20)
  args = ap.parse_args()

  from mmt_tpu.data import native_assembler as nasm
  from mmt_tpu.tokenization import create_tokenizer
  root = pathlib.Path(tempfile.mkdtemp(prefix="mmt_loader_bench"))
  data_dir = build_corpus(root, args.videos, args.max_feats)
  tok = create_tokenizer("bertftn", vocab_file=str(root / "vocab.txt"))

  have_native = pathlib.Path(nasm._lib_path()).exists()
  if not have_native:
    print("note: native/libassembler.so missing (make -C native); "
          "skipping native rows")
  for workers in (0, 2):
    for native in ((False, True) if have_native else (False,)):
      rate = run(data_dir, tok, native, workers, args.batch_size,
                 args.batches, args.warm)
      print(f"workers={workers} native={int(native)}: "
            f"{rate:7.0f} samples/s", flush=True)


if __name__ == "__main__":
  main()
