#!/usr/bin/env python
"""Serving tail latency through the REAL HTTP server on the TPU.

Completes the SERVING.md performance story: the existing numbers are
mean throughput measured at the engine; this harness measures request
latency percentiles (p50/p90/p99) as a client of the actual
`serve_http` daemon — the full path a production caller sees
(HTTP parse -> handler lock -> tokenize -> jitted query -> JSON reply),
read back from the server's own /statz reservoir plus client-side
timing.  Wall numbers include this setup's ~27 ms dispatch-tunnel RTT
per request (an on-host runtime would subtract nearly all of it — the
device time at [64 x 100k] is ~3.3 ms, docs/SERVING.md).

Index: synthetic flagship-geometry corpus (N x 7 modalities x 512,
L2-normalized rows, L1 MoE weights) — serving perf depends on shapes,
not content.  Phases: interactive (batch 1, topk 5, GET) and bulk
(batch 64, topk 10, POST), fp32 and int8 engines.

Run on the tunneled TPU:  nohup python scripts/bench_serving.py > log &
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import tempfile
import time
import urllib.request

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_VIDEOS = int(os.environ.get("BENCH_INDEX", "100000"))
N_INTERACTIVE = int(os.environ.get("BENCH_REQS", "200"))
N_BULK = int(os.environ.get("BENCH_BULK_REQS", "50"))
WORDS = ("person cooking pasta kitchen soccer match goal rain city "
         "night dog park guitar song stage car road mountain beach").split()


def _synthetic_index(n, m, d, seed=0):
  from mmt_tpu.serving import RetrievalIndex
  rng = np.random.RandomState(seed)
  emb = rng.randn(n, m, d).astype(np.float32)
  emb /= np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
  w = rng.rand(n, m).astype(np.float32)
  w /= w.sum(-1, keepdims=True)
  ids = [f"video{i:07d}" for i in range(n)]
  return RetrievalIndex(emb, w, ids, [""] * n)


def _vocab_tokenizer():
  from mmt_tpu.tokenization import WordPieceTokenizer
  vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + sorted(set(WORDS))
  path = pathlib.Path(tempfile.mkdtemp()) / "vocab.txt"
  path.write_text("\n".join(vocab))
  return WordPieceTokenizer(str(path))


def _queries(rng, batch):
  return [" ".join(rng.choice(WORDS, size=5)) for _ in range(batch)]


def _get_json(url, payload=None):
  t0 = time.perf_counter()
  if payload is None:
    with urllib.request.urlopen(url) as r:
      body = json.loads(r.read())
  else:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
      body = json.loads(r.read())
  return body, time.perf_counter() - t0


def _pct(xs, p):
  xs = sorted(xs)
  return round(1e3 * xs[min(len(xs) - 1, int(p / 100 * len(xs)))], 2)


def main():
  import jax
  import jax.numpy as jnp
  import urllib.parse

  from __graft_entry__ import _flagship_model_and_batch
  from mmt_tpu.serving import RetrievalEngine, serve_http

  model, batch = _flagship_model_and_batch(batch_size=2,
                                           compute_dtype=jnp.bfloat16)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables))
  tok = _vocab_tokenizer()
  index = _synthetic_index(N_VIDEOS, 7, 512)
  print(f"model {n_params / 1e6:.1f}M params, index {N_VIDEOS} videos",
        flush=True)

  rng = np.random.RandomState(7)
  summary = {"index": N_VIDEOS, "params_m": round(n_params / 1e6, 1)}
  for quant in (None, "int8"):
    t0 = time.time()
    engine = RetrievalEngine(model, variables, tok, index, quantize=quant)
    server = serve_http(engine, host="127.0.0.1", port=0, block=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    label = quant or "fp32"
    try:
      # Warm both request-shape buckets (compiles excluded from stats).
      for _ in range(3):
        q = urllib.parse.quote(_queries(rng, 1)[0])
        _get_json(f"{base}/search?q={q}&topk=5")
        _get_json(f"{base}/search", {"queries": _queries(rng, 64),
                                     "topk": 10})
      stats0 = _get_json(f"{base}/statz")[0]
      print(f"[{label}] staged+warm in {time.time() - t0:.1f}s", flush=True)

      lat1 = []
      for _ in range(N_INTERACTIVE):
        q = urllib.parse.quote(_queries(rng, 1)[0])
        _, dt = _get_json(f"{base}/search?q={q}&topk=5")
        lat1.append(dt)
      lat64 = []
      for _ in range(N_BULK):
        _, dt = _get_json(f"{base}/search",
                          {"queries": _queries(rng, 64), "topk": 10})
        lat64.append(dt)
      statz = _get_json(f"{base}/statz")[0]
      assert statz["requests"] - stats0["requests"] == \
          N_INTERACTIVE + N_BULK
      summary[label] = {
          "batch1_ms": {"p50": _pct(lat1, 50), "p90": _pct(lat1, 90),
                        "p99": _pct(lat1, 99), "max": _pct(lat1, 100)},
          "batch64_ms": {"p50": _pct(lat64, 50), "p90": _pct(lat64, 90),
                         "p99": _pct(lat64, 99), "max": _pct(lat64, 100)},
          "batch64_qps": round(64 / (sorted(lat64)[len(lat64) // 2]), 0),
          "server_statz": statz.get("search_latency_ms"),
      }
      print(f"[{label}] {json.dumps(summary[label])}", flush=True)
    finally:
      server.shutdown()
  print(json.dumps(summary))


if __name__ == "__main__":
  main()
