#!/usr/bin/env python
"""Retrieval serving CLI: build an index from a trained experiment, then
answer text queries.

  # one-time index build
  python scripts/serve.py --config <cfg> --checkpoint <msgpack> \
      --build_index index.msgpack
  # query
  python scripts/serve.py --config <cfg> --checkpoint <msgpack> \
      --index index.msgpack --query "a man cooking pasta" [--topk 5]
  # HTTP daemon (GET /healthz, GET/POST /search)
  python scripts/serve.py --config <cfg> --checkpoint <msgpack> \
      --index index.msgpack --listen 8080
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logger = logging.getLogger("serve")


def load_model_and_loader(config_path, checkpoint_path):
  import jax
  from mmt_tpu import config as config_lib
  from mmt_tpu.ops import enable_tpu_default_kernels
  enable_tpu_default_kernels()
  from mmt_tpu.experts import compute_dims
  from mmt_tpu.models.cenet import CENet
  from mmt_tpu.registry import build
  from mmt_tpu.tokenization import create_tokenizer
  from mmt_tpu.train import checkpoint as ckpt_lib
  from mmt_tpu.train.trainer import model_batch
  import mmt_tpu.data.loader  # noqa: F401

  cfg = config_lib.load(config_path)
  expert_dims = compute_dims(cfg.raw)
  tokenizer = create_tokenizer(cfg.arch_args.get("txt_agg", "bertftn"))
  # Same constructor path as train.py — a raw CENet(**arch_args) here
  # would size the text vocab differently from training whenever a
  # custom vocab/geometry is in play, and the checkpoint's embedding
  # rows would silently keep their random init.
  from mmt_tpu.models.cenet import cenet_kwargs_from_arch_args
  model_kwargs, _ = cenet_kwargs_from_arch_args(cfg.arch_args, tokenizer)
  model = CENet(expert_dims=expert_dims, **model_kwargs)

  entry = build("data_loader", cfg["final_eval_sets"][0],
                raw_input_dims=expert_dims, training=False,
                tokenizer=tokenizer, loaded_data={},
                cross_seed=cfg.cross_seed)

  probe = model_batch(next(iter(entry["loader"])))
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      probe, train=False)
  raw = ckpt_lib.load_checkpoint_raw(checkpoint_path)
  # STRICT load: serving has no training loop to paper over a partial
  # init — any model leaf the checkpoint can't fill means the config
  # and checkpoint disagree (wrong vocab/geometry/arch), and the engine
  # would silently rank with random weights in that leaf.
  stats = {}
  params = ckpt_lib.merge_params(variables["params"], raw["params"],
                                 path="params", stats=stats)
  batch_stats = variables.get("batch_stats", {})
  if raw.get("batch_stats"):
    batch_stats = ckpt_lib.merge_params(batch_stats, raw["batch_stats"],
                                        path="batch_stats", stats=stats)
  elif batch_stats:
    # The model has BatchNorm running stats but the checkpoint carries
    # none at all — serving with freshly-initialized BN statistics is the
    # exact silent-partial-init failure the strict check exists for.
    raise ValueError(
        f"checkpoint {checkpoint_path} has no batch_stats collection but "
        f"the model built from {config_path} has BatchNorm running stats "
        f"({len(jax.tree_util.tree_leaves(batch_stats))} leaves) — the "
        f"engine would rank with freshly-initialized BN statistics")
  if stats.get("skipped"):
    raise ValueError(
        f"checkpoint {checkpoint_path} does not fill the model built from "
        f"{config_path}: {len(stats['skipped'])} leaves kept their random "
        f"init (first: {stats['skipped'][0]}) — config/checkpoint mismatch")
  variables = {"params": params, "batch_stats": batch_stats}
  mix0 = cfg["final_eval_sets"][0]["args"]["mix"][0]
  return model, variables, tokenizer, entry, mix0.get("max_text_words", 30)


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument("--config", required=True)
  parser.add_argument("--checkpoint", required=True)
  parser.add_argument("--build_index", default=None,
                      help="write the index here and exit")
  parser.add_argument("--index", default=None, help="prebuilt index path")
  parser.add_argument("--query", action="append", default=[],
                      help="text query (repeatable)")
  parser.add_argument("--topk", type=int, default=5)
  parser.add_argument("--quantize", choices=["int8"], default=None,
                      help="serve from an int8-quantized index (4x less "
                           "index HBM, MXU int8 matmuls; approximate — "
                           "see serving.RetrievalEngine)")
  parser.add_argument("--shard_index", action="store_true",
                      help="shard the index across the device mesh (corpus "
                           "scales with aggregate HBM; see serving.py)")
  parser.add_argument("--listen", type=int, default=None, metavar="PORT",
                      help="serve a JSON HTTP API (GET/POST /search, "
                           "GET /healthz) instead of answering --query once")
  parser.add_argument("--host", default="127.0.0.1",
                      help="bind address for --listen (default loopback)")
  args = parser.parse_args(argv)
  if not (args.index or args.build_index):
    parser.error("one of --index or --build_index is required")
  logging.basicConfig(level=logging.INFO, format="%(message)s")

  from mmt_tpu.serving import RetrievalEngine, RetrievalIndex

  model, variables, tokenizer, entry, max_words = load_model_and_loader(
      args.config, args.checkpoint)

  if args.build_index:
    index = RetrievalIndex.build(model, variables, entry["loader"],
                                 dataset=entry["dataset"].datasets[0]
                                 if hasattr(entry["dataset"], "datasets")
                                 else entry["dataset"])
    index.save(args.build_index)
    logger.info("indexed %d videos -> %s", len(index), args.build_index)
    if not args.query and args.listen is None:
      return

  index = RetrievalIndex.load(args.index or args.build_index)
  mesh = None
  if args.shard_index:
    from mmt_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.data_mesh()
  engine = RetrievalEngine(model, variables, tokenizer, index,
                           max_text_words=max_words, mesh=mesh,
                           quantize=args.quantize)
  if args.listen is not None:
    from mmt_tpu.serving import serve_http
    if args.query:
      # Warm the jitted query path before accepting traffic.
      engine.search(args.query[:1], topk=1)
    serve_http(engine, host=args.host, port=args.listen)
    return
  for query, hits in zip(args.query, engine.search(args.query, args.topk)):
    print(json.dumps({"query": query, "hits": hits}))


if __name__ == "__main__":
  main()
