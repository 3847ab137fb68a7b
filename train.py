#!/usr/bin/env python
"""CLI entry point.

Same surface as the reference (train.py:151-181):

  python train.py --config configs_pub/eccv20/X.json [--resume EXPDIR]
                  [--load_checkpoint CKPT] [--device IDS] [--only_eval] [-v]

Builds tokenizer -> data loaders -> model -> loss -> optimizer ->
scheduler -> visualizer -> trainer, then trains and runs the final eval
(train.py:43-148 flow), on TPU via jitted steps and an optional data mesh.
"""

from __future__ import annotations

import argparse
import logging
import os
import random

import numpy as np

logger = logging.getLogger(__name__)

# Default location of converted pretrained text-BERT weights
# (scripts/convert_hf_bert.py output); auto-loaded for bertftn/bertfrz
# stock-geometry runs, mirroring the reference's from_pretrained
# (model/model.py:150-162).
TXT_BERT_INIT_DEFAULT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data",
    "txt_bert_init.msgpack")


def build_data_loaders(config, expert_dims, tokenizer):
  from mmt_tpu.registry import build
  import mmt_tpu.data.loader  # noqa: F401 (registers ExpertDataLoader)

  raw_input_dims = expert_dims
  loaded_data = {}
  loaders = {}
  for key, training in (("train_sets", True), ("continuous_eval_sets", False),
                        ("final_eval_sets", False)):
    loaders[key] = [
        build("data_loader", spec, raw_input_dims=raw_input_dims,
              training=training, tokenizer=tokenizer, loaded_data=loaded_data,
              cross_seed=config.cross_seed)
        for spec in config.get(key, [])
    ]
  return loaders


def frozen_param_mask(params, txt_agg: str, txt_inp: str):
  """Freeze mask implementing the bertfrz modes (model/model.py:164-193).

  Returns a bool pytree (True = frozen) or None when nothing is frozen.
  """
  import jax
  from mmt_tpu.config import TxtAggSpec

  spec = TxtAggSpec.parse(txt_agg) if txt_agg[:4] == "bert" else None
  frozen_paths = []
  if spec is not None and spec.state == "frz":
    if spec.freeze_until is None:
      frozen_paths.append(("txt_bert", "encoder"))
    else:
      for i in range(spec.freeze_until):
        frozen_paths.append(("txt_bert", "encoder", f"layer_{i}"))
  if txt_inp.endswith("frz"):  # bertfrz / wo2vfrz / grvlfrz
    for sub in ("word_embeddings", "position_embeddings",
                "token_type_embeddings", "embeddings_ln"):
      frozen_paths.append(("txt_bert", sub))
    frozen_paths.append(("word_embeddings",))  # word-embedding-table path
  if not frozen_paths:
    return None

  def is_frozen(path_keys):
    keys = tuple(k.key for k in path_keys)
    return any(keys[:len(p)] == p for p in frozen_paths)

  return jax.tree_util.tree_map_with_path(
      lambda path, _: is_frozen(path), params)


def resolve_txt_bert_init(config, arch_value, txt_agg, custom_geometry=False):
  """Locate pretrained text-BERT init weights for bertftn/bertfrz runs.

  The reference builds ONLY those text towers from pretrained
  bert-base-cased (model/model.py:150-162 — 'bertscr' and the non-bert
  aggregators never see from_pretrained); here the converted weights
  (scripts/convert_hf_bert.py) are resolved in priority order:
  CLI --txt_bert_init > MMT_TPU_TXT_BERT_INIT env > arch.args
  "txt_bert_init" > the default asset data/txt_bert_init.msgpack (if
  present).  For a non-pretrained tower, a CLI/config request raises
  (it contradicts the architecture) while an ambient env var is ignored
  with a log line, so an exported MMT_TPU_TXT_BERT_INIT cannot silently
  turn a from-scratch ablation into a pretrained run.
  Returns a path or None.
  """
  from mmt_tpu.config import TxtAggSpec

  spec = TxtAggSpec.parse(txt_agg) if txt_agg[:4] == "bert" else None
  cli_value = getattr(config, "txt_bert_init", None)
  env_value = os.environ.get("MMT_TPU_TXT_BERT_INIT")
  if spec is None or spec.state not in ("ftn", "frz"):
    if cli_value or arch_value:
      raise ValueError(
          f"txt_bert_init={cli_value or arch_value!r} conflicts with "
          f"txt_agg={txt_agg!r}: only bertftn/bertfrz towers start from "
          "pretrained weights (model/model.py:150-162)")
    if env_value:
      logger.info("MMT_TPU_TXT_BERT_INIT ignored: txt_agg=%s stays "
                  "randomly initialized, as in the reference", txt_agg)
    return None
  explicit = cli_value or env_value or arch_value
  if explicit:
    if not os.path.isfile(explicit):
      raise FileNotFoundError(f"txt_bert_init not found: {explicit}")
    return explicit
  if custom_geometry:
    # The default asset is bert-base-cased; a model with an overridden
    # text_bert_geometry can't load it — only an explicit path applies.
    return None
  default = TXT_BERT_INIT_DEFAULT
  if os.path.isfile(default):
    return default
  if config.resume is None:
    logger.warning(
        "txt_agg=%s: no pretrained text-BERT weights found — txt_bert is "
        "RANDOMLY initialized (the reference always starts from pretrained "
        "bert-base-cased).  Convert them once with scripts/convert_hf_bert.py "
        "(default output %s) or pass --txt_bert_init.", txt_agg, default)
  return None


def _is_custom_text_geometry(geom):
  """True when a text_bert_geometry override departs from bert-base-cased.

  Gates the default-asset auto-load: the geometry must come from the
  EFFECTIVE model kwargs (cenet_kwargs_from_arch_args injects
  ``{"vocab_size": tokenizer.vocab_size}`` when MMT_TPU_BERT_VOCAB is
  set — invisible in the raw config), and an injected geometry that
  merely restates the stock values is still stock.
  """
  if not geom:
    return False
  import dataclasses
  from mmt_tpu.config import TEXT_BERT_BASE_CASED
  stock = dataclasses.asdict(TEXT_BERT_BASE_CASED)
  return any(stock.get(k) != v for k, v in dict(geom).items())


def build_trainer(config):
  """Construct the fully-wired Trainer for ``config`` (model, loaders,
  optimizer incl. freeze mask, pretrained inits) without running it —
  shared by train() and the perf harnesses (scripts/bench_sustained.py)."""
  import jax

  from mmt_tpu.parallel.mesh import maybe_initialize_distributed
  maybe_initialize_distributed()   # idempotent (main() already ran it)

  from mmt_tpu.ops import enable_tpu_default_kernels
  enable_tpu_default_kernels()

  from mmt_tpu.experts import compute_dims
  from mmt_tpu.models.cenet import CENet
  from mmt_tpu.registry import build, get
  from mmt_tpu.tokenization import create_tokenizer
  from mmt_tpu.train.optim import build_optimizer, step_lr
  from mmt_tpu.train.trainer import Trainer
  import mmt_tpu.train.losses    # noqa: F401 (registry)
  import mmt_tpu.train.metrics   # noqa: F401 (registry)
  import mmt_tpu.utils.visualizer  # noqa: F401 (registry)

  expert_dims = compute_dims(config.raw)
  logger.debug("experts: %s", expert_dims)

  # Seeds (train.py:53-59): data-pipeline randomness is host-side numpy;
  # model randomness flows through jax.random below.
  seed = config.seed
  random.seed(seed)
  np.random.seed(seed)

  arch_args = dict(config.arch_args)
  # Tokenizer follows txt_inp (train.py:62 in the reference): bert* ->
  # WordPiece; wo2v/grvl -> word-embedding tokenizer.
  tokenizer = create_tokenizer(arch_args.get("txt_inp", "bertftn"))

  data_loaders = build_data_loaders(config, expert_dims, tokenizer)

  # Config-surface knobs -> constructor kwargs through the one shared
  # path serving also uses (models/cenet.py:cenet_kwargs_from_arch_args
  # — includes the "compute_dtype": "bfloat16" TPU extension knob and
  # tokenizer-driven text vocab sizing).
  from mmt_tpu.models.cenet import cenet_kwargs_from_arch_args
  model_kwargs, cfg_txt_bert_init = cenet_kwargs_from_arch_args(
      arch_args, tokenizer)
  txt_bert_init = resolve_txt_bert_init(
      config, cfg_txt_bert_init,
      arch_args.get("txt_agg", "bertftn"),
      custom_geometry=_is_custom_text_geometry(
          model_kwargs.get("text_bert_geometry")))
  model = CENet(expert_dims=expert_dims, **model_kwargs)

  loss_fn = build("loss", config["loss"])
  metrics = [(name, get("metric", name)) for name in config["metrics"]]

  # Optimizer with freeze mask; mask needs initialized params, so the
  # trainer resolves it lazily via a callback-free two-phase init: build
  # with no mask, then rebuild if a mask is needed.
  tx, base_lr = build_optimizer(config["optimizer"])
  sched_args = config.get("lr_scheduler", {"args": {}}).get("args", {})
  lr_schedule = step_lr(base_lr, sched_args.get("step_size", 1),
                        sched_args.get("gamma", 1.0))

  visualizer = None
  if "visualizer" in config.raw:
    visualizer = build("visualizer", config["visualizer"],
                       exp_name=config.exper_name, web_dirs=config.web_dirs)

  trainer = Trainer(
      model=model, loss_fn=loss_fn, metrics=metrics, tx=tx, base_lr=base_lr,
      config=config, data_loaders=data_loaders, lr_schedule=lr_schedule,
      visualizer=visualizer,
      skip_first_n_saves=config["trainer"].get("skip_first_n_saves", 0),
      include_optim_in_ckpts=config["trainer"].get("include_optim_in_ckpts",
                                                   False),
      expert_dims=expert_dims,
      num_keep_ckpts=config["trainer"].get("num_keep_ckpts", 1),
      tokenizer=tokenizer,
      warmup_iterations=config["trainer"].get("warmup_iterations", -1),
      init_rng=jax.random.PRNGKey(seed),
      txt_bert_init=txt_bert_init)

  # Pretrained word-embedding table for the wo2v/grvl text path
  # (TxtEmbeddings.from_pretrained semantics, model/txt_embeddings.py:33-46).
  if (hasattr(tokenizer, "weights")
      and "word_embeddings" in trainer.params):
    trainer.params["word_embeddings"]["word_embeddings"] = (
        np.asarray(tokenizer.weights))

  # Apply the freeze mask now that params exist.
  mask = frozen_param_mask(trainer.params, arch_args.get("txt_agg", ""),
                           arch_args.get("txt_inp", ""))
  if mask is not None:
    tx, _ = build_optimizer(config["optimizer"], frozen_mask=mask)
    trainer.tx = tx
    trainer.opt_state = tx.init(trainer.params)
  return trainer


def train(config):
  trainer = build_trainer(config)
  if not config.only_eval:
    trainer.train()
  trainer.evaluate()
  return trainer


def main(argv=None):
  parser = argparse.ArgumentParser(description="mmt_tpu trainer")
  parser.add_argument("--config", default=None, type=str,
                      help="config file path")
  parser.add_argument("--resume", default=None, type=str,
                      help="path to the experiment dir to resume")
  parser.add_argument("--load_checkpoint", default=None, type=str,
                      help="checkpoint path for a warm start")
  parser.add_argument("--txt_bert_init", default=None, type=str,
                      help="converted pretrained text-BERT msgpack "
                           "(scripts/convert_hf_bert.py); defaults to "
                           "data/txt_bert_init.msgpack when present")
  parser.add_argument("--device", default=None, type=str,
                      help="device indices (accepted for CLI parity)")
  parser.add_argument("--only_eval", action="store_true",
                      help="skip training; evaluate only")
  parser.add_argument("-v", "--verbose", action="store_true")
  args = parser.parse_args(argv)

  # Multi-process runs must initialize the distributed runtime before
  # ANY backend use — and process identity gates the filesystem writes
  # below (config dump, log file), so it has to be known up front.
  from mmt_tpu.parallel.mesh import maybe_initialize_distributed
  maybe_initialize_distributed()
  import jax
  process_index = jax.process_index()

  from mmt_tpu import config as config_lib
  config = config_lib.from_args(args, primary=process_index == 0)

  level = logging.DEBUG if args.verbose else logging.INFO
  # force=True so a second experiment in the same process re-points the
  # log file at its own exp dir (parse_config.py:103-117 behavior).
  # Secondary processes get their own log file (log.txt is process 0's).
  log_name = "log.txt" if process_index == 0 else f"log.p{process_index}.txt"
  logging.basicConfig(
      level=os.environ.get("LOGLEVEL", level),
      format="%(message)s",
      force=True,
      handlers=[logging.FileHandler(config.save_dir / log_name),
                logging.StreamHandler()])
  logger.info("Experiment directory: %s", config.save_dir)

  epochs = config["trainer"]["epochs"]
  save_period = config["trainer"].get("save_period", 1)
  assert epochs >= save_period, (
      f"epochs ({epochs}) must be >= save_period ({save_period}), "
      "otherwise no checkpoint would ever be written")

  return train(config)


if __name__ == "__main__":
  main()
