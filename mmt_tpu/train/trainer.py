"""Training runtime: jitted steps, epoch loop, eval, checkpoints, logs.

Covers base/base_trainer.py:39-464 + trainer/trainer.py:55-493 semantics,
restructured for TPU:

* one jitted ``train_step`` (forward + fused similarity + loss + backward
  + optimizer, donated state) instead of the eager per-phase loop;
* one jitted ``embed_step`` for eval; the full similarity matrix and the
  retrieval ranks are computed on device (mmt_tpu/ops);
* data parallelism via a 1-D ``data`` mesh: the batch is sharded on axis
  0, params replicated; the similarity contraction over the global batch
  makes XLA insert the embedding all-gather — differentiably — which is
  the reference's DataParallel out='embds' + host-side loss re-fusion
  path (trainer/trainer.py:134,185-199) done by the compiler;
* epoch-0 eval-only baseline, curriculum train-set selection by
  ``until_epoch``, ``max_samples_per_epoch`` caps, monitor / early-stop /
  best-checkpoint, atomic checkpoint saves + stale purge, perf log and
  TensorBoard scalars, final-eval artifacts (sims .npy, challenge CSV,
  HTML ranking pages, exp_results.json + completion flag).
"""

from __future__ import annotations

import itertools
import json
import logging
import math
import os
import pathlib
import time
from typing import Any, Dict, List

import jax
import optax
import jax.numpy as jnp
import numpy as np

from mmt_tpu.data import loader as loader_lib
from mmt_tpu.models.cenet import similarity_from_outputs
from mmt_tpu.ops import similarity as similarity_ops
from mmt_tpu.parallel import mesh as mesh_lib
from mmt_tpu.train import checkpoint as ckpt_lib
from mmt_tpu.train import metrics as metrics_lib
from mmt_tpu.train.optim import linear_warmup
from mmt_tpu.utils.timing import AverageMeter, update_perf_log

logger = logging.getLogger(__name__)

MODEL_BATCH_KEYS = ("token_ids", "query_masks", "features", "features_t",
                    "features_ind", "features_avgpool", "features_maxpool")


def model_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
  """Strip host-only list fields (the analogue of move_dict_to_device's
  tensor filter, trainer/trainer.py:36-52)."""
  return {k: batch[k] for k in MODEL_BATCH_KEYS if k in batch}


def compress_predictions(query_masks: np.ndarray, sims: np.ndarray,
                         topk: int = 10) -> np.ndarray:
  """Top-k ranked video indices per valid query (utils/util.py:37-68)."""
  assert query_masks.ndim == 2 and sims.ndim == 2
  nv, per_vid = query_masks.shape
  nq, nv2 = sims.shape
  assert nv == nv2 and nq == nv * per_vid
  valid = sims[query_masks.flatten().astype(bool)]
  return np.argsort(-valid, axis=1)[:, :topk]


def _json_sanitize(obj):
  """Replace non-finite floats with strings so the output is RFC-8259
  JSON (json.dump would otherwise emit bare `Infinity`/`NaN`)."""
  if isinstance(obj, dict):
    return {k: _json_sanitize(v) for k, v in obj.items()}
  if isinstance(obj, (list, tuple)):
    return [_json_sanitize(v) for v in obj]
  if isinstance(obj, float) and not math.isfinite(obj):
    return str(obj)
  return obj


def pad_batch_to_multiple(batch, multiple: int):
  """Zero-pad every array's leading axis to a multiple of the mesh size.

  Padded rows have all-zero attention masks/indicators, so they embed to
  harmless values that the caller slices off; returns (padded, orig_n).
  """
  n = batch["token_ids"].shape[0]
  pad = (-n) % multiple
  if pad == 0:
    return batch, n

  def pad_arr(x):
    if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == n:
      widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
      return np.pad(np.asarray(x), widths)
    return x

  return jax.tree_util.tree_map(pad_arr, batch), n


class Trainer:
  """Epoch-loop trainer over pure jitted steps."""

  def __init__(self, model, loss_fn, metrics, tx, base_lr, config,
               data_loaders, lr_schedule, visualizer=None,
               skip_first_n_saves=0, include_optim_in_ckpts=False,
               expert_dims=None, num_keep_ckpts=1, tokenizer=None,
               warmup_iterations=-1, init_rng=None, use_mesh=True,
               device_metrics=True, txt_bert_init=None):
    # Multi-process topology: every process runs the identical program in
    # lockstep (loaders are deterministic, metrics are computed from
    # replicated eval outputs everywhere so control flow like early
    # stopping stays in sync); only process 0 touches the filesystem
    # (checkpoints, TensorBoard, artifacts, perf log).
    self.process_index = jax.process_index()
    self.is_primary = self.process_index == 0
    self.multiprocess = jax.process_count() > 1

    self.model = model
    self.loss_fn = loss_fn
    self.metrics = metrics                      # list of (name, fn)
    self.tx = tx
    self.base_lr = base_lr
    self.config = config
    self.data_loaders = data_loaders
    self.lr_schedule = lr_schedule
    # The fused-vs-matrix eval decision must be identical on every
    # process (it changes the program all processes execute), so it keys
    # off whether a visualizer was CONFIGURED; only the primary actually
    # draws.
    self._want_visualizer = visualizer is not None
    self.visualizer = visualizer if self.is_primary else None
    self.skip_first_n_saves = skip_first_n_saves
    self.include_optim_in_ckpts = include_optim_in_ckpts
    self.num_keep_ckpts = num_keep_ckpts
    self.tokenizer = tokenizer
    self.warmup = linear_warmup(warmup_iterations)
    self.modalities = list(expert_dims.keys()) if expert_dims else []
    self.device_metrics = device_metrics

    cfg_trainer = config["trainer"]
    # Validated up front (fail fast, before any filesystem/writer setup):
    # model_parallel > 1 carves a Megatron-style 'model' axis out of the
    # devices (parallel/mesh.py:param_shardings) — a scale-up hook the
    # reference has no analogue of (SURVEY.md §2.2 marks TP as absent).
    self.model_parallel = int(cfg_trainer.get(
        "model_parallel", os.environ.get("MMT_TPU_MODEL_PARALLEL", 1)))
    if self.model_parallel > 1 and self.multiprocess:
      # The checkpoint writer gathers non-addressable shards to host
      # (_save_checkpoint:_to_host), so the only remaining argument is
      # the real one: a 'model' axis spanning hosts puts the per-layer
      # FFN/attention psums on DCN, which is bandwidth-wrong for this
      # model size (DESIGN.md "Tensor parallelism").
      raise ValueError(
          "model_parallel > 1 is single-process (multi-chip) only: a "
          "'model' axis spanning hosts would put per-layer FFN psums on "
          "DCN")
    self.epochs = cfg_trainer["epochs"]
    self.save_period = cfg_trainer.get("save_period", 1)
    self.max_samples_per_epoch = cfg_trainer.get("max_samples_per_epoch",
                                                 int(1e9))
    monitor = cfg_trainer.get("monitor", "off")
    from mmt_tpu.config import parse_monitor
    self.mnt_mode, self.mnt_arg = parse_monitor(monitor)
    if self.mnt_mode in ("min", "max"):
      self.mnt_metric = self.mnt_arg
      self._validate_monitor_metric()
      self.mnt_best = np.inf if self.mnt_mode == "min" else -np.inf
      self.early_stop = cfg_trainer.get("early_stop", np.inf)
    else:
      self.mnt_best = 0
      self.given_epoch = self.mnt_arg if self.mnt_mode == "given_epoch" else -1

    self.exp_dir = pathlib.Path(config.save_dir)
    self.perf_log_path = self.exp_dir / "perf_log.txt"
    self.timer = AverageMeter()
    self.writer = self._make_writer(config.log_dir)
    from mmt_tpu.utils.hparams import get_hparams_from_config
    self.hparams = get_hparams_from_config(config)

    # Debug & observability hooks (SURVEY.md §5): jax-level NaN trapping
    # replaces the reference's scattered ipdb NaN traps; profiler traces
    # replace its wall-clock-only phase timers at device level.
    if (cfg_trainer.get("debug_nans")
        or os.environ.get("MMT_TPU_DEBUG_NANS")):
      jax.config.update("jax_debug_nans", True)
      logger.info("jax_debug_nans enabled")
    self.profile_dir = (cfg_trainer.get("profile_dir")
                        or os.environ.get("MMT_TPU_PROFILE"))
    # checkified device-side batch invariants on the first batch of each
    # epoch/eval (SURVEY.md §5 sanitizer analogue).
    self.sanity_checks = bool(cfg_trainer.get("sanity_checks")
                              or os.environ.get("MMT_TPU_SANITY_CHECKS"))
    # Eval sets with >= this many videos rank on-device from embeddings
    # (ops/ranking.py fused path); the [Q, V] similarity matrix is never
    # materialized.  Applies where no sims artifact is required.
    self.fused_eval_from_videos = cfg_trainer.get("fused_eval_from_videos",
                                                  50_000)

    # Preemption-safe checkpointing: SIGTERM triggers an atomic save
    # before exit (the reference has no failure handling; its recovery is
    # manual --resume).
    self._install_preemption_handler()

    # Background checkpoint writes: the device->host snapshot happens
    # inline (donation invalidates device buffers at the next step), the
    # msgpack encode + disk write overlap the next epoch.  The reference
    # blocks on torch.save here (base/base_trainer.py:346-369).
    # trainer.args "async_checkpoint": false restores inline writes.
    self._ckpt_writer = ckpt_lib.AsyncCheckpointWriter(
        async_enabled=bool(cfg_trainer.get("async_checkpoint", True))
        and self.is_primary)

    self.start_epoch = 0
    self.epoch = 0
    self.loaded_epoch = 0
    self.n_samples = 0
    self.n_steps = 0

    # Mesh / sharding.  The train batch must divide the mesh's data axis
    # (the loss is defined over the global batch); fall back to
    # replication otherwise.
    self.mesh = (mesh_lib.data_mesh(model_parallel=self.model_parallel)
                 if use_mesh else None)
    if self.mesh is not None:
      data_n = int(self.mesh.shape["data"])
      train_sets = self.data_loaders.get("train_sets") or []
      if any(e.batch_size % data_n for e in train_sets):
        logger.warning(
            "train batch size not divisible by the %d-way data axis; "
            "running replicated (set batch_size to a multiple to shard)",
            data_n)
        self.mesh = None
    if self.model_parallel > 1 and mesh_lib.model_axis_size(self.mesh) <= 1:
      # An explicitly requested capability must not silently degrade to
      # replicated training (the data-axis fallback above, or too few
      # visible devices, both end with mesh=None).
      raise ValueError(
          f"model_parallel={self.model_parallel} was requested but cannot "
          f"be honored: {len(jax.devices())} visible device(s), and the "
          f"train batch size must divide the data axis "
          f"(devices / model_parallel). Fix the config or unset "
          f"model_parallel")
    if mesh_lib.model_axis_size(self.mesh) > 1:
      logger.info("tensor parallel: %d-way 'model' axis "
                  "(column/row-parallel FFN, head-parallel attention)",
                  mesh_lib.model_axis_size(self.mesh))
      from mmt_tpu.ops import ffn as ffn_ops
      if ffn_ops.pallas_active():
        # The fused FFN kernel's partition rule (ops/ffn.py:
        # _tp_row_sharded) is TP-aware: model-sharded w1/w2 run the
        # shard-local half kernel and the partial output psums — no
        # weight all-gathers (tested: test_parallel.py::
        # test_ffn_kernel_tensor_parallel_*).
        logger.info("Pallas FFN kernels active under tensor parallelism "
                    "(shard-local half kernels + psum; weights stay "
                    "model-sharded)")
    # Both the FFN and the similarity Pallas kernels carry
    # custom_partitioning rules (ops/ffn.py:_tp_row_sharded,
    # ops/similarity.py:_fused_sim_fn), so they stay enabled under the
    # mesh: GSPMD shards the caption rows and all-gathers exactly the
    # video operands — the reference's global-batch negative semantics.
    if self.mesh is not None and similarity_ops._USE_PALLAS:
      logger.info("data mesh active: Pallas similarity kernel partitioned "
                  "via its custom_partitioning rule (caption rows shard, "
                  "video operands all-gather)")

    # Parameter init from the first available batch's shapes.
    self.rng = init_rng if init_rng is not None else jax.random.PRNGKey(
        config.seed if hasattr(config, "seed") else 0)
    self._init_state()

    # Pretrained text-tower init BEFORE any checkpoint load: the
    # reference constructs txt_bert via from_pretrained and then
    # load_state_dict overrides it (model/model.py:161-162), so a resume
    # or warm start must win over this init.
    if txt_bert_init is not None:
      self._load_txt_bert_init(txt_bert_init)

    self._train_step_fn = None
    self._embed_step_fn = None

    if config.resume is not None:
      self._resume_checkpoint(config.resume)

  # ------------------------------------------------------------------
  def _validate_monitor_metric(self):
    """Fail fast on a monitor key the epoch log will never contain.

    The reference silently disables monitoring on a KeyError mid-run
    (base/base_trainer.py:150-177) — a misspelled monitor string then
    quietly turns off early stopping and best-checkpoint tracking.  Here
    the key is resolved at construction against what _valid_epoch will
    actually emit: '<dataset>/<metric_fn>/<name>' for every continuous
    eval set, or one of the scalar epoch-log keys.
    """
    scalar_keys = {"epoch", "loss", "learning_rate", "n_samples", "n_steps"}
    if self.mnt_metric in scalar_keys:
      return
    ds_names = {e["dataset"].dataset_name
                for e in self.data_loaders.get("continuous_eval_sets", [])}
    metric_fns = {name for name, _ in self.metrics}
    parts = self.mnt_metric.split("/")
    ok = (len(parts) == 3 and parts[0] in ds_names
          and parts[1] in metric_fns)
    # The VALUE part is only statically known for the shipped retrieval
    # metrics (cols2metrics surface, mmt_tpu/train/metrics.py:19-37);
    # custom registered metric fns may emit any key names, so only the
    # dataset and metric-fn parts are enforced for them.
    if ok and parts[1] in ("t2v_metrics", "v2t_metrics"):
      ok = parts[2] in {"R1", "R5", "R10", "R50", "MedR", "MeanR",
                        "geometric_mean_R1-R5-R10"}
    if not ok:
      hint = sorted(f"{ds}/{fn}/R1" for ds in ds_names
                    for fn in metric_fns)[:4]
      raise ValueError(
          f"monitor metric {self.mnt_metric!r} will never appear in the "
          f"epoch log (eval sets: {sorted(ds_names)}, metrics: "
          f"{sorted(metric_fns)}); examples of valid keys: {hint} "
          f"or scalar keys {sorted(scalar_keys)}")

  # ------------------------------------------------------------------
  def _install_preemption_handler(self):
    import signal

    self._preempt_requested = False

    def handler(signum, frame):
      # Defer the save to the next step boundary: a SIGTERM landing
      # mid-train_step would find self.params/opt_state already DONATED
      # (deleted buffers) and the save itself would crash.  The train
      # loop checks the flag after every state update (~30 ms latency).
      logger.warning("SIGTERM received: checkpointing at the next step "
                     "boundary")
      self._preempt_requested = True

    try:
      signal.signal(signal.SIGTERM, handler)
    except ValueError:
      pass  # not the main thread (e.g. under some test runners)

  def _maybe_preempt_exit(self, completed_epoch: int):
    """If preemption was requested, checkpoint and exit 143.

    The checkpoint is stamped with the last COMPLETED epoch: a mid-epoch
    save that claimed the current epoch would make restart skip the rest
    of that epoch's samples silently.  The (partially trained) params
    are still saved — they are strictly newer than the completed epoch's.
    """
    if not getattr(self, "_preempt_requested", False):
      return
    epoch, self.epoch = self.epoch, completed_epoch
    try:
      self._save_checkpoint(completed_epoch, save_best=False)
      self._ckpt_writer.flush()  # the process exits right after
      logger.warning("preemption checkpoint written (epoch %d complete); "
                     "exiting", completed_epoch)
    except Exception:
      # A failed save must not masquerade as a clean preemption exit:
      # log it loudly, then still exit 143 (the scheduler is tearing the
      # job down either way; the previous on-disk checkpoint survives).
      logger.exception("preemption checkpoint FAILED; exiting without a "
                       "fresh checkpoint (last periodic save is intact)")
    finally:
      self.epoch = epoch
    raise SystemExit(143)

  # ------------------------------------------------------------------
  def _make_writer(self, log_dir):
    class _Null:
      def add_scalar(self, *a, **k): pass
      def add_text(self, *a, **k): pass
      def add_hparams(self, *a, **k): pass
    if not self.is_primary:   # one TensorBoard stream per experiment
      return _Null()
    try:
      from tensorboardX import SummaryWriter
      return SummaryWriter(str(log_dir))
    except Exception:  # pragma: no cover
      return _Null()

  def _first_loader(self):
    sets = (self.data_loaders.get("train_sets")
            or self.data_loaders.get("continuous_eval_sets")
            or self.data_loaders["final_eval_sets"])
    return sets[0]

  def _init_state(self):
    loader = self._first_loader()
    probe = next(iter(loader["loader"]))
    batch = model_batch(probe)
    self.rng, init_rng, drop_rng = jax.random.split(self.rng, 3)
    variables = self.model.init({"params": init_rng, "dropout": drop_rng},
                                batch, train=False)
    self.params = variables["params"]
    self.batch_stats = variables.get("batch_stats", {})
    self.opt_state = self.tx.init(self.params)
    n = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
    logger.info("Initialized model: %s params", f"{n:,}")

  # ------------------------------------------------------------------
  # Jitted steps
  # ------------------------------------------------------------------
  def _build_train_step(self):
    model, loss_fn, tx = self.model, self.loss_fn, self.tx

    def train_step(params, batch_stats, opt_state, batch, lr, rng):
      def compute_loss(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        sims = similarity_from_outputs(out, merge="avg")
        return loss_fn(sims), mut.get("batch_stats", batch_stats)

      (loss, new_bs), grads = jax.value_and_grad(
          compute_loss, has_aux=True)(params)
      opt_state.hyperparams["learning_rate"] = lr
      updates, new_opt = tx.update(grads, opt_state, params)
      new_params = optax.apply_updates(params, updates)
      return new_params, new_bs, new_opt, loss

    donate = (0, 1, 2)
    if self.mesh is not None:
      shardings = mesh_lib.batch_sharding(self.mesh)
      return jax.jit(train_step, donate_argnums=donate,
                     in_shardings=(None, None, None, shardings, None, None))
    return jax.jit(train_step, donate_argnums=donate)

  def _build_embed_step(self):
    model = self.model

    def embed_step(params, batch_stats, batch):
      return model.apply({"params": params, "batch_stats": batch_stats},
                         batch, train=False)

    if self.mesh is not None:
      shardings = mesh_lib.batch_sharding(self.mesh)
      kwargs = {"in_shardings": (None, None, shardings)}
      if self.multiprocess:
        # Replicated eval outputs: every process then holds the FULL
        # per-batch embeddings, so the host-side accumulation /
        # similarity / metrics below are multi-process-safe (a
        # batch-sharded output would not be addressable off-process).
        kwargs["out_shardings"] = mesh_lib.replicated(self.mesh)
      return jax.jit(embed_step, **kwargs)
    return jax.jit(embed_step)

  @property
  def train_step(self):
    if self._train_step_fn is None:
      self._train_step_fn = self._build_train_step()
    return self._train_step_fn

  @property
  def embed_step(self):
    if self._embed_step_fn is None:
      self._embed_step_fn = self._build_embed_step()
    return self._embed_step_fn

  def _tp_num_heads(self):
    """Tower -> attention head count, for head-aligned TP shardings.

    Mirrors CENet's geometry resolution (models/cenet.py:94-106; flax
    setup() attributes are not readable from outside apply, so this
    recomputes from the constructor fields).  Missing towers (non-bert
    txt_agg) are simply absent — param_shardings only consults the keys
    that exist in the tree."""
    from mmt_tpu.config import BertParams, TEXT_BERT_BASE_CASED
    heads = {}
    vid = dict(getattr(self.model, "vid_bert_params", {}) or {})
    # Resolve through BertParams so a config that omits
    # num_attention_heads still reports the DEFAULT head count the model
    # actually builds with — otherwise the dim-divisibility fallback in
    # param_shardings could shard q/k/v across head boundaries.
    heads["vid_bert"] = int(BertParams.from_dict(vid).num_attention_heads)
    txt = int(TEXT_BERT_BASE_CASED.num_attention_heads)
    geom = dict(getattr(self.model, "text_bert_geometry", None) or {})
    txt = int(geom.get("num_attention_heads", txt))
    overrides = dict(getattr(self.model, "txt_bert_params", None) or {})
    heads["txt_bert"] = int(overrides.get("num_attention_heads", txt))
    return heads

  def _ensure_global_state(self):
    """Multi-process: promote host-side state to replicated global arrays.

    Every jit argument must be a global jax.Array once the mesh spans
    processes.  Called at the top of train()/evaluate() because the CLI
    mutates trainer.params / opt_state after construction (pretrained
    word embeddings, freeze-mask optimizer rebuild, train.py).
    Idempotent; no-op single-process.
    """
    if self.mesh is None:
      return
    if mesh_lib.model_axis_size(self.mesh) > 1:
      # Tensor parallel: place params per their Megatron-style specs
      # (idempotent; a device_put onto the sharding an array already has
      # is a no-op).  Optimizer state is left as-is — GSPMD propagates
      # the param shardings through tx.update, so mu/nu settle onto the
      # same layout after the first step.
      self.params = mesh_lib.shard_params(self.mesh, self.params,
                                          num_heads=self._tp_num_heads())
    if not self.multiprocess:
      return
    self.params = mesh_lib.replicate_tree(self.mesh, self.params)
    self.batch_stats = mesh_lib.replicate_tree(self.mesh, self.batch_stats)
    self.opt_state = mesh_lib.replicate_tree(self.mesh, self.opt_state)
    # The RNG key is replicated ONCE; jax.random.split then runs as a
    # tiny lockstep global computation each step — replicating the key
    # per step would round-trip it through host memory (a device->host
    # sync on the hot path, the loss.item() pattern in disguise).
    self.rng = mesh_lib.replicate_tree(self.mesh, self.rng)

  # ------------------------------------------------------------------
  # Train loop
  # ------------------------------------------------------------------
  def train(self):
    self._ensure_global_state()
    not_improved_count = 0
    for epoch in range(self.start_epoch, self.epochs + 1):
      self.epoch = epoch
      epoch_start = time.time()

      from mmt_tpu.utils.timing import profiler_trace
      with self.timer.time("epoch.train"):
        # Capture a device trace of the first trained epoch when asked.
        with profiler_trace(self.profile_dir,
                            enabled=bool(self.profile_dir) and epoch == 1):
          result = self._train_epoch(epoch)
      for key, val in result.items():
        if np.isscalar(val):
          self.writer.add_scalar(key, val, epoch)

      with self.timer.time("epoch.valid"):
        val_log = self._valid_epoch(epoch, sets="continuous_eval")
      result.update(val_log)

      log = {"epoch": epoch}
      for key, value in result.items():
        if key == "metrics":
          for ds_name, ds_metrics in value.items():
            for m_type, m_dict in ds_metrics.items():
              for m_name, m_value in m_dict.items():
                log[f"{ds_name}/{m_type}/{m_name}"] = m_value
        else:
          log[key] = value

      best = False
      if self.mnt_mode in ("min", "max"):
        try:
          lower = log[self.mnt_metric] <= self.mnt_best
          higher = log[self.mnt_metric] >= self.mnt_best
          improved = ((self.mnt_mode == "min" and lower)
                      or (self.mnt_mode == "max" and higher))
        except KeyError:
          logger.warning("Metric %s not found; monitoring disabled",
                         self.mnt_metric)
          self.mnt_mode = "off"
          improved, not_improved_count = False, 0
        if improved:
          self.mnt_best = log[self.mnt_metric]
          not_improved_count = 0
          best = True
        else:
          not_improved_count += 1
        if not_improved_count > self.early_stop:
          logger.info("No improvement for %s epochs; stopping",
                      self.early_stop)
          break

      # 'save_best' decides whether an off-period save happens at all; the
      # trained_model copy itself follows 'best' (base/base_trainer.py:181-193
      # ordering — monitor='max epoch' refreshes trained_model every epoch).
      save_best = best and getattr(self, "mnt_metric", None) != "epoch"
      if self.mnt_mode == "given_epoch" and epoch == self.given_epoch:
        save_best = True
        best = True

      with self.timer.time("epoch.checkpoint"):
        if epoch < self.skip_first_n_saves:
          logger.info("Skipping ckpt save at epoch %d < %d", epoch,
                      self.skip_first_n_saves)
        elif epoch % self.save_period == 0 or save_best:
          self._save_checkpoint(epoch, save_best=best)
        if epoch > self.num_keep_ckpts and self.is_primary:
          # Routed through the writer queue so the purge always sees the
          # epoch's (possibly still in-flight) checkpoint file.
          self._ckpt_writer.purge(self.exp_dir, self.num_keep_ckpts)
      # SIGTERM between epochs (e.g. during the continuous eval above):
      # this epoch IS complete, checkpoint it as such and exit.
      self._maybe_preempt_exit(epoch)

      self.timer.update("epoch.total", time.time() - epoch_start)
      for key, entry in self.timer.dic.items():
        log[f"timer.{key}.sum"] = entry["sum"]
        self.writer.add_scalar(f"timer_epoch/{key}", entry["sum"], epoch)
      self.writer.add_text("exp_dir", str(self.exp_dir), epoch)
      self.timer.reset()

      log["mnt_best"] = self.mnt_best
      log["not_improved_count"] = not_improved_count
      if np.isfinite(self.mnt_best):  # -inf until first improvement
        self.writer.add_scalar("mnt_best", self.mnt_best, epoch)
      try:
        acc_key = getattr(self, "mnt_metric", None)
        self.writer.add_hparams(
            self.hparams,
            {"hparam/accuracy": log.get(acc_key, 0),
             "hparam/mnt_best": self.mnt_best,
             "hparam/epoch": epoch},
            name="hparams")
      except Exception:  # pragma: no cover - tensorboardX quirk tolerance
        pass

      for name, value in log.items():
        if "/cols" in name:
          continue
        (logger.debug if "timer." in name else logger.info)(
            " %-30s: %s", name, value)
      if self.is_primary:
        update_perf_log({k: v for k, v in log.items()
                         if not k.endswith("cols")}, self.perf_log_path)

    # Join the last background checkpoint write (and surface its error)
    # before callers read the files (evaluate() loads trained_model).
    self._ckpt_writer.flush()

  def _select_train_set(self, epoch):
    """Curriculum: first train set whose until_epoch >= epoch
    (trainer/trainer.py:137-143; hardened — the reference IndexErrors
    past the last until_epoch, we keep using the final set)."""
    i = 0
    sets = self.data_loaders["train_sets"]
    while i < len(sets) - 1 and sets[i].until_epoch < epoch:
      i += 1
    return sets[i]

  def _train_epoch(self, epoch):
    if epoch == 0:
      # Eval-only baseline epoch (trainer/trainer.py:120-130).
      return {"loss": 0, "learning_rate": self.lr_schedule(0),
              "n_samples": self.n_samples, "n_steps": self.n_steps}

    entry = self._select_train_set(epoch)
    loader, dataset = entry["loader"], entry["dataset"]
    batch_size, n_pairs = entry.batch_size, entry.n_pairs
    max_batches = int(self.max_samples_per_epoch / n_pairs / batch_size)
    batches_per_epoch = min(len(loader), max_batches)
    log_step = max(1, int(np.sqrt(batch_size)))
    # StepLR steps at end of each epoch; epoch e uses rate decayed e-1
    # times (torch calls get_lr before step()).
    epoch_lr = self.lr_schedule(epoch - 1)

    # Losses stay on device between log points: reading the scalar every
    # step would serialize host and device (the reference pays this with
    # loss.item() each step, trainer/trainer.py:206).  Window reads are
    # PIPELINED one window deep: at each log point the stacked window
    # starts an async device->host copy and the PREVIOUS window (whose
    # transfer has long since landed) is logged — a blocking read here
    # would stall step enqueueing for the full transfer latency
    # (measured 2 RTTs/window over the tunnel = 8.4 ms/step at b32,
    # scripts/bench_sustained.py).
    pending_losses: List[Any] = []
    # [(batch_idx, stacked window, batch_time when the window closed)] —
    # batch_time is captured at enqueue so the (late) drain logs the
    # timing that belongs to the window's own step, not a later one.
    pending_reads: List[Any] = []
    total_loss = 0.0

    def drain(window):
      nonlocal total_loss
      idx, vals, bt = window
      vals = np.asarray(vals)
      total_loss += float(vals.sum())
      logger.info("Train Epoch: %d [%d/%d] Loss: %.6f batch_time=%.5f",
                  epoch, idx + 1, batches_per_epoch, float(vals[-1]), bt)

    data_start = time.time()
    # Cap the source at the epoch's batch budget BEFORE prefetch: the
    # 2-deep prefetch would otherwise assemble (and H2D-transfer) batches
    # past the epoch boundary that no step ever consumes.
    batches = itertools.islice(iter(loader), batches_per_epoch)
    if self.mesh is None:
      batches = loader_lib.device_prefetch(
          (model_batch(b) for b in batches), size=2)
    else:
      # Same 2-deep prefetch on the mesh path: shard_batch only ENQUEUES
      # the H2D scatters, so issuing the next batch's transfer while the
      # current step runs overlaps them (round-4 VERDICT item 2 — the
      # mesh path used to scatter synchronously per step).
      batches = loader_lib.device_prefetch(
          (model_batch(b) for b in batches), size=2,
          put=lambda b: mesh_lib.shard_batch(self.mesh, b))
    for batch_idx, batch in enumerate(batches):
      # max_samples_per_epoch is already enforced: batches_per_epoch
      # capped the islice'd source above (max_batches term).
      self.timer.update("train_batch.data_loading", time.time() - data_start)
      if self.sanity_checks and batch_idx == 0:
        from mmt_tpu.utils.checks import validate_batch
        validate_batch(batch)

      self.n_samples += batch_size * n_pairs
      self.n_steps += 1
      lr = epoch_lr * self.warmup(self.n_steps - 1)

      step_start = time.time()
      # Under multi-process, self.rng is a replicated global array
      # (_ensure_global_state), so the split stays on device and its
      # outputs are already valid global jit arguments.
      self.rng, step_rng = jax.random.split(self.rng)
      self.params, self.batch_stats, self.opt_state, loss = self.train_step(
          self.params, self.batch_stats, self.opt_state, batch, lr, step_rng)
      self._maybe_preempt_exit(epoch - 1)
      pending_losses.append(loss)
      self.timer.update("train_batch.step", time.time() - step_start)
      self.timer.update("train_batch.total", time.time() - data_start)

      if batch_idx % log_step == 0:
        vals = jnp.stack(pending_losses)
        pending_losses = []
        try:
          vals.copy_to_host_async()
        except AttributeError:   # non-PJRT array types (tracers in tests)
          pass
        pending_reads.append(
            (batch_idx, vals, self.timer.dic["train_batch.total"]["val"]))
        while len(pending_reads) > 1:
          drain(pending_reads.pop(0))
      data_start = time.time()
      # No in-loop boundary check: the islice cap above is the epoch
      # boundary's single enforcement point.

    if pending_losses:
      pending_reads.append((batch_idx, jnp.stack(pending_losses),
                            self.timer.dic["train_batch.total"]["val"]))
    for window in pending_reads:
      drain(window)
    return {"loss": total_loss / max(batches_per_epoch, 1),
            "learning_rate": epoch_lr,
            "n_samples": self.n_samples, "n_steps": self.n_steps}

  # ------------------------------------------------------------------
  # Eval
  # ------------------------------------------------------------------
  def _get_embeddings(self, loader, to_host=False):
    """Accumulate per-modality embeddings over an eval set
    (trainer/trainer.py:286-370).

    ``to_host=True`` (the fused at-scale path) lands every batch's
    embeddings in host memory instead of concatenating on device: a
    50k+-video corpus then never occupies one chip's HBM — the fused
    ranking re-shards it across the mesh candidate-wise
    (metrics.fused_retrieval_metrics), so per-chip residency is
    corpus/n_chips."""
    vid_embds, text_embds = [], []
    vid_weights, text_weights = [], []
    query_masks, raw_captions, paths = [], [], []
    data_start = time.time()
    mesh_n = int(np.prod(self.mesh.devices.shape)) if self.mesh else 1
    for batch in loader:
      # A SIGTERM landing during a long eval must not wait for the whole
      # eval to finish (that can exceed a scheduler's grace period): eval
      # state is safe to abandon, only the params need saving.  The
      # current epoch's training is already complete whenever an eval
      # runs (continuous eval follows _train_epoch; final eval follows
      # training), so self.epoch is the right completed-epoch stamp.
      self._maybe_preempt_exit(self.epoch)
      self.timer.update("valid_batch.data_loading", time.time() - data_start)
      step_start = time.time()
      padded, n = pad_batch_to_multiple(model_batch(batch), mesh_n)
      if self.multiprocess:
        padded = mesh_lib.shard_batch(self.mesh, padded)
      out = self.embed_step(self.params, self.batch_stats, padded)
      snap = np.asarray if to_host else (lambda x: x)
      vid_embds.append(snap(out["vid_embds"][:n]))
      text_embds.append(snap(out["text_embds"][:n]))
      vid_weights.append(snap(out["vid_weights"][:n]))
      text_weights.append(snap(out["text_weights"][:n]))
      query_masks.append(np.asarray(batch["query_masks"]))
      raw_captions.extend(batch.get("raw_captions",
                                    [None] * len(batch["query_masks"])))
      paths.extend(batch.get("paths", [""] * len(batch["query_masks"])))
      self.timer.update("valid_batch.forward", time.time() - step_start)
      data_start = time.time()
    cat = np.concatenate if to_host else jnp.concatenate
    return {
        "vid_embds": cat(vid_embds, 0),
        "text_embds": cat(text_embds, 0),
        "vid_weights": cat(vid_weights, 0),
        "text_weights": cat(text_weights, 0),
        "query_masks": np.concatenate(query_masks, 0),
        "raw_captions": raw_captions,
        "paths": paths,
    }

  def _valid_epoch(self, epoch=None, sets="continuous_eval"):
    result = {"metrics": {}}
    entries = self.data_loaders.get(f"{sets}_sets", [])
    for entry in entries:
      loader, dataset = entry["loader"], entry["dataset"]
      dataset_name = dataset.dataset_name

      metric_names = {name for name, _ in self.metrics}
      # At >= fused_eval_from_videos videos, rank on-device from the
      # embeddings (ops/ranking.py) instead of materializing the [Q, V]
      # matrix; final_eval keeps the matrix (sims .npy / challenge CSV
      # artifacts need it, trainer/trainer.py:411-437).  Decided from
      # len(dataset) BEFORE embedding so the at-scale path can land the
      # accumulated embeddings on host instead of one chip's HBM
      # (identical on every process: len() is deterministic).
      n_videos = len(dataset)
      use_fused = (sets != "final_eval"
                   and self.fused_eval_from_videos
                   and n_videos >= self.fused_eval_from_videos
                   and metric_names <= {"t2v_metrics", "v2t_metrics"}
                   # the visualizer reads the sims matrix (keyed on the
                   # configured flag, not the per-process instance, so
                   # all processes pick the same program)
                   and not self._want_visualizer)

      with self.timer.time("valid.embds"):
        embds = self._get_embeddings(loader, to_host=use_fused)

      b, k, m, d = embds["text_embds"].shape
      query_masks = embds["query_masks"]
      n_videos = embds["vid_embds"].shape[0]
      sims = None
      if not use_fused:
        with self.timer.time("valid.conf_mat"):
          sims_dev = similarity_ops.moe_similarity(
              embds["text_embds"].reshape(b * k, m, d),
              embds["vid_embds"],
              embds["text_weights"].reshape(b * k, m),
              embds["vid_weights"],
              merge="indep", num_caps=k)
          sims = np.asarray(sims_dev)

      # MixDataset evals have dataset_name='Mix' with no cut/split parts
      # (the reference IndexErrors there, trainer/trainer.py:411-437);
      # artifact naming just falls back to the plain name.
      parts = dataset_name.split("_")
      if len(parts) >= 3:
        ds_base, cut_name, split_name = parts[0], parts[1], parts[2]
      else:
        ds_base, cut_name, split_name = dataset_name, "", "eval"

      if sets == "final_eval" and self.is_primary:
        if cut_name == "c" and split_name in ("test1", "test2"):
          public = ("public_server_val" if split_name == "test1"
                    else "public_server_test")
          pred_path = self.exp_dir / f"{ds_base}-{public}-predictions.csv"
          np.savetxt(pred_path,
                     compress_predictions(query_masks, sims),
                     delimiter=",", fmt="%d")
          logger.info("Saved predictions to %s", pred_path)
        sims_path = self.exp_dir / f"{ds_base}-{split_name}-sims.npy"
        np.save(sims_path, {"sims": sims, "query_masks": query_masks})
        logger.info("Saved similarity matrix to %s", sims_path)

      nested = {}
      if use_fused:
        with self.timer.time("valid.conf_mat"):
          nested = metrics_lib.fused_retrieval_metrics(
              embds["text_embds"].reshape(b * k, m, d),
              embds["vid_embds"],
              embds["text_weights"].reshape(b * k, m),
              embds["vid_weights"],
              query_masks, which=tuple(name for name, _ in self.metrics),
              mesh=self.mesh)
        logger.info("%s: fused on-device ranking (%d videos; sims matrix "
                    "not materialized%s)", dataset_name, n_videos,
                    ", candidate-sharded across the mesh"
                    if self.mesh is not None else "")

      # Tracked throughput metric (BASELINE.json): eval videos/sec/chip.
      embds_time = self.timer.dic.get("valid.embds", {}).get("val", 0)
      conf_time = self.timer.dic.get("valid.conf_mat", {}).get("val", 0)
      n_chips = jax.device_count()
      if embds_time + conf_time > 0:
        vps = n_videos / (embds_time + conf_time) / n_chips
        logger.info("%s eval throughput: %.1f videos/s/chip "
                    "(%d videos, %.3fs embed + %.3fs similarity)",
                    dataset_name, vps, n_videos, embds_time, conf_time)
        self.writer.add_scalar(f"{dataset_name}/eval_videos_per_sec_per_chip",
                               vps, epoch)

      with self.timer.time("valid.metrics"):
        for name, fn in self.metrics:
          if not use_fused:
            nested[name] = fn(sims, query_masks=query_masks,
                              device=self.device_metrics)
          for key, value in nested[name].items():
            if key != "cols":
              self.writer.add_scalar(f"{dataset_name}/{name}/{key}",
                                     value, epoch)
      result["metrics"][dataset_name] = nested

      if self.visualizer is not None and sims is not None:
        with self.timer.time("valid.visu"):
          self.visualizer.visualize_ranking(
              sims=sims, query_masks=query_masks, epoch=epoch,
              meta={"paths": embds["paths"],
                    "raw_captions": embds["raw_captions"],
                    "vid_weights": np.asarray(embds["vid_weights"]),
                    "text_weights": np.asarray(
                        embds["text_weights"]).reshape(b * k, m)},
              nested_metrics=nested, modalities=self.modalities,
              subdir_name=f"{split_name}_{sets}", sets=sets,
              tokenizer=self.tokenizer)
    return result

  def evaluate(self):
    """Final eval: load best ckpt, run final_eval sets, write artifacts
    (base/base_trainer.py:244-297)."""
    # Process 0 may still be flushing the last checkpoint; everyone must
    # see the same file (or the same absence) before loading.
    self._ckpt_writer.flush()
    mesh_lib.barrier("pre_final_eval")
    best = self.exp_dir / "trained_model.msgpack"
    if best.exists():
      self._resume_checkpoint(best)
    else:
      logger.info("No best checkpoint at %s; evaluating current weights",
                  best)
    self._ensure_global_state()
    final = self._valid_epoch(epoch=self.epoch, sets="final_eval")

    log = {}
    for ds_name, ds_metrics in final["metrics"].items():
      log[ds_name] = {}
      for m_type, m_dict in ds_metrics.items():
        for m_name, m_value in m_dict.items():
          log[ds_name][f"{m_type}/{m_name}/final_eval"] = m_value
    for ds_name, metric_dict in log.items():
      logger.info("%s:", ds_name)
      for name, value in metric_dict.items():
        if "/cols" not in name:
          logger.info(" %-40s: %s", name, value)

    if self.is_primary:
      results_path = self.exp_dir / "exp_results.json"
      res = {}
      if results_path.exists():
        with open(results_path) as f:
          res = json.load(f)
      res["perfs"] = {ds: {k: v for k, v in d.items() if "/cols" not in k}
                      for ds, d in log.items()}
      res["checkpoint_epoch"] = self.loaded_epoch
      with open(results_path, "w") as f:
        # MeanR/MedR can legitimately be inf (a video whose captions are
        # all masked ranks at infinity, ops/ranking.py) — python's json
        # would emit non-RFC `Infinity`, which external parsers reject.
        json.dump(_json_sanitize(res), f, indent=4)

      flag = self.exp_dir / "exp_completed_flag.txt"
      flag.touch()
    # All processes observe the finished artifacts before returning
    # (callers may read exp_results.json right after evaluate()).
    mesh_lib.barrier("post_final_eval")
    return final

  # ------------------------------------------------------------------
  # Checkpointing
  # ------------------------------------------------------------------
  def _state_dict(self):
    state = {
        "params": self.params,
        "batch_stats": self.batch_stats,
        "epoch": self.epoch,
        "monitor_best": float(self.mnt_best),
        "n_samples": self.n_samples,
        "n_steps": self.n_steps,
        "config": json.dumps(dict(self.config.raw)),
        "arch": type(self.model).__name__,
        # Model RNG key: restored on restart so dropout streams continue
        # exactly (the reference loses torch RNG state across --resume).
        "rng": np.asarray(jax.random.key_data(self.rng)),
    }
    if self.include_optim_in_ckpts:
      state["opt_state"] = self.opt_state
    return state

  def _save_checkpoint(self, epoch, save_best=False):
    # Snapshot to host NOW (the next train step donates these buffers);
    # encode+write happen on the writer thread (AsyncCheckpointWriter).
    # Sharded state (e.g. 'model'-axis params under tensor parallelism)
    # is gathered: np.asarray handles every single-process layout (all
    # shards addressable); a cross-process sharding goes through
    # process_allgather — a COLLECTIVE, so it must run on EVERY process
    # (a primary-only gather of genuinely cross-process-sharded state
    # would deadlock process 0).  All processes therefore walk the tree;
    # non-primary ones skip the device->host copy of addressable leaves
    # and discard the result below.
    def _to_host(x):
      if not isinstance(x, jax.Array):
        return x
      if not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
      return np.asarray(x) if self.is_primary else x

    host_state = jax.tree_util.tree_map(_to_host, self._state_dict())
    # One writer per experiment: a shared-FS save from every process
    # would race on the tmp file and multiply IO for identical bytes
    # (state is replicated).  Readers sync via mesh_lib.barrier().
    if not self.is_primary:
      return
    self._ckpt_writer.save(self.exp_dir, host_state, epoch,
                           save_best=save_best)

  def _load_txt_bert_init(self, path):
    """Initialize the text tower from converted pretrained BERT weights.

    Mirrors the reference's unconditional ``from_pretrained`` for
    bertftn/bertfrz text towers (model/model.py:150-162): the tree from
    scripts/convert_hf_bert.py is merged into params['txt_bert'] BEFORE
    any resume/warm-start so a checkpoint still wins.  Unlike general
    warm starts, this merge is STRICT: any tower leaf the asset cannot
    fill (missing key or shape mismatch, e.g. a custom-vocab word table
    against the stock bert-base-cased asset) raises — a partially
    pretrained encoder over a random word table is the worst silent
    failure mode.
    """
    logger.info("Initializing txt_bert from %s", path)
    raw = ckpt_lib.load_checkpoint_raw(str(path))
    tree = raw.get("params", raw)
    if isinstance(tree, dict) and "txt_bert" in tree:
      tree = tree["txt_bert"]
    if "txt_bert" not in self.params:
      logger.warning("txt_bert_init given but the model has no txt_bert "
                     "tower; ignored")
      return
    stats = {}
    self.params["txt_bert"] = ckpt_lib.merge_params(
        self.params["txt_bert"], tree, path="txt_bert", stats=stats)
    n_target = len(jax.tree_util.tree_leaves(self.params["txt_bert"]))
    if not stats.get("matched"):
      raise ValueError(
          f"txt_bert_init {path}: no leaf matched the model's txt_bert "
          f"tree — wrong geometry or a stale converter output "
          f"(re-run scripts/convert_hf_bert.py)")
    if stats.get("skipped"):
      raise ValueError(
          f"txt_bert_init {path}: {len(stats['skipped'])} txt_bert leaves "
          f"could not be initialized from the asset (first: "
          f"{stats['skipped'][0]}) — the tower geometry does not match the "
          f"converted weights; fix text_bert_geometry / the vocab, or "
          f"re-run scripts/convert_hf_bert.py against the right model")
    logger.info("txt_bert init: %d/%d leaves loaded from %s",
                stats["matched"], n_target, path)

  def _resume_checkpoint(self, resume_path):
    resume_path = str(resume_path)
    logger.info("Loading checkpoint from %s", resume_path)
    raw = ckpt_lib.load_checkpoint_raw(resume_path)
    restart = os.path.dirname(os.path.abspath(resume_path)) == str(
        self.exp_dir.resolve())

    loaded_cfg = json.loads(raw.get("config", "{}"))
    if loaded_cfg.get("arch") != self.config.raw.get("arch"):
      logger.warning("Architecture config differs from checkpoint")

    raw["params"] = ckpt_lib.match_checkpoint_to_model(
        raw.get("params", {}), self.params)

    if restart:
      self.params = jax.tree_util.tree_map(
          lambda t, l: jnp.asarray(l), self.params,
          ckpt_lib.merge_params(self.params, raw["params"]))
      if raw.get("batch_stats"):
        self.batch_stats = ckpt_lib.merge_params(self.batch_stats,
                                                 raw["batch_stats"])
      if "opt_state" in raw and self.include_optim_in_ckpts:
        same_optim = (loaded_cfg.get("optimizer", {}).get("type")
                      == self.config.raw.get("optimizer", {}).get("type"))
        if same_optim:
          from flax import serialization
          self.opt_state = serialization.from_state_dict(
              self.opt_state, raw["opt_state"])
        else:
          logger.warning("Optimizer type changed; not resuming its state")
      self.loaded_epoch = int(raw.get("epoch", 0))
      self.epoch = self.loaded_epoch
      self.start_epoch = self.loaded_epoch + 1
      self.n_samples = int(raw.get("n_samples", 0))
      self.n_steps = int(raw.get("n_steps", 0))
      self.mnt_best = float(raw.get("monitor_best", self.mnt_best))
      if raw.get("rng") is not None:
        # Restore as a legacy uint32[2] key — the same representation
        # jax.random.PRNGKey(seed) produced at init, so the key type is
        # uniform across fresh/resumed runs (a typed key here broke
        # multi-process replication: np.asarray refuses typed keys).
        self.rng = jnp.asarray(raw["rng"], dtype=jnp.uint32)
    else:
      # Warm start: non-strict load, counters reset
      # (base/base_trainer.py:452-462).
      self.params = ckpt_lib.merge_params(self.params, raw["params"])
      if raw.get("batch_stats"):
        self.batch_stats = ckpt_lib.merge_params(self.batch_stats,
                                                 raw["batch_stats"])
      self.loaded_epoch = int(raw.get("epoch", 0))
      self.epoch = 0
      self.start_epoch = 0
      self.n_samples = 0
      self.n_steps = 0
      if self.is_primary:
        ckpt_lib.write_info(self.exp_dir, resume_path, self.loaded_epoch)
    logger.info("Ckpt loaded at epoch %s", raw.get("epoch", "?"))
