"""Worker for the multi-process DP smoke test (run as a subprocess).

Initializes the JAX distributed runtime via
mmt_tpu.parallel.mesh.maybe_initialize_distributed (env-var driven),
builds the global data mesh, runs ONE training step of the tiny flagship
model with the batch sharded over all processes' devices, and prints the
loss.  Run with MMT_TPU_NUM_PROCESSES=1 (no coordinator) it executes the
identical GSPMD program single-process, so the printed losses must match.

The DP semantics under test are the reference's global-batch negatives
(trainer/trainer.py:185-199): the loss reads the full similarity matrix,
so gradients flow through cross-process all-gathers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main_full_train():
  """Full-system mode (MMT_TPU_WORKER_MODE=full_train): run the REAL CLI
  trainer — Trainer.train() + evaluate(), checkpoints, artifacts — over
  the multi-process mesh on a pre-generated synthetic corpus, then print
  a params fingerprint + the final-eval metrics for cross-run comparison.

  This is the test surface for multi-host as a system (not a step):
  process-0-gated writes, replicated eval outputs, lockstep loaders,
  checkpoint barrier (trainer.py, mesh.py).
  """
  import jax
  jax.config.update("jax_platforms", "cpu")

  import json
  import pathlib

  import numpy as np

  sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "tests"))
  from test_train_e2e import make_config
  import train as train_cli

  root = pathlib.Path(os.environ["MMT_TPU_WORKER_ROOT"])
  data_dir = pathlib.Path(os.environ["MMT_TPU_WORKER_DATA"])
  exp_root = pathlib.Path(os.environ["MMT_TPU_WORKER_EXP"])
  os.environ["MMT_TPU_BERT_VOCAB"] = str(root / "vocab.txt")

  if os.environ.get("MMT_TPU_WORKER_RESUME"):
    # Restart leg: the exp dir already holds config.json + checkpoints
    # from a completed run; the caller bumped epochs in config.json.
    # Exercises multi-process _resume_checkpoint (every process reads
    # the shared checkpoint, state re-replicates, counters restore).
    trainer = train_cli.main(["--resume", str(exp_root)])
  else:
    cfg = make_config(root, data_dir, exp_root)
    cfg["train_sets"][0]["args"]["batch_size"] = 8  # divides the 8-dev mesh
    cfg["trainer"].update({"epochs": 2, "max_samples_per_epoch": 16,
                           "save_dir": str(exp_root)})
    if os.environ.get("MMT_TPU_WORKER_FUSED_EVAL"):
      # Route continuous eval through the candidate-sharded fused
      # no-matrix path (metrics.fused_retrieval_metrics(mesh=...)) —
      # the at-scale 50k+ eval program, exercised here across real
      # processes.  final_eval stays on the matrix path (sims artifact),
      # so BOTH eval programs run in this test.  The visualizer reads
      # the sims matrix, so it must be off for the fused path to engage.
      cfg.pop("visualizer", None)
      cfg["trainer"]["fused_eval_from_videos"] = 1
    tag = os.environ.get("MMT_TPU_PROCESS_ID", "single")
    cfg_path = root / f"cfg_full_{tag}.json"
    cfg_path.write_text(json.dumps(cfg))
    trainer = train_cli.main(["--config", str(cfg_path)])

  leaf = np.asarray(trainer.params["moe_fc_txt_rgb"]["kernel"])
  fingerprint = float(np.abs(leaf).sum())
  results_path = exp_root / "exp_results.json"
  perfs = {}
  if results_path.exists():   # written by process 0 only
    perfs = json.loads(results_path.read_text()).get("perfs", {})
  print("RESULTFULL fingerprint=%.10f n_devices=%d perfs=%s"
        % (fingerprint, len(jax.devices()), json.dumps(perfs,
                                                       sort_keys=True)),
        flush=True)


def main():
  import jax
  jax.config.update("jax_platforms", "cpu")

  from mmt_tpu.parallel import mesh as mesh_lib
  mesh_lib.maybe_initialize_distributed()

  import jax.numpy as jnp
  import numpy as np
  import optax
  from jax.sharding import NamedSharding, PartitionSpec as P

  import __graft_entry__ as graft
  from mmt_tpu.models.cenet import similarity_from_outputs
  from mmt_tpu.train.losses import max_margin_ranking_loss
  from mmt_tpu.train.optim import build_optimizer

  mesh = mesh_lib.data_mesh()
  n = len(jax.devices())
  assert mesh is not None, "expected a multi-device mesh"

  model, batch = graft._flagship_model_and_batch(
      batch_size=n, max_expert_tokens=2, max_text_words=4, tiny=True)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)

  def place(tree, spec):
    sharding = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), sharding, lambda idx: np.asarray(x)[idx]), tree)

  params = place(variables["params"], P())
  batch_stats = place(variables.get("batch_stats", {}), P())
  global_batch = place(batch, P("data"))
  tx, _ = build_optimizer(
      {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}})
  opt_state = jax.jit(tx.init)(params)
  loss_fn = max_margin_ranking_loss(margin=0.05, fix_norm=True)

  def train_step(params, batch_stats, opt_state, batch, rng):
    def compute_loss(p):
      out, mut = model.apply({"params": p, "batch_stats": batch_stats},
                             batch, train=True, rngs={"dropout": rng},
                             mutable=["batch_stats"])
      sims = similarity_from_outputs(out, merge="avg")
      return loss_fn(sims), mut.get("batch_stats", batch_stats)

    (loss, new_bs), grads = jax.value_and_grad(compute_loss,
                                               has_aux=True)(params)
    opt_state.hyperparams["learning_rate"] = jnp.float32(1e-4)
    updates, new_opt = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_bs, new_opt, loss

  step = jax.jit(train_step)
  rng = place(np.asarray(jax.random.PRNGKey(2)), P())
  new_params, _, _, loss = step(params, batch_stats, opt_state,
                                global_batch, rng)
  # A post-update parameter fingerprint catches gradient divergence that
  # the (pre-update) loss value alone would not.
  leaf = new_params["moe_fc_txt_rgb"]["kernel"]
  fingerprint = float(jnp.sum(jnp.abs(leaf)))
  print(f"RESULT loss={float(loss):.10f} n_devices={n} "
        f"fingerprint={fingerprint:.10f}", flush=True)


if __name__ == "__main__":
  if os.environ.get("MMT_TPU_WORKER_MODE") == "full_train":
    main_full_train()
  else:
    main()
