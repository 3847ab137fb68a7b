"""Data-parallel correctness: the sharded step equals the single-device
step (global-batch negative semantics, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmt_tpu.models.cenet import CENet, similarity_from_outputs
from mmt_tpu.parallel import mesh as mesh_lib
from mmt_tpu.train.losses import max_margin_ranking_loss
from tests.conftest import make_batch


def test_data_mesh_shapes():
  m = mesh_lib.data_mesh()
  assert m is not None and m.devices.shape == (8, 1)
  m2 = mesh_lib.data_mesh(model_parallel=2)
  assert m2.devices.shape == (4, 2)


def test_sharded_step_matches_single_device(tiny_arch):
  """Loss and grads on an 8-way sharded batch == unsharded computation.

  This is the invariant the reference enforces by hand (DataParallel
  out='embds' + host-side loss re-fusion, trainer/trainer.py:185-199);
  here GSPMD owns it — similarity over the full batch forces embedding
  all-gathers, differentiably."""
  model = CENet(**tiny_arch)
  batch = make_batch(tiny_arch["expert_dims"], b=16)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  loss_fn = max_margin_ranking_loss(0.05, True)

  def compute(params, batch):
    out = model.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      batch, train=False)
    return loss_fn(similarity_from_outputs(out, merge="avg"))

  grad_fn = jax.value_and_grad(compute)

  # Single device
  loss_1, grads_1 = jax.jit(grad_fn)(variables["params"], batch)

  # 8-way data sharding
  mesh = mesh_lib.data_mesh()
  shard = NamedSharding(mesh, P("data"))
  sharded_batch = jax.tree_util.tree_map(
      lambda x: jax.device_put(x, shard), batch)
  loss_8, grads_8 = jax.jit(grad_fn, in_shardings=(None, shard))(
      variables["params"], sharded_batch)

  np.testing.assert_allclose(float(loss_1), float(loss_8), rtol=1e-5)
  flat_1 = jax.tree_util.tree_leaves(grads_1)
  flat_8 = jax.tree_util.tree_leaves(grads_8)
  for a, b in zip(flat_1, flat_8):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=1e-5)


def test_sharded_train_step_runs_and_updates(tiny_arch):
  """Full optimizer step under the mesh changes params and stays finite."""
  from mmt_tpu.train.optim import build_optimizer

  model = CENet(**tiny_arch)
  batch = make_batch(tiny_arch["expert_dims"], b=8)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  tx, _ = build_optimizer({"type": "Adam", "args": {"lr": 1e-3,
                                                    "weight_decay": 0}})
  params = variables["params"]
  opt_state = tx.init(params)
  loss_fn = max_margin_ranking_loss(0.05, True)

  mesh = mesh_lib.data_mesh()
  shard = NamedSharding(mesh, P("data"))

  def step(params, opt_state, batch, rng):
    def compute(p):
      out, _ = model.apply(
          {"params": p, "batch_stats": variables["batch_stats"]}, batch,
          train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
      return loss_fn(similarity_from_outputs(out, merge="avg"))
    loss, grads = jax.value_and_grad(compute)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

  jit_step = jax.jit(step, in_shardings=(None, None, shard, None))
  sharded = jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), batch)
  new_params, opt_state, loss = jit_step(params, opt_state, sharded,
                                         jax.random.PRNGKey(3))
  assert np.isfinite(float(loss))
  moved = sum(float(jnp.sum(jnp.abs(a - b)))
              for a, b in zip(jax.tree_util.tree_leaves(params),
                              jax.tree_util.tree_leaves(new_params)))
  assert moved > 0


def test_dryrun_multichip_entrypoint():
  import __graft_entry__
  __graft_entry__.dryrun_multichip(8)
