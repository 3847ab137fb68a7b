"""Optimizer / schedule tests, incl. Ranger trajectory parity against a
direct numpy transcription of the reference algorithm."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmt_tpu.train import optim


def reference_ranger_step(p, grad, state, lr, alpha=0.5, k=6,
                          n_sma_threshhold=5, b1=0.95, b2=0.999, eps=1e-5,
                          weight_decay=0.0):
  """Numpy transcription of utils/ranger.py:107-195 (single tensor)."""
  import math
  state["step"] += 1
  t = state["step"]
  state["exp_avg_sq"] = b2 * state["exp_avg_sq"] + (1 - b2) * grad * grad
  state["exp_avg"] = b1 * state["exp_avg"] + (1 - b1) * grad

  beta2_t = b2 ** t
  n_sma_max = 2 / (1 - b2) - 1
  n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
  if n_sma > n_sma_threshhold:
    step_size = math.sqrt((1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                          * (n_sma - 2) / n_sma * n_sma_max
                          / (n_sma_max - 2)) / (1 - b1 ** t)
  else:
    step_size = 1.0 / (1 - b1 ** t)

  if weight_decay:
    p = p - weight_decay * lr * p
  if n_sma > n_sma_threshhold:
    denom = np.sqrt(state["exp_avg_sq"]) + eps
    p = p - step_size * lr * state["exp_avg"] / denom
  else:
    p = p - step_size * lr * state["exp_avg"]

  if t % k == 0:
    state["slow"] = state["slow"] + alpha * (p - state["slow"])
    p = state["slow"].copy()
  return p, state


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_ranger_matches_reference_trajectory(rng, weight_decay):
  lr = 0.02
  p0 = rng.randn(12).astype(np.float32)

  tx = optim.ranger_lr(lr, weight_decay=weight_decay)
  params = jnp.asarray(p0)
  state = tx.init(params)

  ref_p = p0.astype(np.float64).copy()
  ref_state = {"step": 0, "exp_avg": np.zeros(12), "exp_avg_sq": np.zeros(12),
               "slow": ref_p.copy()}

  for t in range(15):  # crosses both the SMA threshold and k=6 boundaries
    grad = (np.sin(ref_p) + 0.1 * t).astype(np.float32)
    updates, state = tx.update(jnp.asarray(grad), state, params)
    params = optax.apply_updates(params, updates)
    ref_p, ref_state = reference_ranger_step(
        ref_p, grad.astype(np.float64), ref_state, lr,
        weight_decay=weight_decay)
    # fp32 (ours) vs fp64 (oracle) drift across the rectification
    # branch; the trajectory itself is identical.
    np.testing.assert_allclose(np.asarray(params), ref_p, rtol=1e-3,
                               atol=1e-4, err_msg=f"step {t}")


def test_step_lr():
  sched = optim.step_lr(1.0, step_size=2, gamma=0.5)
  assert sched(0) == 1.0 and sched(1) == 1.0
  assert sched(2) == 0.5 and sched(3) == 0.5
  assert sched(4) == 0.25


def test_linear_warmup():
  warm = optim.linear_warmup(4)
  assert [warm(i) for i in range(5)] == [0.25, 0.5, 0.75, 1.0, 1.0]
  assert optim.linear_warmup(-1)(0) == 1.0


def test_frozen_mask_blocks_updates():
  params = {"a": jnp.ones(3), "frozen": {"b": jnp.ones(2)}}
  mask = {"a": False, "frozen": {"b": True}}
  tx, _ = optim.build_optimizer(
      {"type": "Adam", "args": {"lr": 0.1, "weight_decay": 0.01}},
      frozen_mask=mask)
  state = tx.init(params)
  grads = {"a": jnp.ones(3), "frozen": {"b": jnp.ones(2)}}
  updates, state = tx.update(grads, state, params)
  new = optax.apply_updates(params, updates)
  assert not np.allclose(np.asarray(new["a"]), 1.0)
  np.testing.assert_array_equal(np.asarray(new["frozen"]["b"]), 1.0)


def test_injected_lr_changes_step_size():
  tx, base_lr = optim.build_optimizer(
      {"type": "SGD", "args": {"lr": 1.0}})
  params = {"w": jnp.ones(2)}
  state = tx.init(params)
  grads = {"w": jnp.ones(2)}
  state.hyperparams["learning_rate"] = jnp.float32(0.5)
  updates, state = tx.update(grads, state, params)
  np.testing.assert_allclose(np.asarray(updates["w"]), -0.5)


def test_frozen_param_mask_paths(tiny_arch):
  """bertfrz<N> masks exactly the first N encoder layers."""
  from train import frozen_param_mask
  from mmt_tpu.models.cenet import CENet
  from tests.conftest import make_batch

  model = CENet(**{**tiny_arch, "txt_agg": "bertfrz1", "txt_inp": "bertfrz"})
  batch = make_batch(tiny_arch["expert_dims"])
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  mask = frozen_param_mask(variables["params"], "bertfrz1", "bertfrz")
  enc = mask["txt_bert"]["encoder"]
  assert all(jax.tree_util.tree_leaves(enc["layer_0"]))
  assert not any(jax.tree_util.tree_leaves(enc["layer_1"]))
  assert all(jax.tree_util.tree_leaves(mask["txt_bert"]["word_embeddings"]))
  assert not any(jax.tree_util.tree_leaves(mask["vid_bert"]))
