"""Optimizers and schedules.

Covers the reference surface: ``Adam`` / ``AdamW`` / ``SGD`` via optax,
``Ranger`` (RAdam + Lookahead, utils/ranger.py:30-195) as a custom optax
transformation, ``StepLR`` epoch decay (train.py:102-103), linear warmup
dampening (trainer/trainer.py:114-118,172-173), and parameter freezing
masks for the bertfrz modes (model/model.py:164-193).

The learning rate is injected as mutable state (optax.inject_hyperparams)
so the trainer can set ``lr(epoch) * warmup(step)`` every step without
recompiling the jitted update.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mmt_tpu.registry import get, register


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------


def step_lr(base_lr: float, step_size: int = 1, gamma: float = 1.0):
  """torch StepLR semantics: lr = base * gamma^(epoch // step_size)."""
  def schedule(epoch: int) -> float:
    return base_lr * (gamma ** (epoch // step_size))
  return schedule


def linear_warmup(warmup_period: int):
  """pytorch_warmup.LinearWarmup dampening: min(1, (t+1)/period)."""
  def factor(step: int) -> float:
    if warmup_period <= 0:
      return 1.0
    return min(1.0, (step + 1) / warmup_period)
  return factor


# ---------------------------------------------------------------------------
# Ranger: RAdam + Lookahead in one optax GradientTransformation
# ---------------------------------------------------------------------------


class RangerState(NamedTuple):
  count: jnp.ndarray
  mu: Any          # first-moment EMA
  nu: Any          # second-moment EMA
  slow: Any        # lookahead slow weights


def ranger_lr(learning_rate, alpha: float = 0.5, k: int = 6,
              n_sma_threshhold: int = 5, b1: float = 0.95, b2: float = 0.999,
              eps: float = 1e-5,
              weight_decay: float = 0.0) -> optax.GradientTransformation:
  """RAdam step with integrated lookahead (utils/ranger.py:107-195).

  Per step: rectified-Adam delta when the variance SMA exceeds the
  threshold, momentum-SGD fallback otherwise; weight decay is decoupled
  (applied to params, scaled by lr); every k-th step the fast weights are
  pulled α of the way toward the slow buffer and the slow buffer adopts
  the result.  Returns the *total* param delta, so lookahead fuses into
  one update.  ``learning_rate`` may be a float or an injected
  hyperparameter; it scales the step *before* the lookahead blend, in the
  reference's order.
  """

  def init_fn(params):
    return RangerState(
        count=jnp.zeros([], jnp.int32),
        mu=jax.tree_util.tree_map(jnp.zeros_like, params),
        nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        # Copy, don't alias: the slow buffer lives in opt_state, and the
        # trainer donates params and opt_state as separate buffers.
        slow=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                    params))

  def update_fn(updates, state, params=None):
    assert params is not None, "ranger requires params"
    lr = learning_rate
    count = state.count + 1
    cnt = count.astype(jnp.float32)

    mu = jax.tree_util.tree_map(
        lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
    nu = jax.tree_util.tree_map(
        lambda v, g: b2 * v + (1 - b2) * (g * g), state.nu, updates)

    beta2_t = jnp.power(b2, cnt)
    n_sma_max = 2.0 / (1 - b2) - 1.0
    n_sma = n_sma_max - 2.0 * cnt * beta2_t / (1 - beta2_t)
    rect = jnp.sqrt((1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                    * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2))
    bias1 = 1 - jnp.power(b1, cnt)
    step_size = jnp.where(n_sma > n_sma_threshhold, rect / bias1, 1.0 / bias1)
    use_adaptive = n_sma > n_sma_threshhold
    do_la = (count % k) == 0

    def per_leaf(p, g_mu, g_nu, s):
      p_wd = p - weight_decay * lr * p if weight_decay else p
      adaptive = g_mu / (jnp.sqrt(g_nu) + eps)
      d = jnp.where(use_adaptive, adaptive, g_mu)
      fast = p_wd - step_size * lr * d
      new_slow = s + alpha * (fast - s)
      new_fast = jnp.where(do_la, new_slow, fast)
      return new_fast - p, jnp.where(do_la, new_slow, s)

    pairs = jax.tree_util.tree_map(per_leaf, params, mu, nu, state.slow)
    is_pair = lambda x: isinstance(x, tuple)
    upd = jax.tree_util.tree_map(lambda t: t[0], pairs, is_leaf=is_pair)
    slow = jax.tree_util.tree_map(lambda t: t[1], pairs, is_leaf=is_pair)
    return upd, RangerState(count=count, mu=mu, nu=nu, slow=slow)

  return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Optimizer registry: each entry returns (factory(lr) -> tx, base_lr)
# ---------------------------------------------------------------------------


@register("optimizer", "Adam")
def adam(lr: float, weight_decay: float = 0.0, betas=(0.9, 0.999),
         eps: float = 1e-8):
  def factory(learning_rate):
    if weight_decay:
      return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=weight_decay)
    return optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
  return factory, lr


@register("optimizer", "AdamW")
def adamw(lr: float, weight_decay: float = 0.01, betas=(0.9, 0.999),
          eps: float = 1e-8):
  def factory(learning_rate):
    return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)
  return factory, lr


@register("optimizer", "SGD")
def sgd(lr: float, momentum: float = 0.0, weight_decay: float = 0.0):
  def factory(learning_rate):
    tx = optax.sgd(learning_rate, momentum=momentum or None)
    if weight_decay:
      tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
  return factory, lr


@register("optimizer", "Ranger")
def ranger_factory(lr: float = 1e-3, alpha: float = 0.5, k: int = 6,
                   n_sma_threshhold: int = 5, betas=(0.95, 0.999),
                   eps: float = 1e-5, weight_decay: float = 0.0):
  def factory(learning_rate):
    return ranger_lr(learning_rate, alpha=alpha, k=k,
                     n_sma_threshhold=n_sma_threshhold, b1=betas[0],
                     b2=betas[1], eps=eps, weight_decay=weight_decay)
  return factory, lr


def build_optimizer(spec, frozen_mask=None):
  """{'type','args'} config entry -> (inject_hyperparams tx, base_lr).

  ``frozen_mask``: pytree of bools (True = frozen), implementing
  requires_grad=False semantics — the final update for frozen leaves is
  zeroed (after the optimizer, so decoupled weight decay cannot leak in).
  """
  factory, base_lr = get("optimizer", spec["type"])(**spec.get("args", {}))

  def make(learning_rate):
    tx = factory(learning_rate)
    if frozen_mask is not None:
      tx = optax.chain(
          tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx

  tx = optax.inject_hyperparams(make)(learning_rate=base_lr)
  return tx, base_lr
