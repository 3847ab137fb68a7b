"""Training losses.

Parity with /root/reference/model/loss.py:29-81, expressed as masked
reductions over the full similarity matrix instead of index_select
gathers (static shapes; everything stays on the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmt_tpu.registry import register


@register("loss", "MaxMarginRankingLoss")
def max_margin_ranking_loss(margin: float = 1.0, fix_norm: bool = True):
  """Bidirectional max-margin ranking loss.

  For sims x [n, n] with positives on the diagonal, penalizes
  relu(margin - x_ii + x_ij) over row negatives and
  relu(margin - x_ii + x_ji) over column negatives; ``fix_norm`` drops the
  (zero-margin-violating-by-construction) diagonal terms from the mean
  (model/loss.py:38-65 — the reference concatenates the row copy and the
  column copy and takes one mean, so both directions share a denominator).
  """
  def loss_fn(x):
    x = x.astype(jnp.float32)
    n = x.shape[0]
    diag = jnp.diagonal(x)[:, None]                    # x_ii per row
    row_terms = jax.nn.relu(margin - (diag - x))       # [n, n]
    col_terms = jax.nn.relu(margin - (diag - x.T))     # [n, n]
    if fix_norm:
      off = 1.0 - jnp.eye(n, dtype=jnp.float32)
      total = jnp.sum(row_terms * off) + jnp.sum(col_terms * off)
      count = 2.0 * n * (n - 1)
    else:
      total = jnp.sum(row_terms) + jnp.sum(col_terms)
      count = 2.0 * n * n
    return total / count
  return loss_fn


@register("loss", "InfoNceLoss")
def info_nce_loss():
  """Symmetric cross-entropy over rows and columns (model/loss.py:68-81)."""
  def loss_fn(x):
    x = x.astype(jnp.float32)
    n = x.shape[0]
    labels = jnp.arange(n)
    log_p_rows = jax.nn.log_softmax(x, axis=-1)
    log_p_cols = jax.nn.log_softmax(x.T, axis=-1)
    ce_rows = -jnp.mean(jnp.take_along_axis(log_p_rows, labels[:, None], 1))
    ce_cols = -jnp.mean(jnp.take_along_axis(log_p_cols, labels[:, None], 1))
    return ce_rows + ce_cols
  return loss_fn
