"""On-device retrieval ranking with tie-averaging.

The reference ranks on the host with numpy sorts
(/root/reference/model/metric.py:26-243).  On TPU, the tie-averaged rank
of the ground-truth item is a pair of comparisons reduced over the
candidate axis — no sort needed:

    rank(q) = #{v : d[q,v] < d_gt} + (#{v : d[q,v] == d_gt} - 1) / 2

which is exactly the "averaging" tie-break the reference implements via
``np.where(sorted_dists - gt_dists == 0)`` + reduceat.  Everything
vectorizes to two [Q, V] comparisons and row reductions (VPU work, one
pass over the similarity matrix, O(QV) instead of O(QV log V)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MISSING_VAL = 1e8  # model/metric.py:186


@jax.jit
def t2v_ranks(sims):
  """Tie-averaged rank of the GT video for each caption row.

  sims: [Q, V] with Q = V * caps_per_video; query q's GT video is
  q // caps_per_video (model/metric.py:57-64 index layout).
  Returns fp32 ranks [Q].
  """
  q, v = sims.shape
  qu = q // v
  d = -sims.astype(jnp.float32)
  gt_col = jnp.arange(q) // qu                      # [Q]
  d_gt = jnp.take_along_axis(d, gt_col[:, None], axis=1)  # [Q, 1]
  closer = jnp.sum(d < d_gt, axis=1).astype(jnp.float32)
  tied = jnp.sum(d == d_gt, axis=1).astype(jnp.float32)
  return closer + (tied - 1.0) / 2.0


@jax.jit
def v2t_ranks(sims, query_masks):
  """Min tie-averaged rank over each video's own captions.

  sims: [Q, V] caption-x-video similarities (the op transposes internally,
  model/metric.py:170).  query_masks: [V, caps_per_video] validity of each
  caption slot.  Missing captions get distance MISSING_VAL (they still
  occupy a slot in the ranking, as in the reference) and are skipped as
  ranking *candidates*.  Returns fp32 ranks [V].
  """
  q, v = sims.shape
  cpv = q // v
  d = -sims.astype(jnp.float32).T                    # [V, Q]
  mask_flat = query_masks.reshape(-1).astype(bool)   # [Q]
  d = jnp.where(mask_flat[None, :], d, MISSING_VAL)

  # Own-caption distances for each video: columns [i*cpv, (i+1)*cpv).
  own_idx = (jnp.arange(v)[:, None] * cpv + jnp.arange(cpv)[None, :])  # [V,cpv]
  d_own = jnp.take_along_axis(d, own_idx, axis=1)    # [V, cpv]
  own_valid = query_masks.reshape(v, cpv).astype(bool)

  # One [V, Q] comparison pass per caption slot (cpv is small and static);
  # avoids materializing a [V, cpv, Q] tensor.
  best = jnp.full((v,), jnp.inf, dtype=jnp.float32)
  for j in range(cpv):
    dj = d_own[:, j:j + 1]                           # [V, 1]
    closer = jnp.sum(d < dj, axis=1).astype(jnp.float32)
    tied = jnp.sum(d == dj, axis=1).astype(jnp.float32)
    rank_j = closer + (tied - 1.0) / 2.0
    rank_j = jnp.where(own_valid[:, j], rank_j, jnp.inf)
    best = jnp.minimum(best, rank_j)
  return best
