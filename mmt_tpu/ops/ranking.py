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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---------------------------------------------------------------------------
# Fused similarity + ranking (Pallas): for N-video evals the [Q, V] sims
# matrix is QV*4 bytes of HBM traffic written and re-read twice by the
# two comparison passes; this kernel computes similarity tiles in VMEM
# and reduces them to per-query (closer, tied) counts on the spot, so the
# full matrix never touches HBM.  Two MXU contractions per tile (same
# fusion as mmt_tpu/ops/similarity.py) + VPU compares.
#
# Measured on one v5e: at 1k-5k videos it matches the two-pass path
# (both are RTT/dispatch-bound, single-digit ms of device time); its HBM
# saving becomes material at ~50k+ videos where the sims matrix is GBs.
# Rank semantics: the GT self-tie is exact (excluded by index); candidate
# orderings agree with the two-pass path up to fp32 matmul rounding of
# near-ties.
# ---------------------------------------------------------------------------


def _rank_kernel(t_ref, v_ref, tw_ref, vw_ref, gt_ref, gtcol_ref,
                 nvalid_ref, closer_ref, tied_ref):
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    closer_ref[:] = jnp.zeros_like(closer_ref)
    tied_ref[:] = jnp.zeros_like(tied_ref)

  t = t_ref[:].astype(jnp.float32)       # [TQ, M*D] weight-scaled text
  v = v_ref[:].astype(jnp.float32)       # [TV, M*D] weight-scaled video
  tw = tw_ref[:].astype(jnp.float32)     # [TQ, M]
  vw = vw_ref[:].astype(jnp.float32)     # [TV, M]
  numer = jax.lax.dot_general(t, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
  denom = jax.lax.dot_general(tw, vw, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
  sims = numer / jnp.where(denom == 0, 1e-5, denom)   # [TQ, TV]

  # Candidate mask: real columns only, and the GT column excluded *by
  # index* — its self-tie contributes exactly (1-1)/2 = 0 to the rank,
  # and excluding it by value would be 1-ulp sensitive (the tile matmul
  # and the direct GT computation round differently).
  tile_v = sims.shape[1]
  col = (j * tile_v
         + jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1))
  valid = (col < nvalid_ref[0]) & (col != gtcol_ref[:].astype(jnp.int32))

  gt = gt_ref[:].astype(jnp.float32)                  # [TQ, 1]
  # dists = -sims: d < d_gt <=> sims > gt ; ties on equality.
  closer_ref[:] += jnp.sum(
      jnp.where(valid & (sims > gt), 1.0, 0.0), axis=1, keepdims=True)
  tied_ref[:] += jnp.sum(
      jnp.where(valid & (sims == gt), 1.0, 0.0), axis=1, keepdims=True)


def _round_up(x, m):
  return ((x + m - 1) // m) * m


@jax.jit
def fused_t2v_ranks(text_embds, vid_embds, text_weights, vid_weights):
  """Tie-averaged t2v GT ranks straight from embeddings (no sims matrix).

  Args as in mmt_tpu.ops.similarity.moe_similarity; Q = V * caps.
  Returns fp32 ranks [Q], matching
  ``t2v_ranks(moe_similarity(..., merge='indep'))`` (the GT column is
  excluded by index, so the self-tie is exact; cross-column ties agree up
  to matmul rounding of the GT value).
  """
  q, m, d = text_embds.shape
  v = vid_embds.shape[0]
  qu = q // v
  tw = text_weights.astype(jnp.float32)
  vw = vid_weights.astype(jnp.float32)
  t = (text_embds.astype(jnp.float32) * tw[:, :, None]).reshape(q, m * d)
  vv = (vid_embds.astype(jnp.float32) * vw[:, :, None]).reshape(v, m * d)

  # Ground-truth similarity per query, computed directly on the matched
  # pairs (O(Q M D), no matrix).
  gt_col = jnp.arange(q) // qu
  gt_numer = jnp.sum(t * vv[gt_col], axis=1)
  gt_denom = jnp.sum(tw * vw[gt_col], axis=1)
  gt = gt_numer / jnp.where(gt_denom == 0, 1e-5, gt_denom)     # [Q]

  # Tile sizes sized for VMEM: 2 double-buffered operand tiles of
  # [tile, M*D] fp32 must fit in ~16 MB (M*D is 3584 for the 7-expert
  # flagship).
  tile_q = min(_round_up(q, 8), 128)
  tile_v = min(_round_up(v, 128), 256)
  qp, vp = _round_up(q, tile_q), _round_up(v, tile_v)
  t = jnp.pad(t, ((0, qp - q), (0, 0)))
  vv = jnp.pad(vv, ((0, vp - v), (0, 0)))
  tw_p = jnp.pad(tw, ((0, qp - q), (0, 0)))
  vw_p = jnp.pad(vw, ((0, vp - v), (0, 0)))
  gt_p = jnp.pad(gt, (0, qp - q))[:, None]
  # padded queries get gt_col -1 (no column excluded; their rank is cut)
  gtcol_p = jnp.pad(gt_col.astype(jnp.int32), (0, qp - q),
                    constant_values=-1)[:, None]
  nvalid = jnp.asarray([v], jnp.int32)

  grid = (qp // tile_q, vp // tile_v)
  closer, tied = pl.pallas_call(
      _rank_kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((tile_q, m * d), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_v, m * d), lambda i, j: (j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_q, m), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_v, m), lambda i, j: (j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pltpu.SMEM),
      ],
      out_specs=(
          pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((qp, 1), jnp.float32),
          jax.ShapeDtypeStruct((qp, 1), jnp.float32),
      ),
  )(t, vv, tw_p, vw_p, gt_p, gtcol_p, nvalid)
  # GT column excluded by index: rank = closer + tied/2 (the self-tie's
  # (1-1)/2 = 0 contribution is already accounted for).
  return closer[:q, 0] + tied[:q, 0] / 2.0
