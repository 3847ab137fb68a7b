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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from mmt_tpu.ops.sharding import drop_conflicting_axes, norm_spec_entry

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
                 colbias_ref, nvalid_ref, closer_ref, tied_ref):
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    closer_ref[:] = jnp.zeros_like(closer_ref)
    tied_ref[:] = jnp.zeros_like(tied_ref)

  t = t_ref[:].astype(jnp.float32)       # [TQ, M*D] weight-scaled queries
  v = v_ref[:].astype(jnp.float32)       # [TV, M*D] weight-scaled cands
  tw = tw_ref[:].astype(jnp.float32)     # [TQ, M]
  vw = vw_ref[:].astype(jnp.float32)     # [TV, M]
  numer = jax.lax.dot_general(t, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
  denom = jax.lax.dot_general(tw, vw, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
  sims = numer / jnp.where(denom == 0, 1e-5, denom)   # [TQ, TV]
  # Per-candidate additive bias: 0 for live candidates, -MISSING_VAL for
  # masked caption slots in the v2t orientation (model/metric.py:186).
  sims = sims + colbias_ref[:]

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


def _fused_counts(queries, cands, qw, cw, gt, gtcol, colbias,
                  interpret=False):
  """(closer, tied) counts for each query against all candidates.

  queries/cands: weight-scaled [N, M*D] fp32; qw/cw: [N, M] weights;
  gt: [Nq] ground-truth similarity; gtcol: [Nq] candidate index excluded
  per query (-1 = none); colbias: [Nc] additive per-candidate bias
  (-MISSING_VAL marks dead caption slots).  Pallas tiles: the [Nq, Nc]
  similarity matrix lives only in VMEM, tile by tile.
  """
  nq, k = queries.shape
  nc = cands.shape[0]
  m = qw.shape[1]

  # Tile sizes walked down so the double-buffered [tile, M*D] fp32
  # operand tiles fit scoped VMEM (shared sizing with the similarity
  # kernel — ops/similarity.py:qv_tiles; (128, 256) at flagship M*D).
  from mmt_tpu.ops.similarity import qv_tiles
  tiles = qv_tiles(nq, nc, k)
  assert tiles is not None, (nq, nc, k)  # gated in *_ranks_from_embeddings
  tile_q, tile_v = tiles
  qp, vp = _round_up(nq, tile_q), _round_up(nc, tile_v)
  t = jnp.pad(queries, ((0, qp - nq), (0, 0)))
  vv = jnp.pad(cands, ((0, vp - nc), (0, 0)))
  qw_p = jnp.pad(qw, ((0, qp - nq), (0, 0)))
  cw_p = jnp.pad(cw, ((0, vp - nc), (0, 0)))
  gt_p = jnp.pad(gt, (0, qp - nq))[:, None]
  gtcol_p = jnp.pad(gtcol.astype(jnp.int32), (0, qp - nq),
                    constant_values=-1)[:, None]
  colbias_p = jnp.pad(colbias.astype(jnp.float32), (0, vp - nc))[None, :]
  # jnp.full, not jnp.asarray: a concrete array materialized at trace
  # time becomes a jaxpr const, which custom_partitioning rejects.
  nvalid = jnp.full((1,), nc, jnp.int32)

  grid = (qp // tile_q, vp // tile_v)
  closer, tied = pl.pallas_call(
      _rank_kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_v, k), lambda i, j: (j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_q, m), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_v, m), lambda i, j: (j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tile_v), lambda i, j: (0, j),
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
      interpret=interpret,
  )(t, vv, qw_p, cw_p, gt_p, gtcol_p, colbias_p, nvalid)
  return closer[:nq, 0], tied[:nq, 0]


def _cand_sharded(local_fn):
  """custom_partitioning for the fused-counts op:

      (queries[Q,K], cands[C,K], qw[Q,M], cw[C,M], gt[Q], gtcol[Q],
       colbias[C]) -> (closer[Q], tied[Q])

  The counts are ADDITIVE over candidate shards, so the natural rule is:
  query-side operands shard like their rows; candidate-side operands
  shard like theirs; each device counts its local candidate block (with
  the GT-exclusion index shifted into shard-local coordinates — indices
  outside the local range simply never match) and the outputs psum over
  the candidate axis.  When both sides ride the same mesh axis the query
  side wins and candidates gather (an output can't shard two ways on one
  axis) — the at-scale eval shards candidates with queries replicated,
  which also keeps the outputs replicated (multi-host lockstep-safe).
  """
  cp = custom_partitioning(local_fn)

  _norm = norm_spec_entry

  def _axes(arg_shapes):
    def row(i):
      spec = arg_shapes[i].sharding.spec
      return _norm(spec[0] if len(spec) else None)
    q = next((a for a in (row(0), row(2), row(4), row(5)) if a), ())
    c = next((a for a in (row(1), row(3), row(6)) if a), ())
    # One mesh axis can't shard both sides: queries win, and only the
    # CONFLICTING axes leave the candidate sharding — a mixed layout
    # like q=('data',), c=('data','model') keeps candidates sharded
    # over 'model' instead of gathering the whole corpus per device.
    c = drop_conflicting_axes(q, c)
    return q or None, c or None

  def infer(mesh, arg_shapes, result_shape):
    q, _ = _axes(arg_shapes)
    return (NamedSharding(mesh, P(q)), NamedSharding(mesh, P(q)))

  def part(mesh, arg_shapes, result_shape):
    # Follow the RESOLVED output sharding for the query axis (under
    # Shardy the partition body must not guess — ops/similarity.py
    # learned this the hard way); the candidate axis comes from the
    # operands.
    out_spec = result_shape[0].sharding.spec
    q = _norm(out_spec[0] if len(out_spec) else None) or None
    _, c = _axes(arg_shapes)
    if c is not None:
      c = drop_conflicting_axes(q or (), c) or None
    args = (NamedSharding(mesh, P(q, None)),
            NamedSharding(mesh, P(c, None)),
            NamedSharding(mesh, P(q, None)),
            NamedSharding(mesh, P(c, None)),
            NamedSharding(mesh, P(q)),
            NamedSharding(mesh, P(q)),
            NamedSharding(mesh, P(c)))
    outs = (NamedSharding(mesh, P(q)), NamedSharding(mesh, P(q)))

    def lower(queries, cands, qw, cw, gt, gtcol, colbias):
      if c is None:
        return local_fn(queries, cands, qw, cw, gt, gtcol, colbias)
      # Shift the GT-exclusion index into this shard's coordinates; the
      # validity window (col < local candidate count) and all counting
      # stay shard-local, and the additive outputs reduce across shards.
      # A multi-axis candidate sharding linearizes major-to-minor, the
      # same order GSPMD lays shard blocks out for P((a, b)).
      shard = jax.lax.axis_index(c[0])
      for a in c[1:]:
        shard = shard * mesh.shape[a] + jax.lax.axis_index(a)
      offset = shard * cands.shape[0]
      closer, tied = local_fn(queries, cands, qw, cw, gt,
                              gtcol - offset, colbias)
      return (jax.lax.psum(closer, c), jax.lax.psum(tied, c))

    return mesh, lower, outs, args

  cp.def_partition(partition=part, infer_sharding_from_operands=infer,
                   sharding_rule="q k, c k, q m, c m, q, q, c -> q, q")
  return cp


@functools.lru_cache(maxsize=None)
def _counts_fn(interpret: bool):
  # custom_partitioning requires positional-only callables.
  def _local(queries, cands, qw, cw, gt, gtcol, colbias):
    return _fused_counts(queries, cands, qw, cw, gt, gtcol, colbias,
                         interpret=interpret)

  return _cand_sharded(_local)


def _chunked_counts(queries, cands, qw, cw, gt, gtcol, colbias,
                    chunk: int = 4096):
  """XLA fallback for _fused_counts: candidate-chunked two-comparison
  passes, so at most [Nq, chunk] of the similarity matrix exists at a
  time (used off-TPU; same semantics as the Pallas kernel)."""
  nq = queries.shape[0]
  nc = cands.shape[0]
  closer = jnp.zeros((nq,), jnp.float32)
  tied = jnp.zeros((nq,), jnp.float32)
  for s in range(0, nc, chunk):
    c = cands[s:s + chunk]
    w = cw[s:s + chunk]
    numer = queries @ c.T
    denom = qw @ w.T
    sims = numer / jnp.where(denom == 0, 1e-5, denom)
    sims = sims + colbias[s:s + chunk][None, :]
    col = s + jnp.arange(c.shape[0])
    valid = col[None, :] != gtcol[:, None]
    closer += jnp.sum(jnp.where(valid & (sims > gt[:, None]), 1.0, 0.0), 1)
    tied += jnp.sum(jnp.where(valid & (sims == gt[:, None]), 1.0, 0.0), 1)
  return closer, tied


def _scaled_flat(embds, weights):
  n, m, d = embds.shape
  w = weights.astype(jnp.float32)
  return (embds.astype(jnp.float32) * w[:, :, None]).reshape(n, m * d), w


def _gt_sims(queries, cands, qw, cw, gtcol):
  """Direct GT similarity per query (O(N M D), no matrix)."""
  numer = jnp.sum(queries * cands[gtcol], axis=1)
  denom = jnp.sum(qw * cw[gtcol], axis=1)
  return numer / jnp.where(denom == 0, 1e-5, denom)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_t2v_ranks(text_embds, vid_embds, text_weights, vid_weights,
                    vid_valid=None, interpret=False):
  """Tie-averaged t2v GT ranks straight from embeddings (no sims matrix).

  Args as in mmt_tpu.ops.similarity.moe_similarity; Q = V * caps.
  ``vid_valid`` (optional [V] bool/float): candidate validity — padding
  rows (e.g. to divide a device mesh) are biased to -MISSING_VAL so they
  never outrank a live video.  Returns fp32 ranks [Q], matching
  ``t2v_ranks(moe_similarity(..., merge='indep'))`` (the GT column is
  excluded by index, so the self-tie is exact; cross-column ties agree up
  to matmul rounding of the GT value).
  """
  q = text_embds.shape[0]
  v = vid_embds.shape[0]
  t, tw = _scaled_flat(text_embds, text_weights)
  vv, vw = _scaled_flat(vid_embds, vid_weights)
  gt_col = jnp.arange(q) // (q // v)
  gt = _gt_sims(t, vv, tw, vw, gt_col)
  if vid_valid is None:
    colbias = jnp.zeros((v,), jnp.float32)
  else:
    colbias = jnp.where(vid_valid.astype(bool), 0.0, -MISSING_VAL)
  closer, tied = _counts_fn(interpret)(t, vv, tw, vw, gt, gt_col, colbias)
  # GT column excluded by index: rank = closer + tied/2 (the self-tie's
  # (1-1)/2 = 0 contribution is already accounted for).
  return closer + tied / 2.0


def _v2t_ranks_from_counts(count_fn, text_embds, vid_embds, text_weights,
                           vid_weights, query_masks):
  q = text_embds.shape[0]
  v = vid_embds.shape[0]
  cpv = q // v
  t_cand, tw = _scaled_flat(text_embds, text_weights)
  v_query, vw = _scaled_flat(vid_embds, vid_weights)
  mask_flat = query_masks.reshape(-1).astype(bool)
  colbias = jnp.where(mask_flat, 0.0, -MISSING_VAL)  # dead caption slots
  best = jnp.full((v,), jnp.inf, jnp.float32)
  for j in range(cpv):   # cpv is small and static
    gt_col = jnp.arange(v) * cpv + j
    gt = _gt_sims(v_query, t_cand, vw, tw, gt_col)
    closer, tied = count_fn(v_query, t_cand, vw, tw, gt, gt_col, colbias)
    rank_j = closer + tied / 2.0
    best = jnp.minimum(best, jnp.where(mask_flat[gt_col], rank_j, jnp.inf))
  return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_v2t_ranks(text_embds, vid_embds, text_weights, vid_weights,
                    query_masks, interpret=False):
  """Min tie-averaged rank of each video's own captions among all caption
  slots, straight from embeddings — the v2t orientation of the fused
  kernel (matches ``v2t_ranks(moe_similarity(..., merge='indep'), masks)``
  up to matmul rounding of near-ties; masked caption slots are biased to
  -MISSING_VAL so they never outrank live ones, model/metric.py:186)."""
  return _v2t_ranks_from_counts(_counts_fn(interpret), text_embds,
                                vid_embds, text_weights, vid_weights,
                                query_masks)


def t2v_ranks_from_embeddings(text_embds, vid_embds, text_weights,
                              vid_weights, vid_valid=None):
  """Backend dispatch: Pallas on TPU, candidate-chunked XLA elsewhere.
  Either way the [Q, V] similarity matrix is never materialized in HBM."""
  from mmt_tpu.ops.similarity import qv_tiles
  m, d = text_embds.shape[1:]
  if jax.default_backend() == "tpu" and qv_tiles(1, 1, m * d) is not None:
    return fused_t2v_ranks(text_embds, vid_embds, text_weights, vid_weights,
                           vid_valid)
  q = text_embds.shape[0]
  v = vid_embds.shape[0]
  t, tw = _scaled_flat(text_embds, text_weights)
  vv, vw = _scaled_flat(vid_embds, vid_weights)
  gt_col = jnp.arange(q) // (q // v)
  gt = _gt_sims(t, vv, tw, vw, gt_col)
  if vid_valid is None:
    colbias = jnp.zeros((v,), jnp.float32)
  else:
    colbias = jnp.where(jnp.asarray(vid_valid).astype(bool), 0.0,
                        -MISSING_VAL)
  closer, tied = _chunked_counts(t, vv, tw, vw, gt, gt_col, colbias)
  return closer + tied / 2.0


def v2t_ranks_from_embeddings(text_embds, vid_embds, text_weights,
                              vid_weights, query_masks):
  """Backend dispatch for the v2t orientation (see t2v counterpart)."""
  from mmt_tpu.ops.similarity import qv_tiles
  m, d = text_embds.shape[1:]
  if jax.default_backend() == "tpu" and qv_tiles(1, 1, m * d) is not None:
    return fused_v2t_ranks(text_embds, vid_embds, text_weights,
                           vid_weights, query_masks)
  return _v2t_ranks_from_counts(_chunked_counts, text_embds, vid_embds,
                                text_weights, vid_weights, query_masks)
