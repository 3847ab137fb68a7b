"""Fused MoE-weighted cross-view similarity.

The reference computes, for every (caption q, video v) pair
(/root/reference/model/model.py:789-837):

    moe_w[q,v,m] = tw[q,m] * vw[v,m] / sum_m tw[q,m] * vw[v,m]   (0-sum -> 1e-5)
    sims[q,v]    = sum_m moe_w[q,v,m] * <text[q,m,:], vid[v,m,:]>

via an M-way python loop of matmuls plus a materialized [Q,V,M] weight
tensor.  Because the per-pair normalizer is a rank-1-style contraction,
the whole thing factorizes into exactly TWO MXU contractions:

    numer[q,v] = einsum('qmd,vmd->qv', tw[...,None]*text, vw[...,None]*vid)
    denom[q,v] = tw @ vw.T              (with denom==0 -> 1e-5)
    sims       = numer / denom

No [Q,V,M] tensor, no loop over modalities — this is the TPU-native
formulation.  A Pallas kernel fusing both contractions and the divide is
provided for large eval matrices; both paths are exactly equivalent.

Caption-merge semantics ('avg' at train, 'indep' at eval) follow
model/model.py:827-836.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from mmt_tpu.ops.sharding import drop_conflicting_axes, norm_spec_entry

_USE_PALLAS = bool(int(os.environ.get("MMT_TPU_PALLAS_SIMILARITY", "0")))
_INTERPRET = False  # tests: run the kernel interpreted on CPU
EPS_ZERO_GUARD = 1e-5  # model/model.py:816


def use_pallas(enable: bool, interpret: bool = False) -> None:
  global _USE_PALLAS, _INTERPRET
  _USE_PALLAS = enable
  _INTERPRET = interpret


def pallas_active() -> bool:
  return _USE_PALLAS and (_INTERPRET or jax.default_backend() == "tpu")


def moe_similarity(text_embds, vid_embds, text_weights, vid_weights,
                   merge: str = "avg", num_caps: int = 1,
                   prefer_pallas=None):
  """Similarity matrix between all captions and all videos.

  Args:
    text_embds:  [Q, M, D] L2-normalized per-modality caption embeddings
                 (Q = B * num_caps, captions unrolled onto the first axis).
    vid_embds:   [V, M, D] L2-normalized per-modality video embeddings.
    text_weights: [Q, M] L1-normalized caption modality weights.
    vid_weights:  [V, M] L1-normalized video modality weights.
    merge: 'avg' (train: mean over a video's captions -> [B, V]) or
           'indep' (eval: keep captions separate -> [Q, V]).
    num_caps: captions per video (Q = B * num_caps).
    prefer_pallas: None = follow the global use_pallas() setting; False =
      force the XLA path; True = force the kernel.  The kernel carries a
      custom_partitioning rule (caption rows shard, video operands
      replicate — the all-gather IS the global-batch negative semantics),
      so it stays usable under GSPMD-sharded callers.

  Returns:
    [B, V] ('avg') or [Q, V] ('indep') similarity matrix, fp32.
  """
  use_kernel = _USE_PALLAS if prefer_pallas is None else prefer_pallas
  if use_kernel:
    # Scoped-VMEM feasibility: an M*D too wide for even the smallest
    # operand tiling routes to XLA instead of failing at compile time.
    q, m, d = text_embds.shape
    if qv_tiles(q, vid_embds.shape[0], m * d) is None:
      use_kernel = False
  if use_kernel and (_INTERPRET or jax.default_backend() == "tpu"):
    sims = _fused_sim_fn(_INTERPRET)(text_embds, vid_embds,
                                     text_weights, vid_weights)
  else:
    sims = _xla_moe_similarity(text_embds, vid_embds,
                               text_weights, vid_weights)
  if num_caps > 1 and merge == "avg":
    q, v = sims.shape
    sims = sims.reshape(q // num_caps, num_caps, v).mean(axis=1)
  elif merge not in ("avg", "indep"):
    raise ValueError(f"unrecognised merge mode: {merge}")
  return sims


def _xla_moe_similarity(text_embds, vid_embds, text_weights, vid_weights):
  tw = text_weights.astype(jnp.float32)
  vw = vid_weights.astype(jnp.float32)
  t = text_embds.astype(jnp.float32) * tw[:, :, None]
  v = vid_embds.astype(jnp.float32) * vw[:, :, None]
  numer = jnp.einsum("qmd,vmd->qv", t, v,
                     preferred_element_type=jnp.float32)
  denom = jnp.einsum("qm,vm->qv", tw, vw,
                     preferred_element_type=jnp.float32)
  denom = jnp.where(denom == 0, EPS_ZERO_GUARD, denom)
  return numer / denom


# ---------------------------------------------------------------------------
# Custom-VJP wrapper: Pallas kernel forward, closed-form einsum backward.
# With s = n/d, n = sum_m tw*vw*<t,v>, d = max-guarded sum_m tw*vw:
#   dt[q,m,:] = (g/d) @ (vw*v)        dv[v,m,:] = (g/d)^T @ (tw*t)
#   dtw[q,m]  = sum_v (g/d)[q,v] (vw[v,m]<t,v> - s[q,v] vw[v,m])
#   dvw analogous.  The guard (d==0 -> eps) is treated as a constant
#   selection, matching the XLA path's jnp.where gradient.
#
# The forward kernel carries a two-sided custom_partitioning rule
# (_qv_sharded): output dim 0 shards like the caption operands' rows,
# output dim 1 like the video operands' rows, and each device runs the
# kernel on its (q-shard, v-shard) block.  Two callers exercise the two
# sides:
#   * the trainer's data mesh (both sides batch-sharded on the SAME
#     axis): the conflict resolves to caption-sharded output with the
#     video operands all-gathered — exactly the reference's global-batch
#     negative semantics (trainer/trainer.py:185-199);
#   * sharded serving (index sharded on the video axis, queries
#     replicated): the kernel computes shard-local [Q, V/n] blocks and
#     the downstream top-k merges across chips — the index is never
#     gathered.
# The backward is plain XLA einsums that GSPMD partitions natively.
# ---------------------------------------------------------------------------


def _qv_sharded(local_fn):
  """custom_partitioning for (text[Q,M,D], vid[V,M,D], tw[Q,M], vw[V,M])
  -> sims[Q,V]: Q shards like the text rows, V like the video rows; when
  both sides ride the same mesh axis, captions win and the video side is
  gathered (an output cannot shard two dims on one axis)."""
  cp = custom_partitioning(local_fn)

  _norm = norm_spec_entry

  def _axes(arg_shapes):
    def row(i):
      spec = arg_shapes[i].sharding.spec
      return _norm(spec[0] if len(spec) else None)
    q = row(0) or row(2)
    v = row(1) or row(3)
    # One mesh axis cannot shard both output dims; conflicting axes
    # leave the video side (that all-gather IS the global-batch
    # negative semantics on the trainer's data mesh).  Non-conflicting
    # video axes are kept: q=('data',), v=('data','model') still
    # shards candidates over 'model'.
    v = drop_conflicting_axes(q, v)
    return q or None, v or None

  def infer(mesh, arg_shapes, result_shape):
    q, v = _axes(arg_shapes)
    return NamedSharding(mesh, P(q, v))

  def part(mesh, arg_shapes, result_shape):
    # Follow the RESOLVED output sharding (under Shardy the einsum-style
    # sharding_rule drives propagation — e.g. a both-sides-batch-sharded
    # conflict may resolve to either output dim); sharding the operands
    # to match it avoids a post-kernel reshard.
    spec = result_shape.sharding.spec
    q = spec[0] if len(spec) > 0 else None
    v = spec[1] if len(spec) > 1 else None
    args = (NamedSharding(mesh, P(q, None, None)),
            NamedSharding(mesh, P(v, None, None)),
            NamedSharding(mesh, P(q, None)),
            NamedSharding(mesh, P(v, None)))
    return mesh, local_fn, NamedSharding(mesh, P(q, v)), args

  cp.def_partition(partition=part, infer_sharding_from_operands=infer,
                   sharding_rule="q a b, v c d, q e, v f -> q v")
  return cp


@functools.lru_cache(maxsize=None)
def _fused_sim_fn(interpret: bool):
  # custom_partitioning requires positional-only callables.
  def _local(text_embds, vid_embds, text_weights, vid_weights):
    return _pallas_moe_similarity(text_embds, vid_embds, text_weights,
                                  vid_weights, interpret=interpret)

  local = _qv_sharded(_local)

  @jax.custom_vjp
  def fused(text_embds, vid_embds, text_weights, vid_weights):
    return local(text_embds, vid_embds, text_weights, vid_weights)

  def fwd(text_embds, vid_embds, text_weights, vid_weights):
    sims = local(text_embds, vid_embds, text_weights, vid_weights)
    return sims, (text_embds, vid_embds, text_weights, vid_weights, sims)

  fused.defvjp(fwd, _fused_bwd)
  return fused


def _fused_bwd(res, g):
  text_embds, vid_embds, text_weights, vid_weights, sims = res
  t = text_embds.astype(jnp.float32)
  v = vid_embds.astype(jnp.float32)
  tw = text_weights.astype(jnp.float32)
  vw = vid_weights.astype(jnp.float32)
  g = g.astype(jnp.float32)

  denom = jnp.einsum("qm,vm->qv", tw, vw)
  denom_g = jnp.where(denom == 0, EPS_ZERO_GUARD, denom)
  gd = g / denom_g                                    # [Q, V]

  tv = v * vw[:, :, None]                             # [V, M, D]
  tt = t * tw[:, :, None]                             # [Q, M, D]
  d_text = jnp.einsum("qv,vmd->qmd", gd, tv) * tw[:, :, None]
  d_vid = jnp.einsum("qv,qmd->vmd", gd, tt) * vw[:, :, None]

  dots = jnp.einsum("qmd,vmd->qvm", t, v)             # per-modality <t,v>
  # d/dtw: gd * (vw * dots) - gd * sims * vw  summed over v
  d_tw = (jnp.einsum("qv,qvm,vm->qm", gd, dots, vw)
          - jnp.einsum("qv,qv,vm->qm", gd, sims, vw))
  d_vw = (jnp.einsum("qv,qvm,qm->vm", gd, dots, tw)
          - jnp.einsum("qv,qv,qm->vm", gd, sims, tw))
  return (d_text.astype(text_embds.dtype), d_vid.astype(vid_embds.dtype),
          d_tw.astype(text_weights.dtype), d_vw.astype(vid_weights.dtype))


def _fused_moe_similarity(text_embds, vid_embds, text_weights, vid_weights):
  """Back-compat alias for tests: the interpret-aware fused kernel."""
  return _fused_sim_fn(_INTERPRET)(text_embds, vid_embds, text_weights,
                                   vid_weights)


# ---------------------------------------------------------------------------
# Pallas kernel: tiles of the (Q, V) output; the M*D contraction is folded
# into a single [TQ, M*D] x [M*D, TV] matmul per tile, the M contraction of
# the denominator rides along in the same tile, and the guarded divide is
# fused before writeback (one HBM pass over the output).
# ---------------------------------------------------------------------------


def _sim_kernel(t_ref, v_ref, tw_ref, vw_ref, out_ref):
  t = t_ref[:].astype(jnp.float32)      # [TQ, M*D] weight-scaled text
  v = v_ref[:].astype(jnp.float32)      # [TV, M*D] weight-scaled video
  tw = tw_ref[:].astype(jnp.float32)    # [TQ, M]
  vw = vw_ref[:].astype(jnp.float32)    # [TV, M]
  numer = jax.lax.dot_general(t, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
  denom = jax.lax.dot_general(tw, vw, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
  denom = jnp.where(denom == 0, EPS_ZERO_GUARD, denom)
  out_ref[:] = numer / denom


def _round_up(x, m):
  return ((x + m - 1) // m) * m


_VMEM_LIMIT = 16 * 1024 * 1024


def qv_tiles(q, v, md):
  """(tile_q, tile_v) for a [Q, V]-gridded kernel whose operand tiles are
  [tile, M*D] fp32, walked down so the double-buffered tiles fit the
  16 MB scoped-VMEM limit; None if even the smallest tiling cannot.

  The 7-expert flagship (M*D = 3584) takes the measured (128, 256);
  larger embedding widths (e.g. same_dim=768: M*D = 5376) step down to
  (128, 128) instead of failing at compile time.  Shared with
  ops/ranking.py, whose kernel has the same operand footprint.
  """
  # 1 MB of headroom below the hard limit: the estimate ignores the
  # weight tiles and compiler scratch, and a tiling that lands exactly on
  # the boundary is one layout decision away from an OOM.
  budget = _VMEM_LIMIT - 1024 * 1024
  for tq, tv in ((128, 256), (128, 128), (64, 128), (32, 128), (8, 128)):
    if 2 * (tq + tv) * md * 4 + 2 * tq * tv * 4 <= budget:
      return min(_round_up(q, 8), tq), min(_round_up(v, 128), tv)
  return None


def _pallas_moe_similarity(text_embds, vid_embds, text_weights, vid_weights,
                           interpret: bool = False):
  q, m, d = text_embds.shape
  v = vid_embds.shape[0]
  tw = text_weights.astype(jnp.float32)
  vw = vid_weights.astype(jnp.float32)
  t = (text_embds.astype(jnp.float32) * tw[:, :, None]).reshape(q, m * d)
  vv = (vid_embds.astype(jnp.float32) * vw[:, :, None]).reshape(v, m * d)

  tiles = qv_tiles(q, v, m * d)
  assert tiles is not None, (q, v, m, d)  # gated in moe_similarity
  tile_q, tile_v = tiles
  qp, vp = _round_up(q, tile_q), _round_up(v, tile_v)
  # Zero padding is harmless: padded rows produce denom==0 -> eps guard.
  t = jnp.pad(t, ((0, qp - q), (0, 0)))
  vv = jnp.pad(vv, ((0, vp - v), (0, 0)))
  tw = jnp.pad(tw, ((0, qp - q), (0, 0)))
  vw = jnp.pad(vw, ((0, vp - v), (0, 0)))

  grid = (qp // tile_q, vp // tile_v)
  out = pl.pallas_call(
      _sim_kernel,
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
      ],
      out_specs=pl.BlockSpec((tile_q, tile_v), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((qp, vp), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=2 * qp * vp * (m * d + m),
          bytes_accessed=4 * (qp * m * d + vp * m * d + qp * vp),
          transcendentals=0,
      ),
      interpret=interpret,
  )(t, vv, tw, vw)
  return out[:q, :v]
