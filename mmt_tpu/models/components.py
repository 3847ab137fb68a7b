"""Projection / gating / pooling building blocks.

Parity targets:
* GatedEmbeddingUnit / ContextGating / ReduceDim / GatedLinearUnit —
  /root/reference/model/model.py:683-786
* NetVLAD — /root/reference/model/net_vlad.py:32-101
* LSTM pooler — /root/reference/model/lstm.py:19-71
* TxtEmbeddings — /root/reference/model/txt_embeddings.py:26-61

BatchNorm note: torch BatchNorm1d(momentum=0.1) == flax BatchNorm
(momentum=0.9) up to torch's unbiased-variance running stats; at eval both
are frozen affines, so converted checkpoints evaluate identically.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def l2_normalize(x, axis=-1, eps=1e-12):
  """F.normalize(p=2) semantics: x / max(||x||, eps).

  Implemented as sqrt(max(sum(x^2), eps^2)) so the gradient at x == 0 is
  finite (torch defines the norm subgradient at 0 as 0; jnp.linalg.norm
  would propagate NaN — zero vectors really occur for missing
  modalities whose pooled features are all-zero).
  """
  sq = jnp.sum(x * x, axis=axis, keepdims=True)
  norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
  return x / norm


def safe_norm(x, axis=-1, eps=1e-12):
  """||x|| with a finite gradient at 0 (clamped below by eps)."""
  sq = jnp.sum(x * x, axis=axis)
  return jnp.sqrt(jnp.maximum(sq, eps * eps))


def l1_normalize(x, axis=-1, eps=1e-12):
  """F.normalize(p=1) semantics."""
  norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
  return x / jnp.maximum(norm, eps)


class TorchBatchNorm(nn.Module):
  """BatchNorm over the last axis with torch BatchNorm1d defaults."""
  features: int
  use_running_average: Optional[bool] = None

  @nn.compact
  def __call__(self, x, use_running_average: Optional[bool] = None):
    use_ra = nn.merge_param("use_running_average",
                            self.use_running_average, use_running_average)
    return nn.BatchNorm(use_running_average=use_ra,
                        momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name="bn")(x)


class ContextGating(nn.Module):
  """x * sigmoid(BN(Wx + b))  (model/model.py:736-750; GLU of cat(x, x1))."""
  dimension: int
  add_batch_norm: bool = True

  @nn.compact
  def __call__(self, x, *, train: bool = False):
    x1 = nn.Dense(self.dimension, name="fc")(x)
    if self.add_batch_norm:
      x1 = TorchBatchNorm(self.dimension, name="batch_norm")(
          x1, use_running_average=not train)
    return x * jax.nn.sigmoid(x1)


class GatedEmbeddingUnit(nn.Module):
  """Linear -> ContextGating -> optional L2 norm (model/model.py:683-702)."""
  output_dimension: int
  use_bn: bool
  normalize: bool = True

  @nn.compact
  def __call__(self, x, *, train: bool = False):
    x = nn.Dense(self.output_dimension, name="fc")(x)
    x = ContextGating(self.output_dimension, add_batch_norm=self.use_bn,
                      name="cg")(x, train=train)
    if self.normalize:
      x = l2_normalize(x)
    return x


class MimicCEGatedEmbeddingUnit(nn.Module):
  """ContextGating + L2 norm without the input Dense (model/model.py:705-714)."""
  input_dimension: int
  use_bn: bool

  @nn.compact
  def __call__(self, x, *, train: bool = False):
    x = ContextGating(self.input_dimension, add_batch_norm=self.use_bn,
                      name="cg")(x, train=train)
    return l2_normalize(x)


class ReduceDim(nn.Module):
  """Linear + L2 norm (model/model.py:717-726)."""
  output_dimension: int

  @nn.compact
  def __call__(self, x):
    x = nn.Dense(self.output_dimension, name="fc")(x)
    return l2_normalize(x)


class GatedLinearUnit(nn.Module):
  """glu(cat(x, mask)) (model/model.py:729-733; defined-for-completeness
  in the reference as well)."""

  @nn.compact
  def __call__(self, x, mask):
    return x * jax.nn.sigmoid(mask)


class ContextGatingReasoning(nn.Module):
  """x * sigmoid(BN(mask) + BN2(Wx)) (model/model.py:765-786)."""
  dimension: int
  add_batch_norm: bool = True

  @nn.compact
  def __call__(self, x, mask, *, train: bool = False):
    x2 = nn.Dense(self.dimension, name="fc")(x)
    x1 = mask
    if self.add_batch_norm:
      x1 = TorchBatchNorm(self.dimension, name="batch_norm")(
          x1, use_running_average=not train)
      x2 = TorchBatchNorm(self.dimension, name="batch_norm2")(
          x2, use_running_average=not train)
    t = x1 + x2
    return x * jax.nn.sigmoid(t)


class GatedEmbeddingUnitReasoning(nn.Module):
  """ContextGatingReasoning + L2 norm (model/model.py:753-762)."""
  output_dimension: int

  @nn.compact
  def __call__(self, x, mask, *, train: bool = False):
    x = ContextGatingReasoning(self.output_dimension, name="cg")(
        x, mask, train=train)
    return l2_normalize(x)


class NetVLAD(nn.Module):
  """NetVLAD aggregation (model/net_vlad.py:32-101).

  x: [B, N, D] -> [B, D*K]; soft-assignment matmul + BN + softmax, residual
  aggregation against cluster centers, intra-cluster L2 norm, global L2.
  """
  cluster_size: int
  feature_size: int
  add_batch_norm: bool = True

  @nn.compact
  def __call__(self, x, *, train: bool = False):
    b, n, d = x.shape
    assert d == self.feature_size
    init_sc = 1.0 / (self.feature_size ** 0.5)
    clusters = self.param(
        "clusters", nn.initializers.normal(init_sc),
        (self.feature_size, self.cluster_size))
    clusters2 = self.param(
        "clusters2", nn.initializers.normal(init_sc),
        (1, self.feature_size, self.cluster_size))

    flat = x.reshape(-1, d)
    assignment = flat @ clusters                       # [BN, K]
    if self.add_batch_norm:
      assignment = TorchBatchNorm(self.cluster_size, name="batch_norm")(
          assignment, use_running_average=not train)
    assignment = jax.nn.softmax(assignment, axis=1)
    assignment = assignment.reshape(b, n, self.cluster_size)
    a_sum = jnp.sum(assignment, axis=1, keepdims=True)  # [B, 1, K]
    a = a_sum * clusters2                               # [B, D, K]
    vlad = jnp.einsum("bkn,bnd->bkd", assignment.transpose(0, 2, 1),
                      x).transpose(0, 2, 1)             # [B, D, K]
    vlad = vlad - a
    vlad = l2_normalize(vlad, axis=1)                   # intra norm over D
    vlad = vlad.reshape(-1, self.cluster_size * self.feature_size)
    return l2_normalize(vlad)

  @property
  def out_dim(self):
    return self.cluster_size * self.feature_size


class LSTMPooler(nn.Module):
  """Single-direction LSTM over padded sequences; fc(last valid hidden).

  model/lstm.py:19-71 semantics (packed sequences == mask-held state).
  """
  hidden_dim: int
  output_dim: int
  num_layers: int = 1

  @nn.compact
  def __call__(self, x, lengths):
    hidden = x
    final_h = None
    for layer in range(self.num_layers):
      # nn.RNN's seq_lengths handling freezes the carry at padded steps —
      # the packed-sequence behavior of the reference (model/lstm.py:52-66).
      rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim),
                   return_carry=True, name=f"lstm_{layer}")
      (final_c, final_h), hidden = rnn(hidden, seq_lengths=lengths)
    return nn.Dense(self.output_dim, name="fc")(final_h)


# ---------------------------------------------------------------------------
# Batched per-modality heads.
#
# The reference applies its projection heads in a python loop over the 7
# modalities (model/model.py:413-418, 589-618) — 21+ tiny matmuls per
# forward, each far too small to occupy the MXU.  TPU-first, the heads
# are evaluated as single batched einsums over stacked [M, D_in, D_out]
# weights.  The parameters stay in the reference checkpoint tree
# (text_gu_<m>/fc/kernel, .../cg/batch_norm/bn/..., moe_fc_txt_<m>/...)
# via parameter-holder modules — the same trick bert.py:_Proj uses for
# the fused FFN kernel — so converted checkpoints and warm starts are
# unaffected.
# ---------------------------------------------------------------------------


class DenseParams(nn.Module):
  """Parameter holder with nn.Dense's exact tree ({kernel, bias}).

  The single holder shared by every batched/fused apply path (the BERT
  towers alias it as ``_Proj``), so the checkpoint-tree contract lives
  in one place.  kernel_init defaults to nn.Dense's default.
  """
  in_dim: int
  out_dim: int
  kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

  @nn.compact
  def __call__(self):
    kernel = self.param("kernel", self.kernel_init,
                        (self.in_dim, self.out_dim))
    bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
    return kernel, bias


class _BNParams(nn.Module):
  """Holder with nn.BatchNorm's tree: params {scale, bias}, batch_stats
  {mean, var}.  Returns the stats as mutable flax Variables so the
  batched-apply code can write the running updates."""
  features: int

  @nn.compact
  def __call__(self):
    scale = self.param("scale", nn.initializers.ones, (self.features,))
    bias = self.param("bias", nn.initializers.zeros, (self.features,))
    mean = self.variable("batch_stats", "mean",
                         lambda: jnp.zeros((self.features,), jnp.float32))
    var = self.variable("batch_stats", "var",
                        lambda: jnp.ones((self.features,), jnp.float32))
    return scale, bias, mean, var


class _TorchBNParams(nn.Module):
  """Nesting shim reproducing TorchBatchNorm's tree (batch_norm/bn/...)."""
  features: int

  @nn.compact
  def __call__(self):
    return _BNParams(self.features, name="bn")()


class _CGParams(nn.Module):
  """ContextGating's tree: fc {kernel, bias} + optional batch_norm/bn."""
  dim: int
  use_bn: bool

  @nn.compact
  def __call__(self):
    fc = DenseParams(self.dim, self.dim, name="fc")()
    bn = _TorchBNParams(self.dim, name="batch_norm")() if self.use_bn \
        else None
    return fc, bn


class GEUParams(nn.Module):
  """GatedEmbeddingUnit's exact tree (fc + cg/...), params only."""
  in_dim: int
  out_dim: int
  use_bn: bool

  @nn.compact
  def __call__(self):
    fc = DenseParams(self.in_dim, self.out_dim, name="fc")()
    cg = _CGParams(self.out_dim, self.use_bn, name="cg")()
    return fc, cg


class ReduceDimParams(nn.Module):
  """ReduceDim's exact tree (fc/{kernel, bias}), params only."""
  in_dim: int
  out_dim: int

  @nn.compact
  def __call__(self):
    return DenseParams(self.in_dim, self.out_dim, name="fc")()


def _batched_torch_bn(x, stacks, *, train: bool,
                      momentum: float = 0.9, eps: float = 1e-5):
  """BatchNorm over the channel axes of x [B, M, D] with per-modality
  parameters, exactly flax nn.BatchNorm's math (fast variance, biased
  running var) as used by TorchBatchNorm — every (m, d) pair is an
  independent channel, so the batched form is bit-equivalent to M
  separate BatchNorm(D) calls up to reduction order.
  """
  scales, biases, means, variances = stacks
  scale = jnp.stack([s for s in scales])          # [M, D]
  bias = jnp.stack([b for b in biases])
  if train:
    mean = jnp.mean(x, axis=0)                    # [M, D] batch moments
    mean2 = jnp.mean(jax.lax.square(x), axis=0)
    var = mean2 - jax.lax.square(mean)
    for i, (rm, rv) in enumerate(zip(means, variances)):
      rm.value = momentum * rm.value + (1 - momentum) * mean[i]
      rv.value = momentum * rv.value + (1 - momentum) * var[i]
  else:
    mean = jnp.stack([rm.value for rm in means])
    var = jnp.stack([rv.value for rv in variances])
  y = (x - mean[None]) * jax.lax.rsqrt(var[None] + eps)
  return y * scale[None] + bias[None]


def batched_gated_embedding(x, geu_params, *, use_bn: bool, train: bool,
                            normalize: bool = True, dtype=None):
  """All modalities' GatedEmbeddingUnits in two batched einsums.

  x: [B, D_in] shared input (the caption embedding feeds every per-
  modality GEU, model/model.py:413-418); geu_params: list over
  modalities of GEUParams() outputs.  Returns [B, M, D_out].
  ``dtype`` is the matmul compute dtype (the model's compute_dtype —
  bf16 on the MXU when the caller opted in; accumulation and the
  BN/sigmoid/normalize epilogue stay fp32).
  """
  dt = dtype or x.dtype
  fc, cg = zip(*geu_params)
  w1 = jnp.stack([k for k, _ in fc])              # [M, D_in, D_out]
  b1 = jnp.stack([b for _, b in fc])              # [M, D_out]
  cg_fc, cg_bn = zip(*cg)
  wc = jnp.stack([k for k, _ in cg_fc])           # [M, D_out, D_out]
  bc = jnp.stack([b for _, b in cg_fc])

  h = jnp.einsum("bd,mde->bme", x.astype(dt), w1.astype(dt),
                 preferred_element_type=jnp.float32) + b1[None]  # [B, M, D]
  g = jnp.einsum("bme,mef->bmf", h.astype(dt), wc.astype(dt),
                 preferred_element_type=jnp.float32) + bc[None]
  if use_bn:
    stacks = tuple(zip(*cg_bn))                   # (scales, biases, ms, vs)
    g = _batched_torch_bn(g, stacks, train=train)
  out = h * jax.nn.sigmoid(g)
  if normalize:
    out = l2_normalize(out)
  return out


def batched_reduce_dim(x, dense_params, normalize: bool = True,
                       dtype=None):
  """All modalities' ReduceDims in one batched einsum (shared input).

  x: [B, D_in]; dense_params: list of DenseParams() outputs with a
  COMMON in_dim.  Returns [B, M, D_out].
  """
  dt = dtype or x.dtype
  w = jnp.stack([k for k, _ in dense_params])
  b = jnp.stack([bb for _, bb in dense_params])
  out = jnp.einsum("bd,mde->bme", x.astype(dt), w.astype(dt),
                   preferred_element_type=jnp.float32) + b[None]
  return l2_normalize(out) if normalize else out


def batched_reduce_dim_ragged(xs, dense_params, normalize: bool = True,
                              dtype=None):
  """Ragged-input ReduceDims: per-modality inputs xs[i] of width D_i are
  zero-padded to max(D_i) and reduced in ONE batched einsum (zero pad
  rows meet zero-padded kernel rows, so the result is exact).

  xs: list of [B, D_i]; returns [B, M, D_out].
  """
  dt = dtype or xs[0].dtype
  d_max = max(x.shape[-1] for x in xs)
  xp = jnp.stack([
      jnp.pad(x.astype(dt), ((0, 0), (0, d_max - x.shape[-1])))
      for x in xs], axis=1)
  wp = jnp.stack([
      jnp.pad(k.astype(dt), ((0, d_max - k.shape[0]), (0, 0)))
      for k, _ in dense_params])
  b = jnp.stack([bb for _, bb in dense_params])
  out = jnp.einsum("bmd,mde->bme", xp, wp,
                   preferred_element_type=jnp.float32) + b[None]
  return l2_normalize(out) if normalize else out


def batched_moe_logits(x, dense_params):
  """All modalities' Dense(D->1) MoE heads as one [D, M] matmul.

  Exactly concat([head_m(x) for m]) (model/model.py:589-618) with the
  M matmul dispatches collapsed into one.
  """
  w = jnp.concatenate([k for k, _ in dense_params], axis=1)   # [D, M]
  b = jnp.stack([bb[0] for _, bb in dense_params])            # [M]
  return x @ w + b[None]


class TxtEmbeddings(nn.Module):
  """Standalone word-embedding table with frozen-at-zero PAD row."""
  vocab_size: int
  emb_dim: int

  @nn.compact
  def __call__(self, input_ids):
    table = self.param("word_embeddings", nn.initializers.normal(0.02),
                       (self.vocab_size, self.emb_dim))
    # padding_idx=0 semantics: row 0 pinned to zero.
    table = table.at[0].set(0.0)
    return jnp.take(table, input_ids, axis=0)
