"""Transformer encoder for both the video and text towers.

Functionally equivalent to the reference's from-scratch BERT
(/root/reference/model/bert.py:74-414): post-LN residual blocks, erf-GELU,
additive -10000 attention mask, LayerNorm eps from config, and an
embedding layer that *adds projected continuous features* to position +
token-type embeddings (no word lookup) for the video side
(model/bert.py:87-105), or a word-embedding lookup for the text side.

TPU-native details:
* one einsum per projection, batched attention via
  ``mmt_tpu.ops.attention`` (XLA-fused; a Pallas kernel was benchmarked
  and deleted — see that module's docstring and docs/PERF.md),
* static shapes everywhere; masks are additive floats computed once,
* compute dtype is configurable (bf16 matmuls with fp32 accumulation).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmt_tpu.config import BertParams
from mmt_tpu.ops import attention as attention_ops
from mmt_tpu.ops import ffn as ffn_ops


def activation(name: str):
  if name == "gelu":
    # erf-based GELU, matching model/bert.py:37-53 (not the tanh approx).
    return lambda x: jax.nn.gelu(x, approximate=False)
  if name == "relu":
    return jax.nn.relu
  if name == "swish":
    return jax.nn.swish
  raise ValueError(f"unknown activation {name!r}")


class _LNParams(nn.Module):
  """Parameter holder with nn.LayerNorm's exact tree ({scale, bias})."""
  dim: int

  @nn.compact
  def __call__(self):
    scale = self.param("scale", nn.initializers.ones, (self.dim,))
    bias = self.param("bias", nn.initializers.zeros, (self.dim,))
    return scale, bias


# Parameter holder with nn.Dense's exact tree ({kernel, bias}) — the
# shared components.DenseParams.  Exists so the attention/FFN
# projections keep their reference-checkpoint param layout
# (query/kernel, ffn_inter/kernel, ... — the converter and warm-start
# paths depend on it) while the *apply* path routes the weights into
# layout-native einsums and the fused Pallas FFN-block kernel
# (mmt_tpu/ops/ffn.py).  (A concatenated-QKV variant was measured and
# rejected: one [H, 3H] matmul benched ~1.4% SLOWER end-to-end than
# separate projections — the per-step weight concat costs more than the
# merge saves, docs/PERF.md.)
from mmt_tpu.models.components import DenseParams as _Proj  # noqa: E402


class TransformerLayer(nn.Module):
  """Post-LN encoder block (attention -> add&norm -> FFN -> add&norm)."""
  cfg: BertParams
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, hidden, attn_bias, *, deterministic: bool):
    cfg = self.cfg
    # LayerNorm statistics in fp32 regardless of compute dtype (measured
    # to cost nothing on TPU vs bf16 statistics, and numerically safer).
    ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name,
                                   dtype=jnp.float32)

    # Self-attention.  The q/k/v projections emit the head-split
    # [B, H, S, dh] layout DIRECTLY from the matmul (kernel viewed as
    # [D, H, dh]) and the output projection consumes it ([H, dh, D]) —
    # the separate head split/merge reshapes cost ~17% of eval device
    # time as physical layout copies (docs/PERF.md round-3 profile).
    # Params stay in nn.Dense's tree via the _Proj holders.
    init = nn.initializers.normal(cfg.initializer_range)
    h = cfg.hidden_size
    n_heads = cfg.num_attention_heads
    dh = h // n_heads
    dt = self.dtype

    # Round-4 A/B, measured and REJECTED: classic [B, S, D] projections
    # for small-head (dh=64) layers — the text tower's layout-native
    # matmuls run at ~66 TF/s (dh=64 fills half the 128-lane MXU tile)
    # vs the video tower's ~165, so full-lane classic projections +
    # explicit head split/merge looked like a win.  Same-session bench:
    # classic 0.1382 s vs layout-native 0.1329 s — the split/merge
    # copies and broken fusions cost more than the lanes recover
    # (docs/PERF.md round-4 roofline).
    def project_heads(name):
      kernel, bias = _Proj(h, h, init, name=name)()
      out = jnp.einsum("bsd,dhe->bhse", hidden.astype(dt),
                       kernel.reshape(h, n_heads, dh).astype(dt))
      return out + bias.reshape(n_heads, dh).astype(dt)[None, :, None, :]

    ctx = attention_ops.attention_bhsd(
        project_heads("query"), project_heads("key"),
        project_heads("value"),
        attn_bias=attn_bias,
        dropout_rate=cfg.attention_probs_dropout_prob,
        deterministic=deterministic,
        dropout_rng_fn=(None if deterministic else
                        (lambda: self.make_rng("dropout"))),
    )
    wo, bo = _Proj(h, h, init, name="attn_out")()
    attn_out = (jnp.einsum("bhsd,hde->bse", ctx.astype(dt),
                           wo.reshape(n_heads, dh, h).astype(dt))
                + bo.astype(dt))
    attn_out = nn.Dropout(cfg.hidden_dropout_prob)(
        attn_out, deterministic=deterministic)
    hidden = ln("attn_ln")(attn_out + hidden)

    # Feed-forward: params held in nn.Dense/nn.LayerNorm tree layout, but
    # applied either as the hand-fused Pallas FFN-block kernel (inter +
    # erf-GELU + out + residual + fp32 LN in one program, deterministic
    # path on TPU — see mmt_tpu/ops/ffn.py and docs/PERF.md) or as the
    # same math left to XLA (training path, with dropout).
    w1, b1 = _Proj(h, cfg.intermediate_size, init, name="ffn_inter")()
    w2, b2 = _Proj(cfg.intermediate_size, h, init, name="ffn_out")()
    gamma, beta = _LNParams(h, name="ffn_ln")()
    p_drop = cfg.hidden_dropout_prob
    fusable = cfg.hidden_act == "gelu" and ffn_ops.pallas_active()
    if fusable and (deterministic or p_drop == 0.0):
      hidden = ffn_ops.ffn_block(hidden, w1, b1, w2, b2, gamma, beta,
                                 eps=cfg.layer_norm_eps,
                                 compute_dtype=self.dtype)
    elif fusable:
      # Train path: fused fwd+bwd kernels with an explicit pre-scaled
      # dropout mask (mmt_tpu/ops/ffn.py — mask generated here so the
      # op stays deterministic given its inputs).
      keep = jax.random.bernoulli(self.make_rng("dropout"),
                                  1.0 - p_drop, hidden.shape)
      drop = keep.astype(jnp.float32) / (1.0 - p_drop)
      hidden = ffn_ops.ffn_block_train(hidden, drop, w1, b1, w2, b2,
                                       gamma, beta,
                                       eps=cfg.layer_norm_eps,
                                       compute_dtype=self.dtype)
    else:
      dt = self.dtype
      inter = hidden.astype(dt) @ w1.astype(dt) + b1.astype(dt)
      inter = activation(cfg.hidden_act)(inter)
      ffn_out = inter @ w2.astype(dt) + b2.astype(dt)
      ffn_out = nn.Dropout(cfg.hidden_dropout_prob)(
          ffn_out, deterministic=deterministic)
      hidden = ffn_ops.layer_norm(
          ffn_out.astype(jnp.float32) + hidden.astype(jnp.float32),
          gamma, beta, eps=cfg.layer_norm_eps)
    return hidden


class TransformerEncoder(nn.Module):
  cfg: BertParams
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, hidden, attn_bias, *, deterministic: bool):
    for i in range(self.cfg.num_hidden_layers):
      hidden = TransformerLayer(self.cfg, dtype=self.dtype,
                                name=f"layer_{i}")(
                                    hidden, attn_bias,
                                    deterministic=deterministic)
    return hidden


def attention_bias_from_mask(attention_mask, dtype=jnp.float32):
  """[B, S] {0,1} mask -> [B, 1, 1, S] additive bias with -10000 at pads.

  Same constant as model/bert.py:382-395 (kept for checkpoint parity; the
  softmax is computed in fp32 so the constant is safely representable).
  """
  mask = attention_mask.astype(dtype)
  return ((1.0 - mask) * -10000.0)[:, None, None, :]


class FeatureBert(nn.Module):
  """Video-side BERT: embeddings = pos + type + continuous features.

  model/bert.py:87-105 semantics: if position ids are given, add position
  embeddings; always add token-type embeddings and the projected features;
  then LayerNorm + dropout.  The CLS output is read by the caller.
  """
  cfg: BertParams
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, features, attention_mask, token_type_ids,
               position_ids=None, *, deterministic: bool = True):
    cfg = self.cfg
    emb_init = nn.initializers.normal(cfg.initializer_range)
    type_emb = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                        embedding_init=emb_init, name="token_type_embeddings",
                        dtype=self.dtype)(token_type_ids)
    emb = type_emb + features.astype(self.dtype)
    if position_ids is not None:
      pos_mod = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                         embedding_init=emb_init, name="position_embeddings",
                         dtype=self.dtype)
      if self.dtype == jnp.bfloat16 and position_ids.shape[0] > 1:
        # Data-dependent ids at batch scale (pos_enc='tint'): the row
        # gather materializes VMEM-write-bound; a one-hot matmul over
        # the tiny table is bitwise-identical in bf16 (one-hot rows
        # select exact table entries; fp32 accumulation of one term)
        # and ~11% faster on the MXU (docs/PERF.md round-3 microbench).
        table = pos_mod(jnp.arange(cfg.max_position_embeddings))
        one_hot = jax.nn.one_hot(position_ids, cfg.max_position_embeddings,
                                 dtype=self.dtype)
        pos_emb = jnp.einsum(
            "bsv,vh->bsh", one_hot, table,
            preferred_element_type=jnp.float32).astype(self.dtype)
      else:
        pos_emb = pos_mod(position_ids)
      emb = emb + pos_emb
    else:
      # Keep the table in the param tree for checkpoint-shape stability.
      nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
               embedding_init=emb_init, name="position_embeddings")
    emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_ln",
                       dtype=jnp.float32)(emb)
    emb = nn.Dropout(cfg.hidden_dropout_prob)(emb, deterministic=deterministic)

    bias = attention_bias_from_mask(attention_mask)
    hidden = TransformerEncoder(cfg, dtype=self.dtype, name="encoder")(
        emb, bias, deterministic=deterministic)
    return hidden


class TextBert(nn.Module):
  """Text-side BERT (bert-base-cased geometry): word + pos + type lookup.

  Mirrors the HF model the reference finetunes (model/model.py:161-162,
  :371-376).  The bertfrz<N> / txt_inp='bertfrz' freeze modes
  (model/model.py:164-193) are implemented as optimizer-side parameter
  masks (mmt_tpu/train/optim.py) — torch's requires_grad=False still lets
  gradients flow *through* frozen layers to the embeddings below, which
  stop_gradient would not.
  """
  cfg: BertParams
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, input_ids, attention_mask, token_type_ids,
               position_ids, *, deterministic: bool = True):
    cfg = self.cfg
    emb_init = nn.initializers.normal(cfg.initializer_range)
    word_emb = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        embedding_init=emb_init, name="word_embeddings",
                        dtype=self.dtype)(input_ids)
    pos_emb = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=emb_init, name="position_embeddings",
                       dtype=self.dtype)(position_ids)
    type_emb = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                        embedding_init=emb_init, name="token_type_embeddings",
                        dtype=self.dtype)(token_type_ids)
    emb = word_emb + pos_emb + type_emb
    emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_ln",
                       dtype=jnp.float32)(emb)
    emb = nn.Dropout(cfg.hidden_dropout_prob)(emb, deterministic=deterministic)

    bias = attention_bias_from_mask(attention_mask)
    hidden = TransformerEncoder(cfg, dtype=self.dtype, name="encoder")(
        emb, bias, deterministic=deterministic)
    return hidden


# NOTE: the reference's BertPooler (model/bert.py:295-309) is
# intentionally NOT implemented: CENet consumes sequence outputs only and
# the converter drops pooler weights (scripts/convert_checkpoint.py).
