"""Fused FFN-block Pallas kernel: equivalence vs the XLA reference path.

The kernel (mmt_tpu/ops/ffn.py) computes the reference's whole FFN
sub-block (/root/reference/model/bert.py:175-199: Dense -> erf-GELU ->
Dense -> residual -> LayerNorm) in one program.  These tests run it in
interpret mode on the CPU mesh and check it against the plain-XLA math
the training path uses, including through the custom VJP and through the
full BERT tower.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.ops import ffn


def _make_inputs(r, h, i, seed=0, dtype=np.float32):
  rng = np.random.RandomState(seed)
  x = rng.randn(r, h).astype(dtype)
  w1 = (rng.randn(h, i) * 0.05).astype(np.float32)
  b1 = (rng.randn(i) * 0.05).astype(np.float32)
  w2 = (rng.randn(i, h) * 0.05).astype(np.float32)
  b2 = (rng.randn(h) * 0.05).astype(np.float32)
  gamma = (1.0 + 0.1 * rng.randn(h)).astype(np.float32)
  beta = (0.1 * rng.randn(h)).astype(np.float32)
  return x, w1, b1, w2, b2, gamma, beta


@pytest.mark.parametrize("r,h,i", [(64, 64, 256), (100, 128, 512),
                                   (9, 64, 128)])
def test_kernel_matches_xla_fp32(r, h, i):
  args = _make_inputs(r, h, i)
  got = ffn.ffn_block(*args, eps=1e-12, compute_dtype=jnp.float32,
                      interpret=True)
  want = ffn.xla_ffn_block(*args, eps=1e-12, compute_dtype=jnp.float32)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-5, atol=2e-5)


def test_kernel_matches_xla_bf16_tolerance():
  args = _make_inputs(96, 128, 512, seed=3)
  got = ffn.ffn_block(*args, eps=1e-12, compute_dtype=jnp.bfloat16,
                      interpret=True)
  want = ffn.xla_ffn_block(*args, eps=1e-12, compute_dtype=jnp.bfloat16)
  # The kernel keeps bias+GELU in fp32 where the XLA path stays bf16, so
  # agreement is at bf16 resolution, not bitwise.
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=0.08, atol=0.08)


def test_kernel_handles_3d_and_row_padding():
  # 3D input with a row count that does not divide the tile.
  x, w1, b1, w2, b2, gamma, beta = _make_inputs(70, 64, 256, seed=5)
  x3 = x.reshape(7, 10, 64)
  got = ffn.ffn_block(x3, w1, b1, w2, b2, gamma, beta, eps=1e-12,
                      compute_dtype=jnp.float32, interpret=True)
  want = ffn.xla_ffn_block(x3, w1, b1, w2, b2, gamma, beta, eps=1e-12,
                           compute_dtype=jnp.float32)
  assert got.shape == (7, 10, 64)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-5, atol=2e-5)


def test_custom_vjp_matches_xla_grads():
  args = _make_inputs(32, 64, 128, seed=7)

  def loss_fused(*a):
    return ffn.ffn_block(*a, eps=1e-12, compute_dtype=jnp.float32,
                         interpret=True).sum()

  def loss_ref(*a):
    return ffn.xla_ffn_block(*a, eps=1e-12,
                             compute_dtype=jnp.float32).sum()

  g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
  g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
  for gf, gr in zip(g_fused, g_ref):
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_flax():
  import flax.linen as nn
  rng = np.random.RandomState(11)
  y = rng.randn(17, 96).astype(np.float32)
  mod = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32)
  variables = mod.init(jax.random.PRNGKey(0), y)
  gamma = (1.0 + 0.2 * rng.randn(96)).astype(np.float32)
  beta = (0.1 * rng.randn(96)).astype(np.float32)
  variables = {"params": {"scale": jnp.asarray(gamma),
                          "bias": jnp.asarray(beta)}}
  want = mod.apply(variables, y)
  got = ffn.layer_norm(y, gamma, beta, eps=1e-12)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-6, atol=1e-6)


def test_full_tower_fused_vs_unfused():
  """The whole FeatureBert forward agrees between the fused (interpret)
  and XLA FFN paths, on the real module with its real param tree."""
  from mmt_tpu.config import BertParams
  from mmt_tpu.models.bert import FeatureBert

  cfg = BertParams(hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=256,
                   vocab_size=100, max_position_embeddings=32,
                   type_vocab_size=4, hidden_dropout_prob=0.1,
                   attention_probs_dropout_prob=0.1)
  model = FeatureBert(cfg)
  rng = np.random.RandomState(13)
  feats = rng.randn(3, 12, 64).astype(np.float32)
  mask = np.ones((3, 12), np.int32)
  mask[1, 8:] = 0
  types = rng.randint(0, 4, (3, 12)).astype(np.int32)
  pos = np.tile(np.arange(12, dtype=np.int32), (3, 1))
  variables = model.init(jax.random.PRNGKey(0), feats, mask, types, pos)

  try:
    ffn.use_pallas(False)
    want = model.apply(variables, feats, mask, types, pos,
                       deterministic=True)
    ffn.use_pallas(True, interpret=True)
    assert ffn.pallas_active()
    got = model.apply(variables, feats, mask, types, pos,
                      deterministic=True)
  finally:
    ffn.use_pallas(False)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-5, atol=2e-5)


def _mask(shape, p, seed=21):
  rng = np.random.RandomState(seed)
  return (rng.rand(*shape) >= p).astype(np.float32) / (1.0 - p)


def test_train_kernel_matches_xla_with_same_mask():
  x, w1, b1, w2, b2, gamma, beta = _make_inputs(100, 128, 512, seed=17)
  drop = _mask((100, 128), 0.3)
  got = ffn.ffn_block_train(x, drop, w1, b1, w2, b2, gamma, beta,
                            eps=1e-12, compute_dtype=jnp.float32,
                            interpret=True)
  want = ffn.xla_ffn_block_train(x, drop, w1, b1, w2, b2, gamma, beta,
                                 eps=1e-12, compute_dtype=jnp.float32)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-5, atol=2e-5)


def test_train_kernel_grads_match_xla():
  """All eight cotangents (x, mask, both matmuls, biases, LN scale/bias)
  from the hybrid Pallas/XLA backward agree with jax.grad of the pure-XLA
  reference."""
  args = _make_inputs(64, 64, 256, seed=19)
  drop = _mask((64, 64), 0.25)

  def loss_fused(x, w1, b1, w2, b2, gamma, beta):
    out = ffn.ffn_block_train(x, drop, w1, b1, w2, b2, gamma, beta,
                              eps=1e-12, compute_dtype=jnp.float32,
                              interpret=True)
    return jnp.sum(out * jnp.cos(out))   # non-trivial cotangent

  def loss_ref(x, w1, b1, w2, b2, gamma, beta):
    out = ffn.xla_ffn_block_train(x, drop, w1, b1, w2, b2, gamma, beta,
                                  eps=1e-12, compute_dtype=jnp.float32)
    return jnp.sum(out * jnp.cos(out))

  g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
  g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
  names = ["x", "w1", "b1", "w2", "b2", "gamma", "beta"]
  for name, gf, gr in zip(names, g_fused, g_ref):
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-4, atol=1e-5, err_msg=name)


def test_train_kernel_p0_equals_eval_kernel():
  x, w1, b1, w2, b2, gamma, beta = _make_inputs(40, 64, 128, seed=23)
  ones = np.ones((40, 64), np.float32)
  a = ffn.ffn_block_train(x, ones, w1, b1, w2, b2, gamma, beta,
                          eps=1e-12, compute_dtype=jnp.float32,
                          interpret=True)
  b = ffn.ffn_block(x, w1, b1, w2, b2, gamma, beta, eps=1e-12,
                    compute_dtype=jnp.float32, interpret=True)
  np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                             rtol=1e-6, atol=1e-6)


def test_full_tower_train_mode_fused_vs_unfused_grads():
  """Gradients of the whole FeatureBert in train mode agree between the
  fused (interpret) path and the flax/XLA path when dropout_prob=0 (so
  randomness cannot differ)."""
  from mmt_tpu.config import BertParams
  from mmt_tpu.models.bert import FeatureBert

  cfg = BertParams(hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=256,
                   vocab_size=100, max_position_embeddings=32,
                   type_vocab_size=4, hidden_dropout_prob=0.0,
                   attention_probs_dropout_prob=0.0)
  model = FeatureBert(cfg)
  rng = np.random.RandomState(29)
  feats = rng.randn(2, 10, 64).astype(np.float32)
  mask = np.ones((2, 10), np.int32)
  types = rng.randint(0, 4, (2, 10)).astype(np.int32)
  pos = np.tile(np.arange(10, dtype=np.int32), (2, 1))
  variables = model.init(jax.random.PRNGKey(0), feats, mask, types, pos)

  def loss(params, fused):
    try:
      ffn.use_pallas(fused, interpret=fused)
      out = model.apply({"params": params}, feats, mask, types, pos,
                        deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(7)})
    finally:
      ffn.use_pallas(False)
    return jnp.sum(out ** 2)

  g_ref = jax.grad(lambda p: loss(p, False))(variables["params"])
  g_fused = jax.grad(lambda p: loss(p, True))(variables["params"])
  flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_fused = jax.tree_util.tree_leaves_with_path(g_fused)
  for (path, a), (_, b) in zip(flat_ref, flat_fused):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=5e-4, atol=1e-5,
                               err_msg=jax.tree_util.keystr(path))


# ---------------------------------------------------------------------------
# Scoped-VMEM feasibility gate (mmt_tpu/ops/ffn.py:kernel_fits).  fp32
# compute at flagship text geometry (H=768, I=3072) puts the resident
# weights alone at 18.9 MB > the 16 MB scoped-VMEM limit — no row tile
# can fit, and the kernel OOMs at *compile* time on real TPU.  The gate
# must route such shapes to the XLA path; bf16 routing must be untouched
# (it is the measured PERF.md configuration).
# ---------------------------------------------------------------------------


def test_vmem_gate_fp32_flagship_text_does_not_fit():
  assert not ffn.kernel_fits(768, 3072, jnp.float32)
  assert not ffn.kernel_fits(768, 3072, jnp.float32, train=True)


def test_vmem_gate_bf16_flagship_towers_fit():
  for h in (512, 768):
    assert ffn.kernel_fits(h, 3072, jnp.bfloat16)
    assert ffn.kernel_fits(h, 3072, jnp.bfloat16, train=True)


def test_vmem_gate_bf16_routing_unchanged():
  # The tiles the PERF.md numbers were measured with: eval 256 on both
  # flagship towers, train 128; small towers eval 512.
  assert ffn._eval_tile(1024, 512, 3072, 2) == 256
  assert ffn._eval_tile(1024, 768, 3072, 2) == 256
  assert ffn._eval_tile(1024, 512, 2048, 2) == 512
  assert ffn._train_tile(1024, 512, 3072, 2) == 128
  assert ffn._train_tile(1024, 768, 3072, 2) == 128


def test_ffn_block_fp32_flagship_falls_back_to_xla():
  # With the gate active the fp32 flagship-text call must route to the
  # XLA path (bitwise-equal result) and never construct the pallas_call
  # even with interpret unavailable.
  args = _make_inputs(16, 768, 3072, seed=11)
  got = ffn.ffn_block(*args, eps=1e-12, compute_dtype=jnp.float32,
                      interpret=False)  # kernel would OOM; must not run
  want = ffn.xla_ffn_block(*args, eps=1e-12, compute_dtype=jnp.float32)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ffn_block_train_fp32_flagship_falls_back_to_xla():
  rng = np.random.RandomState(13)
  args = _make_inputs(16, 768, 3072, seed=13)
  drop = (rng.rand(16, 768) > 0.1).astype(np.float32) / 0.9
  x, rest = args[0], args[1:]
  got = ffn.ffn_block_train(x, drop, *rest, eps=1e-12,
                            compute_dtype=jnp.float32, interpret=False)
  want = ffn.xla_ffn_block_train(x, drop, *rest, eps=1e-12,
                                 compute_dtype=jnp.float32)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
