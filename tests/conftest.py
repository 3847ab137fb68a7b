"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import — the TPU-world analogue of "test
multi-node without a cluster" (SURVEY.md §4): sharding/collective tests
run against 8 virtual CPU devices.
"""

import os

# Disable the axon TPU tunnel and use the host CPU backend.  The axon
# sitecustomize imports jax at interpreter startup, so the env vars alone
# are too late — override through jax.config as well (safe as long as no
# backend has been initialized yet, which sitecustomize does not do).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected the 8-device virtual CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
  return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tiny_arch():
  """Small CENet arch kwargs used across tests."""
  return dict(
      expert_dims={"rgb": {"dim": 64, "idx": 5}, "s3d": {"dim": 32, "idx": 1}},
      vid_bert_params=dict(
          hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
          intermediate_size=64, hidden_act="gelu",
          hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
          max_position_embeddings=32, type_vocab_size=19,
          initializer_range=0.02, layer_norm_eps=1e-12),
      text_bert_geometry=dict(
          hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
          intermediate_size=64, vocab_size=100, max_position_embeddings=40),
      same_dim=48,
  )


def make_batch(expert_dims, b=3, k=2, t=7, l=5, seed=0, vocab=100):
  rng = np.random.RandomState(seed)
  return {
      "token_ids": np.stack(
          [rng.randint(0, vocab, (b, k, t)),
           np.ones((b, k, t))], -1).astype(np.int32),
      "query_masks": np.ones((b, k), np.float32),
      "features": {m: rng.randn(b, l, d["dim"]).astype(np.float32)
                   for m, d in expert_dims.items()},
      "features_t": {m: rng.randint(0, 30, (b, l)).astype(np.float32)
                     for m in expert_dims},
      "features_ind": {m: (rng.rand(b, l) > 0.3).astype(np.float32)
                       for m in expert_dims},
      "features_avgpool": {m: rng.randn(b, d["dim"]).astype(np.float32)
                           for m, d in expert_dims.items()},
      "features_maxpool": {m: rng.randn(b, d["dim"]).astype(np.float32)
                           for m, d in expert_dims.items()},
  }


@pytest.fixture
def legacy_assembly():
  """Force the Python sample/collate path for tests that introspect raw
  sample dicts (with native/libassembler.so present, samples carry
  descriptors instead of materialized blocks)."""
  from mmt_tpu.data import native_assembler
  native_assembler.set_enabled(False)
  yield
  native_assembler.set_enabled(None)
