"""Device-side input validation via checkify.

The reference's sanity story is ipdb traps on NaNs and ad-hoc asserts
(SURVEY.md §5 "race detection / sanitizers"); the TPU-native equivalents
are ``jax_debug_nans`` (wired in the trainer) and this checkified batch
validator, which runs the invariant checks *inside* jit without host
round trips.  Enable with trainer config ``sanity_checks: true`` or by
calling ``validate_batch`` directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def _batch_invariants(batch):
  """Invariants of the fixed-shape batch schema."""
  token_ids = batch["token_ids"]
  checkify.check(jnp.all(token_ids[..., 0] >= 0),
                 "negative token ids in batch")
  checkify.check(jnp.all((token_ids[..., 1] == 0) | (token_ids[..., 1] == 1)),
                 "token validity column must be 0/1")
  checkify.check(jnp.all(jnp.sum(token_ids[..., 1], axis=-1) > 0),
                 "caption with zero valid tokens")
  for mod, feats in batch["features"].items():
    checkify.check(jnp.all(jnp.isfinite(feats)),
                   "non-finite features")
    ind = batch["features_ind"][mod]
    checkify.check(jnp.all((ind == 0) | (ind == 1)),
                   "feature indicators must be 0/1")
    # padded rows must be zero
    checkify.check(
        jnp.all(jnp.abs(feats) * (1 - ind)[..., None] == 0),
        "nonzero features at padded positions")
  return jnp.zeros(())


_checked = checkify.checkify(_batch_invariants)
_checked_jit = jax.jit(_checked)


def validate_batch(batch) -> None:
  """Raise ValueError with the failed invariant if the batch is malformed."""
  err, _ = _checked_jit(batch)
  try:
    err.throw()
  except checkify.JaxRuntimeError as e:
    raise ValueError(f"batch failed validation: {e}") from e
