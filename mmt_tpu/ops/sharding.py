"""Shared PartitionSpec helpers for the kernels' custom_partitioning rules.

GSPMD/Shardy cannot partition a ``pallas_call``, so every shipped kernel
(ops/ffn.py, ops/similarity.py, ops/ranking.py) carries its own
custom_partitioning rule.  Those rules all reason about PartitionSpec dim
entries, which come in three spellings — ``None``, a single axis name, or
a tuple of axis names (multi-axis sharding of one dim) — and all resolve
"one mesh axis cannot shard two tensor dims" conflicts the same way.
This module is the single copy of that logic; keeping private per-file
copies in sync by hand is what produced the round-4 tuple-normalization
bug in ops/similarity.py.
"""

from __future__ import annotations


def norm_spec_entry(entry):
  """Normalize one PartitionSpec dim entry to a tuple of axis names.

  ``None`` -> ``()``; an axis name -> a 1-tuple; a tuple passes through.
  Conflict checks then treat ``P('x')`` and ``P(('x', 'y'))``
  consistently.
  """
  if entry is None:
    return ()
  return (entry,) if isinstance(entry, str) else tuple(entry)


def drop_conflicting_axes(keep, other):
  """Remove from ``other`` the mesh axes that also appear in ``keep``.

  One mesh axis cannot shard two tensor dims of the same op; the caller
  decides which side wins (``keep``) and only the CONFLICTING axes leave
  the losing side — a mixed layout like keep=('data',),
  other=('data', 'model') stays sharded over 'model' instead of
  gathering entirely.  Both args are normalized tuples
  (:func:`norm_spec_entry`).
  """
  if set(keep) & set(other):
    other = tuple(a for a in other if a not in set(keep))
  return other
