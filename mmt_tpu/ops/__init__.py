"""TPU ops: fused attention, similarity, ranking."""
