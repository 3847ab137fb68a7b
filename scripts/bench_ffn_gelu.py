#!/usr/bin/env python
"""Quantify the fused FFN kernel's GELU/VPU share on the TPU.

The round-4 roofline (docs/PERF.md) left one open delta: the fused FFN
kernels run at 74% (video tower, H=512) / 85% (text tower, H=768) MFU
against a pure-matmul floor.  A serial MXU+VPU model explains both
numbers exactly: within one Pallas block the erf-GELU over the [T, I]
fp32 intermediate cannot overlap the matmuls (Mosaic schedules the block
body serially — the round-2 I-chunked experiment), so

    MFU ~= 1 / (1 + t_vpu / t_mxu),  t_vpu/t_mxu ~ (GELU ops) / (4H flops)

predicting ~74% at H=512 and ~81-85% at H=768.  This script measures the
share directly: it times the production kernel against an
identity-GELU variant (numerics-wrong, perf-true — the GELU is replaced
by a pass-through at trace time) on the flagship eval shapes.  If the
identity variant recovers ~the predicted gap, the kernel is AT its
serial-engine roofline and the "~44 ms pure-matmul floor" is not
reachable without cross-engine software pipelining that Mosaic does not
expose; the honest floor is the serial MXU+VPU one.

Protocol: one jitted lax.scan chains CHAIN kernel calls (output feeds
the next input — serial data dependence defeats CSE), scalar host read
as the barrier, per-call time = (total - rtt) / CHAIN, min over REPS.
Run on the tunneled TPU: nohup python scripts/bench_ffn_gelu.py > log &
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPS = int(os.environ.get("BENCH_REPS", "5"))
PEAK_BF16 = 197e12  # v5e TensorCore peak, bf16 (docs/PERF.md roofline)

# Flagship eval shapes (docs/PERF.md profile): video tower 50x218 rows at
# H=512, text tower 50x30 rows at H=768, both I=3072, bf16 compute.
# Chain length per shape targets >=150 ms of device work so the ~27 ms
# tunnel RTT (and its several-ms jitter) cannot swamp the per-call time
# — at CHAIN=50 the text shape produced >100% "MFU", i.e. pure noise.
SHAPES = [
    ("video", 50 * 218, 512, 3072, 500),
    ("text", 50 * 30, 768, 3072, 6000),
]


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from mmt_tpu.ops import ffn

    ffn.use_pallas(True, interpret=ffn._INTERPRET)  # keep a preset interpret
    assert ffn.pallas_active(), "run on the TPU (or interpret mode)"

    # Tunnel dispatch RTT, measured like bench.py.
    @jax.jit
    def tiny(v):
        return v * 2.0

    x0 = jnp.float32(1.0)
    float(tiny(x0))
    rtt = min(_timed(lambda: float(tiny(x0))) for _ in range(10))

    results = {}
    real_gelu = ffn._gelu_erf_kernel
    for mode in ("as7126", "identity"):
        ffn._gelu_erf_kernel = real_gelu if mode == "as7126" else (lambda x: x)
        ffn._fused_ffn_fn.cache_clear()  # drop closures traced with the other body
        for name, r, h, i, chain in SHAPES:
            key = jax.random.PRNGKey(0)
            x = jax.random.normal(key, (r, h), jnp.float32)
            w1 = jax.random.normal(key, (h, i), jnp.float32) * 0.02
            b1 = jnp.zeros((i,), jnp.float32)
            w2 = jax.random.normal(key, (i, h), jnp.float32) * 0.02
            b2 = jnp.zeros((h,), jnp.float32)
            gamma = jnp.ones((h,), jnp.float32)
            beta = jnp.zeros((h,), jnp.float32)

            # Fresh def per (mode, shape): jit shares executable caches
            # across wrappers with identical traces (CLAUDE.md gotcha),
            # and the GELU body flip is invisible to the cache key.
            def chained(x, w1, b1, w2, b2, gamma, beta, _mode=mode):
                def body(carry, _):
                    out = ffn.ffn_block(carry, w1, b1, w2, b2, gamma, beta,
                                        eps=1e-12)
                    return out, ()
                final, _ = jax.lax.scan(body, x, None, length=chain)
                return final.sum()

            run = jax.jit(chained)
            float(run(x, w1, b1, w2, b2, gamma, beta))  # compile + warm
            t = min(_timed(lambda: float(run(x, w1, b1, w2, b2, gamma, beta)))
                    for _ in range(REPS))
            per_call_ms = (t - rtt) / chain * 1e3
            tflops = 4 * r * h * i / (per_call_ms * 1e-3) / 1e12
            results[f"{name}/{mode}"] = {
                "per_call_ms": round(per_call_ms, 4),
                "tflops": round(tflops, 1),
                "mfu_pct": round(100 * tflops * 1e12 / PEAK_BF16, 1),
            }
            print(f"{name:5s} {mode:8s} {per_call_ms:8.4f} ms/call  "
                  f"{tflops:6.1f} TF/s  {results[f'{name}/{mode}']['mfu_pct']:5.1f}% MFU",
                  flush=True)
    ffn._gelu_erf_kernel = real_gelu

    for name, r, h, i, chain in SHAPES:
        a = results[f"{name}/as7126"]["per_call_ms"]
        b = results[f"{name}/identity"]["per_call_ms"]
        share = 100 * (a - b) / a if a > 0 else float("nan")
        print(f"{name}: GELU share of kernel time = {share:.1f}% "
              f"(prod {a:.4f} ms vs identity {b:.4f} ms)")
        results[f"{name}/gelu_share_pct"] = round(share, 1)
    print(json.dumps({"rtt_s": round(rtt, 4), **results}))


if __name__ == "__main__":
    main()
