"""Flash-prefill attention block-size sweep (rep-count differencing).

The decoder prefill is FLOP-bound at ~73% MXU utilization
(docs/PERFORMANCE.md); its attention runs the Pallas causal flash
kernel.  This sweeps (block_q, block_k) tilings — including the trimmed
single-(T, T)-tile fallback — at the bench shape to find the fastest
schedule.  Run on the TPU env:  python tools/flash_sweep.py [B] [T]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from qwen3_asr_tpu.ops.pallas.flash_attention import flash_attention_causal

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 448
    hq, hkv, D = 16, 8, 128
    print(f"[flash-sweep] B={B} hq={hq} hkv={hkv} T={T} D={D}", flush=True)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, hq, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, hkv, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, hkv, T, D)), jnp.bfloat16)

    def rep_program(bq, bk, n):
        def body(c, i):
            qq = q + (i * jnp.bfloat16(1e-30))
            out = flash_attention_causal(qq, k, v, block_q=bq, block_k=bk)
            return c + out.astype(jnp.float32).ravel()[0], None

        return jax.jit(
            lambda: jax.lax.scan(body, jnp.float32(0), jnp.arange(n))[0]
        )

    def timeit(fn, n=6, warmup=2):
        for _ in range(warmup):
            np.asarray(fn())
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # FLOPs: causal ~ B*hq*T*T*D*2 (scores) + same for PV -> /2 for causal.
    flops = 2 * B * hq * T * T * D * 2 / 2

    candidates = [(T, T)] if T % 256 else []
    for bq in (64, 128, 256, 512):
        for bk in (128, 256, 512, 1024):
            if T % bq == 0 and T % bk == 0:
                candidates.append((bq, bk))
    seen = set()
    for bq, bk in candidates:
        if (bq, bk) in seen:
            continue
        seen.add((bq, bk))
        try:
            lo = rep_program(bq, bk, 1)
            hi = rep_program(bq, bk, 5)
            t_lo, t_hi = timeit(lo), timeit(hi)
            dev = (t_hi - t_lo) / 4
            tf = flops / dev / 1e12 if dev > 0 else float("inf")
            print(
                f"  block_q={bq:4d} block_k={bk:4d}  device {dev * 1e3:7.2f} ms"
                f"  ~{tf:6.1f} TFLOP/s",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"  block_q={bq:4d} block_k={bk:4d}  FAILED: {exc}")


if __name__ == "__main__":
    main()
