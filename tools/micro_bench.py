"""Microbenchmarks for the decode hot path on the real chip.

Decomposes the official bench's per-call cost: host->device audio
transfer, decode-attention kernel alone (per layer-step), a full decode
step, and N-step decode loops at several batch sizes.  Run directly on
the TPU env (no args): python tools/micro_bench.py [section ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _force(out):
    # block_until_ready is not a reliable barrier through the axon tunnel;
    # fetch one element to force a real device->host round trip.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.numpy.ravel(leaf)[0])


def timeit(fn, *args, n=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    _force(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times))


def bench_h2d():
    """Host->device transfer at the bench's audio payload size."""
    for mb in (1, 16, 61):
        buf = np.zeros(mb * (1 << 20) // 4, np.float32)
        t, med = timeit(lambda b: jax.device_put(b), buf, n=8)
        print(f"h2d {mb:4d} MB: best {t*1e3:8.2f} ms  med {med*1e3:8.2f} ms  "
              f"({mb/max(t,1e-9):.0f} MB/s)")


def bench_kernel(B=32, S=640, pbucket=512, L=28):
    """Decode-attention kernel alone, per single (layer) call and full-cache scan."""
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm3 import decode_attention_hbm3

    Hkv, Hq, D = 8, 16, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    kall = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    vall = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.bfloat16)
    v_new = k_new
    plen = jnp.full((B,), 408, jnp.int32)
    dend = jnp.int32(pbucket + 64)

    # One launch (single layer)
    t, med = timeit(
        lambda l: decode_attention_hbm3(
            q, kall, vall, k_new, v_new, l, plen, dend, pbucket
        ),
        jnp.int32(0), n=30,
    )
    # bytes actually streamed per launch: valid rows only
    valid_rows = 408 + 64
    gb = B * Hkv * valid_rows * D * 2 * 2 / 1e9
    print(f"kernel 1-layer B={B} S={S}: best {t*1e3:.3f} ms  med {med*1e3:.3f} ms "
          f"-> {gb/t:.0f} GB/s effective (valid rows)")

    # All-layer scan (what a decode step's attention costs)
    def scan_all(q, kall, vall, k_new, v_new):
        def f(carry, l):
            o = decode_attention_hbm3(q, kall, vall, k_new, v_new, l, plen, dend, pbucket)
            return carry + o.astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(f, jnp.float32(0), jnp.arange(L))
        return out

    sfn = jax.jit(scan_all)
    t, med = timeit(sfn, q, kall, vall, k_new, v_new, n=20)
    print(f"kernel {L}-layer scan: best {t*1e3:.3f} ms  med {med*1e3:.3f} ms "
          f"({t/L*1e3:.3f} ms/layer, {gb*L/t:.0f} GB/s)")


def bench_hbm_stream(B=32, S=640, L=28):
    """Upper bound: XLA full-cache reduction (pure HBM stream)."""
    Hkv, D = 8, 128
    kall = jnp.zeros((L, B, Hkv, S, D), jnp.bfloat16)
    vall = jnp.zeros((L, B, Hkv, S, D), jnp.bfloat16)
    f = jax.jit(lambda a, b: (a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()))
    t, med = timeit(f, kall, vall, n=20)
    gb = 2 * L * B * Hkv * S * D * 2 / 1e9
    print(f"XLA stream {gb:.2f} GB: best {t*1e3:.3f} ms ({gb/t:.0f} GB/s)")


def bench_kernel_ab(B=64, S=640, pbucket=512, L=28):
    """v5 (hbm4) vs v7 (schedule-driven) decode-attention A/B, in-program
    repetition over the layer scan (the only timing the tunnel doesn't
    poison — docs/PERFORMANCE.md perf model)."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm4 import (
        decode_attention_hbm4,
    )
    from qwen3_asr_tpu.ops.pallas.decode_attention_sched import (
        decode_attention_sched,
    )

    Hkv, Hq, D = 8, 16, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    kall = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    vall = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.bfloat16)
    v_new = k_new
    plen = jnp.full((B,), 408, jnp.int32)

    def scan_all(kernel, reps):
        # reps x L kernel calls in ONE program; layer index cycles so no
        # iteration is hoistable.  Device time per rep = (t(hi) - t(lo)) /
        # (hi - lo), which cancels the ~26 ms tunnel RPC entirely.
        def fn(q, kall, vall, k_new, v_new, dend):
            def f(carry, i):
                l = jax.lax.rem(i, L)
                o = kernel(q, kall, vall, k_new, v_new, l, plen, dend, pbucket)
                return carry + o.astype(jnp.float32).sum(), None
            out, _ = jax.lax.scan(f, jnp.float32(0), jnp.arange(reps * L))
            return out
        return jax.jit(fn)

    LO, HI = 2, 10
    for dend_off in (8, 64, 128):
        dend = jnp.int32(pbucket + dend_off)
        for name, kern in (("v5", decode_attention_hbm4),
                           ("v7", decode_attention_sched)):
            t_lo, _ = timeit(scan_all(kern, LO), q, kall, vall, k_new, v_new,
                             dend, n=10)
            t_hi, _ = timeit(scan_all(kern, HI), q, kall, vall, k_new, v_new,
                             dend, n=10)
            dev = (t_hi - t_lo) / (HI - LO)  # seconds per L-layer pass
            rows = 408 + dend_off
            gb = L * B * Hkv * rows * D * 2 * 2 / 1e9
            print(f"{name} B={B} S={S} dend+{dend_off:4d}: "
                  f"device {dev*1e3:8.3f} ms/step-attn "
                  f"({dev/L*1e6:7.1f} us/layer, {gb/max(dev,1e-9):.0f} GB/s "
                  f"valid; lo {t_lo*1e3:.1f} hi {t_hi*1e3:.1f})")


def bench_step(B=32):
    """Full decode: 128-token loop through the public pipeline."""
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import ModelConfig

    class Tok:
        def build_prompt(self, n, language="English"):
            from qwen3_asr_tpu.tokenizer import build_prompt
            return build_prompt(n, language_name_tokens=[6364])
        def decode(self, ids, skip_special_tokens=True):
            return " ".join(map(str, ids))

    model = Qwen3ASR.from_random(ModelConfig(), tokenizer=Tok(), seed=None)
    rng = np.random.default_rng(0)
    clips = [(rng.standard_normal(30 * 16000) * 0.05).astype(np.float32)
             for _ in range(B)]
    def run():
        return model.transcribe_batch(clips, max_tokens=128, temperature=0.0)
    run()
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    stats = model.last_stats.as_dict()
    print(f"pipeline B={B}: best {min(times):.3f} s  all={[f'{t:.2f}' for t in times]}")
    print(f"  stats: {stats}")


if __name__ == "__main__":
    sections = sys.argv[1:] or ["h2d", "stream", "kernel"]
    print("devices:", jax.devices())
    if "h2d" in sections:
        bench_h2d()
    if "stream" in sections:
        bench_hbm_stream()
    if "kernel" in sections:
        bench_kernel()
    if "kernel64" in sections:
        bench_kernel(B=64)
    if "kernelab" in sections:
        bench_kernel_ab()
    if "kernelab-long" in sections:
        bench_kernel_ab(B=8, S=4096 + 1024, pbucket=4096)
    if "step" in sections:
        bench_step()
    if "step64" in sections:
        bench_step(B=64)
