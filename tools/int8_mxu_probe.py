"""Probe: does XLA map int8 x int8 -> int32 dot_general onto the v5e MXU
at its 2x-bf16 rate?  Prefill is MXU-bound (docs/PERFORMANCE.md round-4
xprof: dense dot_general at bf16 peak), so an int8 activation-quantized
prefill path is only worth building if this probe shows a real speedup.

Rep-diff timing per docs/PERFORMANCE.md: the tunnel adds ~26 ms per
dispatch, so each measurement is one program with an in-program
``lax.scan`` over N reps; device time = (t_2N - t_N) / N.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args):
    # float() forces a device->host fetch: on the axon tunnel backend
    # ``block_until_ready`` returns without syncing, so only a value
    # fetch actually waits for the program (measured: 64 reps of an
    # 825-GFLOP matmul "completed" in 0.0 ms under block_until_ready).
    float(fn(*args)[0])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def bench_dot(M, K, N, reps=32):
    """Per-rep device seconds for bf16 and int8 dots of (M,K)x(K,N)."""
    key = jax.random.PRNGKey(0)
    a_bf = jax.random.normal(key, (M, K), jnp.bfloat16)
    b_bf = jax.random.normal(key, (K, N), jnp.bfloat16)
    a_i8 = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, (M, K), np.int8)
    )
    b_i8 = jnp.asarray(
        np.random.default_rng(1).integers(-127, 127, (K, N), np.int8)
    )

    def loop_bf(a, b, n):
        def step(c, _):
            out = jnp.dot(c, b)
            # fold back to (M, K) shape-compatibly: take the first K cols
            return out[:, :K].astype(jnp.bfloat16) * 0 + a, None

        c, _ = jax.lax.scan(step, a, None, length=n)
        return (c,)

    # The dot must DEPEND on the scan carry or XLA hoists it out of the
    # loop (first version measured ~0 ms/rep).  Perturb one element of
    # ``a`` with a carry-derived value each iteration.
    def chain_bf(a, b, n):
        def step(s, _):
            a2 = a.at[0, 0].set(s.astype(jnp.bfloat16))
            out = jax.lax.dot_general(
                a2, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.max(out), None

        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
        return (s,)

    def chain_i8(a, b, n):
        def step(s, _):
            a2 = a.at[0, 0].set((s & 1).astype(jnp.int8))
            out = jax.lax.dot_general(
                a2, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.max(out), None

        s, _ = jax.lax.scan(step, jnp.int32(0), None, length=n)
        return (s,)

    f_bf = jax.jit(chain_bf, static_argnames=("n",))
    f_i8 = jax.jit(chain_i8, static_argnames=("n",))

    out = {}
    for name, f, a, b in (("bf16", f_bf, a_bf, b_bf), ("int8", f_i8, a_i8, b_i8)):
        t1 = _timed(lambda a=a, b=b, f=f: f(a, b, reps))
        t2 = _timed(lambda a=a, b=b, f=f: f(a, b, 2 * reps))
        per = (t2 - t1) / reps
        flops = 2 * M * K * N
        out[name] = (per, flops / per / 1e12)
    return out


def main():
    print("devices:", jax.devices())
    shapes = [
        # decoder prefill dense at B=64, T=512 rows (qkv/gate-up/down/o)
        (64 * 512, 2048, 6144),
        (64 * 512, 6144, 2048),
        # encoder MLP at B=64 chunk rows
        (2048 * 13, 1024, 4096),
        # lm-head-ish tall-skinny
        (64 * 512, 2048, 2048),
    ]
    for M, K, N in shapes:
        r = bench_dot(M, K, N)
        bf, i8 = r["bf16"], r["int8"]
        print(
            f"({M},{K})x({K},{N}): bf16 {bf[0]*1e3:.2f} ms ({bf[1]:.1f} T/s)"
            f"  int8 {i8[0]*1e3:.2f} ms ({i8[1]:.1f} T/s)"
            f"  speedup {bf[0]/i8[0]:.2f}x"
        )


if __name__ == "__main__":
    main()
