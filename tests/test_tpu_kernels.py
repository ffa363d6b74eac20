"""Real-hardware Pallas kernel verification (runs only on a TPU backend).

The CPU suite validates these kernels in interpreter mode; this file
re-runs the same oracles against Mosaic-compiled kernels on the actual
chip (run manually: JAX_PLATFORMS= python -m pytest tests/test_tpu_kernels.py).
Verified on v5e: kv_write bit-exact, attention kernels within bf16 noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a real TPU backend"
)


def test_kv_write_rows_on_tpu():
    from qwen3_asr_tpu.ops.pallas.kv_write import kv_write_rows

    L, B, H, S, D = 4, 3, 8, 512, 128
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    rows = jnp.asarray(rng.standard_normal((L, B, H, 1, D)), jnp.bfloat16)
    for slot in (256, 259, 511):
        out = kv_write_rows(cache, rows, jnp.int32(slot))
        expected = cache.at[:, :, :, slot : slot + 1, :].set(rows)
        assert np.array_equal(
            np.asarray(out, np.float32), np.asarray(expected, np.float32)
        ), f"slot {slot}"


def test_decode_kernels_on_tpu():
    from qwen3_asr_tpu.ops.attention import sdpa
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm2 import decode_attention_hbm2
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm3 import decode_attention_hbm3

    L, B, hq, hkv, S, D, Pb = 4, 3, 16, 8, 512, 128, 256
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    q, kall, vall = mk(B, hq, D), mk(L, B, hkv, S, D), mk(L, B, hkv, S, D)
    k_new, v_new = mk(B, hkv, 1, D), mk(B, hkv, 1, D)
    plen = jnp.asarray([100, 250, 37], jnp.int32)
    dend = jnp.int32(Pb + 37)

    k = jnp.concatenate([kall[1], k_new], axis=2).astype(jnp.float32)
    v = jnp.concatenate([vall[1], v_new], axis=2).astype(jnp.float32)
    slots = jnp.arange(S + 1)
    mask = (slots[None, :] < plen[:, None]) | (
        (slots[None, :] >= Pb) & (slots[None, :] < dend)
    )
    mask = mask.at[:, S].set(True)
    ref = np.asarray(
        sdpa(q[:, :, None, :].astype(jnp.float32), k, v, mask=mask[:, None, None, :])
    )[:, :, 0, :]

    for fn in (decode_attention_hbm2, decode_attention_hbm3):
        out = np.asarray(
            fn(q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb,
               block_k=128).astype(jnp.float32)
        )
        assert np.max(np.abs(out - ref)) < 0.05, fn.__name__
