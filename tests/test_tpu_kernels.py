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
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm2 import decode_attention_hbm2
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm3 import decode_attention_hbm3

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


def test_hbm4_idle_lane_on_tpu():
    """Regression: a live lane with ZERO blocks (plen=0, no decode rows —
    an idle continuous-batch slot) desynced the DMA pipeline's producer
    walk from its consumer and crashed the device.  The wrapper now clamps
    plen >= 1; real lanes' outputs must be unaffected."""
    from qwen3_asr_tpu.ops.attention import sdpa
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm4 import decode_attention_hbm4

    L, B, hq, hkv, S, D, Pb = 2, 4, 16, 8, 640, 128, 512
    rng = np.random.default_rng(2)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    q, kall, vall = mk(B, hq, D), mk(L, B, hkv, S, D), mk(L, B, hkv, S, D)
    k_new, v_new = mk(B, hkv, 1, D), mk(B, hkv, 1, D)
    plen = jnp.asarray([100, 410, 0, 0], jnp.int32)     # lanes 2-3 idle
    dend = jnp.asarray([Pb + 37, Pb, Pb, Pb], jnp.int32)  # hetero depths

    out = np.asarray(
        decode_attention_hbm4(
            q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb
        ).astype(jnp.float32)
    )
    # Oracle for the two real lanes only.
    k = jnp.concatenate([kall[1], k_new], axis=2).astype(jnp.float32)
    v = jnp.concatenate([vall[1], v_new], axis=2).astype(jnp.float32)
    slots = jnp.arange(S + 1)
    mask = (slots[None, :] < plen[:, None]) | (
        (slots[None, :] >= Pb) & (slots[None, :] < dend[:, None])
    )
    mask = mask.at[:, S].set(True)
    ref = np.asarray(
        sdpa(q[:, :, None, :].astype(jnp.float32), k, v, mask=mask[:, None, None, :])
    )[:, :, 0, :]
    assert np.max(np.abs(out[:2] - ref[:2])) < 0.05
    assert np.isfinite(out).all()


def test_paged_kernel_on_tpu():
    """Paged flash-decode vs compact-gather oracle on real hardware,
    including an idle lane (plen=0)."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_paged import (
        decode_attention_paged,
    )
    from tests.test_pallas import paged_oracle

    L, B, hq, hkv, D, PS = 2, 3, 16, 8, 128, 256
    n_pages, maxp = 16, 4
    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    q = mk(B, hq, D)
    kall, vall = mk(L, n_pages, hkv, PS, D), mk(L, n_pages, hkv, PS, D)
    k_new, v_new = mk(B, hkv, 1, D), mk(B, hkv, 1, D)
    table = jnp.asarray([[7, 2, 11, 0], [5, 9, 1, 14], [0, 0, 0, 0]], jnp.int32)
    plen = jnp.asarray([300, 256, 0], jnp.int32)
    dcount = jnp.asarray([37, 300, 0], jnp.int32)

    out = np.asarray(
        decode_attention_paged(
            q, kall, vall, k_new, v_new, jnp.int32(1), table, plen, dcount
        )
    )
    ref = np.asarray(paged_oracle(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kall.astype(jnp.bfloat16).astype(jnp.float32),
        vall.astype(jnp.bfloat16).astype(jnp.float32),
        k_new.astype(jnp.bfloat16).astype(jnp.float32),
        v_new.astype(jnp.bfloat16).astype(jnp.float32),
        1, table, plen, dcount,
    ))
    assert np.max(np.abs(out[:2] - ref[:2])) < 0.05
    assert np.isfinite(out).all()


def test_paged_verify_kernel_on_tpu():
    """Speculative verify variant of the paged kernel (T = 4 positions in
    one page walk) vs the gather oracle on real hardware, bf16 and int8
    pools."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_paged import (
        decode_attention_paged_verify,
        decode_attention_paged_verify_q8,
    )
    from qwen3_asr_tpu.ops.quant_kv import dequantize_kv, quantize_kv
    from tests.test_pallas import paged_verify_oracle

    L, B, hq, hkv, D, PS, T = 2, 3, 16, 8, 128, 256, 4
    n_pages = 16
    rng = np.random.default_rng(13)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    q = mk(B, hq, T, D)
    kall, vall = mk(L, n_pages, hkv, PS, D), mk(L, n_pages, hkv, PS, D)
    k_new, v_new = mk(B, hkv, T, D), mk(B, hkv, T, D)
    table = jnp.asarray([[7, 2, 11, 0], [5, 9, 1, 14], [3, 0, 0, 0]], jnp.int32)
    plen = jnp.asarray([300, 256, 120], jnp.int32)
    dcount = jnp.asarray([37, 300, 0], jnp.int32)

    out = np.asarray(decode_attention_paged_verify(
        q, kall, vall, k_new, v_new, jnp.int32(1), table, plen, dcount
    ))
    ref = np.asarray(paged_verify_oracle(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kall.astype(jnp.bfloat16).astype(jnp.float32),
        vall.astype(jnp.bfloat16).astype(jnp.float32),
        k_new.astype(jnp.bfloat16).astype(jnp.float32),
        v_new.astype(jnp.bfloat16).astype(jnp.float32),
        1, table, plen, dcount,
    ))
    assert out.shape == (B, hq, T, D)
    assert np.max(np.abs(out - ref)) < 0.05
    assert np.isfinite(out).all()

    kq, vq = quantize_kv(kall), quantize_kv(vall)
    out8 = decode_attention_paged_verify_q8(
        q, kq, vq, k_new, v_new, jnp.int32(1), table, plen, dcount
    )
    ref8 = decode_attention_paged_verify(
        q, dequantize_kv(kq, jnp.float32), dequantize_kv(vq, jnp.float32),
        k_new, v_new, jnp.int32(1), table, plen, dcount
    )
    d = np.abs(np.asarray(out8) - np.asarray(ref8)).max()
    assert d < 5e-3, d


def test_kv_write_rows_batch_and_paged_on_tpu():
    from qwen3_asr_tpu.ops.pallas.kv_write import (
        kv_write_rows_batch,
        kv_write_rows_paged,
    )

    L, B, H, S, D = 3, 4, 8, 640, 128
    rng = np.random.default_rng(4)
    cache = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    rows = jnp.asarray(rng.standard_normal((L, B, H, 1, D)), jnp.bfloat16)
    slots = jnp.asarray([512, 513, 520, 639], jnp.int32)
    out = kv_write_rows_batch(cache, rows, slots)
    expected = cache
    for b, s in enumerate(np.asarray(slots)):
        expected = expected.at[:, b, :, s : s + 1, :].set(rows[:, b])
    assert np.array_equal(
        np.asarray(out, np.float32), np.asarray(expected, np.float32)
    )

    P, PS = 6, 256
    pcache = jnp.asarray(rng.standard_normal((L, P, H, PS, D)), jnp.bfloat16)
    pages = jnp.asarray([1, 3, 5, 2], jnp.int32)
    offs = jnp.asarray([0, 7, 255, 128], jnp.int32)
    pout = kv_write_rows_paged(pcache, rows, pages, offs)
    pexp = pcache
    for b in range(B):
        pexp = pexp.at[
            :, int(pages[b]), :, int(offs[b]) : int(offs[b]) + 1, :
        ].set(rows[:, b])
    assert np.array_equal(
        np.asarray(pout, np.float32), np.asarray(pexp, np.float32)
    )


def test_kv_write_span_on_tpu():
    """Speculative-verify span writer on real hardware: spans that sit
    inside one tile, straddle a tile boundary, and overflow the cache
    edge (dropped rows)."""
    from qwen3_asr_tpu.ops.pallas.kv_write import kv_write_span_batch

    L, B, H, S, D, T = 3, 4, 8, 640, 128, 4
    rng = np.random.default_rng(6)
    cache = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    rows = jnp.asarray(rng.standard_normal((L, B, H, T, D)), jnp.bfloat16)
    slots = jnp.asarray([512, 517, 526, S - 2], jnp.int32)

    out = kv_write_span_batch(cache, rows, slots)
    expected = cache
    for b, s in enumerate(np.asarray(slots)):
        for t in range(T):
            if s + t < S:
                expected = expected.at[:, b, :, s + t, :].set(rows[:, b, :, t])
    assert np.array_equal(
        np.asarray(out, np.float32), np.asarray(expected, np.float32)
    )


def test_q8_decode_kernel_and_int8_writer_on_tpu():
    """int8-cache v5 variant + 32-row-tile int8 row writer on real
    hardware (the CPU suite covers both in interpreter mode)."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm4 import (
        decode_attention_hbm4,
        decode_attention_hbm4_q8,
    )
    from qwen3_asr_tpu.ops.pallas.kv_write import kv_write_rows
    from qwen3_asr_tpu.ops.quant_kv import dequantize_kv, quantize_kv

    L, B, hq, hkv, S, D, Pb = 4, 3, 16, 8, 640, 128, 512
    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    q, kall, vall = mk(B, hq, D), mk(L, B, hkv, S, D), mk(L, B, hkv, S, D)
    k_new, v_new = mk(B, hkv, 1, D), mk(B, hkv, 1, D)
    plen = jnp.asarray([100, 458, 37], jnp.int32)
    kq, vq = quantize_kv(kall), quantize_kv(vall)

    for dend_off in (0, 37):
        dend = jnp.int32(Pb + dend_off)
        out = decode_attention_hbm4_q8(
            q, kq, vq, k_new, v_new, jnp.int32(1), plen, dend, Pb
        )
        ref = decode_attention_hbm4(
            q, dequantize_kv(kq), dequantize_kv(vq), k_new, v_new,
            jnp.int32(1), plen, dend, Pb,
        )
        d = np.abs(
            np.asarray(out, np.float32) - np.asarray(ref, np.float32)
        ).max()
        assert d < 5e-3, f"dend_off={dend_off}: {d}"

    cache8 = kq["q"]
    rows8 = jnp.asarray(
        rng.integers(-127, 128, (L, B, hkv, 1, D)), jnp.int8
    )
    for slot in (Pb, Pb + 5, Pb + 33, S - 1):
        out = kv_write_rows(cache8, rows8, jnp.int32(slot))
        expected = cache8.at[:, :, :, slot : slot + 1, :].set(rows8)
        assert np.array_equal(np.asarray(out), np.asarray(expected)), slot


def test_paged_q8_kernel_and_paged_int8_writer_on_tpu():
    """int8 page-pool kernel + int8 paged row writer on real hardware
    (engine int8 support; CPU covers both in interpreter mode)."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_paged import (
        decode_attention_paged,
        decode_attention_paged_q8,
    )
    from qwen3_asr_tpu.ops.pallas.kv_write import kv_write_rows_paged
    from qwen3_asr_tpu.ops.quant_kv import dequantize_kv, quantize_kv

    L, B, hq, hkv, D, PS = 2, 3, 16, 8, 128, 256
    n_pages = 16
    rng = np.random.default_rng(5)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    q = mk(B, hq, D)
    kall, vall = mk(L, n_pages, hkv, PS, D), mk(L, n_pages, hkv, PS, D)
    k_new, v_new = mk(B, hkv, 1, D), mk(B, hkv, 1, D)
    table = jnp.asarray([[7, 2, 11, 0], [5, 9, 1, 14], [6, 0, 0, 0]], jnp.int32)
    plen = jnp.asarray([300, 256, 100], jnp.int32)
    dcount = jnp.asarray([37, 300, 0], jnp.int32)
    kq, vq = quantize_kv(kall), quantize_kv(vall)

    out = decode_attention_paged_q8(
        q, kq, vq, k_new, v_new, jnp.int32(1), table, plen, dcount
    )
    ref = decode_attention_paged(
        q, dequantize_kv(kq, jnp.float32), dequantize_kv(vq, jnp.float32),
        k_new, v_new, jnp.int32(1), table, plen, dcount
    )
    d = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert d < 5e-3, d

    cache8 = kq["q"]
    rows8 = jnp.asarray(rng.integers(-127, 128, (L, B, hkv, 1, D)), jnp.int8)
    pages = jnp.asarray([7, 9, 6], jnp.int32)
    offs = jnp.asarray([3, 37, 255], jnp.int32)
    out = kv_write_rows_paged(cache8, rows8, pages, offs)
    expected = cache8.at[
        :, pages, :, offs, :
    ].set(jnp.moveaxis(rows8[:, :, :, 0, :], 1, 0))
    assert np.array_equal(np.asarray(out), np.asarray(expected))


def test_flash_single_tile_on_tpu():
    """64-aligned trimmed-run flash fallback (one (T, T) tile) on real
    hardware vs the jnp causal oracle."""
    from qwen3_asr_tpu.ops.pallas.flash_attention import flash_attention_causal
    from tests.test_pallas import causal_oracle

    B, hq, hkv, T, D = 2, 16, 8, 448, 128
    rng = np.random.default_rng(7)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    q, k, v = mk(B, hq, T, D), mk(B, hkv, T, D), mk(B, hkv, T, D)
    out = flash_attention_causal(q, k, v)
    ref = causal_oracle(q, k, v)
    d = np.abs(
        np.asarray(out, np.float32) - np.asarray(ref, np.float32)
    ).max()
    assert d < 3e-2, d


def test_conv_stem_kernel_on_tpu():
    """Fused stem kernel vs lax.conv+gelu on real hardware (experiment:
    not yet wired into the encoder — docs/PERFORMANCE.md)."""
    from qwen3_asr_tpu.ops.pallas.experiments.conv_stem import conv_s2_gelu

    N, H, W, C = 64, 64, 50, 480
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((N, H, W, C)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    ref = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(jnp.bfloat16),
        approximate=False,
    )
    out = conv_s2_gelu(x, w, b)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert d < 3e-2, d


def test_w8a8_matmul_kernel_on_tpu():
    """Fused W8A8 kernel vs the jnp int8-dot lowering on the real MXU:
    integer accumulation is exact, so the two must agree to f32 epilogue
    rounding."""
    from qwen3_asr_tpu.ops.pallas.w8a8_matmul import w8a8_matmul
    from qwen3_asr_tpu.ops.quant import quantize_activations, quantize_weight

    rng = jax.random.PRNGKey(11)
    x = jax.random.normal(jax.random.fold_in(rng, 0), (300, 512), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (512, 1024)) * 0.1
    wq = quantize_weight(w)

    got = np.asarray(
        w8a8_matmul(x, wq["q"], wq["s"], out_dtype=jnp.float32)
    )
    xq, sx = quantize_activations(x)
    acc = jax.lax.dot_general(
        xq, wq["q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    want = np.asarray(
        acc.astype(jnp.float32) * sx[:, None] * wq["s"][None, :]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
