"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.ops.attention import sdpa
from qwen3_asr_tpu.ops.pallas.flash_attention import flash_attention_causal


def causal_oracle(q, k, v, scale=None):
    T = q.shape[2]
    ids = jnp.arange(T)
    mask = (ids[None, :] <= ids[:, None])[None, None]
    return sdpa(q, k, v, mask=mask, scale=scale)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2), (8, 2)])
def test_flash_matches_oracle_gqa(hq, hkv):
    B, T, D = 1, 256, 64
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, T, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, hkv, T, D), jnp.float32)

    out = flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = causal_oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("T", [64, 448, 512])
def test_flash_single_tile_trimmed_run(T):
    """64-aligned trimmed prefill runs (prefill_run_granularity) take the
    single-(T, T)-tile fallback — full-width MXU matmuls, same math."""
    B, hq, hkv, D = 2, 4, 2, 64
    rng = jax.random.PRNGKey(9)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, T, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, hkv, T, D), jnp.float32)

    out = flash_attention_causal(q, k, v, interpret=True)
    ref = causal_oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_multiple_kv_tiles():
    """Online-softmax correction across >2 KV tiles."""
    B, H, T, D = 1, 2, 512, 64
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, H, T, D)) * 2.0
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, T, D)) * 2.0
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, T, D))

    out = flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = causal_oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_bf16_io():
    B, H, T, D = 1, 2, 256, 64
    rng = jax.random.PRNGKey(5)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, H, T, D)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, T, D)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, T, D)).astype(jnp.bfloat16)

    out = flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = causal_oracle(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
    )


def test_flash_is_causal():
    """Future keys must not influence output."""
    B, H, T, D = 1, 2, 256, 64
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, H, T, D))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, T, D))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, T, D))

    out_a = flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)
    k2 = k.at[:, :, 200:].set(77.0)
    v2 = v.at[:, :, 200:].set(-77.0)
    out_b = flash_attention_causal(q, k2, v2, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :, :200]), np.asarray(out_b[:, :, :200]), atol=1e-5
    )


# -- decode attention v2 (HBM DMA, block skip, fused self-term) --------------



def hbm_oracle(q, kall, vall, k_new, v_new, layer, plen, dend, Pb, scale=None):
    """Oracle: cache slots < plen | [Pb, dend) plus the fresh row."""
    k = jnp.concatenate([kall[layer], k_new], axis=2)
    v = jnp.concatenate([vall[layer], v_new], axis=2)
    S = kall.shape[3]
    B = q.shape[0]
    slots = jnp.arange(S + 1)
    dend_b = jnp.broadcast_to(jnp.asarray(dend, jnp.int32), (B,))
    mask = (slots[None, :] < plen[:, None]) | (
        (slots[None, :] >= Pb) & (slots[None, :] < dend_b[:, None])
    )
    mask = mask.at[:, S].set(True)  # fresh row always attendable
    out = sdpa(q[:, :, None, :], k, v, mask=mask[:, None, None, :], scale=scale)
    return out[:, :, 0, :]


def test_decode_attention_hbm2_matches_oracle():
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm2 import decode_attention_hbm2

    L, B, hq, hkv, S, D, Pb = 3, 2, 16, 8, 512, 128, 256
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D), jnp.float32)
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D), jnp.float32)
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D), jnp.float32)
    plen = jnp.asarray([100, 250], jnp.int32)
    dend = jnp.int32(Pb + 37)

    out = decode_attention_hbm2(
        q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb,
        block_k=128, interpret=True,
    )
    ref = hbm_oracle(q, kall, vall, k_new, v_new, 1, plen, dend, Pb)
    # v3 uses bf16 MXU inputs with f32 accumulation (the production
    # contract — activations are bf16); vs this f32 oracle that costs
    # ~1e-2 absolute.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)

    # And against a bf16-input oracle the agreement is tight.
    refb = hbm_oracle(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kall.astype(jnp.bfloat16).astype(jnp.float32),
        vall.astype(jnp.bfloat16).astype(jnp.float32),
        k_new.astype(jnp.bfloat16).astype(jnp.float32),
        v_new.astype(jnp.bfloat16).astype(jnp.float32),
        1, plen, dend, Pb,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(refb), atol=5e-3)


def test_decode_attention_hbm3_matches_oracle():
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm3 import decode_attention_hbm3

    L, B, hq, hkv, S, D, Pb = 3, 3, 16, 8, 512, 128, 256
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D), jnp.float32)
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D), jnp.float32)
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D), jnp.float32)
    plen = jnp.asarray([100, 250, 37], jnp.int32)
    dend = jnp.int32(Pb + 37)

    out = decode_attention_hbm3(
        q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb,
        block_k=128, interpret=True,
    )
    ref = hbm_oracle(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kall.astype(jnp.bfloat16).astype(jnp.float32),
        vall.astype(jnp.bfloat16).astype(jnp.float32),
        k_new.astype(jnp.bfloat16).astype(jnp.float32),
        v_new.astype(jnp.bfloat16).astype(jnp.float32),
        1, plen, dend, Pb,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_decode_attention_hbm3_batch1():
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm3 import decode_attention_hbm3

    L, B, hq, hkv, S, D, Pb = 2, 1, 4, 2, 256, 128, 128
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D))
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D))
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D))
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D))
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D))
    plen = jnp.asarray([90], jnp.int32)
    dend = jnp.int32(Pb)

    out = decode_attention_hbm3(
        q, kall, vall, k_new, v_new, jnp.int32(0), plen, dend, Pb,
        block_k=128, interpret=True,
    )
    ref = hbm_oracle(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kall.astype(jnp.bfloat16).astype(jnp.float32),
        vall.astype(jnp.bfloat16).astype(jnp.float32),
        k_new.astype(jnp.bfloat16).astype(jnp.float32),
        v_new.astype(jnp.bfloat16).astype(jnp.float32),
        0, plen, dend, Pb,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def _bf16_oracle(q, kall, vall, k_new, v_new, layer, plen, dend, Pb):
    return hbm_oracle(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kall.astype(jnp.bfloat16).astype(jnp.float32),
        vall.astype(jnp.bfloat16).astype(jnp.float32),
        k_new.astype(jnp.bfloat16).astype(jnp.float32),
        v_new.astype(jnp.bfloat16).astype(jnp.float32),
        layer, plen, dend, Pb,
    )


def test_decode_attention_hbm4_matches_oracle():
    """v5 dual-granularity kernel: S deliberately NOT a multiple of the
    prompt block (the bench shape 512+128 that forced v4 down to 256-row
    blocks)."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm4 import decode_attention_hbm4

    L, B, hq, hkv, S, D, Pb = 3, 3, 16, 8, 640, 128, 512
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D), jnp.float32)
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D), jnp.float32)
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D), jnp.float32)
    plen = jnp.asarray([100, 412, 37], jnp.int32)
    for dend_off in (0, 1, 37, 128):
        dend = jnp.int32(Pb + dend_off)
        out = decode_attention_hbm4(
            q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb,
            interpret=True,
        )
        ref = _bf16_oracle(q, kall, vall, k_new, v_new, 1, plen, dend, Pb)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-3,
            err_msg=f"dend_off={dend_off}",
        )


def test_decode_attention_hbm4_batch1_and_small_blocks():
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm4 import decode_attention_hbm4

    L, B, hq, hkv, S, D, Pb = 2, 1, 4, 2, 384, 128, 256
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D))
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D))
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D))
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D))
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D))
    plen = jnp.asarray([90], jnp.int32)
    out = decode_attention_hbm4(
        q, kall, vall, k_new, v_new, jnp.int32(0), plen, jnp.int32(Pb), Pb,
        block_p=128, interpret=True,
    )
    ref = _bf16_oracle(q, kall, vall, k_new, v_new, 0, plen, jnp.int32(Pb), Pb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_decode_attention_hbm4_masked_garbage_immunity():
    """Garbage in dead regions (prompt padding tail, beyond-dend decode
    slots) must not leak into the output — covers the dual-granularity
    slicing and stale-buffer handling."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm4 import decode_attention_hbm4

    L, B, hq, hkv, S, D, Pb = 2, 2, 4, 2, 640, 128, 512
    rng = jax.random.PRNGKey(9)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D))
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D))
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D))
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D))
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D))
    plen = jnp.asarray([90, 412], jnp.int32)
    dend = jnp.int32(Pb + 10)

    out_a = decode_attention_hbm4(
        q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb, interpret=True
    )
    k2 = kall.at[:, 0, :, 90:Pb].set(55.0).at[:, :, :, Pb + 10 :].set(-44.0)
    v2 = vall.at[:, 0, :, 90:Pb].set(-55.0).at[:, :, :, Pb + 10 :].set(44.0)
    k2 = k2.at[:, 1, :, 412:Pb].set(33.0)
    v2 = v2.at[:, 1, :, 412:Pb].set(-33.0)
    out_b = decode_attention_hbm4(
        q, k2, v2, k_new, v_new, jnp.int32(1), plen, dend, Pb, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


# -- paged decode attention ---------------------------------------------------


def paged_oracle(q, kall, vall, k_new, v_new, layer, table, plen, dcount, scale=None):
    """Gather each sequence's pages into compact order and run masked sdpa."""
    B = q.shape[0]
    PS = kall.shape[3]
    maxp = table.shape[1]
    pp = (plen + PS - 1) // PS
    k_pages = kall[layer][jnp.clip(table, 0, kall.shape[1] - 1)]  # (B,maxp,H,PS,D)
    v_pages = vall[layer][jnp.clip(table, 0, vall.shape[1] - 1)]
    k = jnp.moveaxis(k_pages, 2, 1).reshape(B, kall.shape[2], maxp * PS, -1)
    v = jnp.moveaxis(v_pages, 2, 1).reshape(B, vall.shape[2], maxp * PS, -1)
    k = jnp.concatenate([k, k_new], axis=2)
    v = jnp.concatenate([v, v_new], axis=2)
    cols = jnp.arange(maxp * PS + 1)[None, :]
    dstart = (pp * PS)[:, None]
    mask = (cols < plen[:, None]) | (
        (cols >= dstart) & (cols < dstart + dcount[:, None])
    )
    mask = mask.at[:, maxp * PS].set(True)  # fresh row always attendable
    out = sdpa(q[:, :, None, :], k, v, mask=mask[:, None, None, :], scale=scale)
    return out[:, :, 0, :]


def test_decode_attention_paged_matches_oracle():
    """Paged kernel vs compact-gather oracle: shuffled physical pages,
    heterogeneous prompt lengths AND decode depths."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_paged import (
        decode_attention_paged,
    )

    L, B, hq, hkv, D, PS = 2, 3, 16, 8, 128, 256
    n_pages, maxp = 16, 4
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(
        jax.random.fold_in(rng, 1), (L, n_pages, hkv, PS, D), jnp.float32
    )
    vall = jax.random.normal(
        jax.random.fold_in(rng, 2), (L, n_pages, hkv, PS, D), jnp.float32
    )
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D), jnp.float32)
    # Deliberately non-contiguous, interleaved page assignments.
    table = jnp.asarray(
        [[7, 2, 11, 0], [5, 9, 1, 14], [3, 0, 0, 0]], jnp.int32
    )
    plen = jnp.asarray([300, 256, 120], jnp.int32)   # 2, 1, 1 prompt pages
    dcount = jnp.asarray([37, 300, 0], jnp.int32)    # hetero decode depths

    out = decode_attention_paged(
        q, kall, vall, k_new, v_new, jnp.int32(1), table, plen, dcount,
        interpret=True,
    )
    ref = paged_oracle(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kall.astype(jnp.bfloat16).astype(jnp.float32),
        vall.astype(jnp.bfloat16).astype(jnp.float32),
        k_new.astype(jnp.bfloat16).astype(jnp.float32),
        v_new.astype(jnp.bfloat16).astype(jnp.float32),
        1, table, plen, dcount,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_decode_attention_paged_garbage_immunity():
    """Values in unreferenced pages / masked rows must not affect output."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_paged import (
        decode_attention_paged,
    )

    L, B, hq, hkv, D, PS = 1, 2, 4, 2, 128, 256
    n_pages, maxp = 8, 3
    rng = jax.random.PRNGKey(11)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(
        jax.random.fold_in(rng, 1), (L, n_pages, hkv, PS, D), jnp.float32
    )
    vall = jax.random.normal(
        jax.random.fold_in(rng, 2), (L, n_pages, hkv, PS, D), jnp.float32
    )
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D), jnp.float32)
    table = jnp.asarray([[4, 6, 0], [1, 2, 5]], jnp.int32)
    plen = jnp.asarray([200, 256], jnp.int32)
    dcount = jnp.asarray([100, 40], jnp.int32)

    out_a = decode_attention_paged(
        q, kall, vall, k_new, v_new, jnp.int32(0), table, plen, dcount,
        interpret=True,
    )
    # Poison: unreferenced pages everywhere, masked prompt tail of seq 0
    # (page 4 rows >= 200), masked decode tail of seq 1 (page 5 rows >= 40).
    poison = jnp.full_like(kall, 1e4)
    keep = jnp.zeros((n_pages,), bool).at[jnp.asarray([4, 6, 1, 2, 5])].set(True)
    k2 = jnp.where(keep[None, :, None, None, None], kall, poison)
    v2 = jnp.where(keep[None, :, None, None, None], vall, poison)
    rows = jnp.arange(PS)
    k2 = k2.at[:, 4, :, :, :].set(
        jnp.where((rows >= 200)[None, :, None], 1e4, k2[:, 4])
    )
    k2 = k2.at[:, 5, :, :, :].set(
        jnp.where((rows >= 40)[None, :, None], -1e4, k2[:, 5])
    )
    out_b = decode_attention_paged(
        q, k2, v2, k_new, v_new, jnp.int32(0), table, plen, dcount,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def paged_verify_oracle(
    q, kall, vall, k_new, v_new, layer, table, plen, dcount, scale=None
):
    """T-position verify oracle: compact-gathered pages with the history
    mask shared across positions plus a causal T x T fresh block."""
    B, hq, T, D = q.shape
    PS = kall.shape[3]
    maxp = table.shape[1]
    pp = (plen + PS - 1) // PS
    k_pages = kall[layer][jnp.clip(table, 0, kall.shape[1] - 1)]
    v_pages = vall[layer][jnp.clip(table, 0, vall.shape[1] - 1)]
    k = jnp.moveaxis(k_pages, 2, 1).reshape(B, kall.shape[2], maxp * PS, -1)
    v = jnp.moveaxis(v_pages, 2, 1).reshape(B, vall.shape[2], maxp * PS, -1)
    k = jnp.concatenate([k, k_new], axis=2)
    v = jnp.concatenate([v, v_new], axis=2)
    cols = jnp.arange(maxp * PS)[None, :]
    dstart = (pp * PS)[:, None]
    hist = (cols < plen[:, None]) | (
        (cols >= dstart) & (cols < dstart + dcount[:, None])
    )                                                   # (B, maxp*PS)
    fresh = (
        jnp.arange(T)[None, :, None] >= jnp.arange(T)[None, None, :]
    )                                                   # (1, T, T) causal
    mask = jnp.concatenate(
        [
            jnp.broadcast_to(hist[:, None, :], (B, T, maxp * PS)),
            jnp.broadcast_to(fresh, (B, T, T)),
        ],
        axis=2,
    )
    return sdpa(q, k, v, mask=mask[:, None, :, :], scale=scale)


def test_decode_attention_paged_verify_matches_oracle():
    """Speculative verify kernel (T = 4 positions) vs the gather oracle:
    shuffled pages, heterogeneous prompt lengths and decode depths."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_paged import (
        decode_attention_paged_verify,
    )

    L, B, hq, hkv, D, PS, T = 2, 3, 16, 8, 128, 256, 4
    n_pages, maxp = 16, 4
    rng = jax.random.PRNGKey(21)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, T, D), jnp.float32)
    kall = jax.random.normal(
        jax.random.fold_in(rng, 1), (L, n_pages, hkv, PS, D), jnp.float32
    )
    vall = jax.random.normal(
        jax.random.fold_in(rng, 2), (L, n_pages, hkv, PS, D), jnp.float32
    )
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, T, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, T, D), jnp.float32)
    table = jnp.asarray(
        [[7, 2, 11, 0], [5, 9, 1, 14], [3, 0, 0, 0]], jnp.int32
    )
    plen = jnp.asarray([300, 256, 120], jnp.int32)
    dcount = jnp.asarray([37, 300, 0], jnp.int32)

    out = decode_attention_paged_verify(
        q, kall, vall, k_new, v_new, jnp.int32(1), table, plen, dcount,
        interpret=True,
    )
    ref = paged_verify_oracle(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kall.astype(jnp.bfloat16).astype(jnp.float32),
        vall.astype(jnp.bfloat16).astype(jnp.float32),
        k_new.astype(jnp.bfloat16).astype(jnp.float32),
        v_new.astype(jnp.bfloat16).astype(jnp.float32),
        1, table, plen, dcount,
    )
    assert out.shape == (B, hq, T, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_decode_attention_paged_verify_t1_equals_step():
    """With T = 1 the verify entry reduces to the single-token step."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_paged import (
        decode_attention_paged,
        decode_attention_paged_verify,
    )

    L, B, hq, hkv, D, PS = 1, 2, 4, 2, 128, 256
    n_pages = 8
    rng = jax.random.PRNGKey(5)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(
        jax.random.fold_in(rng, 1), (L, n_pages, hkv, PS, D), jnp.float32
    )
    vall = jax.random.normal(
        jax.random.fold_in(rng, 2), (L, n_pages, hkv, PS, D), jnp.float32
    )
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D), jnp.float32)
    table = jnp.asarray([[4, 6, 0], [1, 2, 5]], jnp.int32)
    plen = jnp.asarray([200, 256], jnp.int32)
    dcount = jnp.asarray([100, 40], jnp.int32)

    a = decode_attention_paged(
        q, kall, vall, k_new, v_new, jnp.int32(0), table, plen, dcount,
        interpret=True,
    )
    b = decode_attention_paged_verify(
        q[:, :, None, :], kall, vall, k_new, v_new, jnp.int32(0), table,
        plen, dcount, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b[:, :, 0, :]), atol=1e-6)


def test_decode_attention_hbm5_matches_oracle():
    """v6 lane-grouped kernel vs oracle: heterogeneous prompt lengths and
    per-sequence decode depths inside one DMA group."""
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm5 import decode_attention_hbm5

    L, B, hq, hkv, S, D, Pb = 3, 8, 16, 8, 640, 128, 512
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D), jnp.float32)
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D), jnp.float32)
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D), jnp.float32)
    plen = jnp.asarray([100, 412, 37, 512, 1, 256, 300, 90], jnp.int32)
    dend = jnp.asarray(
        [512, 513, 549, 640, 512, 640, 512, 523], jnp.int32
    )
    out = decode_attention_hbm5(
        q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb,
        interpret=True,
    )
    ref = jnp.concatenate([
        _bf16_oracle(
            q[b : b + 1], kall[:, b : b + 1], vall[:, b : b + 1],
            k_new[b : b + 1], v_new[b : b + 1], 1,
            plen[b : b + 1], dend[b], Pb,
        )
        for b in range(B)
    ])
    # atol 2e-2 (not the usual 5e-3): the plen=1 lane attends over just
    # two softmax terms, so bf16 rounding-order differences between the
    # kernel and the oracle are not averaged away (a wrong-row bug would
    # show as O(1) error, which this still catches).
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_decode_attention_hbm5_small_batches():
    """v6 group clamping: B < group, B == group, B not a multiple of the
    group (cache pad path)."""
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm5 import decode_attention_hbm5

    L, hq, hkv, S, D, Pb = 2, 4, 2, 384, 128, 256
    rng = jax.random.PRNGKey(7)
    for B in (1, 2, 4, 6):
        q = jax.random.normal(jax.random.fold_in(rng, B), (B, hq, D))
        kall = jax.random.normal(jax.random.fold_in(rng, 10 + B), (L, B, hkv, S, D))
        vall = jax.random.normal(jax.random.fold_in(rng, 20 + B), (L, B, hkv, S, D))
        k_new = jax.random.normal(jax.random.fold_in(rng, 30 + B), (B, hkv, 1, D))
        v_new = jax.random.normal(jax.random.fold_in(rng, 40 + B), (B, hkv, 1, D))
        plen = jnp.asarray([90, 200, 256, 1, 64, 130][:B], jnp.int32)
        dend = jnp.int32(Pb + 64)
        out = decode_attention_hbm5(
            q, kall, vall, k_new, v_new, jnp.int32(0), plen, dend, Pb,
            interpret=True,
        )
        ref = _bf16_oracle(q, kall, vall, k_new, v_new, 0, plen, dend, Pb)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-3, err_msg=f"B={B}"
        )


# -- decode attention v7 (schedule-driven flat walk) --------------------------


def test_build_decode_schedule_covers_exactly():
    """Every valid cache block appears exactly once, in lane order, with
    correct offsets/limits/flags; padded lanes own nothing."""
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_sched import (
        _F_FIRST, _F_LAST, build_decode_schedule,
    )

    Pb, S, block = 512, 1024, 128
    cores, per_core, B = 2, 3, 5
    plen = jnp.asarray([100, 412, 37, 0, 512], jnp.int32)
    dend = jnp.asarray([Pb, Pb + 1, Pb + 128, Pb + 300, Pb + 512], jnp.int32)
    totals, bl, off, lim, flags = jax.tree_util.tree_map(
        np.asarray,
        build_decode_schedule(plen, dend, Pb, S, cores, per_core, B, block),
    )
    plen_c = np.maximum(np.asarray(plen), 1)
    n_p = -(-plen_c // block)
    n_d = -(-(np.asarray(dend) - Pb) // block)
    want_tot = n_p + n_d
    for c in range(cores):
        lanes = [min(c * per_core + i, B - 1) for i in range(per_core)]
        expect = []
        for i_lane, b in enumerate(range(c * per_core, (c + 1) * per_core)):
            if b >= B:
                continue
            for i in range(want_tot[b]):
                is_p = i < n_p[b]
                expect.append((
                    i_lane,
                    i * block if is_p else Pb + (i - n_p[b]) * block,
                    plen_c[b] if is_p else int(dend[b]),
                    (1 if i == 0 else 0) | (2 if i == want_tot[b] - 1 else 0),
                ))
        assert totals[c] == len(expect)
        got = list(zip(bl[c], off[c], lim[c], flags[c]))[: len(expect)]
        assert [tuple(map(int, g)) for g in got] == expect, (c, got, expect)


def test_decode_attention_sched_matches_oracle():
    """v7 at the bench shape (512+128) across decode depths, including
    per-sequence heterogeneous decode ends (continuous batching)."""
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_sched import (
        decode_attention_sched,
    )

    L, B, hq, hkv, S, D, Pb = 3, 3, 16, 8, 640, 128, 512
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D), jnp.float32)
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D), jnp.float32)
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D), jnp.float32)
    plen = jnp.asarray([100, 412, 37], jnp.int32)
    for dend_off in (0, 1, 37, 128):
        dend = jnp.int32(Pb + dend_off)
        out = decode_attention_sched(
            q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb,
            interpret=True,
        )
        ref = _bf16_oracle(q, kall, vall, k_new, v_new, 1, plen, dend, Pb)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-3,
            err_msg=f"dend_off={dend_off}",
        )
    # Heterogeneous per-sequence decode ends.
    dend_b = jnp.asarray([Pb, Pb + 77, Pb + 128], jnp.int32)
    out = decode_attention_sched(
        q, kall, vall, k_new, v_new, jnp.int32(2), plen, dend_b, Pb,
        interpret=True,
    )
    ref = _bf16_oracle(q, kall, vall, k_new, v_new, 2, plen, dend_b, Pb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_decode_attention_sched_batch1():
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_sched import (
        decode_attention_sched,
    )

    L, B, hq, hkv, S, D, Pb = 2, 1, 4, 2, 384, 128, 256
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D))
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D))
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D))
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D))
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D))
    plen = jnp.asarray([90], jnp.int32)
    out = decode_attention_sched(
        q, kall, vall, k_new, v_new, jnp.int32(0), plen, jnp.int32(Pb), Pb,
        interpret=True,
    )
    ref = _bf16_oracle(q, kall, vall, k_new, v_new, 0, plen, jnp.int32(Pb), Pb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_decode_attention_sched_garbage_immunity():
    """Garbage (incl. non-finite) in dead cache regions must not leak."""
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_sched import (
        decode_attention_sched,
    )

    L, B, hq, hkv, S, D, Pb = 2, 2, 4, 2, 640, 128, 512
    rng = jax.random.PRNGKey(9)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D))
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D))
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D))
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D))
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D))
    plen = jnp.asarray([90, 412], jnp.int32)
    dend = jnp.int32(Pb + 10)

    out_a = decode_attention_sched(
        q, kall, vall, k_new, v_new, jnp.int32(1), plen, dend, Pb, interpret=True
    )
    k2 = kall.at[:, 0, :, 90:Pb].set(jnp.inf).at[:, :, :, Pb + 10 :].set(-44.0)
    v2 = vall.at[:, 0, :, 90:Pb].set(-55.0).at[:, :, :, Pb + 10 :].set(44.0)
    k2 = k2.at[:, 1, :, 412:Pb].set(33.0)
    v2 = v2.at[:, 1, :, 412:Pb].set(-33.0)
    out_b = decode_attention_sched(
        q, k2, v2, k_new, v_new, jnp.int32(1), plen, dend, Pb, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_conv_stem_kernel_matches_conv_gelu():
    """Fused conv+bias+GELU stem kernel (interpret) vs lax.conv oracle,
    incl. the real stem's odd spatial sizes."""
    from qwen3_asr_tpu.ops.pallas.experiments.conv_stem import conv_s2_gelu

    rng = jax.random.PRNGKey(11)
    for H, W, C, O in ((64, 50, 16, 8), (32, 25, 8, 16), (10, 9, 4, 4)):
        x = jax.random.normal(jax.random.fold_in(rng, H), (3, H, W, C), jnp.float32)
        w = jax.random.normal(jax.random.fold_in(rng, W), (3, 3, C, O)) * 0.1
        b = jax.random.normal(jax.random.fold_in(rng, C), (O,)) * 0.1
        ref = jax.nn.gelu(
            jax.lax.conv_general_dilated(
                x, w, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b,
            approximate=False,
        )
        out = conv_s2_gelu(x, w, b, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4,
            err_msg=f"H={H} W={W}",
        )


def test_flash_explicit_nondividing_blocks_raise():
    """Explicitly requested block sizes that don't divide T must raise —
    not silently fall back to one (T, T) tile — so tuning sweeps never
    measure a different tiling than requested.  Default blocks still take
    the single-tile fallback."""
    B, hq, hkv, D, T = 1, 2, 1, 64, 520
    rng = jax.random.PRNGKey(11)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, T, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, hkv, T, D), jnp.float32)

    with pytest.raises(ValueError, match="not a multiple"):
        flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)

    out = flash_attention_causal(q, k, v, interpret=True)  # defaults: (T, T)
    ref = causal_oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
