"""int8 KV-cache tests (ops/quant_kv.py + decoder/generator integration).

Covers: quantization round-trip error bound, the XLA-fallback decode path
against a manually dequantized dense cache (exact equality — both paths
compute over identical values), the Pallas q8 kernel in interpret mode
against the dequantized-cache oracle, and end-to-end token parity of the
tiny-model greedy decode between bf16 and int8 caches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import RuntimeConfig, TextDecoderConfig
from qwen3_asr_tpu.models.decoder import (
    decoder_forward,
    init_decoder_params,
)
from qwen3_asr_tpu.ops.quant_kv import (
    dequantize_kv,
    is_quantized_kv,
    kv_seq_len,
    kv_spec,
    quantize_kv,
    quantize_kv_cache,
)
from qwen3_asr_tpu.runtime.generate import Generator

TINY = TextDecoderConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    intermediate_size=128,
    vocab_size=512,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 2, 5, 7, 16)) * 3.0, jnp.float32)
    qc = quantize_kv(x)
    assert qc["q"].dtype == jnp.int8
    assert qc["s"].shape == x.shape[:-1]
    deq = dequantize_kv(qc, jnp.float32)
    # Per-row error bound: half a quantization step (s/2) per element.
    err = np.abs(np.asarray(deq - x))
    bound = np.broadcast_to(
        np.asarray(qc["s"])[..., None] * 0.5 + 1e-6, err.shape
    )
    np.testing.assert_array_less(err, bound)


def test_quantize_zero_rows_and_helpers():
    x = jnp.zeros((1, 1, 1, 4, 8), jnp.float32)
    qc = quantize_kv(x)
    assert np.all(np.asarray(qc["s"]) == 1.0)       # no div-by-zero scale
    assert np.all(np.asarray(dequantize_kv(qc)) == 0)
    assert is_quantized_kv(qc) and not is_quantized_kv(x)
    assert kv_seq_len(qc) == 4 and kv_seq_len(x) == 4
    assert kv_spec(qc) != kv_spec(x)
    assert hash(kv_spec(qc)) is not None            # usable in cache keys


def _decode_step(params, cache, B, S, Pb):
    """One split-attention decode step over the given cache."""
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.standard_normal((B, 1, TINY.hidden_size)), jnp.float32)
    pos = jnp.full((B, 1), Pb, jnp.int32)
    plen = jnp.asarray([3, Pb - 2][:B], jnp.int32)
    return decoder_forward(
        params, TINY, h, pos, cache,
        write_slots=jnp.full((B,), Pb, jnp.int32),
        uniform_write=True,
        decode_ctx=(plen, jnp.int32(Pb), Pb),
    )


def test_xla_decode_path_matches_dequantized_dense():
    """The int8 XLA fallback must equal a bf16-path run over the manually
    dequantized cache EXACTLY (same values through the same einsums)."""
    B, S, Pb = 2, 12, 8
    params = init_decoder_params(TINY, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    shape = (TINY.num_hidden_layers, B, TINY.num_key_value_heads, S, TINY.head_dim)
    keys = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    values = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    kq, vq = quantize_kv_cache((keys, values))
    h_q8, kv_q8 = _decode_step(params, (kq, vq), B, S, Pb)
    dense = (
        dequantize_kv(kq, jnp.float32),
        dequantize_kv(vq, jnp.float32),
    )
    h_ref, kv_ref = _decode_step(params, dense, B, S, Pb)
    np.testing.assert_allclose(
        np.asarray(h_q8), np.asarray(h_ref), atol=1e-5, rtol=1e-5
    )
    # Fresh rows were re-quantized on write: slot Pb holds int8 data whose
    # dequantization matches the dense path's written bf16 rows to one
    # quantization step.
    assert is_quantized_kv(kv_q8[0])
    wrote = dequantize_kv(
        {"q": kv_q8[0]["q"][:, :, :, Pb], "s": kv_q8[0]["s"][:, :, :, Pb]},
        jnp.float32,
    )
    ref_rows = np.asarray(kv_ref[0][:, :, :, Pb])
    err = np.abs(np.asarray(wrote) - ref_rows)
    step = np.broadcast_to(
        np.asarray(kv_q8[0]["s"][:, :, :, Pb])[..., None] * 0.5 + 1e-6,
        err.shape,
    )
    np.testing.assert_array_less(err, step)


def test_q8_kernel_interpret_matches_dequant_oracle():
    """decode_attention_hbm4_q8 (interpret) vs the bf16 kernel run on the
    dequantized cache — identical math modulo bf16 rounding."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm4 import (
        decode_attention_hbm4,
        decode_attention_hbm4_q8,
    )

    L, B, hq, hkv, S, D, Pb = 2, 3, 4, 2, 640, 128, 512
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(jax.random.fold_in(rng, 1), (L, B, hkv, S, D))
    vall = jax.random.normal(jax.random.fold_in(rng, 2), (L, B, hkv, S, D))
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D))
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D))
    plen = jnp.asarray([100, 412, 37], jnp.int32)
    kq, vq = quantize_kv(kall), quantize_kv(vall)

    for dend_off in (0, 1, 37):
        dend = jnp.int32(Pb + dend_off)
        out = decode_attention_hbm4_q8(
            q, kq, vq, k_new, v_new, jnp.int32(1), plen, dend, Pb,
            interpret=True,
        )
        ref = decode_attention_hbm4(
            q, dequantize_kv(kq, jnp.float32), dequantize_kv(vq, jnp.float32),
            k_new, v_new, jnp.int32(1), plen, dend, Pb, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-3,
            err_msg=f"dend_off={dend_off}",
        )


def _tiny_features(n_audio, total=8, hidden=64, seed=11):
    rng = np.random.default_rng(seed)
    f = np.zeros((1, total, hidden), np.float32)
    f[:, :n_audio] = rng.standard_normal((1, n_audio, hidden)) * 0.5
    return jnp.asarray(f)


def _tiny_prompt(n_audio):
    from qwen3_asr_tpu.tokenizer import build_prompt

    return [t % TINY.vocab_size for t in build_prompt(n_audio, language_name_tokens=[77])]


@pytest.mark.parametrize("temperature", [0.0, 0.7])
def test_generator_int8_cache_token_parity(temperature):
    """Tiny-model decode with kv_cache_dtype="int8" produces the same
    token stream as bf16 (the tiny model's logit gaps dwarf the ~0.4%
    quantization noise; both runs are deterministic)."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    feats = _tiny_features(4)
    ids = _tiny_prompt(4)
    outs = {}
    for dtype in ("bf16", "int8"):
        rt = RuntimeConfig(token_buckets=(32, 64), kv_cache_dtype=dtype)
        gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
        outs[dtype] = gen.generate(
            feats, 4, ids, max_tokens=8, temperature=temperature, seed=3,
            top_k=8,
        )
    assert outs["bf16"] == outs["int8"]


def test_generator_int8_cache_is_actually_quantized():
    """The int8 config must route through quantize_kv_cache (guard against
    a silent bf16 fallback)."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(token_buckets=(32, 64), kv_cache_dtype="int8")
    gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
    called = {}
    orig = gen._quantize_cache

    def spy(kv):
        out = orig(kv)
        called["quantized"] = all(is_quantized_kv(c) for c in out)
        return out

    gen._quantize_cache = spy
    gen.generate(_tiny_features(4), 4, _tiny_prompt(4), max_tokens=4)
    assert called.get("quantized") is True
