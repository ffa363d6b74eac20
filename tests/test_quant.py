"""Int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import RuntimeConfig, TextDecoderConfig
from qwen3_asr_tpu.models.decoder import (
    decoder_forward,
    decoder_logits,
    embed_tokens,
    init_decoder_params,
)
from qwen3_asr_tpu.ops.quant import (
    dequantize_weight,
    qlinear,
    quantize_decoder_params,
    quantize_weight,
    quantized_matmul,
)

TINY = TextDecoderConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    intermediate_size=128,
    vocab_size=512,
)


def test_quantize_roundtrip_accuracy():
    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (64, 128)) * 0.1
    wq = quantize_weight(w)
    assert wq["q"].dtype == jnp.int8
    err = np.abs(np.asarray(dequantize_weight(wq, jnp.float32) - w))
    # Max error bounded by scale/2 per channel.
    bound = np.asarray(wq["s"]) / 2 + 1e-6
    assert np.all(err <= bound[None, :])


def test_qlinear_matches_dequant_matmul():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.fold_in(rng, 0), (4, 64))
    w = jax.random.normal(jax.random.fold_in(rng, 1), (64, 128)) * 0.2
    wq = quantize_weight(w)
    got = np.asarray(qlinear(x, wq))
    want = np.asarray(x @ dequantize_weight(wq, jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_quantized_matmul_kernel_interpret():
    """Pallas kernel (interpret mode) == dequantized matmul."""
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(jax.random.fold_in(rng, 0), (3, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (256, 256)) * 0.1
    wq = quantize_weight(w)
    got = quantized_matmul(
        x.astype(jnp.bfloat16), wq["q"], wq["s"],
        block_n=128, block_k=128, out_dtype=jnp.float32, interpret=True,
    )
    want = x.astype(jnp.bfloat16) @ dequantize_weight(wq)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, np.float32), atol=0.15, rtol=0.05
    )


def test_quantized_decoder_forward_close_to_fp():
    params = init_decoder_params(TINY, jax.random.PRNGKey(3), dtype=jnp.float32)
    qparams = quantize_decoder_params(params)

    ids = jnp.asarray([[1, 2, 3, 4]])
    pos = jnp.arange(4)[None]

    h_fp = embed_tokens(params, ids)
    h_q = embed_tokens(qparams, ids)
    np.testing.assert_allclose(np.asarray(h_fp), np.asarray(h_q), atol=2e-2)

    out_fp, _ = decoder_forward(params, TINY, h_fp, pos)
    out_q, _ = decoder_forward(qparams, TINY, h_q, pos)
    logits_fp = np.asarray(decoder_logits(params, TINY, out_fp))
    logits_q = np.asarray(decoder_logits(qparams, TINY, out_q))
    # Loose numerical agreement; ranking of the top logit usually survives.
    assert np.corrcoef(logits_fp.ravel(), logits_q.ravel())[0, 1] > 0.99


def test_quantized_end_to_end_transcribe():
    from tests.test_api import TINY_CFG, StubTokenizer, sine
    from qwen3_asr_tpu.api import Qwen3ASR

    rt = RuntimeConfig(
        frame_buckets=(800,), token_buckets=(16,), quantization="int8"
    )
    model = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt, dtype=jnp.float32
    )
    res = model.transcribe(sine(1.0), max_tokens=4)
    assert isinstance(res.text, str)
    assert res.duration == pytest.approx(1.0)
