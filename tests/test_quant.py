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


def test_w8a8_matmul_kernel_interpret_matches_jnp():
    """Fused W8A8 Pallas kernel (interpret mode) == the jnp int8-dot path
    bit-for-bit: same per-row quantize rule, same int32 accumulation,
    same f32 (row x col) scale epilogue."""
    from qwen3_asr_tpu.ops.pallas.w8a8_matmul import w8a8_matmul
    from qwen3_asr_tpu.ops.quant import quantize_activations

    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.fold_in(rng, 0), (37, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (256, 384)) * 0.1
    wq = quantize_weight(w)

    got = w8a8_matmul(
        x, wq["q"], wq["s"],
        block_m=16, block_n=128, block_k=128,
        out_dtype=jnp.float32, interpret=True,
    )
    xq, sx = quantize_activations(x)
    acc = jax.lax.dot_general(
        xq, wq["q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    want = acc.astype(jnp.float32) * sx[:, None] * wq["s"][None, :]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_w8a8_matmul_kernel_zero_row():
    """An all-zero activation row must produce zeros (scale guard), and
    the M-padding tail must not leak into real rows."""
    from qwen3_asr_tpu.ops.pallas.w8a8_matmul import w8a8_matmul

    x = jnp.zeros((5, 128), jnp.float32).at[1].set(1.0)
    w = jnp.ones((128, 128), jnp.int8)
    s = jnp.full((128,), 0.01, jnp.float32)
    got = np.asarray(
        w8a8_matmul(
            x, w, s, block_m=8, block_n=128, block_k=128,
            out_dtype=jnp.float32, interpret=True,
        )
    )
    assert got.shape == (5, 128)
    np.testing.assert_array_equal(got[0], 0.0)
    np.testing.assert_allclose(got[1], 127 * (1 / 127) * 0.01 * 128, rtol=1e-6)


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


# ---------------------------------------------------------------------------
# W8A8: dynamic activation quantization for prefill-row matmuls
# ---------------------------------------------------------------------------


def test_act_quant_context_gates_by_rows():
    """Inside act_quant_rows(min_rows), only matmuls with >= min_rows
    flattened rows take the int8-dot path; below it the graph is the
    weight-only one (bitwise-identical output to no context)."""
    from qwen3_asr_tpu.ops.quant import act_quant_rows

    rng = jax.random.PRNGKey(4)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (64, 128)) * 0.2
    wq = quantize_weight(w)
    x_small = jax.random.normal(jax.random.fold_in(rng, 2), (4, 64))
    x_big = jax.random.normal(jax.random.fold_in(rng, 3), (16, 64))

    base_small = np.asarray(qlinear(x_small, wq))
    base_big = np.asarray(qlinear(x_big, wq))
    with act_quant_rows(8):
        got_small = np.asarray(qlinear(x_small, wq))
        got_big = np.asarray(qlinear(x_big, wq))
    # Below the gate: identical graph, identical bits.
    np.testing.assert_array_equal(got_small, base_small)
    # At/above the gate: the int8 dot differs in the rounding tail but
    # stays numerically close.
    assert not np.array_equal(got_big, base_big)
    np.testing.assert_allclose(got_big, base_big, atol=0.05, rtol=0.05)


def test_act_quant_exact_on_grid_inputs():
    """Activations already on the int8 grid survive W8A8 exactly:
    x rows = (ints in [-127, 127]) * row_scale and weights on their own
    grid make the quantize a bit-exact identity, so the int8 dot equals
    the f32 matmul."""
    from qwen3_asr_tpu.ops.quant import act_quant_rows

    rng = np.random.default_rng(0)
    xi = rng.integers(-127, 128, (8, 32)).astype(np.float32)
    xi[:, 0] = 127.0  # pin each row's absmax so scale = 1/127 * 127 = 1.0
    x = jnp.asarray(xi)
    wi = rng.integers(-127, 128, (32, 16)).astype(np.float32)
    wi[0, :] = 127.0  # per-channel absmax -> scale 1.0
    wq = {"q": jnp.asarray(wi.astype(np.int8)),
          "s": jnp.ones((16,), jnp.float32)}
    with act_quant_rows(1):
        got = np.asarray(qlinear(x, wq, out_dtype=jnp.float32))
    want = xi @ wi
    np.testing.assert_array_equal(got, want)


def test_act_quant_prefill_close_to_weight_only():
    """Tiny decoder: W8A8 prefill logits track the weight-only int8
    prefill closely (the extra activation rounding is the only delta)."""
    from qwen3_asr_tpu.ops.quant import act_quant_rows

    params = init_decoder_params(TINY, jax.random.PRNGKey(5), dtype=jnp.float32)
    qparams = quantize_decoder_params(params)
    ids = jnp.arange(1, 17)[None]  # (1, 16) rows >= gate below
    pos = jnp.arange(16)[None]
    h = embed_tokens(qparams, ids)

    out_w, _ = decoder_forward(qparams, TINY, h, pos)
    with act_quant_rows(8):
        out_a, _ = decoder_forward(qparams, TINY, h, pos)
    logits_w = np.asarray(decoder_logits(qparams, TINY, out_w))
    logits_a = np.asarray(decoder_logits(qparams, TINY, out_a))
    assert not np.array_equal(logits_a, logits_w)
    assert np.corrcoef(logits_w.ravel(), logits_a.ravel())[0, 1] > 0.995


def test_act_quant_end_to_end_transcribe():
    """Full API path with quantization="int8" + act_quant="int8"."""
    from tests.test_api import TINY_CFG, StubTokenizer, sine
    from qwen3_asr_tpu.api import Qwen3ASR

    rt = RuntimeConfig(
        frame_buckets=(800,), token_buckets=(16,), quantization="int8",
        act_quant="int8", act_quant_min_rows=8,
    )
    model = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt, dtype=jnp.float32
    )
    res = model.transcribe(sine(1.0), max_tokens=4)
    assert isinstance(res.text, str)
    assert res.duration == pytest.approx(1.0)


def test_quantized_encoder_forward_close_to_fp():
    """W8A8-quantized encoder (weights int8, act-quant context enabled by
    the quantized weights themselves) tracks the fp forward closely."""
    from tests.test_encoder import TINY as ENC_TINY
    from qwen3_asr_tpu.models.encoder import (
        encoder_forward,
        init_encoder_params,
    )
    from qwen3_asr_tpu.ops.quant import quantize_encoder_params

    params = init_encoder_params(ENC_TINY, jax.random.PRNGKey(7), dtype=jnp.float32)
    qparams = quantize_encoder_params(params)
    assert {"q", "s"} == set(qparams["layers"]["wq"].keys())
    assert {"q", "s"} == set(qparams["conv_out"].keys())

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 128, 800)).astype(np.float32) * 0.1)
    nvf = jnp.asarray([800], jnp.int32)
    feats_fp, n_fp = encoder_forward(params, ENC_TINY, mel, nvf)
    feats_q, n_q = encoder_forward(qparams, ENC_TINY, mel, nvf)
    assert int(n_fp[0]) == int(n_q[0])
    a, b = np.asarray(feats_fp).ravel(), np.asarray(feats_q).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_quantized_encoder_sharding_rules():
    """Quantized encoder leaves (incl. 2-D top-level linears) get valid
    NamedShardings under a (dp, tp) mesh."""
    from tests.test_encoder import TINY as ENC_TINY
    from qwen3_asr_tpu.models.encoder import init_encoder_params
    from qwen3_asr_tpu.ops.quant import quantize_encoder_params
    from qwen3_asr_tpu.parallel.mesh import make_mesh
    from qwen3_asr_tpu.parallel.sharding import (
        encoder_param_sharding,
        shard_params,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    params = quantize_encoder_params(
        init_encoder_params(ENC_TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    )
    mesh = make_mesh(dp=1, tp=2)
    shardings = encoder_param_sharding(params, mesh)
    placed = shard_params(params, shardings)
    # Column-parallel stacked weight shards its output axis; the 2-D
    # conv_out scale follows the sharded output axis.
    assert placed["layers"]["fc1_w"]["q"].sharding.spec == (None, None, "tp")
    assert placed["conv_out"]["q"].sharding.spec == (None, "tp")
    assert placed["conv_out"]["s"].sharding.spec == ("tp",)
