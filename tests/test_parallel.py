"""Multi-chip SPMD tests on the 8-device virtual CPU mesh.

Oracles: sharded execution must be numerically equivalent to single-device
execution (tp and dp), and the training dryrun must run end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import TextDecoderConfig
from qwen3_asr_tpu.models.decoder import (
    decoder_forward,
    decoder_logits,
    embed_tokens,
    init_decoder_params,
)
from qwen3_asr_tpu.parallel.mesh import make_mesh
from qwen3_asr_tpu.parallel.sharding import (
    decoder_param_sharding,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
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


def _forward_logits(params, ids):
    h = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1])[None], ids.shape)
    out, _ = decoder_forward(params, TINY, h, pos)
    return decoder_logits(params, TINY, out)


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(3, 2, devices=jax.devices()[:4])


def test_tp_sharded_forward_matches_single_device():
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.asarray([[1, 5, 9, 200]])

    ref = np.asarray(jax.jit(_forward_logits)(params, ids))

    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    sharded = shard_params(params, decoder_param_sharding(params, mesh))
    got = np.asarray(jax.jit(_forward_logits)(sharded, ids))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_tp4_sharded_forward_matches_single_device():
    params = init_decoder_params(TINY, jax.random.PRNGKey(1), dtype=jnp.float32)
    ids = jnp.asarray([[3, 7, 11]])
    ref = np.asarray(jax.jit(_forward_logits)(params, ids))

    # tp=2 is the max that divides this tiny model's 2 KV heads; use dp*tp mesh
    # to exercise a 2-D mesh with a replicated batch.
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    sharded = shard_params(params, decoder_param_sharding(params, mesh))
    got = np.asarray(jax.jit(_forward_logits)(sharded, ids))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_dryrun_multichip_entrypoint():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_train_step_loss_decreases():
    """Two sharded train steps on a fixed batch must reduce the loss."""
    import optax

    from qwen3_asr_tpu.config import AudioEncoderConfig, ModelConfig
    from qwen3_asr_tpu.models.encoder import init_encoder_params
    from qwen3_asr_tpu.training.train import (
        Batch,
        init_train_state,
        make_train_step,
    )

    cfg = ModelConfig(
        audio_encoder=AudioEncoderConfig(
            d_model=32,
            encoder_layers=1,
            encoder_attention_heads=4,
            encoder_ffn_dim=64,
            output_dim=64,
            downsample_hidden_size=8,
        ),
        text_decoder=TINY,
    )
    rng = jax.random.PRNGKey(0)
    enc = init_encoder_params(cfg.audio_encoder, rng, dtype=jnp.float32)
    dec = init_decoder_params(cfg.text_decoder, rng, dtype=jnp.float32)

    optimizer = optax.adam(1e-3)
    state = init_train_state(cfg, optimizer, enc, dec)
    step = jax.jit(make_train_step(cfg, optimizer))

    B, frames, P, n_audio = 2, 800, 144, 104
    rngn = np.random.default_rng(0)
    mask = np.zeros((B, P), bool)
    mask[:, 9 + n_audio :] = True
    batch = Batch(
        mel=jnp.asarray(rngn.standard_normal((B, 128, frames)).astype(np.float32) * 0.1),
        n_valid_frames=jnp.full((B,), frames, jnp.int32),
        input_ids=jnp.full((B, P), 7, jnp.int32),
        n_audio=jnp.full((B,), n_audio, jnp.int32),
        labels=jnp.full((B, P), 11, jnp.int32),
        label_mask=jnp.asarray(mask),
    )

    state, loss0 = step(state, batch)
    state, loss1 = step(state, batch)
    state, loss2 = step(state, batch)
    assert float(loss2) < float(loss0)
    assert np.isfinite(float(loss0))


def test_tp_inference_matches_single_device():
    """Qwen3ASR with tp=2 sharded params == single-device transcribe."""
    import jax.numpy as jnp

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import RuntimeConfig
    from tests.test_api import TINY_CFG, StubTokenizer, sine

    rt1 = RuntimeConfig(frame_buckets=(800,), token_buckets=(16,))
    rt2 = RuntimeConfig(frame_buckets=(800,), token_buckets=(16,), dp=1, tp=2)
    m1 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt1, dtype=jnp.float32
    )
    m2 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt2, dtype=jnp.float32
    )
    clip = sine(1.0, 350.0)
    r1 = m1.transcribe(clip, max_tokens=6)
    r2 = m2.transcribe(clip, max_tokens=6)
    assert r1.text == r2.text


def test_tp_continuous_paged_serving_matches_single_device():
    """BASELINE config 5 composition: continuous-batched serving with the
    paged-KV engine on a tp=2 mesh == single-device output (the mesh
    routes decode through the GSPMD-shardable XLA paths via set_spmd)."""
    import jax.numpy as jnp

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import RuntimeConfig
    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer
    from tests.test_api import TINY_CFG, StubTokenizer, sine

    rt1 = RuntimeConfig(frame_buckets=(800,), token_buckets=(16, 128))
    rt2 = RuntimeConfig(
        frame_buckets=(800,), token_buckets=(16, 128), dp=1, tp=2
    )
    m1 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt1, dtype=jnp.float32
    )
    clips = [sine(1.0, 350.0), sine(0.5, 500.0), sine(1.5, 260.0)]
    direct = [m1.transcribe(c, max_tokens=5) for c in clips]

    m2 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt2, dtype=jnp.float32
    )
    with ContinuousTranscriptionServer(
        m2, n_slots=4, max_duration=8.0, max_new_tokens=128,
        chunk_steps=4, paged=True,
    ) as srv:
        futs = [srv.submit(c, max_tokens=5) for c in clips]
        results = [f.result(timeout=300) for f in futs]
    for d, r in zip(direct, results):
        assert d.text == r.text


def test_tp_decode_kernel_path_matches_xla(monkeypatch):
    """shard_map-wrapped v5 kernel + row writers under a tp=2 mesh must
    match the single-device XLA decode path (VERDICT r2 item 3: tp>1 no
    longer downgrades Pallas kernels).  D=128 so the kernel shape gate is
    live; interpret-mode Pallas on the virtual CPU mesh."""
    from qwen3_asr_tpu.models.decoder import init_kv_cache, set_spmd

    cfg = TextDecoderConfig(
        hidden_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=128,
        intermediate_size=256,
        vocab_size=512,
    )
    B, pbucket, S = 2, 128, 256
    params = init_decoder_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    kv0 = init_kv_cache(cfg, B, S, jnp.float32)
    kv = tuple(
        jnp.asarray(rng.standard_normal(c.shape), jnp.float32) * 0.3
        for c in kv0
    )
    embeds = jnp.asarray(rng.standard_normal((B, 1, 256)), jnp.float32) * 0.2
    plen = jnp.asarray([100, 80], jnp.int32)
    step = 5
    dend = jnp.int32(pbucket + step)
    positions = (plen + step)[:, None]
    write_slots = jnp.full((B,), pbucket + step, jnp.int32)

    def fwd(params, embeds, kv):
        return decoder_forward(
            params, cfg, embeds, positions, kv,
            write_slots=write_slots, uniform_write=True,
            decode_ctx=(plen, dend, pbucket),
        )

    set_spmd(False)
    ref_h, (ref_k, ref_v) = jax.jit(fwd)(params, embeds, kv)

    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    sharded = shard_params(params, decoder_param_sharding(params, mesh))
    monkeypatch.setenv("QWEN3_ASR_SPMD_KERNELS", "interpret")
    set_spmd(True, mesh)
    try:
        got_h, (got_k, got_v) = jax.jit(fwd)(sharded, embeds, kv)
        got_h, got_k, got_v = map(np.asarray, (got_h, got_k, got_v))
    finally:
        set_spmd(False)
    np.testing.assert_allclose(got_h, np.asarray(ref_h), atol=2e-3)
    np.testing.assert_allclose(got_k, np.asarray(ref_k), atol=2e-3)
    np.testing.assert_allclose(got_v, np.asarray(ref_v), atol=2e-3)


def test_int8_params_shard_on_mesh():
    """int8 {"q","s"} trees get Megatron shardings (r2: int8 x mesh were
    mutually exclusive) and the sharded quantized forward still matches
    the unsharded quantized forward."""
    from qwen3_asr_tpu.ops.quant import quantize_decoder_params

    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_decoder_params(params)
    ids = jnp.asarray([[1, 5, 9, 200]])
    ref = np.asarray(jax.jit(_forward_logits)(qparams, ids))

    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    shardings = decoder_param_sharding(qparams, mesh)
    # Column-parallel weight: q shards its out axis, s follows.
    wq = shardings["layers"]["wq"]
    assert wq["q"].spec == jax.sharding.PartitionSpec(None, None, "tp")
    assert wq["s"].spec == jax.sharding.PartitionSpec(None, "tp")
    # Row-parallel weight: s replicated.
    wo = shardings["layers"]["wo"]
    assert wo["s"].spec == jax.sharding.PartitionSpec(None, None)
    emb = shardings["embedding"]
    assert emb["q"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert emb["s"].spec == jax.sharding.PartitionSpec("tp")

    sharded = shard_params(qparams, shardings)
    got = np.asarray(jax.jit(_forward_logits)(sharded, ids))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_int8_tp_end_to_end_transcribe():
    """Qwen3ASR(int8, tp=2) == Qwen3ASR(int8, single device)."""
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import RuntimeConfig
    from tests.test_api import TINY_CFG, StubTokenizer, sine

    rt1 = RuntimeConfig(
        frame_buckets=(800,), token_buckets=(16,), quantization="int8"
    )
    rt2 = RuntimeConfig(
        frame_buckets=(800,), token_buckets=(16,), quantization="int8",
        dp=1, tp=2,
    )
    m1 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt1, dtype=jnp.float32
    )
    clip = sine(1.0, 350.0)
    r1 = m1.transcribe(clip, max_tokens=6)
    m2 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt2, dtype=jnp.float32
    )
    r2 = m2.transcribe(clip, max_tokens=6)
    assert r1.text == r2.text


def test_w8a8_tp_end_to_end_transcribe():
    """Qwen3ASR(W8A8, tp=2) == Qwen3ASR(W8A8, single device) — pins the
    quant x parallel matrix end to end (VERDICT r4 item 7): dynamic int8
    activation quantization happens per shard AFTER the column split, so
    the sharded int8-MXU dots must still reduce to the single-device
    tokens.  act_quant_min_rows=1 forces the int8-dot lowering even at
    these tiny prefill shapes."""
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import RuntimeConfig
    from tests.test_api import TINY_CFG, StubTokenizer, sine

    kw = dict(
        frame_buckets=(800,), token_buckets=(16,), quantization="int8",
        act_quant="int8", act_quant_min_rows=1,
    )
    m1 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(),
        runtime=RuntimeConfig(**kw), dtype=jnp.float32,
    )
    clip = sine(1.0, 350.0)
    r1 = m1.transcribe(clip, max_tokens=6)
    m2 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(),
        runtime=RuntimeConfig(dp=1, tp=2, **kw), dtype=jnp.float32,
    )
    r2 = m2.transcribe(clip, max_tokens=6)
    assert r1.text == r2.text
