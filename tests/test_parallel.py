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
