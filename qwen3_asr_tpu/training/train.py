"""ASR fine-tuning: end-to-end (encoder + decoder) training step.

The reference is inference-only; this is a TPU-native capability extension
and the canonical multi-chip program for the framework: one jitted step =
mel -> encoder -> feature injection -> decoder -> causal LM loss -> grads
-> optimizer update, SPMD over a (dp, tp) mesh via parameter sharding
annotations (see ``qwen3_asr_tpu/parallel/sharding.py``).

Batch layout: every sample is a right-padded prompt of bucketed length P
holding the standard chat template with audio-pad placeholders at slots
[9, 9 + n_audio); ``labels`` carries the next-token target at each position
and ``label_mask`` selects the positions that contribute to the loss
(typically the transcription span of the assistant turn).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models.decoder import decoder_forward, decoder_logits, embed_tokens
from ..models.encoder import encoder_forward

_AUDIO_OFFSET = 9  # chat-template prefix length (tokenizer.PROMPT_PREFIX)


class TrainState(NamedTuple):
    encoder: Any
    decoder: Any
    opt_state: Any
    step: jax.Array


class Batch(NamedTuple):
    mel: jax.Array            # (B, n_mels, T) float32, zero-padded
    n_valid_frames: jax.Array  # (B,) int32
    input_ids: jax.Array      # (B, P) int32, audio pads at [9, 9+n_audio)
    n_audio: jax.Array        # (B,) int32 valid audio tokens per sample
    labels: jax.Array         # (B, P) int32 next-token targets
    label_mask: jax.Array     # (B, P) bool — positions that count


def asr_loss(
    enc_params,
    dec_params,
    cfg: ModelConfig,
    batch: Batch,
) -> jax.Array:
    """Masked next-token cross-entropy over the full speech-to-text graph."""
    features, _ = encoder_forward(
        enc_params, cfg.audio_encoder, batch.mel, batch.n_valid_frames
    )

    B, P = batch.input_ids.shape
    embeds = embed_tokens(dec_params, batch.input_ids)
    injected = jnp.zeros_like(embeds)
    take = min(features.shape[1], P - _AUDIO_OFFSET)
    injected = jax.lax.dynamic_update_slice(
        injected, features[:, :take].astype(embeds.dtype), (0, _AUDIO_OFFSET, 0)
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    is_audio = (slot >= _AUDIO_OFFSET) & (slot < _AUDIO_OFFSET + batch.n_audio[:, None])
    embeds = jnp.where(is_audio[:, :, None], injected, embeds)

    # attn_impl="causal" explicitly: the "auto" route selects the Pallas
    # flash kernel on TPU whenever the prompt bucket is a multiple of 256
    # (which the runtime's bucketing guarantees), and pallas_call has no
    # VJP — value_and_grad over the step would fail on real TPU training.
    hidden, _ = decoder_forward(
        dec_params, cfg.text_decoder, embeds, slot, attn_impl="causal"
    )
    logits = decoder_logits(dec_params, cfg.text_decoder, hidden)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, batch.labels[..., None], axis=-1)[..., 0]
    mask = batch.label_mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(cfg: ModelConfig, optimizer: optax.GradientTransformation):
    """Build the jittable SPMD train step: (state, batch) -> (state, loss).

    Gradients follow the parameter shardings; under a (dp, tp) mesh GSPMD
    emits the dp-axis psum for gradients and the tp-axis collectives for the
    row/column-parallel matmuls automatically.
    """

    def step(state: TrainState, batch: Batch):
        def loss_fn(enc_params, dec_params):
            return asr_loss(enc_params, dec_params, cfg, batch)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.encoder, state.decoder
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, (state.encoder, state.decoder)
        )
        enc_up, dec_up = updates
        new_enc = optax.apply_updates(state.encoder, enc_up)
        new_dec = optax.apply_updates(state.decoder, dec_up)
        return TrainState(new_enc, new_dec, opt_state, state.step + 1), loss

    return step


def init_train_state(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    enc_params,
    dec_params,
) -> TrainState:
    return TrainState(
        encoder=enc_params,
        decoder=dec_params,
        opt_state=optimizer.init((enc_params, dec_params)),
        step=jnp.zeros((), jnp.int32),
    )
