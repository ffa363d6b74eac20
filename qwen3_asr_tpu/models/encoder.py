"""Qwen3-ASR audio encoder (Whisper-style), pure-functional and batched.

Architecture parity with /root/reference/src/qwen3_asr_mlx/encoder.py:21-323:
  * 3x Conv2D(k=3, s=2, p=1) + GELU stem over (mel=128, time=100) chunks,
    480 channels -> flatten (channel-major) -> Linear(7680 -> 1024, no bias);
  * per-chunk sinusoidal positions restarting at 0 every chunk, added before
    padding is handled;
  * 24 pre-norm LayerNorm transformer layers, MHA 16 heads, GELU FFN 4096;
  * block-diagonal attention over 104-token windows (13 tokens/chunk * 8
    chunks per n_window_infer=800 frames);
  * ln_post -> GELU(proj1) -> proj2 to 2048-d audio tokens.

TPU-first differences:
  * Shapes are static: mel arrives padded to a multiple of 800 frames (an
    integer number of attention windows), so every chunk is full and the
    window fold is an exact reshape.  Instead of *stripping* the conv
    outputs of the final partial chunk (encoder.py:288-293), invalid tokens
    are *masked*: because real frames form a prefix of the padded timeline,
    valid tokens form a prefix of the token sequence and window boundaries
    coincide with the reference's — masked attention over the padded layout
    is numerically identical to dense attention over the stripped layout.
  * The layer stack runs under ``lax.scan`` over stacked parameters.
  * Batched over clips from day one (the reference is batch-1,
    encoder.py:249-250).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioEncoderConfig
from ..ops.attention import windowed_self_attention
from ..ops.norms import layer_norm

EncoderParams = dict[str, Any]

_LN_EPS = 1e-5  # MLX nn.LayerNorm default, used by the reference encoder.


@lru_cache(maxsize=4)
def sinusoidal_positions(max_positions: int, d_model: int) -> np.ndarray:
    """Whisper-style sinusoid table, (max_positions, d_model) = [sin | cos].

    Parity: encoder.py:29-40 (log-timescale increment over half the dims).
    """
    half = d_model // 2
    log_timescale = np.log(10_000.0) / (half - 1)
    inv_timescales = np.exp(-np.arange(half, dtype=np.float64) * log_timescale)
    scaled = np.arange(max_positions, dtype=np.float64)[:, None] * inv_timescales
    table = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
    return table.astype(np.float32)


def init_encoder_params(
    cfg: AudioEncoderConfig,
    rng: jax.Array | None = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> EncoderParams:
    """Random (or zero) encoder parameters.

    Conv weights are HWIO (freq, time, in, out); linear weights (in, out).
    """
    L = cfg.encoder_layers
    d = cfg.d_model
    ch = cfg.downsample_hidden_size
    ffn = cfg.encoder_ffn_dim

    shapes = {
        "conv1_w": (3, 3, 1, ch),
        "conv1_b": (ch,),
        "conv2_w": (3, 3, ch, ch),
        "conv2_b": (ch,),
        "conv3_w": (3, 3, ch, ch),
        "conv3_b": (ch,),
        "conv_out": (ch * cfg.freq_after_conv, d),
        "layers": {
            "ln1_w": (L, d), "ln1_b": (L, d),
            "wq": (L, d, d), "bq": (L, d),
            "wk": (L, d, d), "bk": (L, d),
            "wv": (L, d, d), "bv": (L, d),
            "wo": (L, d, d), "bo": (L, d),
            "ln2_w": (L, d), "ln2_b": (L, d),
            "fc1_w": (L, d, ffn), "fc1_b": (L, ffn),
            "fc2_w": (L, ffn, d), "fc2_b": (L, d),
        },
        "ln_post_w": (d,), "ln_post_b": (d,),
        "proj1_w": (d, d), "proj1_b": (d,),
        "proj2_w": (d, cfg.output_dim), "proj2_b": (cfg.output_dim,),
    }

    def make(path, shape):
        name = path[-1]
        if name.endswith("_b") or name.startswith("b"):
            return jnp.zeros(shape, dtype)
        if "ln" in name and name.endswith("_w"):
            return jnp.ones(shape, dtype)
        if rng is None:
            return jnp.zeros(shape, dtype)
        import zlib

        key = jax.random.fold_in(rng, zlib.crc32("/".join(path).encode()))
        return (0.02 * jax.random.normal(key, shape, jnp.float32)).astype(dtype)

    def build(tree, path=()):
        if isinstance(tree, dict):
            return {k: build(v, path + (k,)) for k, v in tree.items()}
        return make(path, tree)

    return build(shapes)


def valid_token_count(cfg: AudioEncoderConfig, n_valid_frames: jax.Array) -> jax.Array:
    """Audio tokens carrying real signal, as a traced computation.

    Full 100-frame chunks contribute ``tokens_per_chunk`` tokens; a trailing
    partial chunk contributes ``conv_output_length(remainder)`` (semantics
    of encoder.py:288-293, evaluated symbolically: (L-1)//2+1 three times,
    which maps 0 -> 0 under floor division).
    """
    chunk = cfg.chunk_frames
    full = n_valid_frames // chunk
    rem = n_valid_frames % chunk
    rem_tokens = rem
    for _ in range(3):
        rem_tokens = (rem_tokens - 1) // 2 + 1
    return full * cfg.tokens_per_chunk + rem_tokens


#: Conv-stem lowering: "conv" (default, lax.conv implicit GEMM) or "taps"
#: (each 3x3 stride-2 conv as 9 shifted strided-slice matmuls — pure MXU
#: GEMMs with K = N = 480; same math, different f32 accumulation order).
#: MEASURED NEGATIVE on v5e (micro_bench.py encoder, B=64), BOTH forms:
#: XLA taps 178.8 ms and the fused Pallas tap-GEMM kernel ("pallas",
#: ops/pallas/experiments/conv_stem.py) 365.3 ms vs lax.conv's 114.6 ms — the taps
#: re-read the activations (9x through HBM, or 9 phase re-fetches per
#: chunk in-kernel) and the per-chunk GEMMs are too small to win the
#: MXU back.  XLA's implicit-GEMM conv stands; both rewrites are kept
#: as documented experiments (docs/PERFORMANCE.md).
CONV_STEM_MODE = __import__("os").environ.get("QWEN3_ASR_CONV_STEM", "conv")


def _conv2d_s2_taps(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 conv as 9 shifted matmuls, (N,H,W,C)->(N,H',W',O).

    out[h, w] = sum_{dy, dx} xpad[2h + dy, 2w + dx] @ k[dy, dx] — each tap
    is a strided slice (relayout) feeding one (N*H'*W', C) x (C, O) GEMM,
    which the MXU runs at full width instead of the conv's small spatial
    tiles.  Identical math to ``lax.conv_general_dilated`` modulo f32
    accumulation order (pinned by tests/test_encoder.py).
    """
    N, H, W, C = x.shape
    Ho, Wo = (H - 1) // 2 + 1, (W - 1) // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (N, dy + 2 * (Ho - 1) + 1, dx + 2 * (Wo - 1) + 1, C),
                (1, 2, 2, 1),
            )
            part = jax.lax.dot_general(
                sl, w[dy, dx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = part if out is None else out + part
    return out.astype(x.dtype)


def _conv_stem(params: EncoderParams, chunks: jax.Array) -> jax.Array:
    """3x strided conv + GELU over (N, mel, time, 1) chunks -> (N, t', flat)."""
    x = chunks
    for i in (1, 2, 3):
        w = params[f"conv{i}_w"].astype(x.dtype)
        if (
            CONV_STEM_MODE == "pallas" and i > 1
            and jax.default_backend() == "tpu"
        ):
            # Fused tap-GEMM kernel (ops/pallas/experiments/conv_stem.py); conv1 has
            # C_in = 1 (no MXU work to win) and keeps lax.conv.
            from ..ops.pallas.experiments.conv_stem import conv_s2_gelu

            x = conv_s2_gelu(x, w, params[f"conv{i}_b"].astype(jnp.float32))
            continue
        if CONV_STEM_MODE == "taps" and i > 1:
            # conv1 has C_in = 1 (K = 9 GEMMs would be VPU-bound); the
            # FLOPs live in conv2/conv3 at 480 x 480.
            x = _conv2d_s2_taps(x, w)
        else:
            x = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(2, 2),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        x = jax.nn.gelu(x + params[f"conv{i}_b"].astype(x.dtype), approximate=False)
    # (N, freq', time', ch) -> channel-major flatten (N, time', ch * freq').
    n, freq, time, ch = x.shape
    x = x.transpose(0, 2, 3, 1).reshape(n, time, ch * freq)
    return x @ params["conv_out"]


def encoder_forward(
    params: EncoderParams,
    cfg: AudioEncoderConfig,
    mel: jax.Array,
    n_valid_frames: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Encode log-mel features to audio tokens.

    Parameters
    ----------
    mel:
        ``(B, n_mels, T)`` float32 with T a multiple of
        ``n_window_infer`` (800); invalid frames must be zero.
    n_valid_frames:
        ``(B,)`` int32 — frames carrying real audio per clip.

    Returns
    -------
    (features, n_valid_tokens):
        ``(B, T // 100 * 13, output_dim)`` audio tokens (invalid tail
        zeroed) and ``(B,)`` valid-token counts.
    """
    B, n_mels, T = mel.shape
    chunk = cfg.chunk_frames
    if T % cfg.n_window_infer:
        raise ValueError(
            f"mel frames {T} must be a multiple of n_window_infer={cfg.n_window_infer}"
        )
    n_chunks = T // chunk
    tpc = cfg.tokens_per_chunk

    compute_dtype = params["conv_out"].dtype
    n_valid_frames = jnp.asarray(n_valid_frames, jnp.int32).reshape(B)

    # (B, n_mels, T) -> (B * n_chunks, n_mels, chunk, 1)
    chunks = mel.reshape(B, n_mels, n_chunks, chunk).transpose(0, 2, 1, 3)
    chunks = chunks.reshape(B * n_chunks, n_mels, chunk, 1).astype(compute_dtype)

    x = _conv_stem(params, chunks)  # (B * n_chunks, tpc, d_model)

    # Per-chunk positions restart at 0 (parity: encoder.py:281-286).
    pe = jnp.asarray(sinusoidal_positions(cfg.max_source_positions, cfg.d_model))
    x = x + pe[None, :tpc, :].astype(compute_dtype)

    tokens = x.reshape(B, n_chunks * tpc, cfg.d_model)
    n_tokens = valid_token_count(cfg, n_valid_frames)  # (B,)
    token_ids = jax.lax.broadcasted_iota(jnp.int32, (B, n_chunks * tpc), 1)
    token_valid = token_ids < n_tokens[:, None]

    window = cfg.window_tokens
    nq = cfg.encoder_attention_heads
    d = cfg.d_model
    hd = d // nq
    scale = hd ** -0.5
    total = n_chunks * tpc

    def layer_fn(h, lp):
        x = layer_norm(h, lp["ln1_w"], lp["ln1_b"], _LN_EPS)
        q = (x @ lp["wq"] + lp["bq"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
        k = (x @ lp["wk"] + lp["bk"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
        v = (x @ lp["wv"] + lp["bv"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
        attn = windowed_self_attention(
            q, k, v, window=window, valid_mask=token_valid, scale=scale
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(B, total, d)
        h = h + attn @ lp["wo"] + lp["bo"]

        x = layer_norm(h, lp["ln2_w"], lp["ln2_b"], _LN_EPS)
        x = jax.nn.gelu(x @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        h = h + x @ lp["fc2_w"] + lp["fc2_b"]
        return h, None

    hidden, _ = jax.lax.scan(layer_fn, tokens, params["layers"])

    hidden = layer_norm(hidden, params["ln_post_w"], params["ln_post_b"], _LN_EPS)
    hidden = jax.nn.gelu(hidden @ params["proj1_w"] + params["proj1_b"], approximate=False)
    features = hidden @ params["proj2_w"] + params["proj2_b"]

    features = jnp.where(token_valid[:, :, None], features, 0.0)
    return features, n_tokens
