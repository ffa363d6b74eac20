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
from ..ops.quant import act_quant_rows, is_quantized, qlinear

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


#: Conv-stem lowering:
#:   "conv"   — default: per-chunk lax.conv implicit GEMM.
#:   "taps"   — each 3x3 stride-2 conv as 9 shifted strided-slice matmuls.
#:   "pallas" — fused tap-GEMM kernel (ops/pallas/experiments/conv_stem).
#:   "merged" — round-4 structural rewrite: all of a clip's chunks run as
#:              ONE wide image per conv with zero guard bands between
#:              chunks on the time axis (stride-2-aligned), amortizing
#:              the per-chunk (25, 13)-length spatial tails across the
#:              whole clip; math identical to per-chunk convs because
#:              guard positions read only zeros (proof in
#:              _conv_stem_merged, pinned by tests/test_encoder.py).
#:   "c512"   — channels padded 480 -> 512 (4 x 128 lanes exactly) with
#:              zero weights/biases; extra channels stay zero through
#:              GELU and are sliced off before the flatten.
#:   "merged512" — both.
#: ALL FOUR rewrites are MEASURED NEGATIVE on v5e (micro_bench.py
#: encoder, B=64, conv-stem device ms): lax.conv per-chunk baseline
#: 118.3; round 3: XLA taps 178.8, Pallas tap-GEMM 365.3 (activations
#: re-read 9x through HBM); round 4: merged 169.3 (the wide image adds
#: guard-band compute and a worse layout for XLA's implicit GEMM),
#: c512 131.8 (XLA already pads 480->512 lanes internally; explicit
#: padding just adds real FLOPs), merged512 171.0.  XLA's per-chunk
#: implicit-GEMM conv
#: stands as the production default; the variants remain env-gated,
#: equivalence-tested engineering record (docs/PERFORMANCE.md).
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


def _pad_channels(params: EncoderParams, to: int = 512) -> EncoderParams:
    """Conv weights/biases zero-padded on the channel axes to ``to``.

    480 channels = 3.75 x 128 lanes — every conv tile carries a ragged
    tail.  Zero-padded channels contribute zero through conv + bias +
    GELU (gelu(0) = 0), so activations in the pad lanes stay exactly
    zero layer to layer; the flatten slices them off.  Pure re-layout,
    identical math.
    """
    ch = params["conv1_w"].shape[-1]
    pad = to - ch
    if pad <= 0:
        return params
    out = dict(params)
    out["conv1_w"] = jnp.pad(params["conv1_w"], ((0, 0),) * 3 + ((0, pad),))
    for i in (2, 3):
        out[f"conv{i}_w"] = jnp.pad(
            params[f"conv{i}_w"], ((0, 0), (0, 0), (0, pad), (0, pad))
        )
    for i in (1, 2, 3):
        out[f"conv{i}_b"] = jnp.pad(params[f"conv{i}_b"], ((0, pad),))
    return out


def conv_stem(
    params: EncoderParams, chunks: jax.Array, n_chunks: int
) -> jax.Array:
    """Mode-dispatched conv stem (CONV_STEM_MODE): (B * n_chunks, mel,
    chunk, 1) -> (B * n_chunks, tokens_per_chunk, d_model)."""
    mode = CONV_STEM_MODE
    n_ch = params["conv1_w"].shape[-1]
    if "512" in mode and n_ch <= 512:
        conv_p = _pad_channels(params, 512)
        conv_p["conv_out"] = params["conv_out"]
        keep = n_ch
    else:
        conv_p, keep = params, None
    if mode.startswith("merged"):
        return _conv_stem_merged(conv_p, chunks, n_chunks, keep_ch=keep)
    return _conv_stem(conv_p, chunks, keep_ch=keep)


def _conv_stem_merged(
    params: EncoderParams, chunks: jax.Array, n_chunks: int,
    keep_ch: int | None = None,
) -> jax.Array:
    """Guard-band merged-time conv stem — identical math, wide images.

    Per-chunk convs give XLA (B * n_chunks) tiny images whose odd time
    lengths (50 -> 25 -> 13) leave ragged tile tails in every row.  Here
    each conv runs over ONE (B, freq, n_chunks * P) image in which every
    chunk occupies an EVEN-offset segment ``[0, chunk, 0...]`` (P even),
    so with VALID time padding and stride 2:

      * in-chunk outputs read exactly the reference's pad-1 windows
        (out[j] reads segment[2j .. 2j+2], segment[0] being the zero the
        per-chunk conv's padding would supply);
      * the one junk output per chunk reads only the chunk's own last
        element and guard zeros — never a neighbor — and is sliced off
        before it feeds the next layer.

    Token identity with the per-chunk stem is pinned by
    tests/test_encoder.py (same op, same accumulation structure).
    """
    N, n_mels, t, _ = chunks.shape
    M = n_chunks
    B = N // M

    def conv_valid_time(x, i):
        # Freq keeps the normal pad-1; time guards are embedded.  The +1
        # trailing zero makes the output length exactly (P//2) * M.
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
        x = jax.lax.conv_general_dilated(
            x, params[f"conv{i}_w"].astype(x.dtype),
            window_strides=(2, 2), padding=((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.gelu(
            x + params[f"conv{i}_b"].astype(x.dtype), approximate=False
        )

    # (B*M, mel, t, 1) -> (B, mel, M, t, 1)
    x = chunks.reshape(B, M, n_mels, t, 1).transpose(0, 2, 1, 3, 4)
    for i in (1, 2, 3):
        # Guard-band insert: [0, chunk(t), 0, ...] padded to even P.
        P = t + 2 + (t % 2)
        x = jnp.pad(x, ((0, 0),) * 3 + ((1, P - t - 1), (0, 0)))
        f = x.shape[1]
        x = x.reshape(B, f, M * P, x.shape[-1])
        x = conv_valid_time(x, i)                  # (B, f', M * P//2, ch)
        valid = (t - 1) // 2 + 1
        x = x.reshape(B, x.shape[1], M, P // 2, x.shape[-1])[
            :, :, :, :valid, :
        ]
        t = valid
    # (B, f, M, tpc, ch) -> channel-major flatten (B*M, tpc, ch * f).
    if keep_ch is not None:
        x = x[..., :keep_ch]
    Bf, f, _, tpc, ch = x.shape
    x = x.transpose(0, 2, 3, 4, 1).reshape(B * M, tpc, ch * f)
    return qlinear(x, params["conv_out"])


def _conv_stem(
    params: EncoderParams, chunks: jax.Array, keep_ch: int | None = None
) -> jax.Array:
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
    if keep_ch is not None:
        x = x[..., :keep_ch]
    n, freq, time, ch = x.shape
    x = x.transpose(0, 2, 3, 1).reshape(n, time, ch * freq)
    return qlinear(x, params["conv_out"])


#: Row gate for the encoder's W8A8 matmuls (see ops/quant.py).  Real
#: encoder shapes flatten to thousands of rows (B * tokens); only tiny
#: test configs fall below this and keep the weight-only lowering.
_ACT_QUANT_ENC_MIN_ROWS = 256


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

    Quantized (``{"q", "s"}``) layer weights — produced only by the
    W8A8 prefill mode (RuntimeConfig.act_quant="int8",
    ops/quant.py:quantize_encoder_params) — enable the int8-MXU
    activation-quant context for the whole forward; plain bf16 weights
    trace the exact unquantized graph.
    """
    if is_quantized(params["layers"]["wq"]):
        with act_quant_rows(_ACT_QUANT_ENC_MIN_ROWS):
            return _encoder_forward_impl(params, cfg, mel, n_valid_frames)
    return _encoder_forward_impl(params, cfg, mel, n_valid_frames)


def _encoder_forward_impl(
    params: EncoderParams,
    cfg: AudioEncoderConfig,
    mel: jax.Array,
    n_valid_frames: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    B, n_mels, T = mel.shape
    chunk = cfg.chunk_frames
    if T % cfg.n_window_infer:
        raise ValueError(
            f"mel frames {T} must be a multiple of n_window_infer={cfg.n_window_infer}"
        )
    n_chunks = T // chunk
    tpc = cfg.tokens_per_chunk

    compute_dtype = params["ln_post_w"].dtype
    n_valid_frames = jnp.asarray(n_valid_frames, jnp.int32).reshape(B)

    # (B, n_mels, T) -> (B * n_chunks, n_mels, chunk, 1)
    chunks = mel.reshape(B, n_mels, n_chunks, chunk).transpose(0, 2, 1, 3)
    chunks = chunks.reshape(B * n_chunks, n_mels, chunk, 1).astype(compute_dtype)

    x = conv_stem(params, chunks, n_chunks)  # (B * n_chunks, tpc, d_model)

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
        q = (qlinear(x, lp["wq"]) + lp["bq"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
        k = (qlinear(x, lp["wk"]) + lp["bk"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
        v = (qlinear(x, lp["wv"]) + lp["bv"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
        attn = windowed_self_attention(
            q, k, v, window=window, valid_mask=token_valid, scale=scale
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(B, total, d)
        h = h + qlinear(attn, lp["wo"]) + lp["bo"]

        x = layer_norm(h, lp["ln2_w"], lp["ln2_b"], _LN_EPS)
        x = jax.nn.gelu(qlinear(x, lp["fc1_w"]) + lp["fc1_b"], approximate=False)
        h = h + qlinear(x, lp["fc2_w"]) + lp["fc2_b"]
        return h, None

    hidden, _ = jax.lax.scan(layer_fn, tokens, params["layers"])

    hidden = layer_norm(hidden, params["ln_post_w"], params["ln_post_b"], _LN_EPS)
    hidden = jax.nn.gelu(qlinear(hidden, params["proj1_w"]) + params["proj1_b"], approximate=False)
    features = qlinear(hidden, params["proj2_w"]) + params["proj2_b"]

    features = jnp.where(token_valid[:, :, None], features, 0.0)
    return features, n_tokens
