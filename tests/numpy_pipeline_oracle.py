"""Independent NUMPY implementation of the full Qwen3-ASR pipeline.

This is a from-the-spec reimplementation of the REFERENCE semantics
(/root/reference/src/qwen3_asr_mlx/) used as an end-to-end oracle for the
JAX stack: audio -> log-mel (numpy oracle) -> chunked conv stem -> per-chunk
PE -> **strip** padding (the reference's semantics, encoder.py:288-293 —
deliberately NOT the JAX stack's mask-instead-of-strip design) ->
block-diagonal 104-token window attention -> projection -> prompt build ->
audio-embedding injection -> full-context causal decoder (GQA + QK-norm +
RoPE + SwiGLU, tied head) -> greedy loop with repetition penalty.

Nothing here imports jax; agreement between this and ``Qwen3ASR.transcribe``
on a tiny config checks every piece of cross-module wiring (injection
offsets, RoPE positions, masking-vs-stripping equivalence, penalty
ordering) against an implementation that shares no code with the stack
under test.  Real-weights token parity (BASELINE.md) needs a checkpoint;
this oracle is the strongest fidelity evidence producible without one.
"""

from __future__ import annotations

import numpy as np


# -- helpers ----------------------------------------------------------------

def gelu(x):
    from scipy.special import erf  # available via jax's scipy dep

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def rms_norm(x, w, eps=1e-6):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * w


def softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def conv2d_s2_p1(x, w, b):
    """(H, W, Cin) conv with 3x3 kernel, stride 2, pad 1; w is HWIO."""
    H, W, _ = x.shape
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    Ho, Wo = (H + 1) // 2, (W + 1) // 2
    out = np.zeros((Ho, Wo, w.shape[3]), np.float32)
    for i in range(Ho):
        for j in range(Wo):
            patch = xp[2 * i : 2 * i + 3, 2 * j : 2 * j + 3, :]
            out[i, j] = np.einsum("hwc,hwco->o", patch, w) + b
    return out


def conv_len(n):
    for _ in range(3):
        n = (n - 1) // 2 + 1 if n > 0 else 0
    return n


# -- encoder (reference semantics: strip, then window) ----------------------

def encoder_np(params, cfg, mel):
    """mel (n_mels, T_valid) unpadded -> (n_tokens, output_dim)."""
    p = params
    chunk = cfg.chunk_frames
    T = mel.shape[1]
    n_chunks = -(-T // chunk)
    tokens = []
    for c in range(n_chunks):
        part = mel[:, c * chunk : (c + 1) * chunk]
        valid = part.shape[1]
        if valid < chunk:  # reference zero-pads the last chunk
            part = np.pad(part, ((0, 0), (0, chunk - valid)))
        x = part[:, :, None].astype(np.float32)            # (mel, time, 1)
        for i in (1, 2, 3):
            x = gelu(conv2d_s2_p1(x, p[f"conv{i}_w"], p[f"conv{i}_b"]))
        freq, time, ch = x.shape
        flat = x.transpose(1, 2, 0).reshape(time, ch * freq)  # channel-major
        h = flat @ p["conv_out"]
        # Per-chunk sinusoidal PE restarting at 0, added BEFORE stripping.
        d = h.shape[1]
        half = d // 2
        inv = np.exp(-np.arange(half) * (np.log(10000.0) / (half - 1)))
        pos = np.arange(time)[:, None] * inv[None, :]
        h = h + np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
        h = h[: conv_len(valid)]                           # STRIP padding
        tokens.append(h)
    h = np.concatenate(tokens, axis=0)

    n_tok, d = h.shape
    heads = cfg.encoder_attention_heads
    hd = d // heads
    window = cfg.tokens_per_chunk * (cfg.n_window_infer // chunk)
    for li in range(cfg.encoder_layers):
        lp = {k: v[li] for k, v in params["layers"].items()}
        x = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        q = (x @ lp["wq"] + lp["bq"]).reshape(n_tok, heads, hd)
        k = (x @ lp["wk"] + lp["bk"]).reshape(n_tok, heads, hd)
        v = (x @ lp["wv"] + lp["bv"]).reshape(n_tok, heads, hd)
        attn = np.zeros_like(q)
        for w0 in range(0, n_tok, window):                 # block-diagonal
            w1 = min(w0 + window, n_tok)
            s = np.einsum("qhd,khd->hqk", q[w0:w1], k[w0:w1]) / np.sqrt(hd)
            attn[w0:w1] = np.einsum(
                "hqk,khd->qhd", softmax(s), v[w0:w1]
            )
        h = h + attn.reshape(n_tok, d) @ lp["wo"] + lp["bo"]
        x = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        h = h + gelu(x @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] + lp["fc2_b"]

    h = layer_norm(h, params["ln_post_w"], params["ln_post_b"])
    h = gelu(h @ params["proj1_w"] + params["proj1_b"])
    return h @ params["proj2_w"] + params["proj2_b"]


# -- decoder (full-context recompute; no cache) -----------------------------

def rope_np(x, positions, theta):
    """x (..., T, D) non-interleaved half-split RoPE."""
    D = x.shape[-1]
    inv = 1.0 / (theta ** (np.arange(0, D, 2) / D))
    ang = positions[..., :, None] * inv[None, :]           # (T, D/2)
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., : D // 2], x[..., D // 2 :]
    return np.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def decoder_logits_np(params, cfg, embeds):
    """(T, hidden) injected embeddings -> (T, vocab) float32 logits."""
    h = embeds.astype(np.float32)
    T = h.shape[0]
    nq, nkv, D = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )
    group = nq // nkv
    positions = np.arange(T, dtype=np.float64)
    causal = np.tril(np.ones((T, T), bool))
    for li in range(cfg.num_hidden_layers):
        lp = {k: v[li] for k, v in params["layers"].items()}
        if "wqkv" in lp:  # fused storage layout: split back to reference form
            lp["wq"] = lp["wqkv"][:, : nq * D]
            lp["wk"] = lp["wqkv"][:, nq * D : (nq + nkv) * D]
            lp["wv"] = lp["wqkv"][:, (nq + nkv) * D :]
        if "wgu" in lp:
            half = lp["wgu"].shape[1] // 2
            lp["wg"], lp["wu"] = lp["wgu"][:, :half], lp["wgu"][:, half:]
        x = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q = (x @ lp["wq"]).reshape(T, nq, D)
        k = (x @ lp["wk"]).reshape(T, nkv, D)
        v = (x @ lp["wv"]).reshape(T, nkv, D)
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q = rope_np(q.transpose(1, 0, 2), positions, cfg.rope_theta)
        k = rope_np(k.transpose(1, 0, 2), positions, cfg.rope_theta)
        v = v.transpose(1, 0, 2)                           # (nkv, T, D)
        kg = np.repeat(k, group, axis=0)                   # GQA broadcast
        vg = np.repeat(v, group, axis=0)
        s = np.einsum("hqd,hkd->hqk", q, kg) / np.sqrt(D)
        s = np.where(causal[None], s, -1e9)
        attn = np.einsum("hqk,hkd->hqd", softmax(s), vg)
        h = h + attn.transpose(1, 0, 2).reshape(T, nq * D) @ lp["wo"]
        x = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        gate, up = x @ lp["wg"], x @ lp["wu"]
        silu = gate / (1.0 + np.exp(-gate))
        h = h + (silu * up) @ lp["wd"]
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h @ params["embedding"].T


def greedy_np(
    params, cfg, prompt_ids, features, eos_ids, max_tokens,
    repetition_penalty=1.0, repetition_context_size=100,
):
    """Reference generate semantics: inject, full-context greedy loop.

    Penalty: divide positive / multiply negative logits of tokens in the
    last ``repetition_context_size`` GENERATED tokens; none on the first.
    """
    emb = params["embedding"]
    ids = list(prompt_ids)
    embeds = emb[np.asarray(ids)].astype(np.float32)
    n_audio = features.shape[0]
    embeds[9 : 9 + n_audio] = features                     # audio_pad slots
    generated: list[int] = []
    for step in range(max_tokens):
        logits = decoder_logits_np(params, cfg, embeds)[-1]
        if step > 0 and repetition_penalty != 1.0:
            recent = set(generated[-repetition_context_size:])
            for t in recent:
                logits[t] = (
                    logits[t] / repetition_penalty
                    if logits[t] > 0
                    else logits[t] * repetition_penalty
                )
        nxt = int(np.argmax(logits))
        generated.append(nxt)
        if nxt in eos_ids:
            break
        embeds = np.concatenate([embeds, emb[nxt][None].astype(np.float32)])
    return generated
