"""Checkpoint loading: safetensors -> stacked functional param pytrees.

Reads the single-file ``model.safetensors`` that Qwen3-ASR checkpoints ship
(prefix ``audio_tower.`` for the encoder, ``model.`` for the decoder —
parity with encoder.py:330-359 / decoder.py:260-291 of the reference, but
in ONE pass over the file instead of the reference's two).

Layout conversions at load time (so the forward pass is pure ``x @ w``):
  * linear weights (out, in) -> (in, out);
  * conv weights MLX (O, KH, KW, I) or PyTorch (O, I, KH, KW) -> HWIO,
    sniffed by which axis holds the 3x3 kernel;
  * per-layer tensors stacked along a leading (num_layers, ...) axis for
    ``lax.scan``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import jax
import jax.numpy as jnp

from ..config import ModelConfig


def _as_dtype(x: jax.Array, dtype) -> jax.Array:
    return x.astype(dtype) if x.dtype != dtype else x


def _linear(w: jax.Array) -> jax.Array:
    """(out, in) -> (in, out)."""
    return w.T


def _conv_hwio(w: jax.Array) -> jax.Array:
    """Sniff MLX (O,KH,KW,I) vs torch (O,I,KH,KW) and emit (KH,KW,I,O)."""
    if w.shape[1] == 3 and w.shape[2] == 3:          # MLX: (O, 3, 3, I)
        return jnp.transpose(w, (1, 2, 3, 0))
    if w.shape[2] == 3 and w.shape[3] == 3:          # torch: (O, I, 3, 3)
        return jnp.transpose(w, (2, 3, 1, 0))
    raise ValueError(f"unrecognized conv weight shape {w.shape}")


def load_safetensors(path: str | Path) -> dict[str, jax.Array]:
    """Load every tensor of a .safetensors file (bf16-aware via flax)."""
    from safetensors.flax import load_file

    return dict(load_file(str(path)))


def decoder_params_from_tensors(
    raw: Mapping[str, jax.Array], cfg: ModelConfig, dtype=jnp.bfloat16
):
    """Map ``model.*`` keys to the stacked decoder pytree."""
    tc = cfg.text_decoder
    L = tc.num_hidden_layers
    g = lambda k: raw[f"model.{k}"]

    def stack(fmt: str, transform=lambda x: x):
        return jnp.stack([_as_dtype(transform(g(fmt.format(i))), dtype) for i in range(L)])

    layers = {
        "ln1": stack("layers.{}.input_layernorm.weight"),
        "ln2": stack("layers.{}.post_attention_layernorm.weight"),
        "wq": stack("layers.{}.self_attn.q_proj.weight", _linear),
        "wk": stack("layers.{}.self_attn.k_proj.weight", _linear),
        "wv": stack("layers.{}.self_attn.v_proj.weight", _linear),
        "wo": stack("layers.{}.self_attn.o_proj.weight", _linear),
        "q_norm": stack("layers.{}.self_attn.q_norm.weight"),
        "k_norm": stack("layers.{}.self_attn.k_norm.weight"),
        "wg": stack("layers.{}.mlp.gate_proj.weight", _linear),
        "wu": stack("layers.{}.mlp.up_proj.weight", _linear),
        "wd": stack("layers.{}.mlp.down_proj.weight", _linear),
    }
    return {
        "embedding": _as_dtype(g("embed_tokens.weight"), dtype),
        "layers": layers,
        "final_norm": _as_dtype(g("norm.weight"), dtype),
    }


def encoder_params_from_tensors(
    raw: Mapping[str, jax.Array], cfg: ModelConfig, dtype=jnp.bfloat16
):
    """Map ``audio_tower.*`` keys to the stacked encoder pytree."""
    ac = cfg.audio_encoder
    L = ac.encoder_layers
    g = lambda k: raw[f"audio_tower.{k}"]

    def stack(fmt: str, transform=lambda x: x):
        return jnp.stack([_as_dtype(transform(g(fmt.format(i))), dtype) for i in range(L)])

    layers = {
        "ln1_w": stack("layers.{}.self_attn_layer_norm.weight"),
        "ln1_b": stack("layers.{}.self_attn_layer_norm.bias"),
        "wq": stack("layers.{}.self_attn.q_proj.weight", _linear),
        "bq": stack("layers.{}.self_attn.q_proj.bias"),
        "wk": stack("layers.{}.self_attn.k_proj.weight", _linear),
        "bk": stack("layers.{}.self_attn.k_proj.bias"),
        "wv": stack("layers.{}.self_attn.v_proj.weight", _linear),
        "bv": stack("layers.{}.self_attn.v_proj.bias"),
        "wo": stack("layers.{}.self_attn.out_proj.weight", _linear),
        "bo": stack("layers.{}.self_attn.out_proj.bias"),
        "ln2_w": stack("layers.{}.final_layer_norm.weight"),
        "ln2_b": stack("layers.{}.final_layer_norm.bias"),
        "fc1_w": stack("layers.{}.fc1.weight", _linear),
        "fc1_b": stack("layers.{}.fc1.bias"),
        "fc2_w": stack("layers.{}.fc2.weight", _linear),
        "fc2_b": stack("layers.{}.fc2.bias"),
    }
    return {
        "conv1_w": _as_dtype(_conv_hwio(g("conv2d1.weight")), dtype),
        "conv1_b": _as_dtype(g("conv2d1.bias"), dtype),
        "conv2_w": _as_dtype(_conv_hwio(g("conv2d2.weight")), dtype),
        "conv2_b": _as_dtype(g("conv2d2.bias"), dtype),
        "conv3_w": _as_dtype(_conv_hwio(g("conv2d3.weight")), dtype),
        "conv3_b": _as_dtype(g("conv2d3.bias"), dtype),
        "conv_out": _as_dtype(_linear(g("conv_out.weight")), dtype),
        "layers": layers,
        "ln_post_w": _as_dtype(g("ln_post.weight"), dtype),
        "ln_post_b": _as_dtype(g("ln_post.bias"), dtype),
        "proj1_w": _as_dtype(_linear(g("proj1.weight")), dtype),
        "proj1_b": _as_dtype(g("proj1.bias"), dtype),
        "proj2_w": _as_dtype(_linear(g("proj2.weight")), dtype),
        "proj2_b": _as_dtype(g("proj2.bias"), dtype),
    }


def _linear_out(w: jax.Array) -> jax.Array:
    """(in, out) -> (out, in) — inverse of ``_linear`` for saving."""
    return w.T


def decoder_tensors_from_params(params) -> dict[str, jax.Array]:
    """Inverse mapping: stacked decoder pytree -> ``model.*`` tensor dict."""
    L = params["layers"]["ln1"].shape[0]
    out: dict[str, jax.Array] = {
        "model.embed_tokens.weight": params["embedding"],
        "model.norm.weight": params["final_norm"],
    }
    name_map = {
        "ln1": ("input_layernorm.weight", None),
        "ln2": ("post_attention_layernorm.weight", None),
        "wq": ("self_attn.q_proj.weight", _linear_out),
        "wk": ("self_attn.k_proj.weight", _linear_out),
        "wv": ("self_attn.v_proj.weight", _linear_out),
        "wo": ("self_attn.o_proj.weight", _linear_out),
        "q_norm": ("self_attn.q_norm.weight", None),
        "k_norm": ("self_attn.k_norm.weight", None),
        "wg": ("mlp.gate_proj.weight", _linear_out),
        "wu": ("mlp.up_proj.weight", _linear_out),
        "wd": ("mlp.down_proj.weight", _linear_out),
    }
    for key, (suffix, transform) in name_map.items():
        stacked = params["layers"][key]
        for i in range(L):
            t = stacked[i]
            out[f"model.layers.{i}.{suffix}"] = transform(t) if transform else t
    return out


def encoder_tensors_from_params(params) -> dict[str, jax.Array]:
    """Inverse mapping: stacked encoder pytree -> ``audio_tower.*`` dict.

    Conv weights are emitted in MLX layout (O, KH, KW, I), the layout of
    published Qwen3-ASR MLX-community checkpoints.
    """
    L = params["layers"]["ln1_w"].shape[0]

    def conv_out(w):  # HWIO -> OHWI
        return jnp.transpose(w, (3, 0, 1, 2))

    out: dict[str, jax.Array] = {
        "audio_tower.conv2d1.weight": conv_out(params["conv1_w"]),
        "audio_tower.conv2d1.bias": params["conv1_b"],
        "audio_tower.conv2d2.weight": conv_out(params["conv2_w"]),
        "audio_tower.conv2d2.bias": params["conv2_b"],
        "audio_tower.conv2d3.weight": conv_out(params["conv3_w"]),
        "audio_tower.conv2d3.bias": params["conv3_b"],
        "audio_tower.conv_out.weight": _linear_out(params["conv_out"]),
        "audio_tower.ln_post.weight": params["ln_post_w"],
        "audio_tower.ln_post.bias": params["ln_post_b"],
        "audio_tower.proj1.weight": _linear_out(params["proj1_w"]),
        "audio_tower.proj1.bias": params["proj1_b"],
        "audio_tower.proj2.weight": _linear_out(params["proj2_w"]),
        "audio_tower.proj2.bias": params["proj2_b"],
    }
    name_map = {
        "ln1_w": ("self_attn_layer_norm.weight", None),
        "ln1_b": ("self_attn_layer_norm.bias", None),
        "wq": ("self_attn.q_proj.weight", _linear_out),
        "bq": ("self_attn.q_proj.bias", None),
        "wk": ("self_attn.k_proj.weight", _linear_out),
        "bk": ("self_attn.k_proj.bias", None),
        "wv": ("self_attn.v_proj.weight", _linear_out),
        "bv": ("self_attn.v_proj.bias", None),
        "wo": ("self_attn.out_proj.weight", _linear_out),
        "bo": ("self_attn.out_proj.bias", None),
        "ln2_w": ("final_layer_norm.weight", None),
        "ln2_b": ("final_layer_norm.bias", None),
        "fc1_w": ("fc1.weight", _linear_out),
        "fc1_b": ("fc1.bias", None),
        "fc2_w": ("fc2.weight", _linear_out),
        "fc2_b": ("fc2.bias", None),
    }
    for key, (suffix, transform) in name_map.items():
        stacked = params["layers"][key]
        for i in range(L):
            t = stacked[i]
            out[f"audio_tower.layers.{i}.{suffix}"] = transform(t) if transform else t
    return out


def save_checkpoint(model_path: str | Path, enc_params, dec_params) -> Path:
    """Write encoder+decoder params as a reference-compatible safetensors.

    The reference can only read checkpoints (SURVEY.md §5); saving enables
    the fine-tuning workflow to round-trip through the standard layout.
    """
    from safetensors.flax import save_file

    path = Path(model_path)
    path.mkdir(parents=True, exist_ok=True)
    tensors = {}
    tensors.update(encoder_tensors_from_params(enc_params))
    tensors.update(decoder_tensors_from_params(dec_params))
    out = path / "model.safetensors"
    save_file(tensors, str(out))
    return out


def load_checkpoint(
    model_path: str | Path,
    cfg: ModelConfig,
    dtype=jnp.bfloat16,
    device=None,
):
    """One-pass load of encoder + decoder parameters from a checkpoint dir.

    Returns ``(encoder_params, decoder_params)`` on ``device`` (default:
    JAX's default device).
    """
    path = Path(model_path)
    weights = path / "model.safetensors"
    if not weights.is_file():
        raise FileNotFoundError(f"missing {weights}")
    raw = load_safetensors(weights)
    enc = encoder_params_from_tensors(raw, cfg, dtype)
    dec = decoder_params_from_tensors(raw, cfg, dtype)
    if device is not None:
        enc = jax.device_put(enc, device)
        dec = jax.device_put(dec, device)
    return enc, dec
