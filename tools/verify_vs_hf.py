"""Real-dimension cross-framework verification vs HuggingFace transformers.

Runs the tests/test_hf_cross_oracle.py comparison at the REAL Qwen3-ASR
1.7B dimensions (f32, CPU), so dimension-dependent bugs (GQA 16Q/8KV at
head_dim 128, the 7680-wide conv_out, the 104-token window at d_model
1024) cannot hide behind tiny-config coverage:

  1. build HF's Qwen3OmniMoeAudioEncoder + Qwen3ForCausalLM at the
     default (real) config dims with random init;
  2. export through the published checkpoint layout (audio_tower.* /
     model.* in one model.safetensors, torch conv layout);
  3. load with qwen3_asr_tpu's own loader;
  4. compare encoder forward (multi-window), decoder prefill logits with
     injected audio features, and N greedy tokens through the cached
     incremental decode path.

Run on CPU (the axon plugin must not capture the platform):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/verify_vs_hf.py

Takes a few minutes on one core (1.7B f32 matmuls).  Exit code 0 = all
comparisons within tolerance and token-identical greedy.

``--quant int8|w8a8`` measures the QUANTIZATION fidelity bound instead:
our params are int8-quantized (w8a8 additionally runs the int8-MXU
activation-quant prefill path, forced on at these small shapes) and
compared against the same full-precision HF oracle.

Random-init weights change what is measurable (round-5 finding): a
random 1.7B model's greedy logit margins are NOISE-LEVEL (p50 ~0.1 over
the 151936 vocab), so a flat argmax-agreement bar is unmeetable by ANY
lossy numeric change and token-identity is not a meaningful criterion
here.  What DOES transfer to trained weights is the size of the logit
perturbation: quant mode therefore reports and gates on

  * prefill logit rms relative error (< 25% — noise accumulation over
    28 residual layers on random weights measures 14% for W8A8 and the
    gate exists to catch SYSTEMATIC errors like a wrong scale axis,
    which land at ~100%), and
  * the flip-margin bound: every argmax flip must sit at an oracle
    margin below 10 x rms|delta-logit| — i.e. flips are confined to
    near-ties at the quantization noise scale, never at real margins.

Greedy token-identity is NOT required in quant mode: a single near-tie
flip anywhere in the rollout diverges the sequence, which on random
weights (p50 margin ~0.14, measured) is certain.  The rollout is still
run and the divergence point reported.

On a trained checkpoint, positions with margin above the reported
perturbation bound provably cannot flip; token-level validation on real
weights stays on the checkpoint watch (BASELINE.md fidelity row).
"""

from __future__ import annotations

import contextlib
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(f"[verify_vs_hf] {msg}", flush=True)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--quant", choices=["none", "int8", "w8a8"], default="none",
        help="quantize our params before comparing (fidelity bound mode)",
    )
    ap.add_argument("--max-new", type=int, default=8)
    args = ap.parse_args()

    t0 = time.time()
    import torch

    torch.manual_seed(0)

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        log(f"WARNING: backend is {jax.default_backend()}, expected cpu")

    from transformers import Qwen3Config, Qwen3ForCausalLM
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoder,
        Qwen3OmniMoeAudioEncoderConfig,
    )

    from qwen3_asr_tpu.config import ModelConfig
    from qwen3_asr_tpu.models.decoder import (
        decoder_forward,
        decoder_logits,
        embed_tokens,
        init_kv_cache,
    )
    from qwen3_asr_tpu.models.encoder import encoder_forward
    from qwen3_asr_tpu.models.params import load_checkpoint

    cfg = ModelConfig()  # real 1.7B dims
    enc_c, dec_c = cfg.audio_encoder, cfg.text_decoder

    log("building HF models at real dims (random init)...")
    hf_enc = Qwen3OmniMoeAudioEncoder(
        Qwen3OmniMoeAudioEncoderConfig(
            num_mel_bins=enc_c.num_mel_bins,
            encoder_layers=enc_c.encoder_layers,
            encoder_attention_heads=enc_c.encoder_attention_heads,
            encoder_ffn_dim=enc_c.encoder_ffn_dim,
            d_model=enc_c.d_model,
            output_dim=enc_c.output_dim,
            n_window=enc_c.n_window,
            n_window_infer=enc_c.n_window_infer,
            downsample_hidden_size=enc_c.downsample_hidden_size,
            max_source_positions=enc_c.max_source_positions,
            dropout=0.0,
            attention_dropout=0.0,
        )
    ).float().eval()
    hf_dec = Qwen3ForCausalLM(
        Qwen3Config(
            hidden_size=dec_c.hidden_size,
            num_hidden_layers=dec_c.num_hidden_layers,
            num_attention_heads=dec_c.num_attention_heads,
            num_key_value_heads=dec_c.num_key_value_heads,
            head_dim=dec_c.head_dim,
            intermediate_size=dec_c.intermediate_size,
            vocab_size=dec_c.vocab_size,
            rope_theta=dec_c.rope_theta,
            rms_norm_eps=dec_c.rms_norm_eps,
            max_position_embeddings=dec_c.max_position_embeddings,
            tie_word_embeddings=True,
            attention_bias=False,
            use_cache=False,
        )
    ).float().eval()
    log(f"HF models built in {time.time() - t0:.1f}s")

    from safetensors.torch import save_file

    tensors = {}
    for k, v in hf_enc.state_dict().items():
        tensors[f"audio_tower.{k}"] = v
    for k, v in hf_dec.state_dict().items():
        if k != "lm_head.weight":
            tensors[k] = v.contiguous() if not v.is_contiguous() else v

    tmp = tempfile.mkdtemp(prefix="hf_real_ckpt_")
    save_file(tensors, str(Path(tmp) / "model.safetensors"))
    del tensors
    log(f"checkpoint written to {tmp} at {time.time() - t0:.1f}s")

    enc_params, dec_params = load_checkpoint(tmp, cfg, dtype=jnp.float32)
    log(f"loaded via qwen3_asr_tpu loader at {time.time() - t0:.1f}s")
    # 7.6 GB per run; stale copies also false-positive the standing
    # `find / -name "*.safetensors"` checkpoint watch.
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)

    act_ctx = contextlib.nullcontext
    if args.quant != "none":
        from qwen3_asr_tpu.ops.quant import (
            act_quant_rows,
            quantize_decoder_params,
            quantize_encoder_params,
        )

        dec_params = quantize_decoder_params(dec_params)
        if args.quant == "w8a8":
            # Force the int8-dot path at these tiny verification shapes
            # (production prefill has thousands of rows; the default
            # row gates would silently keep everything weight-only
            # here and the test would prove nothing).  min_rows=2
            # keeps the 1-token greedy steps on the weight-only
            # lowering, matching the production decode path.
            import qwen3_asr_tpu.models.encoder as enc_mod

            enc_mod._ACT_QUANT_ENC_MIN_ROWS = 8
            enc_params = quantize_encoder_params(enc_params)
            act_ctx = lambda: act_quant_rows(2)  # noqa: E731
        log(f"params quantized ({args.quant}) at {time.time() - t0:.1f}s")

    failures = []

    # ---- encoder: 10 s of audio -> 1000 frames -> 130 tokens (2 windows)
    rng = np.random.default_rng(0)
    t_valid = 1000
    mel = rng.standard_normal((enc_c.num_mel_bins, t_valid)).astype(np.float32)

    cap: dict = {}

    def pre_hook(mod, args, kwargs):
        # Membership checks, not truthiness: `tensor or args[0]` raises on
        # multi-element Tensors, and args may be empty when transformers
        # passes everything by keyword.
        h = kwargs["hidden_states"] if "hidden_states" in kwargs else args[0]
        cap["h"] = h.detach().clone()
        cap["cu"] = kwargs["cu_seqlens"] if "cu_seqlens" in kwargs else args[1]

    handle = hf_enc.layers[0].register_forward_pre_hook(pre_hook, with_kwargs=True)
    with torch.no_grad():
        hf_enc(torch.from_numpy(mel), feature_lens=torch.tensor([t_valid]))
    handle.remove()
    # transformers' sdpa path ignores cu_seqlens (dense); drive its own
    # layers with its own block mask for the documented windowed semantics
    # (see tests/test_hf_cross_oracle.py).
    h, cu = cap["h"], cap["cu"]
    mask = hf_enc._prepare_attention_mask(h, cu)
    with torch.no_grad():
        for layer in hf_enc.layers:
            h = layer(h, cu, attention_mask=mask)[0]
        h = hf_enc.ln_post(h)
        h = hf_enc.act(hf_enc.proj1(h))
        ref_enc = hf_enc.proj2(h).numpy()
    log(f"HF encoder forward done at {time.time() - t0:.1f}s (cu={cap['cu'].tolist()})")

    t_pad = -(-t_valid // enc_c.n_window_infer) * enc_c.n_window_infer
    mel_p = np.zeros((1, enc_c.num_mel_bins, t_pad), np.float32)
    mel_p[0, :, :t_valid] = mel
    feats, n_tok = encoder_forward(
        enc_params, enc_c, jnp.asarray(mel_p), jnp.asarray([t_valid], jnp.int32)
    )
    got_enc = np.asarray(feats[0, : int(n_tok[0])])
    d = np.abs(got_enc - ref_enc).max()
    log(f"encoder max|diff| = {d:.3e} over {ref_enc.shape} at {time.time() - t0:.1f}s")
    if args.quant == "none":
        if not (got_enc.shape == ref_enc.shape and d < 5e-4):
            failures.append(f"encoder mismatch: {d:.3e}")
    else:
        rel = d / (np.abs(ref_enc).max() + 1e-9)
        log(f"encoder rel err vs f32 oracle = {rel:.3e} ({args.quant})")
        if not (got_enc.shape == ref_enc.shape and rel < 0.05):
            failures.append(f"encoder quant rel err too large: {rel:.3e}")

    # ---- decoder prefill logits with injected audio features
    n_prompt = 96
    ids = rng.integers(0, dec_c.vocab_size, size=(1, n_prompt))
    audio_pos = np.arange(8, 8 + 32)  # 32 injected "audio token" rows
    inj = (0.5 * rng.standard_normal((32, dec_c.hidden_size))).astype(np.float32)

    with torch.no_grad():
        emb = hf_dec.get_input_embeddings()(torch.from_numpy(ids)).clone()
        emb[0, torch.from_numpy(audio_pos)] = torch.from_numpy(inj)
        ref_logits = hf_dec(inputs_embeds=emb).logits.numpy()
    log(f"HF decoder prefill done at {time.time() - t0:.1f}s")

    h = embed_tokens(dec_params, jnp.asarray(ids, jnp.int32))
    h = h.at[0, jnp.asarray(audio_pos)].set(jnp.asarray(inj))
    with act_ctx():
        out, kv0 = decoder_forward(
            dec_params,
            dec_c,
            h,
            jnp.arange(n_prompt)[None],
            init_kv_cache(dec_c, 1, n_prompt + 16, jnp.float32),
            write_slots=jnp.zeros((1,), jnp.int32),
        )
        got_logits = np.asarray(decoder_logits(dec_params, dec_c, out))
    d = np.abs(got_logits - ref_logits).max()
    agree = (got_logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    log(
        f"decoder prefill max|diff| = {d:.3e}, per-position argmax agreement "
        f"= {agree:.4f} at {time.time() - t0:.1f}s"
    )
    if args.quant == "none":
        if not (d < 2e-3 and agree == 1.0):
            failures.append(f"decoder prefill mismatch: {d:.3e}, agree {agree}")
    else:
        # Quant fidelity bound (see module docstring): gate on the logit
        # perturbation scale and on flips being confined to near-tie
        # margins; report the full picture.
        delta = got_logits - ref_logits
        rms = float(np.sqrt((delta.astype(np.float64) ** 2).mean()))
        rms_rel = rms / float(ref_logits.astype(np.float64).std())
        top2 = np.partition(ref_logits, -2, axis=-1)
        margins = top2[..., -1] - top2[..., -2]        # oracle top-2 gaps
        flips = np.nonzero(got_logits.argmax(-1) != ref_logits.argmax(-1))
        flip_margins = [
            float(
                ref_logits[b, p].max()
                - ref_logits[b, p, got_logits[b, p].argmax()]
            )
            for b, p in zip(*flips)
        ]
        max_flip_margin = max(flip_margins, default=0.0)
        log(
            f"quant perturbation: rms|dlogit| {rms:.4f} (rel {rms_rel:.4f}), "
            f"oracle margin p50 {np.median(margins):.4f}, "
            f"agreement {agree:.4f}, flips {len(flip_margins)} "
            f"(max margin {max_flip_margin:.4f})"
        )
        if rms_rel > 0.25:
            failures.append(f"quant logit rms rel err {rms_rel:.4f} > 0.25")
        if max_flip_margin > 10 * rms:
            failures.append(
                f"argmax flip at margin {max_flip_margin:.4f} > 10 x "
                f"rms|dlogit| {rms:.4f} — systematic, not noise-scale"
            )

    # ---- greedy token identity (cached incremental path)
    max_new = args.max_new
    with torch.no_grad():
        hf_tokens = []
        cur = emb
        for _ in range(max_new):
            nxt = int(torch.argmax(hf_dec(inputs_embeds=cur).logits[0, -1]))
            hf_tokens.append(nxt)
            cur = torch.cat(
                [cur, hf_dec.get_input_embeddings()(torch.tensor([[nxt]]))], dim=1
            )
    log(f"HF greedy loop done at {time.time() - t0:.1f}s: {hf_tokens}")

    kv = kv0
    my_tokens = []
    last = int(np.argmax(got_logits[0, -1]))
    for t in range(max_new):
        my_tokens.append(last)
        if t == max_new - 1:
            break
        nh = embed_tokens(dec_params, jnp.asarray([[last]], jnp.int32))
        with act_ctx():
            out, kv = decoder_forward(
                dec_params, dec_c, nh, jnp.asarray([[n_prompt + t]]), kv,
                write_slots=jnp.asarray([n_prompt + t]),
            )
            last = int(jnp.argmax(decoder_logits(dec_params, dec_c, out)[0, 0]))
    log(f"our greedy loop done at {time.time() - t0:.1f}s: {my_tokens}")
    if my_tokens != hf_tokens:
        if args.quant == "none":
            failures.append(f"greedy tokens differ: {my_tokens} vs {hf_tokens}")
        else:
            # Expected in quant mode on random weights (see docstring):
            # report where the rollout first left the oracle's path.
            div = next(
                (i for i, (a, b) in enumerate(zip(my_tokens, hf_tokens)) if a != b),
                len(my_tokens),
            )
            log(f"quant greedy rollout diverges at step {div}/{max_new} (expected)")

    if failures:
        for f in failures:
            log(f"FAIL: {f}")
        return 1
    mode = "" if args.quant == "none" else f" [{args.quant}]"
    log(f"ALL REAL-DIM COMPARISONS PASSED{mode} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
