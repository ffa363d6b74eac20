"""Microbenchmarks for the decode hot path on the real chip.

Decomposes the official bench's per-call cost: host->device audio
transfer, decode-attention kernel alone (per layer-step), a full decode
step, and N-step decode loops at several batch sizes.  Run directly on
the TPU env (no args): python tools/micro_bench.py [section ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _force(out):
    # block_until_ready is not a reliable barrier through the axon tunnel;
    # fetch one element to force a real device->host round trip.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.numpy.ravel(leaf)[0])


def timeit(fn, *args, n=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    _force(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times))


def bench_h2d():
    """Host->device transfer at the bench's audio payload size."""
    for mb in (1, 16, 61):
        buf = np.zeros(mb * (1 << 20) // 4, np.float32)
        t, med = timeit(lambda b: jax.device_put(b), buf, n=8)
        print(f"h2d {mb:4d} MB: best {t*1e3:8.2f} ms  med {med*1e3:8.2f} ms  "
              f"({mb/max(t,1e-9):.0f} MB/s)")


def bench_kernel(B=32, S=640, pbucket=512, L=28):
    """Decode-attention kernel alone, per single (layer) call and full-cache scan."""
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_hbm3 import decode_attention_hbm3

    Hkv, Hq, D = 8, 16, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    kall = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    vall = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.bfloat16)
    v_new = k_new
    plen = jnp.full((B,), 408, jnp.int32)
    dend = jnp.int32(pbucket + 64)

    # One launch (single layer)
    t, med = timeit(
        lambda l: decode_attention_hbm3(
            q, kall, vall, k_new, v_new, l, plen, dend, pbucket
        ),
        jnp.int32(0), n=30,
    )
    # bytes actually streamed per launch: valid rows only
    valid_rows = 408 + 64
    gb = B * Hkv * valid_rows * D * 2 * 2 / 1e9
    print(f"kernel 1-layer B={B} S={S}: best {t*1e3:.3f} ms  med {med*1e3:.3f} ms "
          f"-> {gb/t:.0f} GB/s effective (valid rows)")

    # All-layer scan (what a decode step's attention costs)
    def scan_all(q, kall, vall, k_new, v_new):
        def f(carry, l):
            o = decode_attention_hbm3(q, kall, vall, k_new, v_new, l, plen, dend, pbucket)
            return carry + o.astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(f, jnp.float32(0), jnp.arange(L))
        return out

    sfn = jax.jit(scan_all)
    t, med = timeit(sfn, q, kall, vall, k_new, v_new, n=20)
    print(f"kernel {L}-layer scan: best {t*1e3:.3f} ms  med {med*1e3:.3f} ms "
          f"({t/L*1e3:.3f} ms/layer, {gb*L/t:.0f} GB/s)")


def bench_hbm_stream(B=32, S=640, L=28):
    """Upper bound: XLA full-cache reduction (pure HBM stream)."""
    Hkv, D = 8, 128
    kall = jnp.zeros((L, B, Hkv, S, D), jnp.bfloat16)
    vall = jnp.zeros((L, B, Hkv, S, D), jnp.bfloat16)
    f = jax.jit(lambda a, b: (a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()))
    t, med = timeit(f, kall, vall, n=20)
    gb = 2 * L * B * Hkv * S * D * 2 / 1e9
    print(f"XLA stream {gb:.2f} GB: best {t*1e3:.3f} ms ({gb/t:.0f} GB/s)")


def bench_kernel_ab(B=64, S=640, pbucket=512, L=28):
    """v5 (hbm4) vs v7 (schedule-driven) decode-attention A/B, in-program
    repetition over the layer scan (the only timing the tunnel doesn't
    poison — docs/PERFORMANCE.md perf model)."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_hbm4 import (
        decode_attention_hbm4,
    )
    from qwen3_asr_tpu.ops.pallas.experiments.decode_attention_sched import (
        decode_attention_sched,
    )

    Hkv, Hq, D = 8, 16, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    kall = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    vall = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.bfloat16)
    v_new = k_new
    plen = jnp.full((B,), 408, jnp.int32)

    def scan_all(kernel, reps):
        # reps x L kernel calls in ONE program; layer index cycles so no
        # iteration is hoistable.  Device time per rep = (t(hi) - t(lo)) /
        # (hi - lo), which cancels the ~26 ms tunnel RPC entirely.
        def fn(q, kall, vall, k_new, v_new, dend):
            def f(carry, i):
                l = jax.lax.rem(i, L)
                o = kernel(q, kall, vall, k_new, v_new, l, plen, dend, pbucket)
                return carry + o.astype(jnp.float32).sum(), None
            out, _ = jax.lax.scan(f, jnp.float32(0), jnp.arange(reps * L))
            return out
        return jax.jit(fn)

    LO, HI = 2, 10
    for dend_off in (8, 64, 128):
        dend = jnp.int32(pbucket + dend_off)
        for name, kern in (("v5", decode_attention_hbm4),
                           ("v7", decode_attention_sched)):
            t_lo, _ = timeit(scan_all(kern, LO), q, kall, vall, k_new, v_new,
                             dend, n=10)
            t_hi, _ = timeit(scan_all(kern, HI), q, kall, vall, k_new, v_new,
                             dend, n=10)
            dev = (t_hi - t_lo) / (HI - LO)  # seconds per L-layer pass
            rows = 408 + dend_off
            gb = L * B * Hkv * rows * D * 2 * 2 / 1e9
            print(f"{name} B={B} S={S} dend+{dend_off:4d}: "
                  f"device {dev*1e3:8.3f} ms/step-attn "
                  f"({dev/L*1e6:7.1f} us/layer, {gb/max(dev,1e-9):.0f} GB/s "
                  f"valid; lo {t_lo*1e3:.1f} hi {t_hi*1e3:.1f})")


def bench_steprate(B=64, plen_val=408, pbucket=512, tbucket=128):
    """TRUE device ms/decode-step: the same compiled decode program run at
    max_new=16 vs max_new=128 — identical launch/fetch overhead, so the
    wall difference / 112 is pure per-step device time."""
    from qwen3_asr_tpu.config import RuntimeConfig, TextDecoderConfig
    from qwen3_asr_tpu.models.decoder import init_decoder_params, init_kv_cache
    from qwen3_asr_tpu.runtime.generate import Generator

    cfg = TextDecoderConfig()
    params = init_decoder_params(cfg, None)  # zero-init, bf16
    gen = Generator(params, cfg, RuntimeConfig())
    rng = np.random.default_rng(0)
    logits = jnp.asarray(
        rng.standard_normal((B, cfg.vocab_size)) * 0.01, jnp.float32
    )
    plens = [plen_val] * B

    def run(max_new):
        kv = init_kv_cache(cfg, B, pbucket + tbucket, jnp.bfloat16)
        # repetition_penalty=1.2 matches the bench path (api default).
        toks = gen.decode(
            kv, logits, plens, [max_new] * B, tbucket,
            repetition_penalty=1.2, repetition_context_size=100,
        )
        return toks

    for m in (16, 128):
        run(m)  # compile both paths
    lo_t = []
    hi_t = []
    for _ in range(6):
        t0 = time.perf_counter(); run(16); lo_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(128); hi_t.append(time.perf_counter() - t0)
    lo, hi = min(lo_t), min(hi_t)
    print(f"steprate B={B}: {1e3*(hi-lo)/112:.3f} ms/step device "
          f"(lo16 {lo*1e3:.1f} ms, hi128 {hi*1e3:.1f} ms) "
          f"kernel={os.environ.get('QWEN3_ASR_DECODE_KERNEL', 'auto')}")


def bench_prefill(B=64, seconds=30.0, runtime=None):
    """Device-time decomposition of the fused prefill at the bench shape:
    mel, encoder, decoder prompt pass — each via rep-count differencing
    (a tiny index-dependent perturbation per rep defeats hoisting).

    ``runtime`` A/Bs quantized variants: RuntimeConfig(quantization="int8")
    for weight-only, + act_quant="int8" for the W8A8 int8-MXU prefill."""
    from qwen3_asr_tpu.api import Qwen3ASR, _mel_core
    from qwen3_asr_tpu.audio.mel import HOP_LENGTH, N_FFT, host_pad_batch
    from qwen3_asr_tpu.config import ModelConfig
    from qwen3_asr_tpu.models.encoder import encoder_forward

    class Tok:
        def build_prompt(self, n, language="English"):
            from qwen3_asr_tpu.tokenizer import build_prompt
            return build_prompt(n, language_name_tokens=[6364])
        def decode(self, ids, skip_special_tokens=True):
            return " ".join(map(str, ids))

    model = Qwen3ASR.from_random(
        ModelConfig(), tokenizer=Tok(), seed=None, runtime=runtime
    )
    gen = model._generator
    cfg = model._config
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(int(seconds * 16000)) * 0.05).astype(np.float32)
    bucket = model._mel.bucket_for(len(clip))
    n_valid = [len(clip) // HOP_LENGTH] * B
    n_audio = [model._n_audio_tokens(v) for v in n_valid]
    prompts = [model._tokenizer.build_prompt(n_audio[0], "English")] * B
    plens = [len(p) for p in prompts]
    atb = bucket // cfg.audio_encoder.chunk_frames * cfg.audio_encoder.tokens_per_chunk
    pbucket, tbucket, cache_len = gen.plan(atb, plens[0], 128, batch=B)
    print(f"prefill B={B}: frames {bucket}, prompt {plens[0]}/{pbucket}, "
          f"cache {cache_len}")
    padded = jax.device_put(host_pad_batch([clip] * B, bucket, N_FFT, HOP_LENGTH))
    nv = jax.device_put(np.asarray(n_valid, np.int32))
    na = jax.device_put(np.asarray(n_audio, np.int32))
    pl_ = jax.device_put(np.asarray(plens, np.int32))
    ids = jax.device_put(gen.pack_prompts(prompts, pbucket))
    n_mels = cfg.audio_encoder.num_mel_bins

    def mel_fn(padded):
        return jax.vmap(
            lambda p, v: _mel_core(p, v, bucket, N_FFT, HOP_LENGTH, n_mels)
        )(padded, nv)

    mel = jax.jit(mel_fn)(padded)
    feats = jax.jit(
        lambda m: encoder_forward(model._encoder_params, cfg.audio_encoder, m, nv)[0]
    )(mel)

    def rep(fn, x, n):
        def body(c, i):
            out = fn(x + jnp.asarray(i, x.dtype) * jnp.asarray(1e-30, x.dtype))
            return c + jax.numpy.float32(
                out[0].astype(jnp.float32).ravel()[0]
                if isinstance(out, tuple) else out.astype(jnp.float32).ravel()[0]
            ), None
        return jax.jit(lambda x: jax.lax.scan(body, jnp.float32(0), jnp.arange(n))[0])

    for label, fn, x in (
        ("mel", mel_fn, padded),
        ("encoder", lambda m: encoder_forward(
            model._encoder_params, cfg.audio_encoder, m, nv)[0], mel),
        ("dec-prefill", lambda f: gen._prefill_impl(
            gen.params, f, ids, na, pl_, cache_len)[1], feats),
    ):
        lo_f, hi_f = rep(fn, x, 1), rep(fn, x, 4)
        t_lo, _ = timeit(lo_f, x, n=5, warmup=2)
        t_hi, _ = timeit(hi_f, x, n=5, warmup=2)
        dev = (t_hi - t_lo) / 3
        print(f"  {label:12s} device {dev*1e3:8.1f} ms "
              f"(lo {t_lo*1e3:.0f} hi {t_hi*1e3:.0f})")


def bench_step(B=32):
    """Full decode: 128-token loop through the public pipeline."""
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import ModelConfig

    class Tok:
        def build_prompt(self, n, language="English"):
            from qwen3_asr_tpu.tokenizer import build_prompt
            return build_prompt(n, language_name_tokens=[6364])
        def decode(self, ids, skip_special_tokens=True):
            return " ".join(map(str, ids))

    model = Qwen3ASR.from_random(ModelConfig(), tokenizer=Tok(), seed=None)
    rng = np.random.default_rng(0)
    clips = [(rng.standard_normal(30 * 16000) * 0.05).astype(np.float32)
             for _ in range(B)]
    def run():
        return model.transcribe_batch(clips, max_tokens=128, temperature=0.0)
    run()
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    stats = model.last_stats.as_dict()
    print(f"pipeline B={B}: best {min(times):.3f} s  all={[f'{t:.2f}' for t in times]}")
    print(f"  stats: {stats}")


def bench_encoder(B=64, seconds=30.0):
    """Encoder device-time split: conv stem vs transformer vs projection
    (rep-count differencing; the prefill64 section showed the encoder at
    ~33% of its FLOP bound — this finds where)."""
    from qwen3_asr_tpu.config import ModelConfig
    from qwen3_asr_tpu.models.encoder import (
        conv_stem,
        encoder_forward,
        init_encoder_params,
    )

    cfg = ModelConfig().audio_encoder
    params = init_encoder_params(cfg, None, jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = 3200
    n_chunks = frames // cfg.chunk_frames
    mel = jnp.asarray(
        rng.standard_normal((B, cfg.num_mel_bins, frames)) * 0.3, jnp.float32
    )
    nv = jnp.full((B,), frames, jnp.int32)
    chunks = jnp.asarray(
        rng.standard_normal(
            (B * n_chunks, cfg.num_mel_bins, cfg.chunk_frames, 1)
        ),
        jnp.bfloat16,
    )
    total = n_chunks * cfg.tokens_per_chunk
    tokens = jnp.asarray(
        rng.standard_normal((B, total, cfg.d_model)) * 0.1, jnp.bfloat16
    )

    import jax.numpy as jnp_  # noqa: F401

    from qwen3_asr_tpu.models.encoder import _LN_EPS, layer_norm, windowed_self_attention

    token_valid = jnp.ones((B, total), bool)
    window = cfg.window_tokens
    nq = cfg.encoder_attention_heads
    d = cfg.d_model
    hd = d // nq
    scale = hd ** -0.5

    def layers_fn(h):
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
            return h + x @ lp["fc2_w"] + lp["fc2_b"], None
        out, _ = jax.lax.scan(layer_fn, h, params["layers"])
        return out

    def attn_only(h):
        def layer_fn(h, lp):
            x = layer_norm(h, lp["ln1_w"], lp["ln1_b"], _LN_EPS)
            q = (x @ lp["wq"] + lp["bq"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
            k = (x @ lp["wk"] + lp["bk"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
            v = (x @ lp["wv"] + lp["bv"]).reshape(B, total, nq, hd).transpose(0, 2, 1, 3)
            attn = windowed_self_attention(
                q, k, v, window=window, valid_mask=token_valid, scale=scale
            )
            return h + attn.transpose(0, 2, 1, 3).reshape(B, total, d) @ lp["wo"], None
        out, _ = jax.lax.scan(layer_fn, h, params["layers"])
        return out

    def rep(fn, x, n):
        def body(c, i):
            out = fn(x + jnp.asarray(i, x.dtype) * jnp.asarray(1e-30, x.dtype))
            return c + out.astype(jnp.float32).ravel()[0], None
        return jax.jit(lambda x: jax.lax.scan(body, jnp.float32(0), jnp.arange(n))[0])

    for label, fn, x in (
        ("full encoder", lambda m: encoder_forward(params, cfg, m, nv)[0], mel),
        ("conv stem", lambda c: conv_stem(params, c, n_chunks), chunks),
        ("24 layers", layers_fn, tokens),
        ("attn-only", attn_only, tokens),
    ):
        lo_f, hi_f = rep(fn, x, 1), rep(fn, x, 4)
        t_lo, _ = timeit(lo_f, x, n=5, warmup=2)
        t_hi, _ = timeit(hi_f, x, n=5, warmup=2)
        dev = (t_hi - t_lo) / 3
        print(f"  {label:12s} device {dev*1e3:8.1f} ms "
              f"(lo {t_lo*1e3:.0f} hi {t_hi*1e3:.0f})")


if __name__ == "__main__":
    sections = sys.argv[1:] or ["h2d", "stream", "kernel"]
    print("devices:", jax.devices())
    if "h2d" in sections:
        bench_h2d()
    if "stream" in sections:
        bench_hbm_stream()
    if "kernel" in sections:
        bench_kernel()
    if "kernel64" in sections:
        bench_kernel(B=64)
    if "kernelab" in sections:
        bench_kernel_ab()
    if "kernelab-long" in sections:
        bench_kernel_ab(B=8, S=4096 + 1024, pbucket=4096)
    if "steprate" in sections:
        bench_steprate()
    if "steprate1" in sections:
        bench_steprate(B=1)
    if "prefill64" in sections:
        bench_prefill()
    if "prefill64-int8" in sections:
        from qwen3_asr_tpu.config import RuntimeConfig
        bench_prefill(runtime=RuntimeConfig(quantization="int8"))
    if "prefill64-w8a8" in sections:
        from qwen3_asr_tpu.config import RuntimeConfig
        bench_prefill(
            runtime=RuntimeConfig(quantization="int8", act_quant="int8")
        )
    if "step" in sections:
        bench_step()
    if "step64" in sections:
        bench_step(B=64)
    if "encoder" in sections:
        bench_encoder()
