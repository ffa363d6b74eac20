"""Model configuration for Qwen3-ASR on TPU.

Mirrors the HuggingFace ``config.json`` schema for Qwen3-ASR checkpoints so
that the same checkpoints load unchanged.  Parity with the reference config
surface (/root/reference/src/qwen3_asr_mlx/config.py:14-150): the same three
dataclasses, the same defaults, and the same ``from_dict`` fallback chain.

Additionally carries a TPU ``RuntimeConfig`` (mesh shape, dtypes, shape
buckets) that has no reference counterpart: on TPU every jitted program is
compiled for static shapes, so audio/prompt lengths are padded to a small set
of buckets to keep the compile cache warm.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass
class AudioEncoderConfig:
    """Whisper-style audio encoder configuration (Qwen3-ASR audio tower)."""

    d_model: int = 1024
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    num_mel_bins: int = 128
    max_source_positions: int = 1500
    output_dim: int = 2048
    n_window: int = 50
    n_window_infer: int = 800
    conv_chunksize: int = 500          # parsed but unused (parity w/ reference)
    activation_function: str = "gelu"  # parsed but unused; GELU is hard-wired
    downsample_hidden_size: int = 480

    @property
    def chunk_frames(self) -> int:
        """Mel frames per encoder chunk (reference: n_window * 2 = 100)."""
        return self.n_window * 2

    @property
    def freq_after_conv(self) -> int:
        """Mel-bin count after the 3x stride-2 conv stem (128 -> 16)."""
        f = self.num_mel_bins
        for _ in range(3):
            f = (f - 1) // 2 + 1
        return f

    @property
    def tokens_per_chunk(self) -> int:
        """Audio tokens produced per full chunk (100 frames -> 13 tokens)."""
        return conv_output_length(self.chunk_frames)

    @property
    def window_tokens(self) -> int:
        """Block-diagonal attention window in tokens (13 * 8 = 104)."""
        return self.tokens_per_chunk * (self.n_window_infer // self.chunk_frames)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "AudioEncoderConfig":
        a = d.get("audio_encoder_config", d)
        get = a.get
        return cls(
            d_model=get("d_model", cls.d_model),
            encoder_layers=get(
                "encoder_layers", get("num_hidden_layers", cls.encoder_layers)
            ),
            encoder_attention_heads=get(
                "encoder_attention_heads", cls.encoder_attention_heads
            ),
            encoder_ffn_dim=get("encoder_ffn_dim", cls.encoder_ffn_dim),
            num_mel_bins=get("num_mel_bins", cls.num_mel_bins),
            max_source_positions=get(
                "max_source_positions", cls.max_source_positions
            ),
            output_dim=get("output_dim", cls.output_dim),
            n_window=get("n_window", cls.n_window),
            n_window_infer=get("n_window_infer", cls.n_window_infer),
            conv_chunksize=get("conv_chunksize", cls.conv_chunksize),
            activation_function=get(
                "activation_function", cls.activation_function
            ),
            downsample_hidden_size=get(
                "downsample_hidden_size", cls.downsample_hidden_size
            ),
        )


@dataclass
class TextDecoderConfig:
    """Qwen3 text decoder configuration (GQA + QK-norm + RoPE + SwiGLU)."""

    hidden_size: int = 2048
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 6144
    hidden_act: str = "silu"           # parsed but unused; SiLU is hard-wired
    vocab_size: int = 151936
    max_position_embeddings: int = 65536
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    mrope_section: list[int] = field(default_factory=lambda: [24, 20, 20])
    rope_interleaved: bool = True      # parsed but unused; plain 1-D RoPE

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TextDecoderConfig":
        get = d.get
        return cls(
            hidden_size=get("hidden_size", cls.hidden_size),
            num_hidden_layers=get("num_hidden_layers", cls.num_hidden_layers),
            num_attention_heads=get(
                "num_attention_heads", cls.num_attention_heads
            ),
            num_key_value_heads=get(
                "num_key_value_heads", cls.num_key_value_heads
            ),
            head_dim=get("head_dim", cls.head_dim),
            intermediate_size=get("intermediate_size", cls.intermediate_size),
            hidden_act=get("hidden_act", cls.hidden_act),
            vocab_size=get("vocab_size", cls.vocab_size),
            max_position_embeddings=get(
                "max_position_embeddings", cls.max_position_embeddings
            ),
            rms_norm_eps=get("rms_norm_eps", cls.rms_norm_eps),
            rope_theta=get("rope_theta", cls.rope_theta),
            mrope_section=get("mrope_section", [24, 20, 20]),
            rope_interleaved=get("rope_interleaved", cls.rope_interleaved),
        )


@dataclass
class ModelConfig:
    """Top-level Qwen3-ASR model configuration."""

    audio_encoder: AudioEncoderConfig = field(default_factory=AudioEncoderConfig)
    text_decoder: TextDecoderConfig = field(default_factory=TextDecoderConfig)
    audio_token_id: int = 151676
    audio_start_token_id: int = 151669
    audio_end_token_id: int = 151670

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ModelConfig":
        return cls(
            audio_encoder=AudioEncoderConfig.from_dict(d),
            text_decoder=TextDecoderConfig.from_dict(d),
            audio_token_id=d.get("audio_token_id", 151676),
            audio_start_token_id=d.get("audio_start_token_id", 151669),
            audio_end_token_id=d.get("audio_end_token_id", 151670),
        )

    @classmethod
    def from_pretrained(cls, model_path: str | Path) -> "ModelConfig":
        """Load from a local directory or a HuggingFace Hub repo id."""
        path = Path(model_path)
        if path.is_dir():
            d = json.loads((path / "config.json").read_text(encoding="utf-8"))
        else:
            from huggingface_hub import hf_hub_download

            f = hf_hub_download(repo_id=str(model_path), filename="config.json")
            d = json.loads(Path(f).read_text(encoding="utf-8"))
        return cls.from_dict(d)


def conv_output_length(input_length: int) -> int:
    """Length after the 3-layer stride-2/pad-1/k-3 conv stem.

    Each conv maps L -> (L + 2 - 3) // 2 + 1 = (L - 1) // 2 + 1.
    Parity: /root/reference/src/qwen3_asr_mlx/encoder.py:197-207.
    """
    length = input_length
    for _ in range(3):
        length = (length - 1) // 2 + 1
    return length


# ---------------------------------------------------------------------------
# TPU runtime configuration (no reference counterpart)
# ---------------------------------------------------------------------------

# Mel-frame buckets: multiples of 800 frames (one 104-token attention window
# = 8 chunks = 800 frames) so that every compiled encoder shape holds an
# integer number of windows.  100 mel frames per second of audio.
DEFAULT_FRAME_BUCKETS: tuple[int, ...] = (
    800,       # <= 8 s
    1_600,     # <= 16 s
    3_200,     # <= 32 s
    6_400,     # ~1 min
    12_800,    # ~2 min
    24_000,    # 4 min
    48_000,    # 8 min
    72_000,    # 12 min
    96_000,    # 16 min
    121_600,   # 20 min (chunk_duration default) + slack: long-form split
               # points snap to low-energy frames within +/-5 s of each
               # chunk_duration multiple (audio/io.py:find_split_points),
               # so a worst-case chunk is ~1210 s = 121,000 frames; the
               # bucket rounds up to a whole 800-frame window.
)

# Decode-step buckets for the autoregressive token budget.
DEFAULT_TOKEN_BUCKETS: tuple[int, ...] = (128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


@dataclass
class RuntimeConfig:
    """TPU execution knobs: dtypes, shape buckets, mesh layout."""

    param_dtype: str = "bfloat16"     # weight storage dtype
    compute_dtype: str = "bfloat16"   # activation dtype inside transformer
    mel_dtype: str = "float32"        # mel frontend stays f32 for fidelity
    frame_buckets: tuple[int, ...] = DEFAULT_FRAME_BUCKETS
    token_buckets: tuple[int, ...] = DEFAULT_TOKEN_BUCKETS
    # Mesh axis sizes; (1, 1) = single chip.  dp replicates, tp shards
    # attention heads / FFN columns.
    dp: int = 1
    tp: int = 1
    # Max decode batch for the batched/continuous decode path.
    max_batch_size: int = 8
    # Weight quantization: "none" (bf16, token-identical greedy contract)
    # or "int8" (weight-only, ~2x decode HBM traffic reduction; opt-in
    # accuracy trade — see ops/quant.py).
    quantization: str = "none"
    # Activation quantization for the PREFILL-side decoder matmuls
    # (requires quantization="int8"): "none" (default — weight-only
    # dequant, the dot runs at the bf16 MXU rate) or "int8" (dynamic
    # per-token absmax activation quant + int8 x int8 -> int32 MXU dot).
    # The v5e MXU runs int8 dots at 2x bf16 (tools/int8_mxu_probe.py:
    # 1.67-2.04x measured at the prefill shapes), and prefill dense is
    # MXU-bound (docs/PERFORMANCE.md round-4 xprof), so this is the one
    # lever that moves prefill.  Only matmuls with
    # >= ``act_quant_min_rows`` flattened rows take the int8 dot —
    # single-token decode steps (M = batch) stay weight-only, where the
    # HBM stream, not the MXU, is the bound.  Opt-in accuracy trade on
    # top of int8 weights (adds per-token activation rounding error).
    act_quant: str = "none"
    act_quant_min_rows: int = 256
    # KV-cache storage dtype for the batched decode loop: "bf16"
    # (default; bit-exact reference semantics) or "int8" (per-row absmax
    # quantization, ops/quant_kv.py — halves the dominant decode-time
    # HBM stream and the cache footprint; opt-in accuracy trade like
    # ``quantization``).  Prefill always runs bf16; the cache is
    # quantized once post-prefill and fresh decode rows quantize as
    # they are written.
    kv_cache_dtype: str = "bf16"
    # Speculative greedy decoding: inside the compiled decode loop,
    # propose ``spec_gamma`` continuation tokens by n-gram lookup over
    # the generated stream (ops/speculative.py) and verify them in ONE
    # multi-token forward — token-identical to plain greedy, because a
    # draft token is accepted only when it equals the model's own
    # argmax.  Wins when decode is weight-stream bound (small batch):
    # verifying gamma+1 positions costs barely more than one token.
    # Round-4 matrix on v5e (tools/spec_bench.py, device ms/token at
    # B=1): 4.80 vs 4.56 at the zero-acceptance floor (-5.4%), 1.27 vs
    # 4.61 at the full-acceptance ceiling (+3.6x) — near-free downside,
    # large upside, no accuracy trade.
    #   "auto" (default) — ngram for greedy requests with batch <=
    #     ``spec_auto_max_batch``, plain loop otherwise (at large batch
    #     decode is attention/FLOP-bound and verify positions cost real
    #     time).  The ceiling is measurement-backed: the round-4
    #     random-init sweep (tools/spec_bench.py, near-floor acceptance
    #     1.06-1.25 tok/forward) has spec FASTER at every batch tried —
    #     4.78→4.51 ms/tok at B=2, 4.71→3.70 at B=4, 5.19→4.15 at B=8 —
    #     so auto covers B <= 8; beyond that is unmeasured.
    #   "ngram" — always (greedy requests; sampled requests take the
    #     standard loop either way).  "off" — never.
    # ``spec_ngram`` is the HIGHEST draft order: the lookup tries
    # n-grams from this order down to 2, longest context first
    # (prompt-lookup convention; each extra order is one more static
    # equality sweep — noise next to the verify forward).  Identity is
    # unaffected either way; draft order only moves acceptance.
    speculative: str = "auto"
    spec_gamma: int = 3
    spec_ngram: int = 3
    spec_auto_max_batch: int = 8
    # Speculative SAMPLING (temperature > 0): verify the n-gram draft by
    # rejection sampling (ops/sampling.py:spec_verify_sample) — accept a
    # drafted token with probability p(draft) under the full sampling
    # transform, else draw from the residual distribution.  Every
    # emitted token is an EXACT draw from the plain sampler's
    # distribution (penalty / temperature / top-k / top-p honored), but
    # the RNG stream is consumed differently, so a fixed seed yields a
    # different (equally valid) sample than speculative="off" — which is
    # why this is opt-in rather than folded into "auto": the default
    # keeps sampled decoding bit-reproducible against the plain path.
    # Gating batch limits are shared with greedy spec (``speculative`` /
    # ``spec_auto_max_batch``).
    spec_sampling: bool = False
    # Speculative verify chunks in the continuous engine
    # (runtime/engine.py): all-greedy chunks run one ngram-draft +
    # multi-token verify per iteration instead of one token, so serving
    # inherits the draft win while admission/retirement still happen at
    # chunk boundaries.  Flat engines need bf16 KV (XLA verify split);
    # paged engines take bf16 AND int8 pools via the paged verify
    # kernel, whose T x group query rows ride the sublane pad a
    # single-token step wastes — the verify pass costs one step's page
    # walk regardless of width.
    #   "auto" (default) — spec chunks when the engine was built with
    #     n_slots <= ``spec_engine_max_slots`` (flat: weight-stream-
    #     bound widths; at wider slots the XLA verify re-reads the whole
    #     cache and the extra positions cost real time) or
    #     <= ``spec_engine_max_slots_paged`` (paged: the kernel makes
    #     verify ~free, so the ceiling is where the 4x dense FLOPs turn
    #     compute-bound).  Measured on v5e: flat B=8 wins even near the
    #     zero-acceptance floor (4.36 vs 5.28 ms/token,
    #     tools/spec_bench.py --batch 8); paged n_slots=16 wins 1.90x,
    #     n_slots=32 wins 1.43x, n_slots=48 wins 1.28x at 2.85
    #     tok/forward (bf16 pool, admission capped at 32 — the 48-wide
    #     padded prefill would OOM 16 GiB HBM), and n_slots=64 (the
    #     ceiling itself; int8 pool, which is what fits 64 slots on
    #     16 GiB) still wins 1.18x at 2.93 tok/forward on the mixed
    #     serving workload (docs/PERFORMANCE.md A/B table) — the
    #     multiplier shrinks with width as the 4x dense rows per verify
    #     approach compute-bound; beyond 64 is unmeasured.
    #   "on" — every all-greedy chunk.  "off" — never.
    spec_engine: str = "auto"
    spec_engine_max_slots: int = 8
    spec_engine_max_slots_paged: int = 64
    # Fuse Q|K|V and gate|up projections into single matmuls (pure
    # re-layout, identical math).  Auto-disabled under tensor parallelism
    # (fused column order misaligns with head sharding).
    fuse_qkv: bool = True
    # Cap on preallocated decode slots per sequence.  The reference's
    # auto budget (50 tokens per audio second, model.py:311) reaches 60k
    # for a 20-minute chunk, but its cache grows lazily; a preallocated
    # cache must bound it.  4096 tokens ≈ 22 minutes of speech-dense
    # transcript — above any real 20-minute chunk, and keeps the K+V pair
    # for a 20-min prompt bucket under ~4.6 GB.
    max_decode_slots: int = 4096
    # HBM budget for KV caches when sizing chunk groups (GiB).
    kv_cache_budget_gb: float = 6.0
    # Unroll the 28 decoder layers in the decode loop.  Static per-layer
    # weight indices avoid the scan's traced-index weight slicing (which
    # copies every weight each step); costs a much longer compile.
    unroll_decode_layers: bool = False
    # Default static size of the repetition-penalty gather window compiled
    # into the decode program (covers the reference default context of 100,
    # generate.py:26).  Requests with a larger ``repetition_context_size``
    # select the smallest covering bucket from ``rep_window_buckets`` —
    # one extra compile per bucket ever hit — so arbitrary context sizes
    # up to the largest bucket are honored exactly, matching the
    # reference's Python-list window (generate.py:289-315).  Contexts
    # beyond the largest bucket clamp with a logged warning.
    rep_window: int = 128
    rep_window_buckets: tuple[int, ...] = (128, 256, 512, 1024)
    # Static candidate-pool sizes for stochastic sampling: the smallest
    # bucket covering the request's ``top_k`` is compiled (exactness for
    # any top_k <= the largest bucket; see ops/sampling.py TOP_K_SUBSET).
    top_k_subset_buckets: tuple[int, ...] = (1024, 4096, 16384)
    # Batched prefill is dispatched in sub-groups of this many sequences so
    # the host->device audio transfer of group g+1 overlaps the device
    # compute of group g (the dev tunnel moves ~40 MB/s; overlapping hides
    # most of it).  0 disables grouping (one prefill for the whole batch).
    prefill_group_size: int = 8
    # Persistent XLA compile cache directory (round-3 cold-start fix: the
    # fused prefill serializes and reloads in ~0.2 s vs a 38-45 s
    # compile, and decode programs serialize too — tools/coldstart_probe
    # measurements in docs/PERFORMANCE.md).  Set at model construction
    # unless a cache dir is already configured; "" disables.
    compile_cache_dir: str = "~/.cache/qwen3_asr_tpu/xla"
    # Progressive decode compilation ("auto" = on TPU backends, "on",
    # "off").  The first decode per (shape, sampling-mode) runs on a
    # fixed-K lax.scan bridge program — token-identical, compiles fast,
    # and (unlike pallas-in-while programs on the axon backend) reloads
    # from the persistent cache — while the steady-state while-loop
    # program compiles in a background thread.  Cuts time-to-first-
    # transcription from the while-program's 60-990 s compile to the
    # bridge's seconds-scale reload.
    progressive_decode: str = "auto"
    bridge_steps: int = 16
    # Fused cold pipeline (round-3 cold-start finding): on the axon
    # backend every DISTINCT program pays a server-side compile round at
    # its first per-process execution (60-500 s shared-service variance,
    # unaffected by the client's persistent cache), so TTFT ~= service
    # rounds on the first-call path.  When enabled, the first
    # transcription per shape runs mel->encoder->prefill->first-token->
    # fixed-length-scan-decode as ONE program (one round instead of
    # prefill + bridge), and keeps serving until the background
    # while-program warm lands.  Applies to single-prefill-group bf16
    # single-chip requests with token budgets <= cold_scan_max_steps
    # (a fixed-length scan always runs its full budget; at B=1 a 2048-
    # step tail costs ~11 s — noise next to the saved compile round).
    cold_fused_first_call: bool = True
    cold_scan_max_steps: int = 2048
    # Pad the batch dimension of transcribe_batch to a bucket (powers of
    # two below 8, multiples of 8 above; exact multiples of 8 pass
    # through unpadded).  Bounds the number of compiled decode-program
    # batch widths a server with varying batch sizes can hit — without
    # it, every never-seen width pays a full XLA compile mid-traffic.
    batch_bucketing: bool = True
    # Prefill run-length granularity.  The KV cache's prompt region is
    # 256-aligned (flash tiling / decode-kernel blocks), but the prefill
    # FORWARD only needs to cover the real prompt: running it over a
    # finer 64-aligned length skips the padded tail's dense matmuls
    # (~20% of prefill FLOPs at the 30 s bucket: 408 real of 512 rows —
    # docs/PERFORMANCE.md round-3 model).  Trimmed lengths above 1024
    # round to 256 instead (single-tile flash is VMEM-bounded); 0
    # disables trimming (prefill always runs the full prompt bucket).
    # Each distinct trimmed length compiles once (persistently cached).
    prefill_run_granularity: int = 64

    def pick_bucket(self, value: int, buckets: tuple[int, ...]) -> int:
        for b in buckets:
            if value <= b:
                return b
        return buckets[-1]

    def pick_rep_window(self, rep_ctx: int, token_bucket: int) -> int:
        """Static gather-window size honoring ``repetition_context_size``.

        Only generated tokens enter the window (parity:
        the reference seeds its context from the generated list,
        generate.py:289-315), so any context >= the token budget is fully
        covered by a ``token_bucket``-sized window.  Returns the smallest
        covering bucket, never below the configured default; a context
        beyond the largest bucket clamps there (caller logs).
        """
        want = min(max(rep_ctx, 0), token_bucket)
        if want <= self.rep_window:
            return self.rep_window
        return self.pick_bucket(want, self.rep_window_buckets)

    def pick_top_k_subset(self, top_k: int, vocab_size: int) -> int:
        """Static candidate-pool size covering the request's ``top_k``."""
        want = min(max(top_k, 0), vocab_size)
        return self.pick_bucket(want, self.top_k_subset_buckets)

    def plan_prefill_run(self, max_prompt_len: int, prompt_bucket: int) -> int:
        """Prefill forward length covering ``max_prompt_len`` at the
        configured granularity (<= ``prompt_bucket``; cache geometry is
        unaffected — the fresh-prefill cache pads to the full bucket)."""
        g = self.prefill_run_granularity
        if not g:
            return prompt_bucket
        run = -(-max_prompt_len // g) * g
        if run > 1024:
            # Long prompts stay 256-aligned: the flash kernel's
            # single-tile fallback for non-256-multiples is VMEM-bounded.
            run = -(-max_prompt_len // 256) * 256
        return min(max(run, g), prompt_bucket)
