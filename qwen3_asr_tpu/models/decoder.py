"""Qwen3 text decoder: GQA + QK-norm + RoPE + SwiGLU, pure-functional.

Architecture parity with /root/reference/src/qwen3_asr_mlx/decoder.py:87-253
(28 pre-norm layers, 16Q/8KV heads of dim 128, per-head RMSNorm on Q and K
applied *before* RoPE, non-interleaved RoPE theta=1e6, SwiGLU MLP, tied
lm_head).

TPU-first design decisions (deliberately NOT the reference's shape):
  * Layer parameters are stacked along a leading (num_layers, ...) axis and
    the layer stack runs under ``lax.scan`` — compile time is one layer,
    not 28, and XLA pipelines the weight fetches.
  * The KV cache is a preallocated ``(layers, B, kv_heads, S, head_dim)``
    ring written with ``dynamic_update_slice`` / scatter — the reference
    reallocates via ``mx.concatenate`` every decoded token
    (decoder.py:54-64).
  * Attention masks are computed from position iota, never materialized on
    the host; queries carry explicit absolute positions so right-padded
    prefill and per-sequence decode slots compile to one program.
  * Linear weights are stored (in_features, out_features) so every matmul
    is a plain ``x @ w`` on the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import TextDecoderConfig
from ..ops.attention import sdpa
from ..ops.norms import rms_norm
from ..ops.quant import is_quantized, qlinear
from ..ops.quant_kv import is_quantized_kv, kv_seq_len, quantize_kv
from ..ops.rope import rope_rotate

DecoderParams = dict[str, Any]

#: Decode attention implementation.  "auto"/"5" (default) = the v5
#: dual-granularity manual-DMA Pallas kernel (decode_attention_hbm4.py:
#: per-core pipelined (batch, block) stream, 4-buffer DMA prefetch, large
#: prompt blocks + 128-row decode blocks, fused self-term) — measured at
#: the HBM bandwidth bound (~89% of peak) on v5e.  "4" = v4 uniform-block
#: kernel (same speed where its S-tiling constraint holds), "3" = v3
#: whole-batch-element cells, "0" = XLA fusion.  Superseded modes 1-2
#: (BlockSpec grid / per-(b,h) cells) were deleted in round 2; their
#: negative results are recorded in docs/PERFORMANCE.md.
DECODE_KERNEL_MODE = __import__("os").environ.get("QWEN3_ASR_DECODE_KERNEL", "auto")


#: Use the Pallas causal flash kernel for prefill (attn_impl="auto").
#: QWEN3_ASR_PREFILL_FLASH=0 falls back to the XLA causal path.
PREFILL_FLASH_ENABLED = (
    __import__("os").environ.get("QWEN3_ASR_PREFILL_FLASH", "1") != "0"
)


#: True while decoder programs are traced for a multi-device GSPMD mesh.
#: Manual Pallas kernels are opaque to the partitioner, so under SPMD they
#: run inside ``shard_map`` with explicit per-shard specs: the KV cache is
#: sharded over the head axis (parallel/sharding.py:kv_cache_sharding) and
#: GQA keeps each query head's group on the same shard as its KV head, so
#: every shard runs the unmodified kernel on its local heads — no
#: collectives inside attention at all.  Set via :func:`set_spmd` by the
#: API when it builds a mesh (process-wide; mixing sharded and unsharded
#: models in one process keeps the conservative path for both).  Without a
#: mesh object (legacy ``set_spmd(True)``) kernels are disabled and the
#: XLA paths shard via GSPMD as in round 2.
_SPMD = False
_SPMD_MESH = None

def set_spmd(on: bool, mesh=None) -> None:
    global _SPMD, _SPMD_MESH
    _SPMD = bool(on)
    _SPMD_MESH = mesh if on else None
    # Keep ops/quant.py's kernel gate in sync (the fused W8A8 matmul is
    # GSPMD-incompatible; see quant.set_spmd).
    from ..ops import quant as _quant

    _quant.set_spmd(on)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu" and not _SPMD


#: KV-cache row writers: "auto" = aliased Pallas writers on TPU (in-place,
#: no full-cache copy), "xla" = plain XLA scatters/updates (XLA copies the
#: cache per step — ~0.3 ms at B=1, ~4 ms at B=32).  The XLA mode exists
#: for first-flight programs: on the axon backend, decode programs
#: containing scalar-prefetch/aliased Pallas calls stall for minutes at
#: their first per-process execution even on a persistent-cache hit
#: (docs/PERFORMANCE.md cold start), while pallas-free programs execute
#: immediately.
KV_WRITER_MODE = __import__("os").environ.get("QWEN3_ASR_KV_WRITER", "auto")


def _use_pallas_writer() -> bool:
    return _use_pallas() and KV_WRITER_MODE != "xla"


def _spmd_kernels_env() -> str:
    """QWEN3_ASR_SPMD_KERNELS: "auto" (kernels on real TPU meshes), "0"
    (force the XLA paths), "interpret" (force the shard_map kernel path
    with interpret-mode Pallas — virtual CPU mesh tests).  Read per call
    so tests can toggle it."""
    import os

    return os.environ.get("QWEN3_ASR_SPMD_KERNELS", "auto")


def _spmd_kernel_ok() -> bool:
    """Pallas kernels under SPMD: shard_map path available?"""
    if not (_SPMD and _SPMD_MESH is not None):
        return False
    env = _spmd_kernels_env()
    if env == "0":
        return False
    if env == "interpret":
        return True
    return jax.default_backend() == "tpu"


def _spmd_interpret() -> bool:
    return _spmd_kernels_env() == "interpret" and jax.default_backend() != "tpu"


def _hbm4_shard_map(q, kall, vall, k_new, v_new, layer, plen, dend, pbucket, scale):
    """v5 decode-attention inside shard_map: each (dp, tp) shard runs the
    unmodified kernel over its local batch slice and KV heads.  GQA head
    grouping is contiguous (q head h -> kv head h // group), so tp shards
    of nq/tp query heads align exactly with nkv/tp KV heads — attention
    needs NO collectives; the surrounding projections keep their GSPMD
    Megatron pattern (parallel/sharding.py)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas.decode_attention_hbm4 import decode_attention_hbm4

    interp = _spmd_interpret()
    mesh = _SPMD_MESH

    def local(q, kall, vall, k_new, v_new, layer, plen, dend):
        return decode_attention_hbm4(
            q, kall, vall, k_new, v_new, layer, plen, dend, pbucket,
            scale=scale, interpret=interp,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("dp", "tp", None),                 # q (B, Hq, D)
            P(None, "dp", "tp", None, None),     # kall (L, B, Hkv, S, D)
            P(None, "dp", "tp", None, None),
            P("dp", "tp", None, None),           # k_new (B, Hkv, 1, D)
            P("dp", "tp", None, None),
            P(),                                 # layer scalar
            P("dp"),                             # prompt_len (B,)
            P("dp"),                             # decode_end (B,)
        ),
        out_specs=P("dp", "tp", None),
        check_rep=False,
    )(q, kall, vall, k_new, v_new, layer, plen, dend)


def _kv_write_shard_map(cache, rows, slots, uniform: bool):
    """Aliased Pallas row writers inside shard_map (same layout logic as
    :func:`_hbm4_shard_map`); keeps the in-place cache update under SPMD
    instead of XLA's full-cache copy."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas.kv_write import kv_write_rows, kv_write_rows_batch

    interp = _spmd_interpret()
    mesh = _SPMD_MESH
    spec_c = P(None, "dp", "tp", None, None)

    if uniform:
        def local(cache, rows, slot):
            return kv_write_rows(cache, rows, slot, interpret=interp)

        return shard_map(
            local, mesh=mesh,
            in_specs=(spec_c, spec_c, P()),
            out_specs=spec_c, check_rep=False,
        )(cache, rows, slots)

    def local(cache, rows, slots):
        return kv_write_rows_batch(cache, rows, slots, interpret=interp)

    return shard_map(
        local, mesh=mesh,
        in_specs=(spec_c, spec_c, P("dp")),
        out_specs=spec_c, check_rep=False,
    )(cache, rows, slots)


def init_decoder_params(
    cfg: TextDecoderConfig,
    rng: jax.Array | None = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> DecoderParams:
    """Random (or zero when ``rng`` is None) decoder parameters.

    Layout::

        embedding            (vocab, hidden)
        layers/ln1           (L, hidden)          input_layernorm
        layers/ln2           (L, hidden)          post_attention_layernorm
        layers/wq,wk,wv,wo   (L, in, out)
        layers/q_norm,k_norm (L, head_dim)
        layers/wg,wu,wd      (L, in, out)         SwiGLU
        final_norm           (hidden,)
    """
    L = cfg.num_hidden_layers
    H = cfg.hidden_size
    D = cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    inter = cfg.intermediate_size

    shapes = {
        "embedding": (cfg.vocab_size, H),
        "layers": {
            "ln1": (L, H),
            "ln2": (L, H),
            "wq": (L, H, nq * D),
            "wk": (L, H, nkv * D),
            "wv": (L, H, nkv * D),
            "wo": (L, nq * D, H),
            "q_norm": (L, D),
            "k_norm": (L, D),
            "wg": (L, H, inter),
            "wu": (L, H, inter),
            "wd": (L, inter, H),
        },
        "final_norm": (H,),
    }

    def make(path, shape):
        name = path[-1]
        if name.startswith(("ln", "q_norm", "k_norm")) or name == "final_norm":
            return jnp.ones(shape, dtype)
        if rng is None:
            return jnp.zeros(shape, dtype)
        import zlib

        key = jax.random.fold_in(rng, zlib.crc32("/".join(path).encode()))
        scale = 0.02
        return (scale * jax.random.normal(key, shape, jnp.float32)).astype(dtype)

    def build(tree, path=()):
        if isinstance(tree, dict):
            return {k: build(v, path + (k,)) for k, v in tree.items()}
        return make(path, tree)

    return build(shapes)


def init_kv_cache(
    cfg: TextDecoderConfig,
    batch: int,
    max_len: int,
    dtype: jnp.dtype = jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Preallocated (keys, values), each (L, B, kv_heads, max_len, head_dim)."""
    shape = (
        cfg.num_hidden_layers,
        batch,
        cfg.num_key_value_heads,
        max_len,
        cfg.head_dim,
    )
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def fuse_decoder_params(params: DecoderParams) -> DecoderParams:
    """Concatenate Q|K|V and gate|up projections into single matmuls.

    4 big matmuls per layer instead of 7 — better MXU utilization at the
    small row counts of decode and fewer weight-fetch streams.  Pure
    re-layout (identical math); apply before quantization.  Prefer the
    unfused layout under tensor parallelism: the fused column order does
    not align with head-boundary sharding.
    """
    layers = dict(params["layers"])
    layers["wqkv"] = jnp.concatenate(
        [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1
    )
    layers["wgu"] = jnp.concatenate(
        [layers.pop("wg"), layers.pop("wu")], axis=-1
    )
    return {**params, "layers": layers}


def embed_tokens(params: DecoderParams, ids: jax.Array) -> jax.Array:
    """Token embedding lookup, (..., ) -> (..., hidden).

    Quantized embeddings are stored transposed (H, V) int8 with per-vocab
    scales; lookup gathers columns and rescales.
    """
    emb = params["embedding"]
    if is_quantized(emb):
        rows = jnp.moveaxis(jnp.take(emb["q"], ids, axis=1), 0, -1)
        rows = rows.astype(jnp.float32) * emb["s"][ids][..., None]
        return rows.astype(params["final_norm"].dtype)
    return emb[ids]


def _project_qkv(h, lp, cfg: TextDecoderConfig, pos_b):
    """ln1 -> fused-or-split QKV -> per-head QK RMSNorm -> RoPE.

    Returns (q (B, nq, T, D), k (B, nkv, T, D), v (B, nkv, T, D)).
    """
    B, T, _ = h.shape
    nq, nkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    x = rms_norm(h, lp["ln1"], eps)
    if "wqkv" in lp:
        fused = qlinear(x, lp["wqkv"])
        q, k, v = jnp.split(fused, [nq * D, (nq + nkv) * D], axis=-1)
        q = q.reshape(B, T, nq, D)
        k = k.reshape(B, T, nkv, D)
        v = v.reshape(B, T, nkv, D)
    else:
        q = qlinear(x, lp["wq"]).reshape(B, T, nq, D)
        k = qlinear(x, lp["wk"]).reshape(B, T, nkv, D)
        v = qlinear(x, lp["wv"]).reshape(B, T, nkv, D)

    # Per-head QK RMSNorm before RoPE (Qwen3 signature).
    q = rms_norm(q, lp["q_norm"], eps).transpose(0, 2, 1, 3)
    k = rms_norm(k, lp["k_norm"], eps).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    q = rope_rotate(q, pos_b, cfg.rope_theta)
    k = rope_rotate(k, pos_b, cfg.rope_theta)
    return q, k, v


def _mlp_block(h, lp, eps):
    """Pre-norm SwiGLU MLP with residual."""
    x = rms_norm(h, lp["ln2"], eps)
    if "wgu" in lp:
        gate, up = jnp.split(qlinear(x, lp["wgu"]), 2, axis=-1)
    else:
        gate, up = qlinear(x, lp["wg"]), qlinear(x, lp["wu"])
    return h + qlinear(jax.nn.silu(gate) * up, lp["wd"])


def decoder_forward(
    params: DecoderParams,
    cfg: TextDecoderConfig,
    hidden: jax.Array,
    positions: jax.Array,
    kv_cache: tuple[jax.Array, jax.Array] | None = None,
    write_slots: jax.Array | None = None,
    attn_impl: str = "auto",
    attn_mask: jax.Array | None = None,
    uniform_write: bool = False,
    decode_ctx: tuple[jax.Array, jax.Array, int] | None = None,
    unroll_layers: bool = False,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array] | None]:
    """Run the layer stack over pre-computed input embeddings.

    Parameters
    ----------
    hidden:
        ``(B, T, hidden)`` input embeddings (audio features already injected
        for prefill).
    positions:
        ``(B, T)`` int32 absolute positions of each query token.  Also
        defines causality: token (b, t) attends cache slots ``<=
        positions[b, t]``, which is exact for the contiguous
        prompt-then-decode cache layout.
    kv_cache:
        Optional preallocated ``(keys, values)``; when None a cache sized to
        T is created (stateless full-context pass).
    write_slots:
        ``(B,)`` int32 slot where each sequence's first new K/V row lands.
        New rows occupy ``write_slots .. write_slots + T``.  When all
        sequences share the slot (prefill at 0) pass a scalar-like array;
        per-sequence slots drive batched decode.
    attn_mask:
        Optional boolean override ``(B, 1, T, S)`` (True = attend) replacing
        the default slot<=position causality — used by the batched decode
        loop whose cache layout separates prompt and decode regions.
    uniform_write:
        Static promise that every sequence writes at the SAME slot
        (``write_slots[0]``), enabling a ``dynamic_update_slice`` instead
        of a batched scatter.
    decode_ctx:
        ``(prompt_len (B,), decode_end scalar, prompt_bucket int)`` — the
        two-interval cache validity of the batched decode loop.  On TPU
        with T == 1 this routes attention through the fused Pallas
        flash-decode kernel; elsewhere it expands to a boolean mask.
    attn_impl:
        "cache"  — attend over the cache with the position mask (general;
                   the only valid choice for incremental decode);
        "flash"  — prefill-from-zero fast path: attend over the FRESH
                   k/v with the Pallas causal flash kernel (requires
                   write_slots == 0, positions == iota, T a multiple of
                   the kernel blocks — the runtime's buckets guarantee it);
        "causal" — same fast path but plain jnp (differentiable, any T);
        "auto"   — "flash" when prefill-shaped on TPU, else "causal" for
                   multi-token prefill, else "cache".

    Returns
    -------
    (hidden_out, (keys, values)) — hidden is pre-final-norm, ``(B, T, H)``.
    """
    B, T, H = hidden.shape
    fresh_prefill = write_slots is None and T > 1
    if kv_cache is None:
        kv_cache = init_kv_cache(cfg, B, T, hidden.dtype)
    if write_slots is None:
        write_slots = jnp.zeros((B,), jnp.int32)
    write_slots = jnp.broadcast_to(jnp.asarray(write_slots, jnp.int32), (B,))

    if attn_impl == "auto":
        if fresh_prefill:
            # 256-multiples use the tiled grid; 64-aligned trimmed runs
            # (RuntimeConfig.prefill_run_granularity) up to 1024 take the
            # kernel's single-tile fallback.
            flash_ok = (
                PREFILL_FLASH_ENABLED
                and (T % 256 == 0 or (T % 64 == 0 and T <= 1024))
                and cfg.head_dim % 128 == 0
                and _use_pallas()
            )
            attn_impl = "flash" if flash_ok else "causal"
        else:
            attn_impl = "cache"

    keys_all, values_all = kv_cache
    # int8 cache ({"q", "s"} pytrees, ops/quant_kv.py): decode-only — the
    # runtime quantizes AFTER prefill, so every multi-token path below
    # still sees plain arrays.
    kv_q8 = is_quantized_kv(keys_all)
    if kv_q8 and not (decode_ctx is not None and T == 1):
        raise ValueError("int8 KV caches support single-token decode only")
    S = kv_seq_len(keys_all)
    nq, nkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    scale = D ** -0.5

    if attn_mask is None and decode_ctx is not None:
        plen, dend, pbucket = decode_ctx
        dend_b = jnp.broadcast_to(jnp.asarray(dend, jnp.int32), (B,))
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)
        attn_mask = (slot_ids < plen[:, None, None, None]) | (
            (slot_ids >= pbucket) & (slot_ids <= dend_b[:, None, None, None])
        )
    if attn_mask is None:
        # Causal-by-position mask over cache slots: (B, 1, T, S).
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)
        attn_mask = slot_ids <= positions[:, None, :, None]

    uniform_slot = B == 1 or uniform_write
    pos_b = positions[:, None, :]  # (B, 1, T) broadcast over heads

    # The cache rides the scan CARRY (not ys): each layer writes only its
    # fresh (B, nkv, T, D) rows in place via dynamic_update_slice into the
    # full (L, ...) buffer.  Stacked-ys scan output would rematerialize the
    # ENTIRE cache every call — a full-cache HBM write per decode step.
    def write_kv(cache_all, layer, new):
        # cache_all (L, B, nkv, S, D); new (B, nkv, T, D)
        new = new.astype(cache_all.dtype)[None]
        if uniform_slot:
            return jax.lax.dynamic_update_slice(
                cache_all, new, (layer, 0, 0, write_slots[0], 0)
            )
        t_idx = write_slots[:, None] + jnp.arange(T)[None, :]  # (B, T)
        return cache_all.at[
            layer,
            jnp.arange(B)[:, None, None],
            jnp.arange(nkv)[None, :, None],
            t_idx[:, None, :],
        ].set(new[0], mode="drop")

    # Split-attention decode: with T == 1 the fresh token's self-term is a
    # dot product, so attention runs over the PRE-STEP cache (read-only,
    # closed over — no per-layer traced-index writes, which lower to
    # expensive scatters) and the step's 28 new K/V rows are written by ONE
    # post-scan batched write.  Per-sequence write slots / decode ends
    # (continuous batching: sequences at heterogeneous depths) take the
    # same path — only the post-scan writer and the mask differ.
    decode_split = decode_ctx is not None and T == 1
    want_hbm = DECODE_KERNEL_MODE in ("3", "4", "5", "auto")
    use_hbm_kernel = (
        decode_split
        and want_hbm
        and _use_pallas()
        and S % 128 == 0
        and D % 128 == 0
    )
    if use_hbm_kernel and not uniform_write and B > 1:
        # Heterogeneous depths need the per-sequence-aware v5 kernel.
        _pb = decode_ctx[2]
        use_hbm_kernel = _pb % 128 == 0 and (S - _pb) % 128 == 0
    if use_hbm_kernel and kv_q8:
        # int8 caches are implemented only by the v5 kernel's _q8 variant.
        _pb = decode_ctx[2]
        use_hbm_kernel = (
            DECODE_KERNEL_MODE in ("auto", "5")
            and _pb % 128 == 0
            and (S - _pb) % 128 == 0
        )

    # SPMD fast path: the v5 kernel runs per-shard inside shard_map (KV
    # sharded over heads by tp, batch over dp; GQA groups never cross a
    # shard), instead of round 2's silent downgrade to XLA attention.
    spmd_kernel = False
    if (
        decode_split and want_hbm and not use_hbm_kernel and not kv_q8
        and _spmd_kernel_ok() and S % 128 == 0 and D % 128 == 0
    ):
        _pb = decode_ctx[2]
        _axes = dict(_SPMD_MESH.shape)
        _tp, _dp = _axes.get("tp", 1), _axes.get("dp", 1)
        spmd_kernel = (
            _pb % 128 == 0 and (S - _pb) % 128 == 0
            and nkv % _tp == 0 and nq % _tp == 0
            and (nq // _tp) % (nkv // _tp) == 0
            and B % _dp == 0
        )

    def qkv(h, lp):
        return _project_qkv(h, lp, cfg, pos_b)

    def mlp(h, lp):
        return _mlp_block(h, lp, eps)

    if decode_split:
        plen, dend, pbucket = decode_ctx
        dend_b = jnp.broadcast_to(jnp.asarray(dend, jnp.int32), (B,))
        group = nq // nkv
        # Old-cache validity: strictly before each sequence's current slot.
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, S), 4)
        cache_mask = (slot_ids < plen[:, None, None, None, None]) | (
            (slot_ids >= pbucket)
            & (slot_ids < dend_b[:, None, None, None, None])
        )
        neg = float(jnp.finfo(jnp.float32).min) / 2

        def layer_fn(carry, xs):
            h, layer = carry
            lp = xs
            q, k_new, v_new = qkv(h, lp)

            if spmd_kernel:
                attn = _hbm4_shard_map(
                    q[:, :, 0, :], keys_all, values_all, k_new, v_new,
                    layer, plen, dend_b, pbucket, scale,
                )[:, :, None, :]
                attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nq * D)
                h = h + qlinear(attn, lp["wo"])
                h = mlp(h, lp)
                return (h, layer + 1), (k_new, v_new)

            if use_hbm_kernel and kv_q8:
                from ..ops.pallas.decode_attention_hbm4 import (
                    decode_attention_hbm4_q8,
                )

                attn = decode_attention_hbm4_q8(
                    q[:, :, 0, :], keys_all, values_all, k_new, v_new,
                    layer, plen, dend_b, pbucket, scale=scale,
                )[:, :, None, :]
                attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nq * D)
                h = h + qlinear(attn, lp["wo"])
                h = mlp(h, lp)
                return (h, layer + 1), (k_new, v_new)

            if use_hbm_kernel:
                per_seq = not uniform_slot
                if not per_seq and DECODE_KERNEL_MODE == "3":
                    from ..ops.pallas.experiments.decode_attention_hbm2 import (
                        decode_attention_hbm2 as hbm_attn,
                    )
                elif not per_seq and DECODE_KERNEL_MODE == "4":
                    from ..ops.pallas.experiments.decode_attention_hbm3 import (
                        decode_attention_hbm3 as hbm_attn,
                    )
                else:
                    hbm_attn = None
                if hbm_attn is None and pbucket % 128 == 0 and (S - pbucket) % 128 == 0:
                    from ..ops.pallas.decode_attention_hbm4 import (
                        decode_attention_hbm4,
                    )

                    attn = decode_attention_hbm4(
                        q[:, :, 0, :], keys_all, values_all, k_new, v_new,
                        layer, plen, dend_b, pbucket, scale=scale,
                    )[:, :, None, :]
                else:
                    if hbm_attn is None:
                        from ..ops.pallas.experiments.decode_attention_hbm3 import (
                            decode_attention_hbm3 as hbm_attn,
                        )
                    # Biggest tile that divides both S and the prompt
                    # bucket: fewer, larger DMAs.
                    block_k = next(
                        bk for bk in (1024, 512, 256, 128)
                        if S % bk == 0 and pbucket % bk == 0
                    )
                    attn = hbm_attn(
                        q[:, :, 0, :], keys_all, values_all, k_new, v_new,
                        layer, plen, dend, pbucket, scale=scale, block_k=block_k,
                    )[:, :, None, :]
                attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nq * D)
                h = h + qlinear(attn, lp["wo"])
                h = mlp(h, lp)
                return (h, layer + 1), (k_new, v_new)

            if kv_q8:
                # XLA fallback: dequantize this layer's tiles inline (the
                # compiler fuses the scale multiply into the reads).
                kcache = jax.lax.dynamic_index_in_dim(
                    keys_all["q"], layer, 0, keepdims=False
                ).astype(jnp.float32) * jax.lax.dynamic_index_in_dim(
                    keys_all["s"], layer, 0, keepdims=False
                )[..., None]
                vcache = jax.lax.dynamic_index_in_dim(
                    values_all["q"], layer, 0, keepdims=False
                ).astype(jnp.float32) * jax.lax.dynamic_index_in_dim(
                    values_all["s"], layer, 0, keepdims=False
                )[..., None]
                kcache = kcache.astype(h.dtype)
                vcache = vcache.astype(h.dtype)
            else:
                kcache = jax.lax.dynamic_index_in_dim(keys_all, layer, 0, keepdims=False)
                vcache = jax.lax.dynamic_index_in_dim(values_all, layer, 0, keepdims=False)

            qg = q.reshape(B, nkv, group, 1, D)
            logits = jnp.einsum(
                "bkgqd,bkld->bkgql", qg, kcache,
                preferred_element_type=jnp.float32,
            ) * scale
            logits = jnp.where(cache_mask, logits, neg)
            self_logit = jnp.sum(
                qg.astype(jnp.float32)
                * k_new.astype(jnp.float32)[:, :, None],
                axis=-1, keepdims=True,
            ) * scale                                     # (B,nkv,G,1,1)
            all_logits = jnp.concatenate([logits, self_logit], axis=-1)
            w = jax.nn.softmax(all_logits, axis=-1)
            out = jnp.einsum(
                "bkgql,bkld->bkgqd", w[..., :S].astype(vcache.dtype), vcache,
                preferred_element_type=jnp.float32,
            ) + w[..., S:].astype(jnp.float32) * v_new.astype(jnp.float32)[:, :, None]
            attn = out.reshape(B, nq, T, D).astype(h.dtype)

            attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nq * D)
            h = h + qlinear(attn, lp["wo"])
            h = mlp(h, lp)
            return (h, layer + 1), (k_new, v_new)

        if unroll_layers:
            # Unrolled: static per-layer indices make the weight slices
            # zero-copy views (scan-xs slicing with a traced index copies
            # every weight through memory each step — double HBM traffic).
            n_layers = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
            rows_k, rows_v = [], []
            carry = (hidden, jnp.int32(0))
            for li in range(n_layers):
                lp_l = jax.tree_util.tree_map(lambda x, li=li: x[li], params["layers"])
                carry, (kr, vr) = layer_fn(carry, lp_l)
            # layer_fn's ys are per-call; collect manually:
                rows_k.append(kr)
                rows_v.append(vr)
            hidden = carry[0]
            k_rows = jnp.stack(rows_k)
            v_rows = jnp.stack(rows_v)
        else:
            (hidden, _), (k_rows, v_rows) = jax.lax.scan(
                layer_fn, (hidden, jnp.int32(0)), params["layers"]
            )
        # One write for all layers: rows (L, B, nkv, 1, D) at the shared
        # (or per-sequence) slot.  On TPU this goes through a Pallas kernel
        # with aliased buffers — a plain dynamic_update_slice inside the
        # while body makes XLA copy the ENTIRE cache every step (the cache
        # is read by attention earlier in the same iteration, defeating its
        # aliasing analysis; xprof measured ~4 ms/step at batch 32).
        def write_dense(cache, rows):
            if _use_pallas_writer():
                from ..ops.pallas.kv_write import (
                    kv_write_rows,
                    kv_write_rows_batch,
                )

                if uniform_slot:
                    return kv_write_rows(cache, rows, write_slots[0])
                return kv_write_rows_batch(cache, rows, write_slots)
            if spmd_kernel:
                slots_arg = write_slots[0] if uniform_slot else write_slots
                return _kv_write_shard_map(cache, rows, slots_arg, uniform_slot)
            if uniform_slot:
                return jax.lax.dynamic_update_slice(
                    cache, rows.astype(cache.dtype),
                    (0, 0, 0, write_slots[0], 0),
                )
            b_idx = jnp.arange(B)
            return cache.at[:, b_idx, :, write_slots, :].set(
                jnp.moveaxis(rows[:, :, :, 0, :], 1, 0).astype(cache.dtype)
            )

        def write_scales(scales, srows):
            # scales (L, nL?, ...) = (L, B, H, S) f32; srows (L, B, H, 1).
            # Tiny (4 B/row) — a plain update is fine even if XLA copies it.
            if uniform_slot:
                return jax.lax.dynamic_update_slice(
                    scales, srows, (0, 0, 0, write_slots[0])
                )
            b_idx = jnp.arange(B)
            return scales.at[:, b_idx, :, write_slots].set(
                jnp.moveaxis(srows[:, :, :, 0], 1, 0)
            )

        def write_rows(cache, rows):
            if is_quantized_kv(cache):
                qr = quantize_kv(rows)
                return {
                    "q": write_dense(cache["q"], qr["q"]),
                    "s": write_scales(cache["s"], qr["s"]),
                }
            return write_dense(cache, rows)

        new_keys = write_rows(keys_all, k_rows)
        new_values = write_rows(values_all, v_rows)
        return hidden, (new_keys, new_values)

    # Verify-split: the speculative-decoding verification pass — T fresh
    # tokens (current + gamma drafts) advance through the stack in ONE
    # forward against the decode cache.  Same split-attention structure as
    # the T == 1 decode step, generalized: the old cache is read-only
    # (scores masked strictly before each lane's write slot), the T fresh
    # positions attend each other through an explicit T x T causal block,
    # and all layers' T rows land in one post-scan span write.  The
    # in-scan per-layer cache writes of the general path below are
    # deliberately avoided — XLA copies the full cache per layer there
    # (see the fresh_prefill comment), which at 28 layers would dwarf the
    # step itself.
    if decode_ctx is not None and 1 < T <= 8:
        plen, ws, pbucket = decode_ctx
        ws_b = jnp.broadcast_to(jnp.asarray(ws, jnp.int32), (B,))
        group = nq // nkv
        slot_ids5 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, S), 4)
        cache_mask = (slot_ids5 < plen[:, None, None, None, None]) | (
            (slot_ids5 >= pbucket)
            & (slot_ids5 < ws_b[:, None, None, None, None])
        )
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T, T), 3)
        u_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T, T), 4)
        self_mask = u_ids <= t_ids
        neg = float(jnp.finfo(jnp.float32).min) / 2

        def verify_layer(carry, lp):
            h, layer = carry
            q, k_new, v_new = qkv(h, lp)     # q (B,nq,T,D); k/v (B,nkv,T,D)
            kcache = jax.lax.dynamic_index_in_dim(
                keys_all, layer, 0, keepdims=False
            )
            vcache = jax.lax.dynamic_index_in_dim(
                values_all, layer, 0, keepdims=False
            )
            qg = q.reshape(B, nkv, group, T, D)
            logits = jnp.einsum(
                "bkgtd,bkld->bkgtl", qg, kcache,
                preferred_element_type=jnp.float32,
            ) * scale
            logits = jnp.where(cache_mask, logits, neg)
            self_logits = jnp.einsum(
                "bkgtd,bkud->bkgtu", qg, k_new,
                preferred_element_type=jnp.float32,
            ) * scale
            self_logits = jnp.where(self_mask, self_logits, neg)
            all_logits = jnp.concatenate([logits, self_logits], axis=-1)
            w = jax.nn.softmax(all_logits, axis=-1)
            out = jnp.einsum(
                "bkgtl,bkld->bkgtd", w[..., :S].astype(vcache.dtype), vcache,
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "bkgtu,bkud->bkgtd",
                w[..., S:].astype(jnp.float32),
                v_new.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            attn = out.reshape(B, nq, T, D).astype(h.dtype)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nq * D)
            h = h + qlinear(attn, lp["wo"])
            h = mlp(h, lp)
            return (h, layer + 1), (k_new, v_new)

        (hidden, _), (k_rows, v_rows) = jax.lax.scan(
            verify_layer, (hidden, jnp.int32(0)), params["layers"]
        )

        def write_span(cache, rows):
            # rows (L, B, nkv, T, D) at slots ws_b .. ws_b + T per lane.
            if _use_pallas_writer():
                from ..ops.pallas.kv_write import kv_write_span_batch

                return kv_write_span_batch(cache, rows, ws_b)
            t_idx = ws_b[:, None] + jnp.arange(T)[None, :]      # (B, T)
            return cache.at[
                :,
                jnp.arange(B)[:, None, None],
                jnp.arange(nkv)[None, :, None],
                t_idx[:, None, :],
            ].set(rows.astype(cache.dtype), mode="drop")

        return hidden, (write_span(keys_all, k_rows),
                        write_span(values_all, v_rows))

    if fresh_prefill and attn_impl in ("flash", "causal"):
        # Prefill never READS the cache (attention runs on the fresh k/v),
        # so the cache is BUILT from the scan outputs with one pad — the
        # per-layer traced-index writes of the general path make XLA copy
        # the full cache once per layer (xprof: ~10 ms x 28 layers x 2
        # tensors per prefill at batch 32).
        def layer_fn(h, lp):
            q, k, v = qkv(h, lp)
            if attn_impl == "flash":
                from ..ops.pallas.flash_attention import flash_attention_causal

                attn = flash_attention_causal(q, k, v, scale=scale)
            else:
                local = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T, T), 3)
                causal = local <= jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, T, T), 2
                )
                attn = sdpa(q, k, v, mask=causal, scale=scale)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nq * D)
            h = h + qlinear(attn, lp["wo"])
            h = mlp(h, lp)
            return h, (k, v)

        hidden, (k_stack, v_stack) = jax.lax.scan(
            layer_fn, hidden, params["layers"]
        )
        pad = ((0, 0), (0, 0), (0, 0), (0, S - T), (0, 0))
        new_keys = jnp.pad(k_stack.astype(keys_all.dtype), pad)
        new_values = jnp.pad(v_stack.astype(values_all.dtype), pad)
        return hidden, (new_keys, new_values)

    def layer_fn(carry, lp):
        h, kall, vall, layer = carry
        q, k, v = qkv(h, lp)

        kall = write_kv(kall, layer, k)
        vall = write_kv(vall, layer, v)

        if attn_impl == "flash":
            from ..ops.pallas.flash_attention import flash_attention_causal

            attn = flash_attention_causal(q, k, v, scale=scale)
        elif attn_impl == "causal":
            local = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T, T), 3)
            causal = local <= jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, T, T), 2
            )
            attn = sdpa(q, k, v, mask=causal, scale=scale)
        else:
            kcache = jax.lax.dynamic_index_in_dim(kall, layer, 0, keepdims=False)
            vcache = jax.lax.dynamic_index_in_dim(vall, layer, 0, keepdims=False)
            attn = sdpa(q, kcache, vcache, mask=attn_mask, scale=scale)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nq * D)
        h = h + qlinear(attn, lp["wo"])
        h = mlp(h, lp)
        return (h, kall, vall, layer + 1), None

    (hidden, new_keys, new_values, _), _ = jax.lax.scan(
        layer_fn,
        (hidden, keys_all, values_all, jnp.int32(0)),
        params["layers"],
    )
    return hidden, (new_keys, new_values)


def decoder_paged_step(
    params: DecoderParams,
    cfg: TextDecoderConfig,
    hidden: jax.Array,          # (B, 1, H) current-token embeddings
    positions: jax.Array,       # (B, 1) absolute RoPE positions
    kv_pages: tuple[jax.Array, jax.Array],  # (L, n_pages, Hkv, PS, D) each
    page_table: jax.Array,      # (B, max_pages) physical page ids
    prompt_len: jax.Array,      # (B,) valid prompt rows
    decode_count: jax.Array,    # (B,) generated rows already in cache
    write_pages: jax.Array,     # (B,) physical page for this step's row
    write_offsets: jax.Array,   # (B,) row offset inside that page
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """One decode step over a PAGED KV cache (split-attention form).

    Mirrors the contiguous split-decode path of :func:`decoder_forward`:
    attention runs over the read-only pre-step pages (per-sequence page
    tables resolve the physical blocks) with the fresh token's self-term
    fused, and the step's 28 new K/V rows land post-scan via the paged
    aliased row writer.  Addressing is compact — prompt pages then decode
    pages — so no prompt_bucket arithmetic exists; positions are RoPE-only.

    The paged cache is the memory half of continuous batching (north star,
    BASELINE.json config 5): a 30 s clip next to a 15-minute clip holds
    2 pages, not the 47-page worst-case slot.
    """
    keys_all, values_all = kv_pages
    B, T, H = hidden.shape
    assert T == 1, "paged step is a single-token decode"
    nq, nkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    # int8 page pools ({"q", "s"} pytrees, ops/quant_kv.py): same split-
    # attention structure; the kernel streams scale pages alongside and the
    # post-scan writer re-quantizes the fresh rows.
    kv_q8 = is_quantized_kv(keys_all)
    PS = (keys_all["q"] if kv_q8 else keys_all).shape[3]
    n_pages_total = (keys_all["q"] if kv_q8 else keys_all).shape[1]
    maxp = page_table.shape[1]
    pos_b = positions[:, None, :]
    on_tpu = _use_pallas()
    group = nq // nkv
    neg = float(jnp.finfo(jnp.float32).min) / 2

    if not on_tpu:
        # Compact validity mask over the gathered page view (CPU fallback /
        # tests): prompt rows < plen, then decode rows < decode_count
        # starting at the first decode page boundary.
        pp = (prompt_len + PS - 1) // PS
        cols = jnp.arange(maxp * PS)[None, :]
        dstart = (pp * PS)[:, None]
        flat_mask = (cols < prompt_len[:, None]) | (
            (cols >= dstart) & (cols < dstart + decode_count[:, None])
        )
        cache_mask = flat_mask[:, None, None, None, :]   # (B,1,1,1,maxp*PS)
        table_c = jnp.clip(page_table, 0, n_pages_total - 1)

    def gather_pages(pool, layer):
        """CPU fallback: (B, Hkv, maxp*PS, D) compact dequantized view."""
        if kv_q8:
            ql = jax.lax.dynamic_index_in_dim(pool["q"], layer, 0, keepdims=False)
            sl = jax.lax.dynamic_index_in_dim(pool["s"], layer, 0, keepdims=False)
            pl_ = (
                ql[table_c].astype(jnp.float32) * sl[table_c][..., None]
            ).astype(hidden.dtype)
        else:
            pl_ = jax.lax.dynamic_index_in_dim(pool, layer, 0, keepdims=False)[
                table_c
            ]
        return jnp.moveaxis(pl_, 2, 1).reshape(B, nkv, maxp * PS, D)

    def layer_fn(carry, lp):
        h, layer = carry
        q, k_new, v_new = _project_qkv(h, lp, cfg, pos_b)

        if on_tpu:
            if kv_q8:
                from ..ops.pallas.decode_attention_paged import (
                    decode_attention_paged_q8 as paged_attn,
                )
            else:
                from ..ops.pallas.decode_attention_paged import (
                    decode_attention_paged as paged_attn,
                )

            attn = paged_attn(
                q[:, :, 0, :], keys_all, values_all, k_new, v_new,
                layer, page_table, prompt_len, decode_count, scale=scale,
            )[:, :, None, :]
        else:
            kc = gather_pages(keys_all, layer)
            vc = gather_pages(values_all, layer)
            qg = q.reshape(B, nkv, group, 1, D)
            logits = jnp.einsum(
                "bkgqd,bkld->bkgql", qg, kc,
                preferred_element_type=jnp.float32,
            ) * scale
            logits = jnp.where(cache_mask, logits, neg)
            self_logit = jnp.sum(
                qg.astype(jnp.float32) * k_new.astype(jnp.float32)[:, :, None],
                axis=-1, keepdims=True,
            ) * scale
            all_logits = jnp.concatenate([logits, self_logit], axis=-1)
            w = jax.nn.softmax(all_logits, axis=-1)
            Sc = maxp * PS
            out = jnp.einsum(
                "bkgql,bkld->bkgqd", w[..., :Sc].astype(vc.dtype), vc,
                preferred_element_type=jnp.float32,
            ) + w[..., Sc:].astype(jnp.float32) * v_new.astype(jnp.float32)[:, :, None]
            attn = out.reshape(B, nq, 1, D).astype(h.dtype)

        attn = attn.transpose(0, 2, 1, 3).reshape(B, 1, nq * D)
        h = h + qlinear(attn, lp["wo"])
        h = _mlp_block(h, lp, eps)
        return (h, layer + 1), (k_new, v_new)

    (hidden, _), (k_rows, v_rows) = jax.lax.scan(
        layer_fn, (hidden, jnp.int32(0)), params["layers"]
    )

    pages_c = jnp.clip(write_pages, 0, n_pages_total - 1)

    def write_rows_paged(pool, rows):
        # rows (L, B, nkv, 1, D).  Quantized pools re-quantize the fresh
        # rows; the tiny f32 scale pages take a plain XLA scatter (4 B per
        # row — a pool copy here is ~100 us at peak, noise vs the step).
        if kv_q8:
            qr = quantize_kv(rows)
            if _use_pallas_writer():
                from ..ops.pallas.kv_write import kv_write_rows_paged

                qpages = kv_write_rows_paged(
                    pool["q"], qr["q"], write_pages, write_offsets
                )
            else:
                qpages = pool["q"].at[:, pages_c, :, write_offsets, :].set(
                    jnp.moveaxis(qr["q"][:, :, :, 0, :], 1, 0)
                )
            spages = pool["s"].at[:, pages_c, :, write_offsets].set(
                jnp.moveaxis(qr["s"][:, :, :, 0], 1, 0)
            )
            return {"q": qpages, "s": spages}
        if _use_pallas_writer():
            from ..ops.pallas.kv_write import kv_write_rows_paged

            return kv_write_rows_paged(pool, rows, write_pages, write_offsets)
        return pool.at[:, pages_c, :, write_offsets, :].set(
            jnp.moveaxis(rows[:, :, :, 0, :], 1, 0).astype(pool.dtype)
        )

    return hidden, (
        write_rows_paged(keys_all, k_rows),
        write_rows_paged(values_all, v_rows),
    )


def decoder_paged_verify(
    params: DecoderParams,
    cfg: TextDecoderConfig,
    hidden: jax.Array,          # (B, T, H) current token + gamma drafts
    positions: jax.Array,       # (B, T) absolute RoPE positions
    kv_pages: tuple[jax.Array, jax.Array],
    page_table: jax.Array,      # (B, max_pages) physical page ids
    prompt_len: jax.Array,      # (B,) valid prompt rows
    decode_count: jax.Array,    # (B,) generated rows already in cache
    write_pages: jax.Array,     # (B, T) physical page per fresh row
    write_offsets: jax.Array,   # (B, T) row offset inside that page
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Speculative verify forward over a PAGED KV cache.

    The paged analog of :func:`decoder_forward`'s verify split: T = gamma+1
    fresh positions advance through the stack in ONE forward.  History
    attention runs the verify variant of the paged kernel (same page walk
    and HBM traffic as a single decode step — the T x group query rows
    fill the sublane pad the step wastes); the fresh positions attend each
    other causally inside the kernel's fresh block.  All T rows land in
    the pool post-scan at their per-position (page, offset); rejected
    rows either get overwritten on the next iteration or land on the
    reserved trash page 0 via unallocated page-table entries.

    No reference counterpart (reference decodes strictly one token per
    forward, generate.py:289-315); this is the continuous-batching side
    of the speculative decoding extension.
    """
    keys_all, values_all = kv_pages
    B, T, H = hidden.shape
    nq, nkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    kv_q8 = is_quantized_kv(keys_all)
    PS = (keys_all["q"] if kv_q8 else keys_all).shape[3]
    n_pages_total = (keys_all["q"] if kv_q8 else keys_all).shape[1]
    maxp = page_table.shape[1]
    pos_b = positions[:, None, :]
    on_tpu = _use_pallas()
    group = nq // nkv
    neg = float(jnp.finfo(jnp.float32).min) / 2

    if not on_tpu:
        pp = (prompt_len + PS - 1) // PS
        cols = jnp.arange(maxp * PS)[None, :]
        dstart = (pp * PS)[:, None]
        flat_mask = (cols < prompt_len[:, None]) | (
            (cols >= dstart) & (cols < dstart + decode_count[:, None])
        )
        cache_mask = flat_mask[:, None, None, None, :]   # (B,1,1,1,maxp*PS)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T, T), 3)
        u_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T, T), 4)
        self_mask = u_ids <= t_ids
        table_c = jnp.clip(page_table, 0, n_pages_total - 1)

    def gather_pages(pool, layer):
        """CPU fallback: (B, Hkv, maxp*PS, D) compact dequantized view."""
        if kv_q8:
            ql = jax.lax.dynamic_index_in_dim(pool["q"], layer, 0, keepdims=False)
            sl = jax.lax.dynamic_index_in_dim(pool["s"], layer, 0, keepdims=False)
            pl_ = (
                ql[table_c].astype(jnp.float32) * sl[table_c][..., None]
            ).astype(hidden.dtype)
        else:
            pl_ = jax.lax.dynamic_index_in_dim(pool, layer, 0, keepdims=False)[
                table_c
            ]
        return jnp.moveaxis(pl_, 2, 1).reshape(B, nkv, maxp * PS, D)

    def layer_fn(carry, lp):
        h, layer = carry
        q, k_new, v_new = _project_qkv(h, lp, cfg, pos_b)   # q (B,nq,T,D)

        if on_tpu:
            if kv_q8:
                from ..ops.pallas.decode_attention_paged import (
                    decode_attention_paged_verify_q8 as paged_verify,
                )
            else:
                from ..ops.pallas.decode_attention_paged import (
                    decode_attention_paged_verify as paged_verify,
                )

            attn = paged_verify(
                q, keys_all, values_all, k_new, v_new,
                layer, page_table, prompt_len, decode_count, scale=scale,
            )                                               # (B, nq, T, D)
        else:
            kc = gather_pages(keys_all, layer)
            vc = gather_pages(values_all, layer)
            qg = q.reshape(B, nkv, group, T, D)
            logits = jnp.einsum(
                "bkgtd,bkld->bkgtl", qg, kc,
                preferred_element_type=jnp.float32,
            ) * scale
            logits = jnp.where(cache_mask, logits, neg)
            self_logits = jnp.einsum(
                "bkgtd,bkud->bkgtu", qg, k_new,
                preferred_element_type=jnp.float32,
            ) * scale
            self_logits = jnp.where(self_mask, self_logits, neg)
            all_logits = jnp.concatenate([logits, self_logits], axis=-1)
            w = jax.nn.softmax(all_logits, axis=-1)
            Sc = maxp * PS
            out = jnp.einsum(
                "bkgtl,bkld->bkgtd", w[..., :Sc].astype(vc.dtype), vc,
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "bkgtu,bkud->bkgtd",
                w[..., Sc:].astype(jnp.float32),
                v_new.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            attn = out.reshape(B, nq, T, D).astype(h.dtype)

        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nq * D)
        h = h + qlinear(attn, lp["wo"])
        h = _mlp_block(h, lp, eps)
        return (h, layer + 1), (k_new, v_new)

    (hidden, _), (k_rows, v_rows) = jax.lax.scan(
        layer_fn, (hidden, jnp.int32(0)), params["layers"]
    )

    def write_rows_paged_t(pool, rows):
        # rows (L, B, nkv, T, D): one per-position row write each — the
        # T = gamma+1 writer calls reuse the aliased single-row path.
        if kv_q8:
            qr = quantize_kv(rows)
            qpool, spool = pool["q"], pool["s"]
            for u in range(T):
                pages_u = jnp.clip(write_pages[:, u], 0, n_pages_total - 1)
                if _use_pallas_writer():
                    from ..ops.pallas.kv_write import kv_write_rows_paged

                    qpool = kv_write_rows_paged(
                        qpool, qr["q"][:, :, :, u:u + 1, :],
                        write_pages[:, u], write_offsets[:, u],
                    )
                else:
                    qpool = qpool.at[
                        :, pages_u, :, write_offsets[:, u], :
                    ].set(jnp.moveaxis(qr["q"][:, :, :, u, :], 1, 0))
                spool = spool.at[:, pages_u, :, write_offsets[:, u]].set(
                    jnp.moveaxis(qr["s"][:, :, :, u], 1, 0)
                )
            return {"q": qpool, "s": spool}
        for u in range(T):
            if _use_pallas_writer():
                from ..ops.pallas.kv_write import kv_write_rows_paged

                pool = kv_write_rows_paged(
                    pool, rows[:, :, :, u:u + 1, :],
                    write_pages[:, u], write_offsets[:, u],
                )
            else:
                pages_u = jnp.clip(write_pages[:, u], 0, n_pages_total - 1)
                pool = pool.at[:, pages_u, :, write_offsets[:, u], :].set(
                    jnp.moveaxis(rows[:, :, :, u, :], 1, 0).astype(pool.dtype)
                )
        return pool

    return hidden, (
        write_rows_paged_t(keys_all, k_rows),
        write_rows_paged_t(values_all, v_rows),
    )


def decoder_logits(params: DecoderParams, cfg: TextDecoderConfig, hidden: jax.Array) -> jax.Array:
    """Final RMSNorm + tied lm_head, float32 logits ``(B, T, vocab)``."""
    h = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    emb = params["embedding"]
    if is_quantized(emb):
        return qlinear(h, emb, out_dtype=jnp.float32)
    return jnp.einsum(
        "bth,vh->btv", h, emb, preferred_element_type=jnp.float32
    )
