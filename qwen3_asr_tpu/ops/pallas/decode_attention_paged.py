"""Paged flash-decode attention: page-table-indirected KV block stream.

The contiguous engines (v3-v5) size every sequence's cache region to the
worst-case bucket, so a mixed workload (30 s clips next to 15-minute
clips) pays the LONGEST clip's memory for every slot.  Here the cache is a
pool of fixed ``page_size``-row pages ``(L, n_pages, Hkv, page_size, D)``
and each sequence owns only the pages its prompt + generated tokens
actually occupy, via a per-sequence page table:

    table[seq, 0 : pp]        physical pages of the prompt (pp = ceil(plen/PS))
    table[seq, pp : pp + dp]  physical pages of the decode region, grown
                              lazily as the sequence generates

Same compute structure as v5 (decode_attention_hbm4): per-core
software-pipelined (batch element, block) walk, ``_NBUF - 1`` DMAs in
flight, online softmax in f32 over bf16 MXU inputs, fused fresh-token
self-term.  The only difference is addressing: block ``i`` of sequence
``b`` DMAs from ``cache[layer, table[b, page_of(i)], :, off_in_page, :]``
instead of a contiguous offset — scalar-prefetched page tables drive the
DMA descriptors, so indirection costs nothing on the data path.

Masking is *compact*: prompt block rows are valid while ``col < plen``;
decode block rows while ``row < decode_count`` (= generated tokens whose
K/V are in the cache).  Absolute slot arithmetic (prompt_bucket) does not
exist here — position information lives entirely in RoPE.

The int8 variant (:func:`decode_attention_paged_q8`) streams per-row f32
scale pages alongside the int8 KV pages and folds the scales into the
score / probability matrices exactly like the contiguous q8 kernel
(decode_attention_hbm4_q8; see ops/quant_kv.py for the algebra) — the
dominant per-step read stream halves.

No reference counterpart (the reference's KV cache is a Python list of
concatenated arrays, decoder.py:54-64); this is the paged-KV design the
blueprint's north star names (BASELINE.json config 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_QPAD = 8
_NBUF = 4   # in-flight KV block buffers (prefetch depth _NBUF - 1)
_BLOCK_D = 128


def _kernel(
    layer_ref, table_ref, prompt_len_ref, dcount_ref, count_ref,
    q_ref,            # (1, BH, Hkv, QPAD, D) VMEM, f32 pre-scaled
    kall_ref,         # (L, n_pages, Hkv, PS, D) HBM (bf16, or int8)
    vall_ref,
    *rest,
    page_size: int, max_pages: int, per_core: int, b_pad: int,
    quantized: bool = False, n_fresh: int = 1, group: int = 1,
):
    # Quantized caches carry per-row f32 scale pages (L, n_pages, Hkv, PS)
    # streamed alongside the int8 tiles; scale math folds into the score /
    # probability matrices (see ops/quant_kv.py docstring).
    if quantized:
        (ks_ref, vs_ref, knew_ref, vnew_ref, o_ref,
         k_buf, v_buf, ks_buf, vs_buf,
         k_sems, v_sems, ks_sems, vs_sems) = rest
    else:
        (knew_ref, vnew_ref, o_ref, k_buf, v_buf, k_sems, v_sems) = rest
        ks_ref = vs_ref = ks_buf = vs_buf = ks_sems = vs_sems = None
    core = pl.program_id(0)
    layer = layer_ref[0]
    my_count = count_ref[core]           # live batch elements on this core
    base = core * per_core
    blocks_per_page = page_size // _BLOCK_D

    def plen_of(bl):
        # Clamp: pipeline lookahead walks (bl, i) past the last live batch
        # element; the guarded prefetch never uses the result, but the SMEM
        # read itself must stay in bounds.
        return prompt_len_ref[jnp.minimum(base + bl, b_pad - 1)]

    def dcount_of(bl):
        return dcount_ref[jnp.minimum(base + bl, b_pad - 1)]

    def n_prompt(bl):
        return pl.cdiv(plen_of(bl), page_size)

    def n_blocks(bl):
        return n_prompt(bl) + pl.cdiv(dcount_of(bl), _BLOCK_D)

    def page_of(bl, p_idx):
        flat = jnp.minimum(base + bl, b_pad - 1) * max_pages + jnp.minimum(
            p_idx, max_pages - 1
        )
        return table_ref[flat]

    def coords(bl, i):
        """(is_prompt, physical page, in-page row offset) of block i."""
        np_b = n_prompt(bl)
        is_p = i < np_b
        j = i - np_b                       # decode block index (if !is_p)
        p_idx = jnp.where(is_p, i, np_b + j // blocks_per_page)
        off = jnp.where(is_p, 0, (j % blocks_per_page) * _BLOCK_D)
        return is_p, page_of(bl, p_idx), pl.multiple_of(off, _BLOCK_D)

    def _copies(bl, i, slot, full):
        """The (start-able, wait-able) async copies of block i."""
        _, page, off = coords(bl, i)
        if full:
            ksel = kall_ref.at[layer, page]
            vsel = vall_ref.at[layer, page]
            kdst = k_buf.at[slot]
            vdst = v_buf.at[slot]
        else:
            ksel = kall_ref.at[layer, page, :, pl.ds(off, _BLOCK_D), :]
            vsel = vall_ref.at[layer, page, :, pl.ds(off, _BLOCK_D), :]
            kdst = k_buf.at[slot, :, pl.ds(0, _BLOCK_D), :]
            vdst = v_buf.at[slot, :, pl.ds(0, _BLOCK_D), :]
        copies = [
            pltpu.make_async_copy(ksel, kdst, k_sems.at[slot]),
            pltpu.make_async_copy(vsel, vdst, v_sems.at[slot]),
        ]
        if quantized:
            if full:
                copies += [
                    pltpu.make_async_copy(
                        ks_ref.at[layer, page], ks_buf.at[slot],
                        ks_sems.at[slot],
                    ),
                    pltpu.make_async_copy(
                        vs_ref.at[layer, page], vs_buf.at[slot],
                        vs_sems.at[slot],
                    ),
                ]
            else:
                copies += [
                    pltpu.make_async_copy(
                        ks_ref.at[layer, page, :, pl.ds(off, _BLOCK_D)],
                        ks_buf.at[slot, :, pl.ds(0, _BLOCK_D)],
                        ks_sems.at[slot],
                    ),
                    pltpu.make_async_copy(
                        vs_ref.at[layer, page, :, pl.ds(off, _BLOCK_D)],
                        vs_buf.at[slot, :, pl.ds(0, _BLOCK_D)],
                        vs_sems.at[slot],
                    ),
                ]
        return copies

    def start(bl, i, slot):
        is_p = coords(bl, i)[0]

        @pl.when(is_p)
        def _():
            for c in _copies(bl, i, slot, True):
                c.start()

        @pl.when(jnp.logical_not(is_p))
        def _():
            for c in _copies(bl, i, slot, False):
                c.start()

    def wait(bl, i, slot):
        is_p = coords(bl, i)[0]

        @pl.when(is_p)
        def _():
            for c in _copies(bl, i, slot, True):
                c.wait()

        @pl.when(jnp.logical_not(is_p))
        def _():
            for c in _copies(bl, i, slot, False):
                c.wait()

    def next_coords(bl, i):
        last = i + 1 >= n_blocks(bl)
        return jnp.where(last, bl + 1, bl), jnp.where(last, 0, i + 1)

    # Warm up the pipeline: the first _NBUF-1 (bl, i) pairs.
    @pl.when(my_count > 0)
    def _warm():
        def w(n, c):
            bl, i = c

            @pl.when(bl < my_count)
            def _():
                start(bl, i, n)

            return next_coords(bl, i)

        jax.lax.fori_loop(0, _NBUF - 1, w, (0, 0))

    def b_loop(state):
        bl, slot = state
        plen = plen_of(bl)
        dcount = dcount_of(bl)
        np_b = n_prompt(bl)
        total_b = n_blocks(bl)
        q = q_ref[0, bl].astype(jnp.bfloat16)             # (Hkv, QPAD, D)
        hkv, _, d = q.shape

        def tile_update(carry, k, v, row_base, limit, width, ks=None, vs=None):
            """Online-softmax update over one (Hkv, width, D) tile whose
            rows are compact indices [row_base, row_base+width) valid
            while < limit.  Quantized tiles carry per-row scales ``ks`` /
            ``vs`` (Hkv, width): scores scale columnwise after the matmul
            and value scales fold into the probability matrix."""
            m_prev, l_prev, acc = carry
            s = jax.lax.dot_general(
                q, k.astype(jnp.bfloat16),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                              # (Hkv, QPAD, width)
            if quantized:
                s = s * ks[:, None, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + row_base
            s = jnp.where(rows < limit, s, _MASK_VALUE)

            m_tile = jnp.max(s, axis=2, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_tile, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :, :1])
            l_next = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=2, keepdims=True), l_prev.shape
            )
            pw = p * vs[:, None, :] if quantized else p
            pv = jax.lax.dot_general(
                pw.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return m_next, l_next, acc * alpha[:, :, :1] + pv

        def blk(i, carry):
            m_prev, l_prev, acc, slot = carry

            # Keep _NBUF-1 blocks in flight: start the one _NBUF-1 ahead.
            def ahead(_, c):
                return next_coords(*c)

            nb, ni = jax.lax.fori_loop(0, _NBUF - 1, ahead, (bl, i))

            @pl.when(nb < my_count)
            def _prefetch():
                start(nb, ni, jax.lax.rem(slot + _NBUF - 1, _NBUF))

            wait(bl, i, slot)
            is_p = i < np_b
            j = i - np_b

            def on_prompt(c):
                return tile_update(
                    c, k_buf[slot], v_buf[slot],
                    i * page_size, plen, page_size,
                    ks_buf[slot] if quantized else None,
                    vs_buf[slot] if quantized else None,
                )

            def on_decode(c):
                return tile_update(
                    c,
                    k_buf[slot, :, : _BLOCK_D, :],
                    v_buf[slot, :, : _BLOCK_D, :],
                    j * _BLOCK_D, dcount, _BLOCK_D,
                    ks_buf[slot, :, : _BLOCK_D] if quantized else None,
                    vs_buf[slot, :, : _BLOCK_D] if quantized else None,
                )

            m, l, acc = jax.lax.cond(
                is_p, on_prompt, on_decode, (m_prev, l_prev, acc)
            )
            return m, l, acc, jax.lax.rem(slot + 1, _NBUF)

        init = (
            jnp.full((hkv, _QPAD, 128), -jnp.inf, jnp.float32),
            jnp.zeros((hkv, _QPAD, 128), jnp.float32),
            jnp.zeros((hkv, _QPAD, d), jnp.float32),
            slot,
        )
        m, l, acc, slot = jax.lax.fori_loop(0, total_b, blk, init)

        # Fresh-token block, then finalize this batch element.  With
        # n_fresh == 1 this is the classic decode self term.  The verify
        # variant (n_fresh = gamma+1 speculative positions) packs the T
        # fresh queries t-major into the same QPAD sublane pad the decode
        # step wastes (row r = t*group + g, T*group <= QPAD), so the
        # history walk above is IDENTICAL — every verify row attends the
        # same read-only pages — and only this block changes: a T-column
        # score tile with an intra-block causal mask (fresh column u is
        # visible to row r iff u <= r // group).  Columns stay per-u VPU
        # multiply-adds in f32, mirroring the T = 1 math exactly.
        s_cols = []
        for u in range(n_fresh):
            k_u = knew_ref[0, bl, :, u].astype(jnp.bfloat16)
            s_cols.append(jnp.sum(
                (q * k_u[:, None, :]).astype(jnp.float32), axis=2,
                keepdims=True,
            ))
        s_self = jnp.concatenate(s_cols, axis=2)       # (Hkv, QPAD, T)
        if n_fresh > 1:
            row_t = jax.lax.broadcasted_iota(
                jnp.int32, s_self.shape, 1
            ) // group
            col_u = jax.lax.broadcasted_iota(jnp.int32, s_self.shape, 2)
            s_self = jnp.where(col_u <= row_t, s_self, _MASK_VALUE)
        m_tile = jnp.max(s_self, axis=2, keepdims=True)
        m_next = jnp.maximum(m, jnp.broadcast_to(m_tile, m.shape))
        alpha = jnp.exp(m - m_next)
        p_self = jnp.exp(s_self - m_next[:, :, :1])    # (Hkv, QPAD, T)
        l = alpha * l + jnp.broadcast_to(
            jnp.sum(p_self, axis=2, keepdims=True), l.shape
        )
        acc = acc * alpha[:, :, :1]
        for u in range(n_fresh):
            v_u = vnew_ref[0, bl, :, u].astype(jnp.float32)
            acc = acc + p_self[:, :, u:u + 1] * v_u[:, None, :]

        l_final = l[:, :, :1]
        l_final = jnp.where(l_final == 0.0, 1.0, l_final)
        o_ref[0, bl] = (acc / l_final).astype(o_ref.dtype)
        return bl + 1, slot

    jax.lax.while_loop(lambda st: st[0] < my_count, b_loop, (0, 0))


def _paged_call(
    q, kall, vall, ks, vs, k_new, v_new, layer, page_table, prompt_len,
    decode_count, scale, interpret,
):
    """Shared host-side wiring for the bf16 and int8 page-pool variants
    (``ks``/``vs`` are the per-row scale pools, None for bf16).

    ``q`` is (B, Hq, D) for the single-token decode step, or
    (B, Hq, T, D) for a T-position speculative verify (T = k_new.shape[2];
    T * group must fit the QPAD sublane pad)."""
    quantized = ks is not None
    squeeze = q.ndim == 3
    if squeeze:
        q = q[:, :, None, :]
    B, hq, T, D = q.shape
    hkv, page_size = kall.shape[2], kall.shape[3]
    max_pages = page_table.shape[1]
    group = hq // hkv
    if scale is None:
        scale = D ** -0.5
    if page_size % _BLOCK_D:
        raise ValueError(f"page_size={page_size} not a multiple of {_BLOCK_D}")
    if T * group > _QPAD:
        raise ValueError(
            f"verify width T={T} x group={group} exceeds QPAD={_QPAD}"
        )

    cores = 2 if B > 1 else 1
    per_core = -(-B // cores)
    b_pad = cores * per_core
    counts = jnp.clip(
        jnp.asarray([B - c * per_core for c in range(cores)], jnp.int32),
        0, per_core,
    )

    # Pack rows t-major — row r = t * group + g — matching the kernel's
    # causal fresh-block mask (row_t = r // group).
    qg = (q.astype(jnp.float32) * scale).reshape(B, hkv, group, T, D)
    qg = qg.transpose(0, 1, 3, 2, 4).reshape(B, hkv, T * group, D)
    qg = jnp.pad(
        qg, ((0, b_pad - B), (0, 0), (0, _QPAD - T * group), (0, 0))
    ).reshape(cores, per_core, hkv, _QPAD, D)
    knew_p = jnp.pad(k_new, ((0, b_pad - B), (0, 0), (0, 0), (0, 0))).reshape(
        cores, per_core, hkv, T, D
    )
    vnew_p = jnp.pad(v_new, ((0, b_pad - B), (0, 0), (0, 0), (0, 0))).reshape(
        cores, per_core, hkv, T, D
    )
    # Clamp plen >= 1: a zero-block lane (idle slot) would desync the
    # DMA pipeline's producer walk from its consumer — see the identical
    # note in decode_attention_hbm4.  The one masked-in row resolves
    # through the (clipped) page table to a finite value; the caller
    # discards idle lanes' outputs.
    plen_p = jnp.pad(
        jnp.maximum(prompt_len.astype(jnp.int32), 1), (0, b_pad - B)
    )
    dcount_p = jnp.pad(decode_count.astype(jnp.int32), (0, b_pad - B))
    table_p = jnp.pad(
        jnp.clip(page_table.astype(jnp.int32), 0, kall.shape[1] - 1),
        ((0, b_pad - B), (0, 0)),
    ).reshape(-1)

    in_specs = [
        pl.BlockSpec(
            (1, per_core, hkv, _QPAD, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [kall, vall]
    scratch = [
        pltpu.VMEM((_NBUF, hkv, page_size, D), kall.dtype),
        pltpu.VMEM((_NBUF, hkv, page_size, D), vall.dtype),
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        operands += [ks, vs]
        scratch += [
            pltpu.VMEM((_NBUF, hkv, page_size), jnp.float32),
            pltpu.VMEM((_NBUF, hkv, page_size), jnp.float32),
        ]
    in_specs += [
        pl.BlockSpec(
            (1, per_core, hkv, T, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, per_core, hkv, T, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
    ]
    scratch += [pltpu.SemaphoreType.DMA((_NBUF,))] * (4 if quantized else 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(cores,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, per_core, hkv, _QPAD, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            page_size=page_size,
            max_pages=max_pages,
            per_core=per_core,
            b_pad=b_pad,
            quantized=quantized,
            n_fresh=T,
            group=group,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (cores, per_core, hkv, _QPAD, D), jnp.float32
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        table_p,
        plen_p,
        dcount_p,
        counts,
        qg,
        *operands,
        knew_p,
        vnew_p,
    )
    out = out.reshape(b_pad, hkv, _QPAD, D)[:B, :, : T * group, :]
    out = out.reshape(B, hkv, T, group, D).transpose(0, 1, 3, 2, 4)
    out = out.reshape(B, hq, T, D).astype(q.dtype)
    return out[:, :, 0, :] if squeeze else out


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret"),
)
def decode_attention_paged(
    q: jax.Array,            # (B, Hq, D)
    kall: jax.Array,         # (L, n_pages, Hkv, page_size, D)
    vall: jax.Array,
    k_new: jax.Array,        # (B, Hkv, 1, D)
    v_new: jax.Array,
    layer: jax.Array,
    page_table: jax.Array,   # (B, max_pages) int32 physical page ids
    prompt_len: jax.Array,   # (B,) valid prompt rows
    decode_count: jax.Array, # (B,) valid decode rows already in cache
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Paged flash-decode over a page-pool KV cache.

    ``page_size`` (from ``kall.shape[3]``) must be a multiple of 128.
    """
    return _paged_call(
        q, kall, vall, None, None, k_new, v_new, layer, page_table,
        prompt_len, decode_count, scale, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret"),
)
def decode_attention_paged_q8(
    q: jax.Array,            # (B, Hq, D)
    kall: dict,              # {"q": int8 (L, n_pages, Hkv, PS, D),
                             #  "s": f32 (L, n_pages, Hkv, PS)}
    vall: dict,
    k_new: jax.Array,        # (B, Hkv, 1, D) — fresh rows stay bf16
    v_new: jax.Array,
    layer: jax.Array,
    page_table: jax.Array,
    prompt_len: jax.Array,
    decode_count: jax.Array,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """int8 page-pool variant: streams half the KV bytes per step plus
    tiny per-row scale pages; equals the bf16 kernel over the dequantized
    pool to bf16 tolerance (ops/quant_kv.py scale folding)."""
    return _paged_call(
        q, kall["q"], vall["q"], kall["s"], vall["s"], k_new, v_new,
        layer, page_table, prompt_len, decode_count, scale, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret"),
)
def decode_attention_paged_verify(
    q: jax.Array,            # (B, Hq, T, D) — T speculative positions
    kall: jax.Array,         # (L, n_pages, Hkv, page_size, D)
    vall: jax.Array,
    k_new: jax.Array,        # (B, Hkv, T, D) fresh rows (current + drafts)
    v_new: jax.Array,
    layer: jax.Array,
    page_table: jax.Array,
    prompt_len: jax.Array,
    decode_count: jax.Array,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Speculative verify over a page-pool cache: T = gamma+1 positions per
    sequence in ONE kernel pass, (B, Hq, T, D) out.

    The T x group query rows fill the QPAD sublane pad the single-token
    step wastes, so the page walk costs the same HBM traffic and MXU
    passes as one decode step while scoring up to T tokens.  History
    masking is unchanged (every verify position attends rows < plen /
    < decode_count); the fresh block is causal across the T positions.
    ``decode_count`` must EXCLUDE the T fresh rows (pass counts - 1, as
    the single-token step does).
    """
    return _paged_call(
        q, kall, vall, None, None, k_new, v_new, layer, page_table,
        prompt_len, decode_count, scale, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret"),
)
def decode_attention_paged_verify_q8(
    q: jax.Array,            # (B, Hq, T, D)
    kall: dict,              # {"q": int8 pool, "s": f32 scale pool}
    vall: dict,
    k_new: jax.Array,        # (B, Hkv, T, D) — fresh rows stay bf16
    v_new: jax.Array,
    layer: jax.Array,
    page_table: jax.Array,
    prompt_len: jax.Array,
    decode_count: jax.Array,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """int8 pool variant of :func:`decode_attention_paged_verify`."""
    return _paged_call(
        q, kall["q"], vall["q"], kall["s"], vall["s"], k_new, v_new,
        layer, page_table, prompt_len, decode_count, scale, interpret,
    )
