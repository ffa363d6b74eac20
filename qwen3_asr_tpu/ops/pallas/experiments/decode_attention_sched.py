"""Flash-decode attention v7: schedule-driven flat block walk.

The v5 kernel (decode_attention_hbm4.py) discovers its work on the fly:
every pipeline step re-derives "which (batch element, block) comes next"
with cdiv chains on SMEM scalars, walks a 3-deep ``fori_loop`` lookahead
for the DMA prefetch, and switches between two block granularities with a
``lax.cond``.  Per the round-2 perf model (docs/PERFORMANCE.md) the
kernel is MXU-compute-bound with ~94% of the systolic array idle per
score matmul — an inherent GQA group-2 shape — so the recoverable
headroom is exactly this scalar/control overhead plus masked-row VPU
work, measured at ~1.5-1.6x over the pure MXU streaming floor.

v7 removes the control flow from the hot loop entirely:

  * The **block schedule is precomputed** outside the kernel
    (:func:`build_decode_schedule`, a handful of tiny vectorized XLA ops
    on the (B,) geometry vectors — computed ONCE per decode step, shared
    by all 28 layers) and passed in as scalar-prefetch SMEM arrays:
    per flat index j, the owning batch lane ``bl``, the row offset
    ``off``, the mask limit ``lim``, and first/last flags.
  * The kernel is ONE ``fori_loop`` over j: prefetch entry j+NBUF-1,
    wait entry j, one tile update, conditional finalize.  No cdiv, no
    structural ``lax.cond``, no lookahead walk — every scalar the loop
    needs is an SMEM array read.
  * **Uniform 128-row blocks.** Both cache regions tile at 128 (the
    dual-granularity split of v5 existed to let the *discovery logic*
    skip invalid rows; with an explicit schedule, skipping is free), so
    there is a single DMA shape and a single compute path.
  * **Contiguous-validity masking**: every block's valid rows are
    ``cols < lim`` (``lim`` = prompt_len for prompt blocks, decode_end
    for decode blocks) — one (1,1,block) iota+compare and one broadcast
    select, replacing v5's full (Hkv, QPAD, block) iota + two compares +
    or + select.

Same math as v5: online softmax in f32 over the stacked (L, B, Hkv, S, D)
cache, bf16 MXU inputs, fused fresh-token self-term, two-interval
validity.  Numerics are bit-compatible with v5 up to f32 reduction order
inside a block (identical: same tile shapes for decode blocks; prompt
rows reduce in 128-col tiles instead of up-to-512 — still exact online
softmax).

Replaces the loop being beaten in the reference:
/root/reference/src/qwen3_asr_mlx/generate.py:289-315 (Python decode loop
with host syncs; attention re-materializes the full score matrix).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_QPAD = 8
_BLOCK = 128
#: In-flight KV block buffers (prefetch depth _NBUF - 1).
_NBUF = int(os.environ.get("QWEN3_ASR_SCHED_NBUF", "6"))
#: Grid split over batch elements; 0 = auto.
_CORES = int(os.environ.get("QWEN3_ASR_SCHED_CORES", "0"))

#: Flag bits in the schedule's ``flags`` array.
_F_FIRST = 1
_F_LAST = 2


def build_decode_schedule(
    prompt_len: jax.Array,    # (B,) int32
    decode_end: jax.Array,    # scalar or (B,) int32
    prompt_bucket: int,
    S: int,
    cores: int,
    per_core: int,
    B: int,
    block: int = _BLOCK,
):
    """Flat per-core block schedules for the v7 kernel.

    Returns ``(totals (cores,), bl, off, lim, flags)`` — the latter four
    ``(cores, J)`` int32 with ``J = per_core * (prompt_bucket//block +
    (S-prompt_bucket)//block)``.  Entry j of core c: lane ``bl[c,j]``
    (element index within the core), rows ``[off, off+block)`` of the
    cache, valid while ``col < lim``, plus first/last-of-element flags.

    A live lane always owns >= 1 block (prompt_len clamps to 1: the
    pipeline's producer/consumer walk must agree on block counts, and a
    zero-block lane would desync them); lanes padded beyond B own zero
    blocks and are never visited.

    This is a handful of vectorized ops on (B,)/(J,) int32 vectors —
    compute it ONCE per decode step and share it across all layers.
    """
    b_pad = cores * per_core
    n_pb = prompt_bucket // block
    n_db = (S - prompt_bucket) // block
    J = per_core * (n_pb + n_db)

    plen = jnp.clip(prompt_len.astype(jnp.int32), 1, prompt_bucket)
    plen = jnp.pad(plen, (0, b_pad - B))
    dend = jnp.broadcast_to(jnp.asarray(decode_end, jnp.int32), (B,))
    dend = jnp.pad(dend, (0, b_pad - B), constant_values=prompt_bucket)

    n_p = (plen + block - 1) // block                       # (b_pad,)
    n_d = jnp.clip(dend - prompt_bucket, 0, S - prompt_bucket)
    n_d = (n_d + block - 1) // block
    tot = (n_p + n_d).reshape(cores, per_core)
    starts = jnp.cumsum(tot, axis=1) - tot                  # exclusive
    totals = tot.sum(axis=1).astype(jnp.int32)              # (cores,)

    j = jnp.arange(J, dtype=jnp.int32)
    # Owning lane: the LAST element whose start <= j (skips empty lanes,
    # which share their successor's start).
    bl = (starts[:, None, :] <= j[None, :, None]).sum(-1) - 1   # (cores, J)
    bl = jnp.clip(bl, 0, per_core - 1)

    def gather(a2):  # (cores, per_core) -> (cores, J) by lane
        return jnp.take_along_axis(a2, bl, axis=1)

    i = j[None, :] - gather(starts)                         # local block idx
    n_p2 = n_p.reshape(cores, per_core)
    plen2 = plen.reshape(cores, per_core)
    dend2 = dend.reshape(cores, per_core)
    is_p = i < gather(n_p2)
    off = jnp.where(
        is_p, i * block, prompt_bucket + (i - gather(n_p2)) * block
    )
    lim = jnp.where(is_p, gather(plen2), gather(dend2))
    flags = (
        jnp.where(i == 0, _F_FIRST, 0)
        | jnp.where(i == gather(tot) - 1, _F_LAST, 0)
    )
    live = j[None, :] < totals[:, None]
    z = jnp.int32(0)
    return (
        totals,
        jnp.where(live, bl, z).astype(jnp.int32),
        jnp.where(live, off, z).astype(jnp.int32),
        jnp.where(live, lim, z).astype(jnp.int32),
        jnp.where(live, flags, z).astype(jnp.int32),
    )


def _kernel(
    layer_ref, totals_ref, sbl_ref, soff_ref, slim_ref, sflags_ref,
    q_ref,            # (1, per_core, Hkv, QPAD, D) VMEM, f32 pre-scaled
    kall_ref,         # (L, B, Hkv, S, D) HBM
    vall_ref,
    knew_ref,         # (1, per_core, Hkv, 1, D) VMEM
    vnew_ref,
    o_ref,            # (1, per_core, Hkv, QPAD, D) VMEM (f32)
    k_buf, v_buf,     # (NBUF, Hkv, block, D)
    k_sems, v_sems,
    *, block: int, per_core: int,
):
    core = pl.program_id(0)
    layer = layer_ref[0]
    total = totals_ref[core]
    base = core * per_core

    def start(j, slot):
        bl = sbl_ref[core, j]
        off = pl.multiple_of(soff_ref[core, j], block)
        pltpu.make_async_copy(
            kall_ref.at[layer, base + bl, :, pl.ds(off, block), :],
            k_buf.at[slot], k_sems.at[slot],
        ).start()
        pltpu.make_async_copy(
            vall_ref.at[layer, base + bl, :, pl.ds(off, block), :],
            v_buf.at[slot], v_sems.at[slot],
        ).start()

    def wait(j, slot):
        bl = sbl_ref[core, j]
        off = pl.multiple_of(soff_ref[core, j], block)
        pltpu.make_async_copy(
            kall_ref.at[layer, base + bl, :, pl.ds(off, block), :],
            k_buf.at[slot], k_sems.at[slot],
        ).wait()
        pltpu.make_async_copy(
            vall_ref.at[layer, base + bl, :, pl.ds(off, block), :],
            v_buf.at[slot], v_sems.at[slot],
        ).wait()

    # Warm-up: first NBUF-1 schedule entries.
    def w(n, c):
        @pl.when(n < total)
        def _():
            start(n, n)
        return c

    jax.lax.fori_loop(0, _NBUF - 1, w, 0)

    hkv = q_ref.shape[2]
    d = q_ref.shape[4]

    def body(j, carry):
        m_prev, l_prev, acc = carry

        jn = j + _NBUF - 1

        @pl.when(jn < total)
        def _prefetch():
            start(jn, jax.lax.rem(jn, _NBUF))

        slot = jax.lax.rem(j, _NBUF)
        wait(j, slot)

        bl = sbl_ref[core, j]
        off = soff_ref[core, j]
        lim = slim_ref[core, j]
        flags = sflags_ref[core, j]
        first = (flags & _F_FIRST) != 0
        last = (flags & _F_LAST) != 0

        # Carry reset on the first block of each lane — selects, not cond.
        m_prev = jnp.where(first, -jnp.inf, m_prev)
        l_prev = jnp.where(first, 0.0, l_prev)
        acc = jnp.where(first, 0.0, acc)

        q = q_ref[0, bl].astype(jnp.bfloat16)              # (Hkv, QPAD, D)
        s = jax.lax.dot_general(
            q, k_buf[slot].astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                   # (Hkv, QPAD, blk)
        # Contiguous validity: one lane-wide compare, broadcast select
        # (select, not bias-add: masked cache rows may hold inf/NaN
        # garbage and NaN + finite = NaN).
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, block), 2) + off
        s = jnp.where(cols < lim, s, _MASK_VALUE)

        m_tile = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_tile, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :, :1])
        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=2, keepdims=True), l_prev.shape
        )
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_buf[slot].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha[:, :, :1] + pv

        @pl.when(last)
        def _finalize():
            k_new = knew_ref[0, bl, :, 0].astype(jnp.bfloat16)
            s_self = jnp.sum(
                (q * k_new[:, None, :]).astype(jnp.float32),
                axis=2, keepdims=True,
            )
            m_f = jnp.maximum(m_next, jnp.broadcast_to(s_self, m_next.shape))
            a_f = jnp.exp(m_next - m_f)
            p_self = jnp.exp(s_self - m_f[:, :, :1])
            l_f = a_f * l_next + jnp.broadcast_to(p_self, l_next.shape)
            v_new = vnew_ref[0, bl, :, 0].astype(jnp.float32)
            out = acc * a_f[:, :, :1] + p_self * v_new[:, None, :]
            l_1 = l_f[:, :, :1]
            l_1 = jnp.where(l_1 == 0.0, 1.0, l_1)
            o_ref[0, bl] = (out / l_1).astype(o_ref.dtype)

        return m_next, l_next, acc

    init = (
        jnp.full((hkv, _QPAD, 128), -jnp.inf, jnp.float32),
        jnp.zeros((hkv, _QPAD, 128), jnp.float32),
        jnp.zeros((hkv, _QPAD, d), jnp.float32),
    )
    jax.lax.fori_loop(0, total, body, init)


@functools.partial(
    jax.jit,
    static_argnames=("prompt_bucket", "scale", "interpret"),
)
def decode_attention_sched(
    q: jax.Array,            # (B, Hq, D)
    kall: jax.Array,         # (L, B, Hkv, S, D)
    vall: jax.Array,
    k_new: jax.Array,        # (B, Hkv, 1, D)
    v_new: jax.Array,
    layer: jax.Array,
    prompt_len: jax.Array,   # (B,)
    decode_end: jax.Array,   # scalar or (B,) — per-sequence decode depth
    prompt_bucket: int,
    scale: float | None = None,
    schedule=None,
    interpret: bool = False,
) -> jax.Array:
    """Schedule-driven flash-decode over the stacked KV cache (v7).

    Requires ``prompt_bucket % 128 == 0`` and a decode region that is a
    multiple of 128.  ``schedule`` (from :func:`build_decode_schedule`
    with matching geometry) may be precomputed once per decode step and
    shared across the layer scan; when None it is built inline.
    """
    B, hq, D = q.shape
    hkv, S = kall.shape[2], kall.shape[3]
    group = hq // hkv
    if scale is None:
        scale = D ** -0.5
    if prompt_bucket % _BLOCK or (S - prompt_bucket) % _BLOCK:
        raise ValueError(
            f"cache regions ({prompt_bucket}, {S - prompt_bucket}) "
            f"not tileable by {_BLOCK}"
        )

    cores = _CORES or (2 if B > 1 else 1)
    cores = min(cores, B)
    per_core = -(-B // cores)
    b_pad = cores * per_core

    if schedule is None:
        schedule = build_decode_schedule(
            prompt_len, decode_end, prompt_bucket, S, cores, per_core, B
        )
    totals, sbl, soff, slim, sflags = schedule

    qg = (q.astype(jnp.float32) * scale).reshape(B, hkv, group, D)
    qg = jnp.pad(
        qg, ((0, b_pad - B), (0, 0), (0, _QPAD - group), (0, 0))
    ).reshape(cores, per_core, hkv, _QPAD, D)
    knew_p = jnp.pad(k_new, ((0, b_pad - B), (0, 0), (0, 0), (0, 0))).reshape(
        cores, per_core, hkv, 1, D
    )
    vnew_p = jnp.pad(v_new, ((0, b_pad - B), (0, 0), (0, 0), (0, 0))).reshape(
        cores, per_core, hkv, 1, D
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(cores,),
        in_specs=[
            pl.BlockSpec(
                (1, per_core, hkv, _QPAD, D), lambda c, *_: (c, 0, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, per_core, hkv, 1, D), lambda c, *_: (c, 0, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, per_core, hkv, 1, D), lambda c, *_: (c, 0, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, per_core, hkv, _QPAD, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, hkv, _BLOCK, D), kall.dtype),
            pltpu.VMEM((_NBUF, hkv, _BLOCK, D), vall.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block=_BLOCK, per_core=per_core),
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
        totals, sbl, soff, slim, sflags,
        qg,
        kall,
        vall,
        knew_p,
        vnew_p,
    )
    out = out.reshape(b_pad, hkv, _QPAD, D)[:B, :, :group, :]
    return out.reshape(B, hq, D).astype(q.dtype)
