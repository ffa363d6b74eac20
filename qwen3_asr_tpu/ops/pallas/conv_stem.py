"""Fused 3x3 stride-2 conv + bias + GELU as in-VMEM tap GEMMs (Pallas).

The encoder's conv stem measured ~36% MXU as ``lax.conv`` (120 ms of the
247 ms encoder at B=64) and the XLA-level taps rewrite measured SLOWER
(178.8 ms — nine strided re-reads of the activations through HBM;
docs/PERFORMANCE.md).  This kernel keeps the taps idea but pays the
relayout in VMEM instead of HBM:

  * XLA phase-separates the (1-padded) input once — four strided slices
    ``phase[p,q] = xpad[p::2, q::2]`` written alongside the pad (one HBM
    pass, fused);
  * the kernel DMAs one chunk's four phase blocks to VMEM and runs the
    nine taps as contiguous-slice GEMMs ``acc += slice(phase) @ k[dy,dx]``
    — every matmul is (Ho*Wo, C) x (C, O) at full MXU width;
  * bias fuses into the epilogue; the exact GELU stays OUTSIDE the
    kernel (Mosaic implements neither erf nor erfc) — XLA applies it to
    the small conv output, numerically identical to the lax.conv stem.

Tap/phase algebra: with ``xpad`` 1-padded, ``out[h, w] = sum_{dy,dx}
xpad[2h+dy, 2w+dx] @ k[dy,dx]``; substituting ``2h+dy = 2(h+dy//2) +
(dy%2)`` gives ``xpad[2h+dy, 2w+dx] = phase[dy%2, dx%2][h + dy//2,
w + dx//2]`` — so each tap is a CONTIGUOUS (Ho, Wo) window of one phase.

Numerical contract: equals ``lax.conv_general_dilated`` + bias + exact
GELU to f32 accumulation-order tolerance (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(p00_ref, p01_ref, p10_ref, p11_ref, w_ref, b_ref, o_ref, *, Ho, Wo):
    phases = ((p00_ref, p01_ref), (p10_ref, p11_ref))
    Wp = p00_ref.shape[2]
    C = p00_ref.shape[3]
    acc = None
    for dy in range(3):
        for dx in range(3):
            ph = phases[dy % 2][dx % 2][0]          # (Hp, Wp, C)
            # H-slice (leading dim — layout-free), then a CONTIGUOUS
            # reshape over the full phase width; the tap's W offset is
            # applied on the small f32 result instead (a sublane slice —
            # a mid-width slice before the reshape is an unsupported
            # Mosaic shape cast).  Costs Wp/Wo ~ +4% MXU work.
            sl = ph[dy // 2 : dy // 2 + Ho].reshape(Ho * Wp, C)
            part = jax.lax.dot_general(
                sl, w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Ho, Wp, -1)[:, dx // 2 : dx // 2 + Wo, :]
            acc = part if acc is None else acc + part
    out = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_n"))
def conv_s2_gelu(
    x: jax.Array,       # (N, H, W, C)
    w: jax.Array,       # (3, 3, C, O)
    b: jax.Array,       # (O,)
    interpret: bool = False,
    block_n: int = 1,
) -> jax.Array:
    """GELU(conv2d(x, w, stride 2, pad 1) + b) -> (N, H', W', O).

    The conv+bias runs in the Pallas kernel; the exact GELU is applied by
    XLA on the (small) output.
    """
    N, H, W, C = x.shape
    O = w.shape[-1]
    Ho, Wo = (H - 1) // 2 + 1, (W - 1) // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Phase blocks sized to cover every tap window: Hp = max over dy of
    # ceil((H+2 - dy%2)/2) bounded by dy//2 + Ho.
    Hp, Wp = Ho + 1, Wo + 1
    phases = [
        jnp.pad(
            xp[:, p::2, q::2, :],
            (
                (0, 0),
                (0, Hp - xp[:, p::2].shape[1]),
                (0, Wp - xp[:, :, q::2].shape[2]),
                (0, 0),
            ),
        )
        for p in (0, 1)
        for q in (0, 1)
    ]
    if N % block_n:
        raise ValueError(f"N={N} not a multiple of block_n={block_n}")

    grid = (N // block_n,)
    if block_n != 1:
        raise NotImplementedError("block_n=1 only (one chunk per cell)")
    spec_in = pl.BlockSpec((1, Hp, Wp, C), lambda n: (n, 0, 0, 0))
    y = pl.pallas_call(
        functools.partial(_kernel, Ho=Ho, Wo=Wo),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, O), x.dtype),
        grid=grid,
        in_specs=[
            spec_in, spec_in, spec_in, spec_in,
            pl.BlockSpec((3, 3, C, O), lambda n: (0, 0, 0, 0)),
            pl.BlockSpec((O,), lambda n: (0,)),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, O), lambda n: (n, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*phases, w.astype(x.dtype), b.astype(jnp.float32))
    return jax.nn.gelu(y, approximate=False)
