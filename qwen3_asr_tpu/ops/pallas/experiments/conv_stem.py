"""Fused 3x3 stride-2 conv + bias as in-VMEM tap GEMMs (Pallas).

The encoder's conv stem measured ~36% MXU as ``lax.conv`` (120 ms of the
247 ms encoder at B=64) and the XLA-level taps rewrite measured SLOWER
(178.8 ms — nine strided re-reads of the activations through HBM;
docs/PERFORMANCE.md).  This kernel keeps the taps idea but pays the
relayout once:

  * XLA phase-separates the (1-padded) input — four strided slices
    ``phase[p,q] = xpad[p::2, q::2]`` stacked into one (4, N, Hp, Wp, C)
    operand (a single fused HBM pass);
  * the grid is ``(chunk, tap)``: each step DMAs ONE phase block (the
    tap's ``(dy % 2, dx % 2)`` phase, chosen by the BlockSpec index map)
    and ONE ``(C, O)`` weight tap, runs a full-MXU-width GEMM over the
    H-sliced phase, and accumulates into an f32 scratch — so VMEM holds
    one phase block, not four (a 4-phase single-step variant exceeded
    the 16 MB scoped-vmem limit by 3.3 MB);
  * the tap's W offset is applied on the small f32 result (a mid-width
    slice BEFORE the GEMM's reshape is an unsupported Mosaic shape
    cast); bias adds in the epilogue.  Exact GELU stays OUTSIDE the
    kernel (Mosaic implements neither erf nor erfc) — XLA applies it to
    the small conv output, numerically identical to the lax.conv stem.

Tap/phase algebra: with ``xpad`` 1-padded, ``out[h, w] = sum_{dy,dx}
xpad[2h+dy, 2w+dx] @ k[dy,dx]``; substituting ``2h+dy = 2(h+dy//2) +
(dy%2)`` gives ``xpad[2h+dy, 2w+dx] = phase[dy%2, dx%2][h + dy//2,
w + dx//2]`` — each tap is a contiguous window of one phase.

Numerical contract: equals ``lax.conv_general_dilated`` + bias to f32
accumulation-order tolerance (tests/test_pallas.py drives the public
conv_s2_gelu, which includes the XLA GELU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Tap visit order: (dy, dx) for grid axis 1.
_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]


def _kernel(ph_ref, w_ref, b_ref, o_ref, acc, *, Ho, Wo):
    tap = pl.program_id(1)

    @pl.when(tap == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    ph = ph_ref[0, 0]                       # (Hp, Wp, C)
    Wp, C = ph.shape[1], ph.shape[2]
    w = w_ref[0]                            # (C, O)

    # The H offset (dy // 2) and W offset (dx // 2) are {0, 1}; branch on
    # the two dynamic conditions so every slice below is static.
    for oy in (0, 1):
        for ox in (0, 1):
            want_oy = (tap // 3 == 2) == (oy == 1)
            want_ox = (tap % 3 == 2) == (ox == 1)

            @pl.when(want_oy & want_ox)
            def _(oy=oy, ox=ox):
                sl = ph[oy : oy + Ho].reshape(Ho * Wp, C)
                part = jax.lax.dot_general(
                    sl, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(Ho, Wp, -1)
                acc[...] += part[:, ox : ox + Wo, :]

    @pl.when(tap == 8)
    def _emit():
        o_ref[0] = (acc[...] + b_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_s2_gelu(
    x: jax.Array,       # (N, H, W, C)
    w: jax.Array,       # (3, 3, C, O)
    b: jax.Array,       # (O,)
    interpret: bool = False,
) -> jax.Array:
    """GELU(conv2d(x, w, stride 2, pad 1) + b) -> (N, H', W', O).

    conv + bias run in the Pallas kernel; the exact GELU is applied by
    XLA on the (small) output.  Large batches run as ``lax.map`` over
    N-slices: the phase-separated operand is ~1.07x the input, and at
    the stem's 2048-chunk batch materializing it whole OOMs HBM
    (measured 19.25G/15.75G).
    """
    N, H, W, C = x.shape
    slice_n = 256
    if N > slice_n and N % slice_n == 0:
        return jax.lax.map(
            lambda xs: _conv_s2_gelu_impl(xs, w, b, interpret),
            x.reshape(N // slice_n, slice_n, H, W, C),
        ).reshape(N, (H - 1) // 2 + 1, (W - 1) // 2 + 1, w.shape[-1])
    return _conv_s2_gelu_impl(x, w, b, interpret)


def _conv_s2_gelu_impl(x, w, b, interpret):
    N, H, W, C = x.shape
    O = w.shape[-1]
    Ho, Wo = (H - 1) // 2 + 1, (W - 1) // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Hp, Wp = Ho + 1, Wo + 1
    phases = jnp.stack(
        [
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
    )                                        # (4, N, Hp, Wp, C)
    w9 = w.reshape(9, C, O)

    def phase_map(n, t):
        # tap (dy, dx) -> stacked phase index 2*(dy%2) + (dx%2).
        return (2 * (t // 3 % 2) + t % 3 % 2, n, 0, 0, 0)

    y = pl.pallas_call(
        functools.partial(_kernel, Ho=Ho, Wo=Wo),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, O), x.dtype),
        grid=(N, 9),
        in_specs=[
            pl.BlockSpec((1, 1, Hp, Wp, C), phase_map),
            pl.BlockSpec((1, C, O), lambda n, t: (t, 0, 0)),
            pl.BlockSpec((O,), lambda n, t: (0,)),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, O), lambda n, t: (n, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((Ho, Wo, O), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(phases, w9.astype(x.dtype), b.astype(jnp.float32))
    return jax.nn.gelu(y, approximate=False)
