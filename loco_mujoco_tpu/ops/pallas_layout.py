"""Pallas TPU relayout helpers.

XLA lowers env-major <-> env-last transposes of small-minor-dim physics
arrays (J, M, cdof, contact fields) to scalar-ish copy loops that run at
~3 GB/s on this chip — feeding the fused constraint kernel cost as much as
the kernel itself (65 ms/step at 4096 envs). This tiled transpose kernel
moves the same bytes at streaming bandwidth: each program reads a
(BE, BK) tile of the (E, K) view into VMEM, transposes it in-registers,
and writes the (BK, BE) tile of the output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BE = 128
_BK = 512


def _t2d_kernel(x_ref, o_ref):
    # Transpose via the MXU: y (K, E) = x^T = dot(x, I_E) contracted over
    # the E axis. Mosaic's vector-unit transpose lowering moves ~19 GB/s on
    # v5e; the systolic array with a 128-deep contraction is several times
    # faster. Bit-exactness: with HIGHEST precision the f32 operands are
    # split into bf16 limbs whose products against the exact-in-bf16 0/1
    # identity reconstruct the original f32 exactly.
    x = x_ref[...]  # (BE, BK)
    E = x.shape[0]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (E, E), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (E, E), 1)
    ).astype(x.dtype)
    o_ref[...] = jax.lax.dot_general(
        x, eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _t2d(x):
    """(E, K) -> (K, E) tiled transpose."""
    E, K = x.shape
    if K < 128 or E < 128:
        # lane-padding a tiny minor dim would cost more than XLA's copy
        return x.T
    bk = _BK if K >= _BK else ((K + 127) // 128) * 128
    be = _BE if E >= _BE else ((E + 127) // 128) * 128
    Ep = ((E + be - 1) // be) * be
    Kp = ((K + bk - 1) // bk) * bk
    if (Ep, Kp) != (E, K):
        x = jnp.pad(x, ((0, Ep - E), (0, Kp - K)))
    from . import pallas_newton as pn  # shared interpret-mode flag

    out = pl.pallas_call(
        _t2d_kernel,
        grid=(Ep // be, Kp // bk),
        in_specs=[
            pl.BlockSpec((be, bk), lambda e, k: (e, k),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((bk, be), lambda e, k: (k, e),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, Ep), x.dtype),
        interpret=pn._INTERPRET,
    )(x)
    if (Ep, Kp) != (E, K):
        out = out[:K, :E]
    return out


def _tg_kernel(x_ref, o_ref):
    # (128, bk) env-major tile -> (1, bk, 128) grouped tile (same MXU
    # transpose as _t2d_kernel, lane-sized env block). The group axis is
    # LEADING in the kernel output — Mosaic requires the last two block
    # dims to be tile-divisible, and a (bk, 1, 128) block over a
    # (K, R, 128) array violates that whenever R > 1 (observed: G1 at
    # 4096 envs, R=32). The (R, K, 128) -> (K, R, 128) major-axis swap
    # happens outside the kernel, where it keeps the lane dim and runs at
    # copy bandwidth.
    x = x_ref[...]  # (128, bk)
    E = x.shape[0]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (E, E), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (E, E), 1)
    ).astype(x.dtype)
    y = jax.lax.dot_general(
        x, eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (bk, 128)
    o_ref[...] = y[None]


def _fg_kernel(x_ref, o_ref):
    # (1, bk, 128) grouped tile -> (128, bk) env-major tile
    x = x_ref[...][0]  # (bk, 128)
    K = x.shape[0]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    ).astype(x.dtype)
    o_ref[...] = jax.lax.dot_general(
        x, eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (128, bk)


def to_grouped(x, r_pad=None):
    """(E, K) env-major -> (K, R, 128) grouped env layout.

    Element (e, k) lands at (k, e // 128, e % 128); R = ceil(E/128),
    optionally padded up to ``r_pad`` rows (so a kernel block of S sublane
    rows covers S*128 envs with no partial group). The sublane axis of
    every (S, 128) tile is 8 distinct env rows — kernels consuming this
    layout run their per-env scalar chains at full VPU sublane occupancy
    instead of the 1/8 a (BE,)-vector layout gets.
    """
    E, K = x.shape
    R = (E + 127) // 128
    if r_pad is not None:
        R = ((R + r_pad - 1) // r_pad) * r_pad
    Ep = R * 128
    from . import pallas_newton as pn

    if K < 8 or pn._INTERPRET or E < 128:
        if Ep != E:
            x = jnp.pad(x, ((0, Ep - E), (0, 0)))
        return x.T.reshape(K, R, 128)
    bk = _BK if K >= _BK else ((K + 127) // 128) * 128
    Kp = ((K + bk - 1) // bk) * bk
    if (Ep, Kp) != (E, K):
        x = jnp.pad(x, ((0, Ep - E), (0, Kp - K)))
    out = pl.pallas_call(
        _tg_kernel,
        grid=(R, Kp // bk),
        in_specs=[
            pl.BlockSpec((128, bk), lambda r, k: (r, k),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, bk, 128), lambda r, k: (r, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Kp, 128), x.dtype),
        interpret=pn._INTERPRET,
    )(x)
    out = jnp.swapaxes(out, 0, 1)  # major-dim swap: lane dim untouched
    return out[:K] if Kp != K else out


def from_grouped(x, E):
    """(K, R, 128) grouped -> (E, K) env-major (inverse of to_grouped)."""
    K, R, _ = x.shape
    from . import pallas_newton as pn

    if K < 8 or pn._INTERPRET or E < 128:
        # mirror of to_grouped's small-batch fallback: lane-padding a
        # sub-128 env batch through the kernel costs more than XLA's copy
        return x.reshape(K, R * 128).T[:E]
    bk = _BK if K >= _BK else ((K + 127) // 128) * 128
    Kp = ((K + bk - 1) // bk) * bk
    if Kp != K:
        x = jnp.pad(x, ((0, Kp - K), (0, 0), (0, 0)))
    x = jnp.swapaxes(x, 0, 1)  # (R, Kp, 128): group axis leading (see
    # _tg_kernel — (bk, 1, 128) blocks over (K, R, 128) are not liftable)
    out = pl.pallas_call(
        _fg_kernel,
        grid=(R, Kp // bk),
        in_specs=[
            pl.BlockSpec((1, bk, 128), lambda r, k: (r, k, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((128, bk), lambda r, k: (r, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * 128, Kp), x.dtype),
        interpret=pn._INTERPRET,
    )(x)
    return out[:E, :K]


def moveaxis0_last(x):
    """moveaxis(x, 0, -1) via the tiled transpose: (E, *rest) -> (*rest, E)."""
    E = x.shape[0]
    rest = x.shape[1:]
    if x.ndim == 1:
        return x
    k = 1
    for r in rest:
        k *= r
    return _t2d(x.reshape(E, k)).reshape(*rest, E)


def moveaxis_last0(x):
    """moveaxis(x, -1, 0): (*rest, E) -> (E, *rest)."""
    E = x.shape[-1]
    rest = x.shape[:-1]
    if x.ndim == 1:
        return x
    k = 1
    for r in rest:
        k *= r
    return _t2d(x.reshape(k, E)).reshape(E, *rest)
