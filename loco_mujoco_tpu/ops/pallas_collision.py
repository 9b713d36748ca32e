"""Pallas TPU kernel for the plane-mesh contact manifold selection.

The XLA formulation of the all-pairs plane-mesh narrowphase
(`collision._plane_mesh_narrow`) is memory-bound: the (env, P, V) vertex
height map and its derived maps (tangential distance, side extent) get
materialized to HBM between the data-dependent reduction passes (argmin ->
one-hot gather -> argmax -> ...), costing ~5 GB of traffic per call at 4096
envs. This kernel runs the entire selection per (pair, env-block) in VMEM:
the height map lives in a (V, BE) tile, every reduction is fused, and only
the 4 selected slot depths/indices per pair leave the chip.

Selection semantics are identical to `_plane_mesh_narrow` (deepest vertex,
farthest-in-plane within margin, two extreme side vertices of that line);
argmin/argmax tie-breaking picks the first index via min-over-masked-iota,
matching jnp.argmin/argmax.

Used only on TPU backends with float32 data; the XLA path remains the
reference implementation (and the CPU/f64 parity path). Opt out with
LMT_PALLAS=0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def pallas_enabled() -> bool:
    if os.environ.get("LMT_PALLAS", "1") == "0":
        return False
    try:
        # The kernel must lower on the device computations actually land on.
        # `jax.default_backend()` alone is wrong when a TPU plugin is present
        # but `jax_default_device` pins execution to CPU (the parity-test
        # configuration): lowering then happens for CPU and pallas_call
        # raises. Trust the pinned default device first.
        pinned = jax.config.jax_default_device
        if pinned is not None:
            platform = getattr(pinned, "platform", pinned)
            return str(platform) not in ("cpu",)
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - no backend at all
        return False


def _kernel(verts_ref, a_ref, b_ref, marg_ref, dist_ref, vsel_ref):
    """One (pair, env-block) program: full manifold selection in VMEM."""
    f32 = jnp.float32
    vx = verts_ref[0, 0, :][:, None]  # (V, 1)
    vy = verts_ref[0, 1, :][:, None]
    vz = verts_ref[0, 2, :][:, None]
    a0 = a_ref[0, 0, :][None, :]  # (1, BE)
    a1 = a_ref[0, 1, :][None, :]
    a2 = a_ref[0, 2, :][None, :]
    b = b_ref[0, 0, :][None, :]
    margin = marg_ref[0, 0, 0]

    V = vx.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0).astype(f32)

    h = vx * a0 + vy * a1 + vz * a2 + b  # (V, BE)

    def amin(x):
        m = jnp.min(x, axis=0, keepdims=True)
        i = jnp.min(jnp.where(x == m, iota, float(V)), axis=0, keepdims=True)
        return m, i

    def amax(x):
        m = jnp.max(x, axis=0, keepdims=True)
        i = jnp.min(jnp.where(x == m, iota, float(V)), axis=0, keepdims=True)
        return m, i

    def take(i):
        oh = (iota == i).astype(f32)  # (V, BE)
        return (
            jnp.sum(vx * oh, axis=0, keepdims=True),
            jnp.sum(vy * oh, axis=0, keepdims=True),
            jnp.sum(vz * oh, axis=0, keepdims=True),
            jnp.sum(h * oh, axis=0, keepdims=True),
        )

    d0, i0 = amin(h)
    v0x, v0y, v0z, _ = take(i0)

    cand = h < margin
    dvx, dvy, dvz = vx - v0x, vy - v0y, vz - v0z
    dh = h - d0
    dist2 = jnp.where(cand, dvx * dvx + dvy * dvy + dvz * dvz - dh * dh, -_BIG)
    far2, i1 = amax(dist2)
    v1x, v1y, v1z, d1 = take(i1)
    has1 = far2 > 1e-12

    ux, uy, uz = v1x - v0x, v1y - v0y, v1z - v0z
    un = jnp.maximum(jnp.sqrt(ux * ux + uy * uy + uz * uz), 1e-15)
    ux, uy, uz = ux / un, uy / un, uz / un
    # cr = a . ((v - v0) x u): side extent about the 0-1 line
    cx = dvy * uz - dvz * uy
    cy = dvz * ux - dvx * uz
    cz = dvx * uy - dvy * ux
    cr = jnp.where(cand, a0 * cx + a1 * cy + a2 * cz, 0.0)
    c2, i2 = amax(cr)
    v2x, v2y, v2z, d2 = take(i2)
    has2 = has1 & (c2 > 1e-10)
    c3, i3 = amin(cr)
    v3x, v3y, v3z, d3 = take(i3)
    has3 = has1 & (c3 < -1e-10)

    big = jnp.full_like(d0, _BIG)
    dist_ref[0, 0, :] = d0[0]
    dist_ref[0, 1, :] = jnp.where(has1, d1, big)[0]
    dist_ref[0, 2, :] = jnp.where(has2, d2, big)[0]
    dist_ref[0, 3, :] = jnp.where(has3, d3, big)[0]
    # selected vertex coordinates (mesh-local), slot-major: avoids a
    # per-env take_along_axis gather on the XLA side (which lowered to
    # layout-copy storms costing more than this whole kernel)
    vsel_ref[0, 0, :] = v0x[0]
    vsel_ref[0, 1, :] = v0y[0]
    vsel_ref[0, 2, :] = v0z[0]
    vsel_ref[0, 3, :] = v1x[0]
    vsel_ref[0, 4, :] = v1y[0]
    vsel_ref[0, 5, :] = v1z[0]
    vsel_ref[0, 6, :] = v2x[0]
    vsel_ref[0, 7, :] = v2y[0]
    vsel_ref[0, 8, :] = v2z[0]
    vsel_ref[0, 9, :] = v3x[0]
    vsel_ref[0, 10, :] = v3y[0]
    vsel_ref[0, 11, :] = v3z[0]


@functools.partial(jax.jit, static_argnums=(3,))
def _select_batched(verts, a, b, margin_tuple):
    """(P,3,V) static verts, (E,P,3) a, (E,P) b -> dist4 (E,P,4), idx4."""
    E, P = b.shape
    V = verts.shape[2]
    BE = 256
    Ep = ((E + BE - 1) // BE) * BE
    at = jnp.moveaxis(a, 0, -1)  # (P, 3, E)
    bt = b.T[:, None, :]  # (P, 1, E)
    if Ep != E:
        at = jnp.pad(at, ((0, 0), (0, 0), (0, Ep - E)))
        bt = jnp.pad(bt, ((0, 0), (0, 0), (0, Ep - E)))
    marg = jnp.asarray(np.asarray(margin_tuple, np.float32)[:, None, None])

    grid = (P, Ep // BE)
    dist, vsel = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, V), lambda p, e: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda p, e: (p, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, 4, Ep), jnp.float32),
            jax.ShapeDtypeStruct((P, 12, Ep), jnp.float32),
        ],
    )(verts, at, bt, marg)
    dist = jnp.moveaxis(dist[:, :, :E], -1, 0)  # (E, P, 4)
    vsel = jnp.moveaxis(vsel[:, :, :E], -1, 0).reshape(E, P, 4, 3)
    return dist, vsel


def make_plane_mesh_select(verts: np.ndarray, margin: np.ndarray):
    """Factory: selection fn over static (P, V, 3) verts (already padded
    with vertex-0 duplicates). Returns fn(a (P,3), b (P,)) -> (dist (P,4),
    idx (P,4)) that dispatches to the fused kernel under vmap."""
    P, V, _ = verts.shape
    Vp = ((V + 7) // 8) * 8
    vt = np.zeros((P, 3, Vp), np.float32)
    vt[:, :, :V] = np.moveaxis(verts, -1, 1)
    if Vp != V:  # pad with vertex 0 duplicates (selection-neutral)
        vt[:, :, V:] = vt[:, :, 0:1]
    # keep verts as host numpy in the closure: converting to a device array
    # here would capture a tracer-scoped constant when the factory runs
    # inside an active trace (the jit boundary of _select_batched converts)
    margin_tuple = tuple(float(m) for m in margin)

    @jax.custom_batching.custom_vmap
    def select(a, b):
        dist, idx = _select_batched(vt, a[None], b[None], margin_tuple)
        return dist[0], idx[0]

    @select.def_vmap
    def _select_vmap(axis_size, in_batched, a, b):
        del axis_size, in_batched
        dist, idx = _select_batched(vt, a, b, margin_tuple)
        return (dist, idx), (True, True)

    return select
