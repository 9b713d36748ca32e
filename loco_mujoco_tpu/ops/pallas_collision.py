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


_PB = 16  # pairs per program: amortizes program-launch overhead (a
# one-pair grid ran 1200 programs/call; their fixed cost dominated the
# actual V x BE selection math)


def _kernel(verts_ref, a_ref, b_ref, marg_ref, dist_ref, vsel_ref):
    """One (pair-block, env-block) program: full manifold selection for
    _PB pairs in VMEM."""
    f32 = jnp.float32
    PB = verts_ref.shape[0]
    V = verts_ref.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0).astype(f32)

    for p in range(PB):
        vx = verts_ref[p, 0, :][:, None]  # (V, 1)
        vy = verts_ref[p, 1, :][:, None]
        vz = verts_ref[p, 2, :][:, None]
        a0 = a_ref[p, 0, :][None, :]  # (1, BE)
        a1 = a_ref[p, 1, :][None, :]
        a2 = a_ref[p, 2, :][None, :]
        b = b_ref[p, 0, :][None, :]
        margin = marg_ref[p, 0, 0]

        h = vx * a0 + vy * a1 + vz * a2 + b  # (V, BE)

        def amin(x):
            m = jnp.min(x, axis=0, keepdims=True)
            i = jnp.min(
                jnp.where(x == m, iota, float(V)), axis=0, keepdims=True
            )
            return m, i

        def amax(x):
            m = jnp.max(x, axis=0, keepdims=True)
            i = jnp.min(
                jnp.where(x == m, iota, float(V)), axis=0, keepdims=True
            )
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
        dist2 = jnp.where(
            cand, dvx * dvx + dvy * dvy + dvz * dvz - dh * dh, -_BIG
        )
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
        dist_ref[p, 0, :] = d0[0]
        dist_ref[p, 1, :] = jnp.where(has1, d1, big)[0]
        dist_ref[p, 2, :] = jnp.where(has2, d2, big)[0]
        dist_ref[p, 3, :] = jnp.where(has3, d3, big)[0]
        # selected vertex coordinates (mesh-local), slot-major: avoids a
        # per-env take_along_axis gather on the XLA side (which lowered to
        # layout-copy storms costing more than this whole kernel)
        vsel_ref[p, 0, :] = v0x[0]
        vsel_ref[p, 1, :] = v0y[0]
        vsel_ref[p, 2, :] = v0z[0]
        vsel_ref[p, 3, :] = v1x[0]
        vsel_ref[p, 4, :] = v1y[0]
        vsel_ref[p, 5, :] = v1z[0]
        vsel_ref[p, 6, :] = v2x[0]
        vsel_ref[p, 7, :] = v2y[0]
        vsel_ref[p, 8, :] = v2z[0]
        vsel_ref[p, 9, :] = v3x[0]
        vsel_ref[p, 10, :] = v3y[0]
        vsel_ref[p, 11, :] = v3z[0]


@functools.partial(jax.jit, static_argnums=(3,))
def _select_batched(verts, a, b, margin_tuple):
    """(P,3,V) static verts, (E,P,3) a, (E,P) b -> dist4 (E,P,4), idx4."""
    E, P = b.shape
    V = verts.shape[2]
    BE = 256
    PB = min(_PB, P)
    Pp = ((P + PB - 1) // PB) * PB
    Ep = ((E + BE - 1) // BE) * BE
    at = jnp.moveaxis(a, 0, -1)  # (P, 3, E)
    bt = b.T[:, None, :]  # (P, 1, E)
    if Ep != E or Pp != P:
        at = jnp.pad(at, ((0, Pp - P), (0, 0), (0, Ep - E)))
        bt = jnp.pad(bt, ((0, Pp - P), (0, 0), (0, Ep - E)))
    marg = np.zeros((Pp, 1, 1), np.float32)
    marg[:P, 0, 0] = np.asarray(margin_tuple, np.float32)
    marg = jnp.asarray(marg)
    if Pp != P:
        verts = jnp.concatenate(
            [verts, jnp.broadcast_to(verts[:1], (Pp - P, 3, V))]
        )

    grid = (Pp // PB, Ep // BE)
    dist, vsel = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((PB, 3, V), lambda p, e: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 3, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1, 1), lambda p, e: (p, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((PB, 4, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 12, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, 4, Ep), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 12, Ep), jnp.float32),
        ],
    )(verts, at, bt, marg)
    from . import pallas_layout as play

    dist = play.moveaxis_last0(dist[:P, :, :E])  # (E, P, 4)
    vsel = play.moveaxis_last0(vsel[:P, :, :E]).reshape(E, P, 4, 3)
    return dist, vsel


def make_plane_mesh_select(
    verts: np.ndarray, margin: np.ndarray, counts: np.ndarray = None
):
    """Factory: selection fn over static (P, V, 3) verts (already padded
    with vertex-0 duplicates). Returns fn(a (P,3), b (P,)) -> (dist (P,4),
    idx (P,4)) that dispatches to the fused kernel under vmap.

    Pairs are bucketed by true hull size (`counts`): the vertex table is
    padded to the LARGEST hull (544 for the humanoid, mean hull 81), so a
    single-bucket kernel would scan ~6.7x more vertices than exist."""
    P, V, _ = verts.shape
    if counts is None:
        counts = np.full(P, V, dtype=np.int64)

    def bucket_size(c):
        c = max(int(c), 8)
        s = 32
        while s < c:
            s += 32
        return min(s, ((V + 7) // 8) * 8)

    buckets: dict = {}
    for p in range(P):
        buckets.setdefault(bucket_size(counts[p]), []).append(p)

    subs = []
    order = []
    for vb, ids in sorted(buckets.items()):
        ids = np.asarray(ids)
        vt = np.zeros((len(ids), 3, vb), np.float32)
        src = np.moveaxis(verts[ids], -1, 1)  # (Pb, 3, V)
        vt[:, :, : min(vb, V)] = src[:, :, :vb]
        if vb > V:
            vt[:, :, V:] = vt[:, :, 0:1]
        # rows beyond each hull's count are vertex-0 duplicates already
        subs.append((ids, vt, tuple(float(m) for m in margin[ids])))
        order.append(ids)
    perm = np.concatenate(order)
    inv = np.argsort(perm)

    @jax.custom_batching.custom_vmap
    def select(a, b):
        d, s = _select_buckets(a[None], b[None])
        return d[0], s[0]

    def _select_buckets(a, b):
        douts, souts = [], []
        for ids, vt, marg in subs:
            d, s = _select_batched(vt, a[:, ids], b[:, ids], marg)
            douts.append(d)
            souts.append(s)
        dist = jnp.concatenate(douts, axis=1)[:, inv]
        vsel = jnp.concatenate(souts, axis=1)[:, inv]
        return dist, vsel

    @select.def_vmap
    def _select_vmap(axis_size, in_batched, a, b):
        del axis_size, in_batched
        return _select_buckets(a, b), (True, True)

    return select
