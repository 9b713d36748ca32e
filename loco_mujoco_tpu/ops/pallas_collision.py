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
    """(P,3,V) static verts, (E,P,3) a, (E,P) b -> dist4 (E,P,4), vsel."""
    E = b.shape[0]
    dist, vsel = _select_batched_raw(verts, a, b, margin_tuple)
    from . import pallas_layout as play

    dist = play.moveaxis_last0(dist[:, :, :E])  # (E, P, 4)
    vsel = play.moveaxis_last0(vsel[:, :, :E]).reshape(E, -1, 4, 3)
    return dist, vsel


@functools.partial(jax.jit, static_argnums=(3,))
def _select_batched_raw(verts, a, b, margin_tuple):
    """Like _select_batched but returns env-LAST (P, 4, Ep), (P, 12, Ep) —
    feeding downstream kernels without the relayout."""
    E, P = b.shape
    V = verts.shape[2]
    BE = 256
    # pairs per program scale inversely with hull size: the unrolled
    # per-pair loop stack-allocates its (V, BE) maps, and a 3200-vertex
    # hull at 16 pairs/program blows the 16 MB VMEM limit (observed on G1)
    PB = max(1, min(_PB, P, int(4_000_000 // (V * BE * 4))))
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
    return dist[:P], vsel[:P]


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


# ---------------------------------------------------------------------------
# fused group top-K: per-pair manifolds -> per-slot contact data, no
# env-major round trip
# ---------------------------------------------------------------------------
def _topk_kernel_builder(P, k, pg1, pg2, ngeom):
    """Kernel: pick the k deepest pairs and emit their slot data.

    Replaces the XLA argmin/one-hot-einsum chain, which cost ~45 ms/step at
    4096 envs in (E, 75)-shaped small ops and forced the full per-pair
    manifold tensors through env-major relayouts."""

    def kernel(dist_ref, vsel_ref, gxp_ref, gxm_ref, tbl_ref,
               ds_ref, pos_ref, fr_ref, meta_ref):
        f32 = jnp.float32
        dist = dist_ref[...]   # (P, 4, BE)
        vsel = vsel_ref[...]   # (P, 12, BE)  (4 verts x xyz, mesh-local)
        tbl = tbl_ref[...]     # (P, 16, 1) static per-pair values

        # per-pair plane normal / mesh pose via static geom indices
        n_all = jnp.stack(
            [jnp.stack([gxm_ref[g, 3 * i + 2] for i in range(3)])
             for g in pg1]
        )  # (P, 3, BE)
        qp_all = jnp.stack([gxp_ref[g] for g in pg2])  # (P, 3, BE)
        qR_all = jnp.stack([gxm_ref[g] for g in pg2])  # (P, 9, BE)

        key = dist[:, 0, :] - tbl[:, 0]  # (P, BE); tbl col 0 = pair margin
        iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(f32)

        ds_rows, pos_rows, fr_rows, meta_rows = [], [], [], []
        for s in range(k):
            m = jnp.min(key, axis=0, keepdims=True)  # (1, BE)
            i = jnp.min(
                jnp.where(key == m, iota, float(P)), axis=0, keepdims=True
            )
            oh = (iota == i).astype(f32)  # (P, BE)
            key = jnp.where(oh > 0, _BIG, key)

            ohe = oh[:, None, :]
            dsel = jnp.sum(ohe * dist, axis=0)        # (4, BE)
            vs = jnp.sum(ohe * vsel, axis=0)          # (12, BE)
            n = jnp.sum(ohe * n_all, axis=0)          # (3, BE)
            qp = jnp.sum(ohe * qp_all, axis=0)        # (3, BE)
            qR = jnp.sum(ohe * qR_all, axis=0)        # (9, BE)
            meta = jnp.sum(ohe * tbl[:, 1:, :], axis=0)  # (15, BE)

            # world positions: w = qp + R v; pos = w - n * dist/2
            pos_f = []
            for f in range(4):
                d2 = 0.5 * dsel[f]
                for i3 in range(3):
                    w = (
                        qp[i3]
                        + qR[3 * i3 + 0] * vs[3 * f + 0]
                        + qR[3 * i3 + 1] * vs[3 * f + 1]
                        + qR[3 * i3 + 2] * vs[3 * f + 2]
                    )
                    pos_f.append(w - n[i3] * d2)
            # contact frame from n (mju_makeFrame convention)
            use_y = jnp.abs(n[1]) < 0.5
            ax = [
                jnp.where(use_y, 0.0, 0.0),
                jnp.where(use_y, 1.0, 0.0),
                jnp.where(use_y, 0.0, 1.0),
            ]
            ndot = n[0] * ax[0] + n[1] * ax[1] + n[2] * ax[2]
            t1 = [ax[i3] - n[i3] * ndot for i3 in range(3)]
            t1n = jnp.maximum(
                jnp.sqrt(t1[0] * t1[0] + t1[1] * t1[1] + t1[2] * t1[2]),
                1e-15,
            )
            t1 = [t / t1n for t in t1]
            t2 = [
                n[1] * t1[2] - n[2] * t1[1],
                n[2] * t1[0] - n[0] * t1[2],
                n[0] * t1[1] - n[1] * t1[0],
            ]
            ds_rows.append(dsel)
            pos_rows.append(jnp.stack(pos_f))
            fr_rows.append(jnp.stack([n[0], n[1], n[2], *t1, *t2]))
            meta_rows.append(meta)

        ds_ref[...] = jnp.stack(ds_rows)      # (k, 4, BE)
        pos_ref[...] = jnp.stack(pos_rows)    # (k, 12, BE)
        fr_ref[...] = jnp.stack(fr_rows)      # (k, 9, BE)
        meta_ref[...] = jnp.stack(meta_rows)  # (k, 15, BE)

    return kernel


def make_group_topk(subs, inv, pg1, pg2, tbl, k):
    """Factory for one plane-mesh group: per-pair manifold selection
    (vertex-bucketed kernels) + in-kernel top-K slot selection.

    subs/inv: vertex buckets from make_plane_mesh_select-style packing,
    over pairs ALREADY in bucket order (inv maps back);
    pg1/pg2: per-pair geom ids in bucket order; tbl (P, 16) static
    [key_margin, g1, g2, friction(5), solref(2), solimp(5), margin-gap];
    k: slots. Returns fn(a (P,3), b (P,), gxp (ngeom,3), gxm (ngeom,3,3))
    -> (dist (k,4), pos (k,4,3), frame (k,3,3), meta (k,15)), batched via
    custom_vmap. `a`/`b`/tbl rows are in ORIGINAL pair order."""
    del inv  # tables are pre-reordered to bucket order by the caller
    P = len(pg1)
    BE = 128
    tblc = np.asarray(tbl, np.float32)[:, :, None]  # (P, 16, 1)

    # only the group's geoms' poses are needed — subset before the env-last
    # relayout (transposing the full (E, ngeom, 12) pose tables cost ~25
    # ms/step at 4096 envs; a plane-mesh group touches ~13 distinct geoms)
    used = sorted(set(pg1) | set(pg2))
    lid = {g: i for i, g in enumerate(used)}
    pg1_l = [lid[g] for g in pg1]
    pg2_l = [lid[g] for g in pg2]
    used_idx = np.asarray(used)

    def batched(a, b, gxp, gxm):
        E = b.shape[0]
        Ep = ((E + BE - 1) // BE) * BE
        douts, souts = [], []
        off = 0
        for ids, vt, marg in subs:
            d, s = _select_batched_raw(
                vt, a[:, off:off + len(ids)], b[:, off:off + len(ids)], marg
            )
            douts.append(d)
            souts.append(s)
            off += len(ids)
        dist = jnp.concatenate(douts, axis=0)  # (P, 4, Ep')
        vsel = jnp.concatenate(souts, axis=0)
        if dist.shape[-1] != Ep:
            dist = dist[..., :Ep]
            vsel = vsel[..., :Ep]

        from . import pallas_layout as play

        nused = len(used)
        gxp_t = play.moveaxis0_last(gxp[:, used_idx].astype(jnp.float32))
        gxm_t = play.moveaxis0_last(
            gxm[:, used_idx].reshape(E, nused, 9).astype(jnp.float32)
        )
        if Ep != E:
            gxp_t = jnp.pad(gxp_t, ((0, 0), (0, 0), (0, Ep - E)))
            gxm_t = jnp.pad(gxm_t, ((0, 0), (0, 0), (0, Ep - E)))

        kernel = _topk_kernel_builder(P, k, pg1_l, pg2_l, nused)
        gs = lambda *shape: pl.BlockSpec(
            tuple(shape) + (BE,),
            (lambda e: (0, e)) if len(shape) == 1 else (lambda e: (0, 0, e)),
            memory_space=pltpu.VMEM,
        )
        ds, pos, fr, meta = pl.pallas_call(
            kernel,
            grid=(Ep // BE,),
            in_specs=[
                gs(P, 4), gs(P, 12), gs(nused, 3), gs(nused, 9),
                pl.BlockSpec((P, 16, 1), lambda e: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[gs(k, 4), gs(k, 12), gs(k, 9), gs(k, 15)],
            out_shape=[
                jax.ShapeDtypeStruct((k, 4, Ep), jnp.float32),
                jax.ShapeDtypeStruct((k, 12, Ep), jnp.float32),
                jax.ShapeDtypeStruct((k, 9, Ep), jnp.float32),
                jax.ShapeDtypeStruct((k, 15, Ep), jnp.float32),
            ],
        )(dist, vsel, gxp_t, gxm_t, jnp.asarray(tblc))
        back = lambda x: play.moveaxis_last0(x[..., :E])
        return (
            back(ds),
            back(pos).reshape(E, k, 4, 3),
            back(fr).reshape(E, k, 3, 3),
            back(meta),
        )

    @jax.custom_batching.custom_vmap
    def topk(a, b, gxp, gxm):
        out = batched(a[None], b[None], gxp[None], gxm[None])
        return tuple(o[0] for o in out)

    @topk.def_vmap
    def _vmap(axis_size, in_batched, *args):
        args = [
            x if bt else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, bt in zip(args, in_batched)
        ]
        return batched(*args), (True, True, True, True)

    return topk
