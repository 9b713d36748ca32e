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

# tests set this to run the kernels in interpret mode on CPU (parity vs
# the XLA narrowphase without TPU hardware)
_INTERPRET = False


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


def _make_kernel(D):
    """Kernel factory for one bucket, D = padded neighbor-list width.

    Selection semantics replicate libmujoco 3.10's mjc_PlaneConvex exactly
    (see collision._plane_mesh_narrow): support vertex (argmin of height,
    first index wins ties), then the first two of its hull-graph neighbors
    — in stored edge order — with height < margin and distance to contact
    0 >= the dedupe radius. The per-pair static table packs, per row over
    the V axis: [vx, vy, vz, nbr_id(D), nbrx(D), nbry(D), nbrz(D)], so the
    entire per-env candidate gather is ONE (3+4D, V) x (V, BE) matmul on
    the MXU against the support one-hot."""

    def kernel(tbl_ref, a_ref, b_ref, marg_ref, dist_ref, vsel_ref):
        f32 = jnp.float32
        PB = tbl_ref.shape[0]
        V = tbl_ref.shape[2]
        iota = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0).astype(f32)

        for p in range(PB):
            a0 = a_ref[p, 0, :][None, :]  # (1, BE)
            a1 = a_ref[p, 1, :][None, :]
            a2 = a_ref[p, 2, :][None, :]
            b = b_ref[p, 0, :][None, :]
            margin = marg_ref[p, 0, 0]
            dedupe2 = marg_ref[p, 1, 0]  # squared dedupe radius

            # conservative directed-extent bound: with per-axis hull
            # extents [lo, hi] (mesh frame), min_v h = min_v (v.a) + b >=
            # b + sum_i min(a_i lo_i, a_i hi_i). When every env in the
            # block is beyond margin by this bound, the pair cannot
            # produce an active contact anywhere in the block — skip the
            # (V, BE) height map AND the manifold walk, emitting the bound
            # as the slot-0 depth (it only serves as a top-K ranking key,
            # and lb >= margin ranks it behind every active pair). In
            # nominal gait this keeps only the ankle-adjacent hulls "near"
            # (the earlier bounding-sphere bound kept most of the
            # humanoid's 75 floor x mesh pairs near permanently: bone
            # hulls are long and their frame origins sit far from the
            # ground-facing end).
            lb = b - 1e-6
            for i3 in range(3):
                loi = marg_ref[p, 2 + i3, 0]
                hii = marg_ref[p, 5 + i3, 0]
                ai = (a0, a1, a2)[i3]
                lb = lb + jnp.minimum(ai * loi, ai * hii)
            big_row = jnp.full_like(lb[0], _BIG)
            dist_ref[p, 0, :] = lb[0]
            dist_ref[p, 1, :] = big_row
            dist_ref[p, 2, :] = big_row
            tbl = tbl_ref[p]  # (3+4D, V)
            zero_row = lb[0] * 0.0
            for i3 in range(9):
                vsel_ref[p, i3, :] = zero_row + tbl[i3 % 3, 0]

            @pl.when(jnp.min(lb) < margin)
            def _near(p=p, tbl=tbl, a0=a0, a1=a1, a2=a2, b=b,
                      margin=margin, dedupe2=dedupe2):
                vx = tbl[0, :][:, None]  # (V, 1)
                vy = tbl[1, :][:, None]
                vz = tbl[2, :][:, None]

                h = vx * a0 + vy * a1 + vz * a2 + b  # (V, BE)

                d0 = jnp.min(h, axis=0, keepdims=True)
                dist_ref[p, 0, :] = d0[0]

                # manifold construction only when some env is within
                # margin of an actual contact (slots of farther pairs are
                # inactive rows whose values never reach the solver)
                @pl.when(jnp.min(d0) < margin)
                def _manifold():
                    i0 = jnp.min(
                        jnp.where(h == d0, iota, float(V)),
                        axis=0, keepdims=True,
                    )
                    oh0 = (iota == i0).astype(f32)  # (V, BE)

                    # one MXU matmul gathers v0 coords, neighbor ids and
                    # neighbor coords for the support vertex of every env.
                    # 2-piece bf16 split: one-hot selection reconstructs
                    # v_hi + v_lo — exact for the int id rows (< 2^16),
                    # ~1e-5-relative for coords — at 1/3 the cost of the
                    # 6-pass HIGHEST f32 emulation this scope defaults to
                    # (see pallas_fk._gather_dot).
                    ohb = oh0.astype(jnp.bfloat16)
                    t_hi = tbl.astype(jnp.bfloat16)
                    t_lo = (tbl - t_hi.astype(f32)).astype(jnp.bfloat16)
                    with jax.default_matmul_precision("default"):
                        q = sum(
                            jax.lax.dot_general(
                                t, ohb, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32,
                            )
                            for t in (t_hi, t_lo)
                        )  # (3+3D, BE)
                    v0x, v0y, v0z = q[0][None], q[1][None], q[2][None]
                    cx = q[3 : 3 + D]            # (D, BE)
                    cy = q[3 + D : 3 + 2 * D]
                    cz = q[3 + 2 * D : 3 + 3 * D]

                    hc = cx * a0 + cy * a1 + cz * a2 + b  # (D, BE)
                    ex = cx - v0x + 0.5 * d0 * a0
                    ey = cy - v0y + 0.5 * d0 * a1
                    ez = cz - v0z + 0.5 * d0 * a2
                    dist2 = ex * ex + ey * ey + ez * ez
                    # validity rides the coordinate sentinel: invalid
                    # neighbor slots store the owner vertex, whose
                    # dedupe distance 0.25*d0^2 always fails dist2 >=
                    # dedupe2 (pack_plane_mesh_buckets) — no id rows
                    qual = (hc < margin) & (dist2 >= dedupe2)
                    qf = qual.astype(f32)

                    big = jnp.full_like(d0, _BIG)
                    zero = jnp.zeros_like(d0)
                    cnt = zero
                    d1 = d2 = big
                    v1x = v1y = v1z = v2x = v2y = v2z = zero
                    # select, not accumulate-toward: d1 + t1*(hc - d1)
                    # cancels catastrophically in f32 when d1 = _BIG
                    # (hc - 1e10 rounds to -1e10 exactly), silently
                    # zeroing every neighbor slot depth
                    for dc in range(D):
                        qd = qf[dc][None]  # (1, BE)
                        t1 = (qd * (cnt == 0.0)) > 0
                        t2 = (qd * (cnt == 1.0)) > 0
                        d1 = jnp.where(t1, hc[dc][None], d1)
                        v1x = jnp.where(t1, cx[dc][None], v1x)
                        v1y = jnp.where(t1, cy[dc][None], v1y)
                        v1z = jnp.where(t1, cz[dc][None], v1z)
                        d2 = jnp.where(t2, hc[dc][None], d2)
                        v2x = jnp.where(t2, cx[dc][None], v2x)
                        v2y = jnp.where(t2, cy[dc][None], v2y)
                        v2z = jnp.where(t2, cz[dc][None], v2z)
                        cnt = cnt + qd

                    dist_ref[p, 1, :] = d1[0]
                    dist_ref[p, 2, :] = d2[0]
                    # selected vertex coordinates (mesh-local), slot-major:
                    # avoids a per-env take_along_axis gather on the XLA
                    # side (which lowered to layout-copy storms costing
                    # more than this kernel)
                    vsel_ref[p, 0, :] = q[0]
                    vsel_ref[p, 1, :] = q[1]
                    vsel_ref[p, 2, :] = q[2]
                    vsel_ref[p, 3, :] = v1x[0]
                    vsel_ref[p, 4, :] = v1y[0]
                    vsel_ref[p, 5, :] = v1z[0]
                    vsel_ref[p, 6, :] = v2x[0]
                    vsel_ref[p, 7, :] = v2y[0]
                    vsel_ref[p, 8, :] = v2z[0]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _select_batched(tbl_tuple, a, b, marg, D):
    """Static table bucket, (E,P,3) a, (E,P) b -> dist (E,P,3), vsel."""
    E = b.shape[0]
    dist, vsel = _select_batched_raw(tbl_tuple, a, b, marg, D)
    from . import pallas_layout as play

    dist = play.moveaxis_last0(dist[:, :, :E])  # (E, P, 3)
    vsel = play.moveaxis_last0(vsel[:, :, :E]).reshape(E, -1, 3, 3)
    return dist, vsel


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _select_batched_raw(tbl_tuple, a, b, marg_tuple, D):
    """Env-LAST variant: returns (P, 3, Ep), (P, 9, Ep) — feeding
    downstream kernels without the relayout. tbl_tuple is the hashable
    ((P, 3+4D, V) table bytes, shape); marg_tuple the per-pair
    (margin, dedupe_r^2) rows."""
    tbl = np.frombuffer(tbl_tuple[0], np.float32).reshape(tbl_tuple[1])
    P, R, V = tbl.shape
    E = b.shape[0]
    # Env-block width: bigger blocks amortize per-program cost (grid
    # launches + fallback-row writes: at BE=256 the humanoid's 75-pair
    # group ran 80 programs/call x 40 forwards/step). Large hulls keep
    # 256 — the live (V, BE) maps scale with BE and G1's 5376-vert bucket
    # at BE=512 would hold ~38 MB of maps alone.
    BE = 512 if V <= 2048 else 256
    # Pairs per program: the per-pair loop's (V, BE) maps are live for ONE
    # pair at a time (measured ~3.2 x V x BE x 4 bytes peak on G1), while
    # each pair's static table stays resident — so tables scale with PB,
    # maps don't.
    from . import pallas_newton as pn

    budget = int(pn.vmem_params().vmem_limit_bytes * 0.75)
    maps = int(3.5 * V * BE * 4)
    per_pair = R * V * 4
    PB = max(1, min(_PB, P, (budget - maps) // per_pair if budget > maps
                    else 1))
    Pp = ((P + PB - 1) // PB) * PB
    Ep = ((E + BE - 1) // BE) * BE
    at = jnp.moveaxis(a, 0, -1)  # (P, 3, E)
    bt = b.T[:, None, :]  # (P, 1, E)
    if Ep != E or Pp != P:
        at = jnp.pad(at, ((0, Pp - P), (0, 0), (0, Ep - E)))
        bt = jnp.pad(bt, ((0, Pp - P), (0, 0), (0, Ep - E)))
    marg = np.zeros((Pp, 8, 1), np.float32)
    marg[:P] = np.asarray(marg_tuple, np.float32).reshape(P, 8, 1)
    marg = jnp.asarray(marg)
    if Pp != P:
        tbl = np.concatenate(
            [tbl, np.broadcast_to(tbl[:1], (Pp - P, R, V))]
        )
    tbl = jnp.asarray(tbl)

    grid = (Pp // PB, Ep // BE)
    dist, vsel = pl.pallas_call(
        _make_kernel(D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((PB, R, V), lambda p, e: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 3, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 8, 1), lambda p, e: (p, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((PB, 3, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 9, BE), lambda p, e: (p, 0, e),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, 3, Ep), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 9, Ep), jnp.float32),
        ],
        interpret=_INTERPRET,
        compiler_params=pn.vmem_params(),
    )(tbl, at, bt, marg)
    return dist[:P], vsel[:P]


def pack_plane_mesh_buckets(model, pid, vcap, with_ids=False):
    """Shared static packing for the plane-mesh kernels: bucket the pairs
    by hull size and build each bucket's (Pb, 3+4D, V) table
    [vx, vy, vz, nbr_id(D), nbrx(D), nbry(D), nbrz(D)] plus per-pair
    (margin, dedupe_r^2, extents lo(3)/hi(3)). Returns (subs, border) with subs entries
    (ids, tbl_tuple, marg_tuple, D) in bucket-major order, or None when a
    pair's mesh is graph-less (brute scan keeps the XLA path) or a hull is
    too large for VMEM."""
    pid = np.asarray(pid)
    pg2 = model.pair_geom2[pid]
    mesh_ids = np.maximum(np.asarray(model.geom_meshid)[pg2], 0)
    if np.asarray(model.mesh_brute)[mesh_ids].any():
        return None
    vmask = np.asarray(model.mesh_vertmask)[mesh_ids, :vcap]
    vraw = np.asarray(model.mesh_vert)[mesh_ids, :vcap]
    verts = np.where(vmask[:, :, None], vraw, vraw[:, 0:1, :]).astype(
        np.float32
    )
    counts = vmask.sum(axis=1)
    margin = np.asarray(model.pair_margin)[pid].astype(np.float32)
    dedupe = 0.3 * np.asarray(model.geom_rbound)[pg2].astype(np.float32)

    def bucket_size(c):
        c = max(int(c), 8)
        s = 32
        while s < c:
            s += 32
        return min(s, ((vcap + 7) // 8) * 8)

    buckets: dict = {}
    for p in range(len(pid)):
        buckets.setdefault(bucket_size(counts[p]), []).append(p)
    if max(buckets) > int(os.environ.get("LMT_MESH_VCAP", "5632")):
        # oversized hull: per-program VMEM. The per-kernel scoped budget
        # (vmem_params) plus the PB shrink in _select_batched_raw covers
        # every shipped hull (H1 foot 1020, G1 torso 5365, pelvis 3160 at
        # degree 98); the cap is a backstop for pathological assets.
        return None

    subs, order = [], []
    for vb, ids in sorted(buckets.items()):
        ids = np.asarray(ids)
        tabs = [model.mesh_nbr[mesh_ids[p]] for p in ids]
        D = max(1, max(t.shape[1] for t in tabs))
        # with_ids keeps the legacy (3+4D)-row layout with dedicated
        # neighbor-id rows: the G1 ext-mega kernel's Mosaic schedule
        # regressed past the scoped-VMEM limit with the sentinel layout
        # (88.8 MB vs the 80 MB it compiled at in round 4), so the ext
        # plan opts back in; consumers detect the layout from the row
        # count (3+4D vs 3+3D).
        rows = 3 + (4 if with_ids else 3) * D
        tbl = np.zeros((len(ids), rows, vb), np.float32)
        for i, p in enumerate(ids):
            nv = int(counts[p])
            v = verts[p, : min(nv, vb)]
            tbl[i, 0:3, : v.shape[0]] = v.T
            if vb > nv:  # pad with vertex-0 duplicates (tie-safe)
                tbl[i, 0:3, nv:] = tbl[i, 0:3, 0:1]
            t = tabs[i][:vb]
            nbr = np.full((vb, D), -1, np.int32)
            nbr[: t.shape[0], : t.shape[1]] = t
            valid = nbr >= 0
            j = np.maximum(nbr, 0)
            coords = verts[p][j]  # (vb, D, 3)
            # invalid neighbor slots carry the OWNER vertex's coords
            # instead of dedicated id rows (23% of the gather rows):
            # their dedupe distance to contact 0 is then 0.25*d0^2,
            # below dedupe2 = (0.3*rbound)^2 for every |d0| < 0.6*rbound
            # — penetration beyond that is deep-fall territory outside
            # validated regimes (contact 0 itself is still emitted)
            own = np.broadcast_to(
                verts[p][:vb, None, :], coords.shape
            )
            coords = np.where(valid[:, :, None], coords, own)
            o = 3 + (D if with_ids else 0)
            if with_ids:
                tbl[i, 3 : 3 + D] = np.where(valid, nbr, -1).T
            tbl[i, o : o + D] = coords[:, :, 0].T
            tbl[i, o + D : o + 2 * D] = coords[:, :, 1].T
            tbl[i, o + 2 * D : o + 3 * D] = coords[:, :, 2].T
        # per-pair directed extents (axis-aligned lo/hi in the mesh frame):
        # the kernel's conservative support-distance bound (skip gate).
        # min_v (a . v) >= sum_i min(a_i lo_i, a_i hi_i) — much tighter
        # than the bounding-sphere bound for elongated bone hulls whose
        # origin sits far from the ground-facing end (the sphere bound kept
        # most of the humanoid's 75 floor x mesh pairs "near" throughout
        # nominal gait; measured ~0.25 ms of the 0.49 ms mega forward).
        lo = np.array(
            [verts[p][vmask[p]].min(axis=0) for p in ids], np.float32
        )
        hi = np.array(
            [verts[p][vmask[p]].max(axis=0) for p in ids], np.float32
        )
        marg = np.concatenate(
            [
                np.stack(
                    [margin[ids], (dedupe[ids] ** 2).astype(np.float32)],
                    axis=1,
                ),
                lo, hi,
            ],
            axis=1,
        )  # (Pb, 8): [margin dedupe2 lo(3) hi(3)]
        subs.append((
            ids,
            (tbl.tobytes(), tbl.shape),
            tuple(map(tuple, marg.tolist())),
            int(D),
        ))
        order.append(ids)
    border = np.concatenate(order)
    return subs, border


def make_plane_mesh_select(subs, inv):
    """Factory: selection fn over pre-packed static bucket tables
    (pack_plane_mesh_buckets). Returns fn(a (P,3), b (P,)) ->
    (dist (P,3), vsel (P,3,3)) that dispatches to the fused kernel under
    vmap; `inv` maps bucket-major results back to original pair order."""

    @jax.custom_batching.custom_vmap
    def select(a, b):
        d, s = _select_buckets(a[None], b[None])
        return d[0], s[0]

    def _select_buckets(a, b):
        douts, souts = [], []
        for ids, tbl_t, marg, D in subs:
            d, s = _select_batched(tbl_t, a[:, ids], b[:, ids], marg, D)
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
        dist = dist_ref[...]   # (P, 3, BE)
        vsel = vsel_ref[...]   # (P, 9, BE)  (3 verts x xyz, mesh-local)
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

        BE = key.shape[-1]
        zrow = jnp.zeros((BE,), f32)
        big_row = jnp.full((BE,), _BIG, f32)
        canon_fr = (0.0, 0.0, 1.0, 0.0, 1.0, 0.0, -1.0, 0.0, 0.0)
        for s in range(k):
            # selection bookkeeping stays unconditional (cheap, and `key`
            # must thread through the python loop); the one-hot gathers and
            # world-position/frame math — the expensive part — run only
            # while some env still has an active (key < 0) pair left.
            # Keys only grow across slots, so once a slot is all-inactive
            # every later slot is too and its rows stay at the fallback:
            # dist=BIG (act=0 in the solver — values never used), slot-0
            # pair's static meta, canonical frame.
            m = jnp.min(key, axis=0, keepdims=True)  # (1, BE)
            i = jnp.min(
                jnp.where(key == m, iota, float(P)), axis=0, keepdims=True
            )
            oh = (iota == i).astype(f32)  # (P, BE)
            key = jnp.where(oh > 0, _BIG, key)

            for f in range(3):
                ds_ref[s, f, :] = big_row
            for f in range(9):
                pos_ref[s, f, :] = zrow
            for f in range(9):
                fr_ref[s, f, :] = zrow + canon_fr[f]
            for f in range(15):
                meta_ref[s, f, :] = zrow + tbl[0, 1 + f, 0]

            @pl.when(jnp.min(m) < 0.0)
            def _build(s=s, oh=oh):
                ohe = oh[:, None, :]
                dsel = jnp.sum(ohe * dist, axis=0)        # (3, BE)
                vs = jnp.sum(ohe * vsel, axis=0)          # (9, BE)
                n = jnp.sum(ohe * n_all, axis=0)          # (3, BE)
                qp = jnp.sum(ohe * qp_all, axis=0)        # (3, BE)
                qR = jnp.sum(ohe * qR_all, axis=0)        # (9, BE)
                meta = jnp.sum(ohe * tbl[:, 1:, :], axis=0)  # (15, BE)

                # world positions: w = qp + R v; pos = w - n * dist/2
                pos_f = []
                for f in range(3):
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
                for f in range(3):
                    ds_ref[s, f, :] = dsel[f]
                for f in range(9):
                    pos_ref[s, f, :] = pos_f[f]
                fr_vals = [n[0], n[1], n[2], *t1, *t2]
                for f in range(9):
                    fr_ref[s, f, :] = fr_vals[f]
                for f in range(15):
                    meta_ref[s, f, :] = meta[f]

    return kernel


def make_group_topk(subs, inv, pg1, pg2, tbl, k):
    """Factory for one plane-mesh group: per-pair manifold selection
    (vertex-bucketed kernels) + in-kernel top-K slot selection.

    subs/inv: vertex buckets from make_plane_mesh_select-style packing,
    over pairs ALREADY in bucket order (inv maps back);
    pg1/pg2: per-pair geom ids in bucket order; tbl (P, 16) static
    [key_margin, g1, g2, friction(5), solref(2), solimp(5), margin-gap];
    k: slots. Returns fn(a (P,3), b (P,), gxp (ngeom,3), gxm (ngeom,3,3))
    -> (dist (k,3), pos (k,3,3), frame (k,3,3), meta (k,15)), batched via
    custom_vmap. `a`/`b`/tbl rows are in ORIGINAL pair order."""
    del inv  # tables are pre-reordered to bucket order by the caller
    P = len(pg1)
    BE = 512  # VMEM is tiny here ((P+nused) x 12 x BE); wide blocks cut
    # the program count 4x vs the original 128-lane blocks
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

        def fit(x):  # buckets pad envs to their own BE (512 or 256 for
            # large hulls) — normalize to this kernel's Ep before concat
            if x.shape[-1] > Ep:
                return x[..., :Ep]
            if x.shape[-1] < Ep:
                return jnp.pad(
                    x, [(0, 0)] * (x.ndim - 1) + [(0, Ep - x.shape[-1])]
                )
            return x

        douts, souts = [], []
        off = 0
        for ids, tbl_t, marg, D in subs:
            d, s = _select_batched_raw(
                tbl_t, a[:, off:off + len(ids)],
                b[:, off:off + len(ids)], marg, D,
            )
            douts.append(fit(d))
            souts.append(fit(s))
            off += len(ids)
        dist = jnp.concatenate(douts, axis=0)  # (P, 3, Ep)
        vsel = jnp.concatenate(souts, axis=0)

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
        from . import pallas_newton as pn

        ds, pos, fr, meta = pl.pallas_call(
            kernel,
            grid=(Ep // BE,),
            interpret=_INTERPRET,
            compiler_params=pn.vmem_params(),
            in_specs=[
                gs(P, 3), gs(P, 9), gs(nused, 3), gs(nused, 9),
                pl.BlockSpec((P, 16, 1), lambda e: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[gs(k, 3), gs(k, 9), gs(k, 9), gs(k, 15)],
            out_shape=[
                jax.ShapeDtypeStruct((k, 3, Ep), jnp.float32),
                jax.ShapeDtypeStruct((k, 9, Ep), jnp.float32),
                jax.ShapeDtypeStruct((k, 9, Ep), jnp.float32),
                jax.ShapeDtypeStruct((k, 15, Ep), jnp.float32),
            ],
        )(dist, vsel, gxp_t, gxm_t, jnp.asarray(tblc))
        back = lambda x: play.moveaxis_last0(x[..., :E])
        return (
            back(ds),
            back(pos).reshape(E, k, 3, 3),
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
