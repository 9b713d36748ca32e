"""Collision: static pair table -> runtime midphase -> analytic narrowphase.

TPU-native redesign of MuJoCo's collision driver (the C library the reference
delegates to; SURVEY.md L0). Instead of a dynamic contact list, the candidate
pair table is enumerated at build time (core/io.py) and split into *groups*
keyed by (geom-type pair, condim). At runtime each group runs a vectorized
bounding-sphere midphase over all its pairs, selects the top-K closest pairs
(K is a small static budget), and runs the group's narrowphase only on those.
The result is a fixed-shape Contact soup whose slots carry dynamic geom ids —
fully jit/vmap compatible, with contact capacity independent of the O(n^2)
pair count.

Narrowphase functions reproduce the contact sets of MuJoCo's analytic
colliders (mjc_PlaneSphere/Capsule/Cylinder/Box/Convex, mjc_SphereSphere/
Capsule/Box, mjc_CapsuleCapsule), empirically validated in
tests/test_collision.py. Mesh-mesh and cylinder-primitive deep pairs (rare
self-collisions) fall back to bounding-sphere contacts only when penetrating
deeply; a GJK narrowphase is planned (see FUTURE in module docstring).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Contact, Data, GeomType, Model

_PLANE = int(GeomType.PLANE)
_SPHERE = int(GeomType.SPHERE)
_CAPSULE = int(GeomType.CAPSULE)
_CYLINDER = int(GeomType.CYLINDER)
_BOX = int(GeomType.BOX)
_MESH = int(GeomType.MESH)

# contacts per pair for each implemented (t1, t2) narrowphase
SLOTS = {
    (_PLANE, _SPHERE): 1,
    (_PLANE, _CAPSULE): 2,
    (_PLANE, _CYLINDER): 4,
    (_PLANE, _BOX): 4,
    (_PLANE, _MESH): 3,
    (_SPHERE, _SPHERE): 1,
    (_SPHERE, _CAPSULE): 1,
    (_SPHERE, _BOX): 1,
    (_CAPSULE, _CAPSULE): 2,
}

# convex-convex pairs handled by the GJK/EPA narrowphase (ops/gjk.py),
# one contact per pair — matching MuJoCo's mjc_Convex single-contact
# emission (the reference inherits these pairs from mj_step, reference
# environments/base.py:180; they activate in falls/self-collision, not
# in gait). These groups sort AFTER every classic group so the Pallas
# mega/ext plans can censor them by tail truncation without shifting
# the classic slot offsets (see classic_ncon).
CONVEX_SLOTS = {
    (_SPHERE, _CYLINDER): 1,
    (_SPHERE, _MESH): 1,
    (_CAPSULE, _CYLINDER): 1,
    (_CAPSULE, _BOX): 1,
    (_CAPSULE, _MESH): 1,
    (_CYLINDER, _CYLINDER): 1,
    (_CYLINDER, _BOX): 1,
    (_CYLINDER, _MESH): 1,
    (_BOX, _BOX): 1,
    (_BOX, _MESH): 1,
    (_MESH, _MESH): 1,
}


def _convex_pairs_enabled() -> bool:
    import os

    return os.environ.get("LMT_CONVEX_PAIRS", "1") != "0"

# default top-K pair budgets per group. Plane groups (ground contact) get a
# bigger budget than self-collision groups; both are correctness-safe as
# long as the number of *simultaneously near-touching* pairs in a group
# stays below K — excess pairs are dropped farthest-first.
DEFAULT_K_PLANE = 8
DEFAULT_K_OTHER = 4


class Group(NamedTuple):
    t1: int
    t2: int
    condim: int
    pair_ids: np.ndarray  # indices into model.pair_* tables
    k: int
    slots: int
    offset: int  # first contact slot of this group
    convex: bool = False  # GJK/EPA group (tail of the slot layout)


_GROUP_CACHE: dict = {}


def contact_groups(model: Model):
    convex_on = _convex_pairs_enabled()
    key = (
        model.pair_geom1.tobytes(),
        model.pair_geom2.tobytes(),
        model.pair_condim.tobytes(),
        model.geom_type.tobytes(),
        model.contact_k_plane,
        model.contact_k_other,
        convex_on,
    )
    hit = _GROUP_CACHE.get(key)
    if hit is not None:
        return hit

    by_key: dict = {}
    conv_key: dict = {}
    skipped: dict = {}
    for i in range(len(model.pair_geom1)):
        t1 = int(model.geom_type[model.pair_geom1[i]])
        t2 = int(model.geom_type[model.pair_geom2[i]])
        condim = int(model.pair_condim[i])
        if (t1, t2) in SLOTS:
            by_key.setdefault((t1, t2, condim), []).append(i)
        elif convex_on and (
            (t1, t2) in CONVEX_SLOTS or (t2, t1) in CONVEX_SLOTS
        ):
            conv_key.setdefault((t1, t2, condim), []).append(i)
        else:
            skipped[(t1, t2)] = skipped.get((t1, t2), 0) + 1

    groups = []
    offset = 0
    for (t1, t2, condim), ids in sorted(by_key.items()):
        ids = np.asarray(ids, dtype=np.int32)
        is_plane = t1 == _PLANE
        k = min(
            model.contact_k_plane if is_plane else model.contact_k_other,
            len(ids),
        )
        slots = SLOTS[(t1, t2)]
        groups.append(Group(t1, t2, condim, ids, k, slots, offset))
        offset += k * slots
    for (t1, t2, condim), ids in sorted(conv_key.items()):
        ids = np.asarray(ids, dtype=np.int32)
        k = min(model.contact_k_other, len(ids))
        groups.append(Group(t1, t2, condim, ids, k, 1, offset, convex=True))
        offset += k
    result = (groups, offset, skipped)
    _GROUP_CACHE[key] = result
    return result


def ncon_max(model: Model) -> int:
    _, total, _ = contact_groups(model)
    return total


def classic_ncon(model: Model) -> int:
    """Contact capacity of the CLASSIC (analytic-narrowphase) groups only.

    Convex GJK/EPA groups occupy the slot-layout tail, so the Pallas
    mega/ext plans — which keep collision in-kernel and do not implement
    the convex narrowphase — size themselves to this prefix and leave
    the tail to the staged (CPU/f64 parity) driver. Slot offsets of the
    classic groups are identical between both views.
    """
    groups, total, _ = contact_groups(model)
    for g in groups:
        if g.convex:
            return g.offset
    return total


# --------------------------------------------------------------------------
# frame / helpers
# --------------------------------------------------------------------------


def make_frame(n: jnp.ndarray) -> jnp.ndarray:
    """Complete a contact frame from its normal — mju_makeFrame convention:
    tangent1 from the y axis when |n_y| < 0.5, else from the z axis."""
    dtype = n.dtype
    y = jnp.array([0.0, 1.0, 0.0], dtype=dtype)
    z = jnp.array([0.0, 0.0, 1.0], dtype=dtype)
    use_y = jnp.abs(n[..., 1]) < 0.5
    ax = jnp.where(use_y[..., None], y, z)
    t1 = ax - n * jnp.sum(n * ax, axis=-1, keepdims=True)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-15)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)  # (..., 3, 3)


def _inactive(k, s, dtype):
    return (
        jnp.full((k, s), 1e10, dtype=dtype),
        jnp.zeros((k, s, 3), dtype=dtype),
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), (k, s, 3, 3)),
    )


# --------------------------------------------------------------------------
# narrowphase: plane-X  (plane is geom1; normal = plane z axis)
# --------------------------------------------------------------------------


def plane_sphere(pp, pR, s1, qp, qR, s2, extra):
    n = pR[:, :, 2]
    r = s2[:, 0]
    h = jnp.sum(n * (qp - pp), axis=-1)
    dist = h - r
    pos = qp - n * (r + 0.5 * dist)[:, None]
    return dist[:, None], pos[:, None], make_frame(n)[:, None]


def _frame_with_axis(n, axis):
    """Contact frame whose first tangent is `axis` projected into the plane
    of the normal (mjc_PlaneCapsule/Cylinder convention); falls back to
    make_frame when axis || n."""
    t1 = axis - n * jnp.sum(n * axis, axis=-1, keepdims=True)
    ln = jnp.linalg.norm(t1, axis=-1, keepdims=True)
    ok = ln[..., 0] > 1e-8
    t1 = jnp.where(ok[..., None], t1 / jnp.maximum(ln, 1e-15), 0.0)
    t2 = jnp.cross(n, t1)
    f_axis = jnp.stack([n, t1, t2], axis=-2)
    return jnp.where(ok[..., None, None], f_axis, make_frame(n))


def plane_capsule(pp, pR, s1, qp, qR, s2, extra):
    n = pR[:, :, 2]
    r, hl = s2[:, 0], s2[:, 1]
    axis = qR[:, :, 2]
    frame = _frame_with_axis(n, axis)[:, None]
    ds, ps = [], []
    for sgn in (1.0, -1.0):
        c = qp + sgn * hl[:, None] * axis
        h = jnp.sum(n * (c - pp), axis=-1)
        dist = h - r
        pos = c - n * (r + 0.5 * dist)[:, None]
        ds.append(dist)
        ps.append(pos)
    return (
        jnp.stack(ds, axis=1),
        jnp.stack(ps, axis=1),
        jnp.broadcast_to(frame, (pp.shape[0], 2, 3, 3)),
    )


def plane_cylinder(pp, pR, s1, qp, qR, s2, extra):
    """Four candidate contacts: deepest rim point of the lower cap, the two
    rim points at ±120° on the same cap, and the deepest rim point of the
    upper cap (active for near-lying cylinders). Matches mjc_PlaneCylinder's
    emitted contact sets (validated empirically in tests/test_collision.py)."""
    k = pp.shape[0]
    n = pR[:, :, 2]
    r, hl = s2[:, 0], s2[:, 1]
    axis = qR[:, :, 2]
    ca = jnp.sum(n * axis, axis=-1)  # cos(axis, normal)

    sgn = jnp.where(ca >= 0, -1.0, 1.0)  # toward the lower cap
    cap_near = qp + sgn[:, None] * hl[:, None] * axis
    cap_far = qp - sgn[:, None] * hl[:, None] * axis

    # deepest in-plane rim direction (⊥ axis): minimizes n·(cap + r d)
    d = axis * ca[:, None] - n
    dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.where(dn > 1e-8, d / jnp.maximum(dn, 1e-15), qR[:, :, 0])
    e = jnp.cross(axis, d)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-15)

    cos120, sin120 = -0.5, float(np.sqrt(3.0) / 2.0)
    pts = [
        cap_near + r[:, None] * d,
        cap_near + r[:, None] * (cos120 * d + sin120 * e),
        cap_near + r[:, None] * (cos120 * d - sin120 * e),
        cap_far + r[:, None] * d,
    ]
    ds, ps = [], []
    for pt in pts:
        h = jnp.sum(n * (pt - pp), axis=-1)
        ds.append(h)
        ps.append(pt - n * (0.5 * h)[:, None])
    dist = jnp.stack(ds, axis=1)
    pos = jnp.stack(ps, axis=1)
    frame = jnp.broadcast_to(make_frame(n)[:, None], (k, 4, 3, 3))
    return dist, pos, frame


def plane_box(pp, pR, s1, qp, qR, s2, extra):
    dtype = pp.dtype
    k = pp.shape[0]
    n = pR[:, :, 2]
    corners = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=dtype,
    )  # (8, 3)
    pts = qp[:, None, :] + jnp.einsum("kij,cj,kj->kci", qR, corners, s2)
    h = jnp.sum(n[:, None, :] * (pts - pp[:, None, :]), axis=-1)  # (k, 8)
    # four deepest corners via iterative argmin + one-hot (lax.top_k lowers
    # to a full sort kernel on TPU — ~100x the cost of these fused selects)
    iota8 = jnp.arange(8)
    hm = h
    hs, ps = [], []
    for _ in range(4):
        i = jnp.argmin(hm, axis=1)
        oh = (iota8[None, :] == i[:, None]).astype(dtype)
        hs.append(jnp.sum(h * oh, axis=1))
        ps.append(jnp.einsum("kc,kci->ki", oh, pts))
        hm = jnp.where(oh > 0, 1e10, hm)
    dist = jnp.stack(hs, axis=1)
    pos_c = jnp.stack(ps, axis=1)
    pos = pos_c - n[:, None, :] * (0.5 * dist)[:, :, None]
    frame = jnp.broadcast_to(make_frame(n)[:, None], (k, 4, 3, 3))
    return dist, pos, frame


def _plane_mesh_group(model: Model, g: Group, data: Data):
    """All-pairs plane-mesh narrowphase in MESH-LOCAL coordinates.

    Replaces the gather-then-transform scheme (world-frame vertex clouds of
    the K selected pairs) with per-pair math against the *static* vertex
    table: heights h = (R2ᵀn)·v + n·(p2-p1), tangential distances
    |v-v0|² - (h-h0)² and side extents (R2ᵀn)·((v-v0)×u) are all invariant
    under the body rotation, so no (env, V, 3) world tensor is ever
    materialized — the only batched tensors are (P, V) scalar maps that XLA
    fuses into their reductions. As a bonus the top-K pair selection ranks
    by the *exact* support distance (deepest-vertex height) instead of a
    bounding-radius midphase.

    Same contact-selection rule as mjc_PlaneConvex-style manifolds used
    before: deepest vertex, farthest-in-plane from it, and the two extreme
    side vertices of that line (within margin). Returns the k selected
    pairs' slot data: (dist (k,4), pos (k,4,3), frame (k,4,3,3), geom1,
    geom2, friction, solref, solimp, margin-gap).
    """
    dtype = data.qpos.dtype
    pid = g.pair_ids

    # TPU: manifold selection AND the top-K slot pick run as chained Pallas
    # kernels with env-last data throughout — the XLA argmin/one-hot-einsum
    # chain below plus the per-pair manifold relayouts cost ~45 ms/step at
    # 4096 envs
    fused = _pallas_group_topk_fn(model, g, dtype)
    if fused is not None:
        topk_fn, pid_b = fused
        pg1b = model.pair_geom1[pid_b]
        pg2b = model.pair_geom2[pid_b]
        gxp, gxm = data.geom_xpos, data.geom_xmat
        n_b = gxm[pg1b][:, :, 2]
        a = jnp.einsum("pij,pi->pj", gxm[pg2b], n_b)
        b = jnp.sum(n_b * (gxp[pg2b] - gxp[pg1b]), axis=-1)
        dist_s, pos, frame, meta = topk_fn(a, b, gxp, gxm)
        frame = jnp.broadcast_to(frame[:, None], (g.k, g.slots, 3, 3))
        return (
            dist_s, pos, frame,
            meta[:, 0].astype(jnp.int32), meta[:, 1].astype(jnp.int32),
            meta[:, 2:7], meta[:, 7:9], meta[:, 9:14], meta[:, 14],
        )

    # bucket pairs by hull size: padding every pair to the group-max vertex
    # count wastes ~4x on typical robots (one 539-vert torso hull vs dozens
    # of <=128-vert limb hulls), and the all-pairs (P, V) maps are the cost
    mesh_ids_all = np.maximum(np.asarray(model.geom_meshid), 0)
    counts = np.asarray(model.mesh_vertmask).sum(1)[mesh_ids_all[
        model.pair_geom2[pid]]]
    buckets: list = []
    for cap in (128, 288, int(np.asarray(model.mesh_vertmask).shape[1])):
        in_b = counts <= cap
        if np.any(in_b):
            buckets.append((cap, pid[in_b]))
            counts = np.where(in_b, np.iinfo(np.int64).max, counts)

    dist_l, vsel_l, key_l, order = [], [], [], []
    for cap, bpid in buckets:
        d_b, v_b, k_b = _plane_mesh_narrow(model, bpid, cap, data)
        dist_l.append(d_b)
        vsel_l.append(v_b)
        key_l.append(k_b)
        order.append(bpid)
    dist = jnp.concatenate(dist_l, axis=0)  # (P, slots)
    vsel = jnp.concatenate(vsel_l, axis=0)  # (P, slots, 3)
    key = jnp.concatenate(key_l, axis=0)  # (P,)
    pid = np.concatenate(order)  # bucket-sorted pair order

    pg1 = model.pair_geom1[pid]
    pg2 = model.pair_geom2[pid]
    gxp, gxm = data.geom_xpos, data.geom_xmat
    n = gxm[pg1][:, :, 2]
    qp, qR = gxp[pg2], gxm[pg2]
    P = len(pid)
    dtype = dist.dtype

    # exact-support top-K pair selection (same key as the old midphase, but
    # with the true deepest-vertex distance instead of rbound). Iterative
    # argmin + one-hot matmuls instead of lax.top_k + dynamic gathers: the
    # sort kernel and the per-env gather layout-copies each cost more than
    # the whole narrowphase.
    if g.k < P:
        okey = key
        ohs = []
        iota_p = jnp.arange(P)
        for _ in range(g.k):
            i = jnp.argmin(okey)
            oh = (iota_p == i).astype(dtype)
            ohs.append(oh)
            okey = jnp.where(oh > 0, 1e10, okey)
        OH = jnp.stack(ohs)  # (k, P)
    else:
        OH = jnp.eye(P, dtype=dtype)

    dist_s = OH @ dist  # (k, slots)
    vsel_s = jnp.einsum("sp,pfc->sfc", OH, vsel)
    n_s = OH @ n
    qp_s = OH @ qp
    qR_s = jnp.einsum("sp,pij->sij", OH, qR)
    # static per-pair tables picked through the same one-hot (exact: one
    # coefficient is 1, the rest 0)
    def pick(tbl):
        return OH @ jnp.asarray(tbl, dtype=dtype)

    g1_s = pick(pg1.astype(np.float32)).astype(jnp.int32)
    g2_s = pick(pg2.astype(np.float32)).astype(jnp.int32)
    fri_s = pick(model.pair_friction[pid])
    sref_s = pick(model.pair_solref[pid])
    simp_s = pick(model.pair_solimp[pid])
    marg_s = pick(model.pair_margin[pid] - model.pair_gap[pid])

    w = qp_s[:, None, :] + jnp.einsum("kij,ksj->ksi", qR_s, vsel_s)
    pos = w - n_s[:, None, :] * (0.5 * dist_s)[:, :, None]
    frame = jnp.broadcast_to(make_frame(n_s)[:, None], (g.k, g.slots, 3, 3))
    return dist_s, pos, frame, g1_s, g2_s, fri_s, sref_s, simp_s, marg_s


_PALLAS_SELECT_CACHE: dict = {}
_PALLAS_TOPK_CACHE: dict = {}


def _pallas_group_topk_fn(model: Model, g: Group, dtype):
    """Cached fused select+topk fn for a plane-mesh group (or None when the
    XLA path must run: non-TPU, f64, traced model tables, or k >= P — the
    identity-OH ordering of the XLA path differs from sorted-by-depth)."""
    if dtype != jnp.float32 or g.k >= len(g.pair_ids):
        return None
    from . import pallas_collision as pc

    if not pc.pallas_enabled():
        return None
    if isinstance(model.mesh_vert, jax.core.Tracer) or isinstance(
        model.pair_margin, jax.core.Tracer
    ) or isinstance(model.geom_rbound, jax.core.Tracer):
        return None
    try:
        pid = np.asarray(g.pair_ids)
        key = (
            model.pair_geom1.tobytes(), model.pair_geom2.tobytes(),
            pid.tobytes(), int(g.k),
            np.asarray(model.mesh_vert).tobytes()[:64],
            np.asarray(model.pair_margin).tobytes(),
            np.asarray(model.pair_friction).tobytes(),
        )
    except Exception:
        return None
    if key in _PALLAS_TOPK_CACHE:
        return _PALLAS_TOPK_CACHE[key]

    vcap = int(np.asarray(model.mesh_vertmask).shape[1])

    # vertex sub-buckets (same packing as make_plane_mesh_select), with the
    # pair order REARRANGED to bucket-major so the kernel consumes the
    # concatenated per-bucket outputs directly
    packed = pc.pack_plane_mesh_buckets(model, pid, vcap)
    if packed is None:
        _PALLAS_TOPK_CACHE[key] = None
        return None  # brute meshes or oversized hull: XLA path
    subs, border = packed
    pid_b = pid[border]

    tbl = np.zeros((len(pid_b), 16), np.float32)
    tbl[:, 0] = np.asarray(model.pair_margin)[pid_b]
    tbl[:, 1] = model.pair_geom1[pid_b]
    tbl[:, 2] = model.pair_geom2[pid_b]
    tbl[:, 3:8] = np.asarray(model.pair_friction)[pid_b]
    tbl[:, 8:10] = np.asarray(model.pair_solref)[pid_b]
    tbl[:, 10:15] = np.asarray(model.pair_solimp)[pid_b]
    tbl[:, 15] = (
        np.asarray(model.pair_margin)[pid_b]
        - np.asarray(model.pair_gap)[pid_b]
    )

    topk_fn = pc.make_group_topk(
        subs, None,
        [int(x) for x in model.pair_geom1[pid_b]],
        [int(x) for x in model.pair_geom2[pid_b]],
        tbl, int(g.k),
    )
    result = (topk_fn, pid_b)
    _PALLAS_TOPK_CACHE[key] = result
    return result


def _pallas_select_fn(model: Model, pid: np.ndarray, vcap: int, dtype):
    """Fused plane-mesh selection kernel for this pair bucket, or None when
    the XLA path must be used (non-TPU backend, f64 parity runs, traced
    mesh vertices from stacked model variants, graph-less meshes, or hulls
    too large for VMEM)."""
    if dtype != jnp.float32:
        return None
    from . import pallas_collision as pc

    if not pc.pallas_enabled():
        return None
    if isinstance(model.mesh_vert, jax.core.Tracer) or isinstance(
        model.pair_margin, jax.core.Tracer
    ) or isinstance(model.geom_rbound, jax.core.Tracer):
        return None  # variant-batched meshes: vertices differ per env
    pid = np.asarray(pid)
    key = (
        np.asarray(model.mesh_vert).tobytes()[:256],
        model.pair_geom2[pid].tobytes(),
        np.asarray(model.pair_margin)[pid].tobytes(),
        int(vcap),
    )
    if key in _PALLAS_SELECT_CACHE:
        return _PALLAS_SELECT_CACHE[key]
    packed = pc.pack_plane_mesh_buckets(model, pid, vcap)
    if packed is None:
        fn = None
    else:
        subs, border = packed
        inv = np.argsort(border)
        fn = pc.make_plane_mesh_select(subs, inv)
    _PALLAS_SELECT_CACHE[key] = fn
    return fn


def _plane_mesh_narrow(model: Model, pid: np.ndarray, vcap: int, data: Data):
    """Manifold selection for one bucket of plane-mesh pairs, padded to
    vcap vertices. Returns (dist (P,3), vsel (P,3,3) mesh-local, key (P,)).

    Exact replication of libmujoco 3.10's mjc_PlaneConvex (verified by
    disassembly; see tests/test_collision.py):
      * contact 0: the support vertex along -normal — for meshes with a
        hull graph and >= 10 vertices this is a graph hill-climb, which on
        a convex hull equals the global argmin of height (first index wins
        ties); emitted when its height <= margin.
      * contacts 1-2: walk the support vertex's hull-graph NEIGHBOR list in
        stored edge order (mesh_nbr) — or, for graph-less/tiny meshes, ALL
        vertices in storage order skipping the support — and emit the first
        two with height < margin whose world distance to contact 0's
        position is >= 0.3 * geom_size[mesh][0] (addplanemesh's dedupe).
    All tests run in mesh-local coordinates: heights h = a·v + b with
    a = R2ᵀn, b = n·(p2-p1); the dedupe distance |R(v-v0) + h0/2 n| equals
    |(v-v0) + h0/2 a|.
    """
    dtype = data.qpos.dtype
    pg1 = model.pair_geom1[pid]
    pg2 = model.pair_geom2[pid]
    mesh_ids = np.maximum(np.asarray(model.geom_meshid)[pg2], 0)

    # static per-pair vertex tables, padded with vertex 0 (duplicates never
    # change argmin selections — they tie with the real vertex 0)
    vraw = model.mesh_vert[mesh_ids, :vcap]  # (P, V, 3) — static gather
    vmask = jnp.asarray(model.mesh_vertmask[mesh_ids, :vcap])  # (P, V)
    verts = jnp.where(vmask[:, :, None], vraw, vraw[:, 0:1, :]).astype(dtype)

    gxp, gxm = data.geom_xpos, data.geom_xmat
    pp, pR = gxp[pg1], gxm[pg1]
    qp, qR = gxp[pg2], gxm[pg2]
    n = pR[:, :, 2]  # (P, 3) plane normal
    a = jnp.einsum("pij,pi->pj", qR, n)  # R2ᵀ n — mesh-local plane normal
    b = jnp.sum(n * (qp - pp), axis=-1)  # (P,)
    margin = jnp.asarray(model.pair_margin[pid], dtype=dtype)
    # addplanemesh rejects extra contacts within 0.3 * geom_rbound of
    # contact 0 (libmujoco 3.10 disassembly: [m->geom_rbound + 8*g2] * 0.3)
    dedupe_r = 0.3 * jnp.asarray(model.geom_rbound, dtype=dtype)[pg2]

    sel_fn = _pallas_select_fn(model, pid, vcap, dtype)
    if sel_fn is not None:
        # fused VMEM kernel returns slot depths AND the selected vertex
        # coordinates (a take_along_axis here lowered to layout-copy storms
        # costing more than the kernel itself)
        dist, vsel = sel_fn(a, b)  # (P, 3), (P, 3, 3)
        return dist, vsel, dist[:, 0] - margin

    big = jnp.asarray(1e10, dtype=dtype)
    h0_map = jnp.einsum("pvi,pi->pv", verts, a) + b[:, None]  # (P, V)
    h = jnp.where(vmask, h0_map, big)

    i0 = jnp.argmin(h, axis=1)
    d0 = jnp.min(h, axis=1)
    v0 = jnp.take_along_axis(verts, i0[:, None, None], axis=1)[:, 0]

    brute = np.asarray(model.mesh_brute)[mesh_ids]  # (P,) static
    V = h.shape[1]
    P = len(pid)

    # candidate ids per pair, in the order MuJoCo scans them
    if brute.all():
        cand_ids = jnp.broadcast_to(jnp.arange(V)[None], (P, V))
        cand_valid = vmask & (jnp.arange(V)[None] != i0[:, None])
    else:
        tabs = [model.mesh_nbr[mi] for mi in mesh_ids]
        D = max(t.shape[1] for t in tabs if t is not None)
        W = max(D, V) if brute.any() else D
        nbr_np = np.full((P, vcap, W), -1, np.int32)
        for p, t in enumerate(tabs):
            if t is not None:
                nv = min(t.shape[0], vcap)
                nbr_np[p, :nv, : t.shape[1]] = t[:nv]
        g_ids = jnp.take_along_axis(
            jnp.asarray(nbr_np), i0[:, None, None], axis=1
        )[:, 0]  # (P, W) — support vertex's neighbor list
        if brute.any():
            # mixed bucket: brute pairs scan all verts in storage order
            b_ids = jnp.pad(
                jnp.broadcast_to(jnp.arange(V)[None], (P, V)),
                ((0, 0), (0, W - V)), constant_values=-1,
            )
            b_valid = (b_ids >= 0) & jnp.pad(
                vmask & (jnp.arange(V)[None] != i0[:, None]),
                ((0, 0), (0, W - V)),
            )
            bsel = jnp.asarray(brute)[:, None]
            cand_ids = jnp.where(bsel, b_ids, g_ids)
            cand_valid = jnp.where(bsel, b_valid, g_ids >= 0)
        else:
            cand_ids, cand_valid = g_ids, g_ids >= 0

    j = jnp.maximum(cand_ids, 0)
    h_c = jnp.take_along_axis(h, j, axis=1)  # (P, C)
    v_c = jnp.take_along_axis(
        verts, j[:, :, None].astype(jnp.int32), axis=1
    )  # (P, C, 3)
    delta = v_c - v0[:, None, :] + (0.5 * d0)[:, None, None] * a[:, None, :]
    dd = jnp.linalg.norm(delta, axis=-1)
    qual = (
        cand_valid
        & (h_c < margin[:, None])
        & (dd >= dedupe_r[:, None])
    )
    rank = jnp.cumsum(qual.astype(jnp.int32), axis=1) * qual

    def pick(r):
        oh = (rank == r).astype(dtype)  # (P, C)
        has = jnp.sum(oh, axis=1) > 0
        d = jnp.sum(h_c * oh, axis=1)
        v = jnp.sum(v_c * oh[:, :, None], axis=1)
        return jnp.where(has, d, big), v

    d1, v1 = pick(1)
    d2, v2 = pick(2)
    dist = jnp.stack([d0, d1, d2], axis=1)  # (P, 3)
    vsel = jnp.stack([v0, v1, v2], axis=1)  # (P, 3, 3)
    return dist, vsel, d0 - margin


# --------------------------------------------------------------------------
# narrowphase: primitive pairs
# --------------------------------------------------------------------------


def _sphere_sphere_core(c1, r1, c2, r2):
    d = c2 - c1
    ln = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(ln, 1e-15)[..., None]
    dist = ln - r1 - r2
    pos = 0.5 * (c1 + n * r1[..., None] + c2 - n * r2[..., None])
    return dist, pos, make_frame(n)


def sphere_sphere(pp, pR, s1, qp, qR, s2, extra):
    dist, pos, frame = _sphere_sphere_core(pp, s1[:, 0], qp, s2[:, 0])
    return dist[:, None], pos[:, None], frame[:, None]


def sphere_capsule(pp, pR, s1, qp, qR, s2, extra):
    axis = qR[:, :, 2]
    hl = s2[:, 1]
    t = jnp.clip(jnp.sum((pp - qp) * axis, axis=-1), -hl, hl)
    c2 = qp + t[:, None] * axis
    dist, pos, frame = _sphere_sphere_core(pp, s1[:, 0], c2, s2[:, 0])
    return dist[:, None], pos[:, None], frame[:, None]


def _seg_seg_closest(p1, d1, l1, p2, d2, l2):
    """Closest points between segments p±l*d (centered param in [-l, l])."""
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(
        jnp.abs(denom) > 1e-12, (b * f - c * e) / jnp.maximum(denom, 1e-15), 0.0
    )
    s = jnp.clip(s, -l1, l1)
    t = (b * s + f) / jnp.maximum(e, 1e-15)
    t_cl = jnp.clip(t, -l2, l2)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-15), -l1, l1)
    return p1 + s[..., None] * d1, p2 + t_cl[..., None] * d2


def capsule_capsule(pp, pR, s1, qp, qR, s2, extra):
    a1, a2 = pR[:, :, 2], qR[:, :, 2]
    c1, c2 = _seg_seg_closest(pp, a1, s1[:, 1], qp, a2, s2[:, 1])
    dist, pos, frame = _sphere_sphere_core(c1, s1[:, 0], c2, s2[:, 0])
    k = pp.shape[0]
    big = jnp.full((k,), 1e10, dtype=pp.dtype)
    zero3 = jnp.zeros((k, 3), dtype=pp.dtype)
    return (
        jnp.stack([dist, big], axis=1),
        jnp.stack([pos, zero3], axis=1),
        jnp.stack([frame, frame], axis=1),
    )


def sphere_box(pp, pR, s1, qp, qR, s2, extra):
    """Sphere (geom1) vs box (geom2)."""
    r = s1[:, 0]
    # sphere center in box frame
    loc = jnp.einsum("kji,kj->ki", qR, pp - qp)
    clamped = jnp.clip(loc, -s2, s2)
    inside = jnp.all(jnp.abs(loc) < s2, axis=-1)
    # outside: closest point on surface
    closest_out = clamped
    # inside: push to nearest face
    gap = s2 - jnp.abs(loc)
    ax = jnp.argmin(gap, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(loc, ax[:, None], axis=1))[:, 0]
    face_val = sign * jnp.take_along_axis(s2, ax[:, None], axis=1)[:, 0]
    closest_in = clamped
    closest_in = jnp.where(
        (jnp.arange(3)[None, :] == ax[:, None]), face_val[:, None], loc
    )
    closest = jnp.where(inside[:, None], closest_in, closest_out)
    cw = qp + jnp.einsum("kij,kj->ki", qR, closest)
    d = cw - pp
    ln = jnp.linalg.norm(d, axis=-1)
    n_out = d / jnp.maximum(ln, 1e-15)[:, None]
    # inside: normal from face toward center...? normal must point g1->g2
    n = jnp.where(inside[:, None], -n_out, n_out)
    dist = jnp.where(inside, -(ln + r), ln - r)
    pos = 0.5 * (pp + n * r[:, None] + cw)
    return dist[:, None], pos[:, None], make_frame(n)[:, None]


_NARROW = {
    (_PLANE, _SPHERE): plane_sphere,
    (_PLANE, _CAPSULE): plane_capsule,
    (_PLANE, _CYLINDER): plane_cylinder,
    (_PLANE, _BOX): plane_box,
    # plane-mesh runs through _plane_mesh_group (exact mjc_PlaneConvex
    # replication over static hull tables), never this generic table
    (_SPHERE, _SPHERE): sphere_sphere,
    (_SPHERE, _CAPSULE): sphere_capsule,
    (_SPHERE, _BOX): sphere_box,
    (_CAPSULE, _CAPSULE): capsule_capsule,
}


# --------------------------------------------------------------------------
# convex-convex narrowphase (GJK/EPA)
# --------------------------------------------------------------------------


def _convex_side(model: Model, t: int, gid, dtype):
    """(verts (k,V,3), mask (k,V), radius (k,), kind) for one geom column
    of a convex group. `gid` is a traced (k,) geom-id vector; vertex
    tables are built from traced-safe gathers (geom_size may be
    domain-randomized; mesh vertices are static model leaves)."""
    from . import gjk as _gjk

    k = gid.shape[0]
    size = jnp.asarray(model.geom_size, dtype=dtype)[gid]  # (k, 3)
    zero = jnp.zeros((k,), dtype)
    if t == _MESH:
        mesh_ids = jnp.asarray(
            np.maximum(np.asarray(model.geom_meshid), 0)
        )[gid]
        verts = jnp.asarray(model.mesh_vert, dtype=dtype)[mesh_ids]
        mask = jnp.asarray(model.mesh_vertmask)[mesh_ids].astype(bool)
        return verts, mask, zero, _gjk.KIND_VERTS
    if t == _BOX:
        signs = jnp.asarray(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
             for sz in (-1, 1)], dtype,
        )  # (8, 3)
        verts = signs[None, :, :] * size[:, None, :]
        return verts, jnp.ones((k, 8), bool), zero, _gjk.KIND_VERTS
    if t == _CAPSULE:
        h = size[:, 1]
        seg = jnp.stack([-h, h], axis=1)  # (k, 2)
        verts = jnp.concatenate(
            [jnp.zeros((k, 2, 2), dtype), seg[:, :, None]], axis=-1
        )
        return verts, jnp.ones((k, 2), bool), size[:, 0], _gjk.KIND_VERTS
    if t == _SPHERE:
        verts = jnp.zeros((k, 1, 3), dtype)
        return verts, jnp.ones((k, 1), bool), size[:, 0], _gjk.KIND_VERTS
    if t == _CYLINDER:
        verts = jnp.concatenate(
            [size[:, :2], jnp.zeros((k, 1), dtype)], axis=-1
        )[:, None, :]  # (k, 1, 3) = (radius, half_height, 0)
        return verts, jnp.ones((k, 1), bool), zero, _gjk.KIND_CYLINDER
    raise NotImplementedError(f"convex side type {t}")


def _convex_narrow(model: Model, g: Group, sg1, sg2, data: Data):
    """GJK/EPA narrowphase for one convex group's k selected pairs.
    Returns (dist (k,1), pos (k,1,3), frame (k,1,3,3))."""
    from . import gjk as _gjk

    dtype = data.qpos.dtype
    gxp, gxm = data.geom_xpos, data.geom_xmat
    v1, m1, r1, k1 = _convex_side(model, g.t1, sg1, dtype)
    v2, m2, r2, k2 = _convex_side(model, g.t2, sg2, dtype)

    def one(v1_, m1_, r1_, p1_, R1_, v2_, m2_, r2_, p2_, R2_):
        return _gjk.convex_contact(
            v1_, m1_, r1_, k1, p1_, R1_, v2_, m2_, r2_, k2, p2_, R2_,
            gjk_iters=_gjk.ENGINE_GJK_ITERS,
            epa_iters=_gjk.ENGINE_EPA_ITERS,
            epa_faces=_gjk.ENGINE_EPA_FACES,
            cyl_segs=_gjk.ENGINE_CYL_SEGS,
        )

    d, p, n = jax.vmap(one)(
        v1, m1, r1, gxp[sg1], gxm[sg1], v2, m2, r2, gxp[sg2], gxm[sg2]
    )
    return d[:, None], p[:, None], make_frame(n)[:, None]


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def _rbound(model: Model, data: Data) -> jnp.ndarray:
    """(ngeom,) bounding radii (traced, domain-randomization friendly)."""
    size = model.geom_size
    per_type = {
        _SPHERE: size[:, 0],
        _CAPSULE: size[:, 0] + size[:, 1],
        _CYLINDER: jnp.sqrt(size[:, 0] ** 2 + size[:, 1] ** 2),
        _BOX: jnp.linalg.norm(size, axis=-1),
    }
    out = jnp.zeros(model.ngeom, dtype=size.dtype)
    gt = model.geom_type
    for t, v in per_type.items():
        out = jnp.where(jnp.asarray(gt == t), v, out)
    if model.mesh_vert.shape[0]:
        vr = jnp.sqrt(
            jnp.max(
                jnp.sum(model.mesh_vert**2, axis=-1)
                * model.mesh_vertmask,
                axis=-1,
            )
        )  # (nmesh,)
        mesh_r = vr[np.maximum(model.geom_meshid, 0)]
        out = jnp.where(jnp.asarray(gt == _MESH), mesh_r, out)
    return out


def collision(model: Model, data: Data) -> Data:
    groups, total, _ = contact_groups(model)
    dtype = data.qpos.dtype
    if total == 0:
        return data

    rbound = _rbound(model, data)
    gxp, gxm = data.geom_xpos, data.geom_xmat

    dists, poss, frames = [], [], []
    g1s, g2s, dims = [], [], []
    fris, srefs, simps, margins = [], [], [], []

    for g in groups:
        pid = g.pair_ids
        pg1 = model.pair_geom1[pid]
        pg2 = model.pair_geom2[pid]

        if g.convex and dtype != jnp.float64:
            # f32 = the Pallas-accelerated production dtype: the mega/ext
            # plans censor convex slots (RowPlan), so the staged driver
            # emits them inactive too — identical contact sets on every
            # f32 stage. Skipped BEFORE midphase: the top_k here lowers
            # to a TPU sort kernel, which alone cost A1 (202 convex
            # candidate pairs) a 891k -> 473k steps/s regression.
            ks = g.k * g.slots
            dists.append(jnp.full((ks,), 1e10, dtype))
            poss.append(jnp.zeros((ks, 3), dtype))
            frames.append(jnp.broadcast_to(
                jnp.eye(3, dtype=dtype), (ks, 3, 3)
            ))
            static_sel = pid[: g.k]
            rep = lambda x: jnp.repeat(jnp.asarray(x), g.slots, axis=0)
            g1s.append(rep(model.pair_geom1[static_sel]))
            g2s.append(rep(model.pair_geom2[static_sel]))
            fris.append(rep(model.pair_friction[static_sel]))
            srefs.append(rep(model.pair_solref[static_sel]))
            simps.append(rep(model.pair_solimp[static_sel]))
            margins.append(rep(
                model.pair_margin[static_sel]
                - model.pair_gap[static_sel]
            ))
            dims.extend([g.condim] * ks)
            continue

        if g.t1 == _PLANE and g.t2 == _MESH:
            (d, p, f, sg1, sg2, fri, sref, simp, marg) = _plane_mesh_group(
                model, g, data
            )
            ks = g.k * g.slots
            dists.append(d.reshape(ks))
            poss.append(p.reshape(ks, 3))
            frames.append(f.reshape(ks, 3, 3))
            rep = lambda x: jnp.repeat(x, g.slots, axis=0)
            g1s.append(rep(sg1))
            g2s.append(rep(sg2))
            fris.append(rep(fri))
            srefs.append(rep(sref))
            simps.append(rep(simp))
            margins.append(rep(marg))
            dims.extend([g.condim] * ks)
            continue

        # midphase: for plane groups use the EXACT support distance of the
        # second geom (cheap per type) — a bounding-radius bound is far too
        # loose for long cylinders/capsules and mis-ranks the top-K
        # selection against small geoms that actually touch
        if g.t1 == _PLANE:
            n = gxm[pg1][:, :, 2]
            h = jnp.sum(n * (gxp[pg2] - gxp[pg1]), axis=-1)
            sz = model.geom_size[pg2]
            if g.t2 == _SPHERE:
                supp = sz[:, 0]
            elif g.t2 == _CAPSULE:
                ca = jnp.abs(jnp.sum(n * gxm[pg2][:, :, 2], axis=-1))
                supp = sz[:, 1] * ca + sz[:, 0]
            elif g.t2 == _CYLINDER:
                ca = jnp.abs(jnp.sum(n * gxm[pg2][:, :, 2], axis=-1))
                supp = sz[:, 1] * ca + sz[:, 0] * jnp.sqrt(
                    jnp.maximum(1.0 - ca * ca, 0.0)
                )
            elif g.t2 == _BOX:
                # sum of |n . axis_i| * size_i
                proj = jnp.abs(jnp.einsum("ki,kij->kj", n, gxm[pg2]))
                supp = jnp.sum(proj * sz, axis=-1)
            else:  # mesh: bounding radius
                supp = rbound[pg2]
            mid = h - supp
        else:
            mid = (
                jnp.linalg.norm(gxp[pg2] - gxp[pg1], axis=-1)
                - rbound[pg1]
                - rbound[pg2]
            )
        mid = mid - model.pair_margin[pid]

        if g.k < len(pid):
            _, sel = jax.lax.top_k(-mid, g.k)  # k closest pairs
            sel_p = jnp.asarray(pid)[sel]
            sg1 = jnp.asarray(pg1)[sel]
            sg2 = jnp.asarray(pg2)[sel]
        else:
            sel_p = jnp.asarray(pid)
            sg1 = jnp.asarray(pg1)
            sg2 = jnp.asarray(pg2)

        pp, pR = gxp[sg1], gxm[sg1]
        qp, qR = gxp[sg2], gxm[sg2]
        s1 = model.geom_size[sg1]
        s2 = model.geom_size[sg2]
        margin = model.pair_margin[sel_p]

        if g.convex:
            # f64 parity path only (the f32 branch skipped this group
            # before the midphase above)
            d, p, f = _convex_narrow(model, g, sg1, sg2, data)
        else:
            extra = None
            fn = _NARROW[(g.t1, g.t2)]
            d, p, f = fn(pp, pR, s1, qp, qR, s2, extra)  # (k, s, ...)

        ks = g.k * g.slots
        dists.append(d.reshape(ks))
        poss.append(p.reshape(ks, 3))
        frames.append(f.reshape(ks, 3, 3))
        rep = lambda x: jnp.repeat(x, g.slots, axis=0)
        g1s.append(rep(sg1))
        g2s.append(rep(sg2))
        fris.append(rep(model.pair_friction[sel_p]))
        srefs.append(rep(model.pair_solref[sel_p]))
        simps.append(rep(model.pair_solimp[sel_p]))
        margins.append(rep(margin - model.pair_gap[sel_p]))
        dims.extend([g.condim] * ks)

    contact = Contact(
        dist=jnp.concatenate(dists),
        pos=jnp.concatenate(poss),
        frame=jnp.concatenate(frames),
        includemargin=jnp.concatenate(margins),
        friction=jnp.concatenate(fris),
        solref=jnp.concatenate(srefs),
        solimp=jnp.concatenate(simps),
        geom1=jnp.concatenate(g1s),
        geom2=jnp.concatenate(g2s),
        dim=np.asarray(dims, dtype=np.int32),
    )
    return data.replace(contact=contact)
