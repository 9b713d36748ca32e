"""In-kernel forward kinematics + plane collision for the mega fused path.

The mega kernel (ops/pallas_constraint.py) runs the ENTIRE forward pass of a
supported model inside one Pallas program: FK -> collision -> smooth stage ->
constraint assembly -> Newton solve. This module provides the FK and
collision stages as trace-time code generators over per-env blocks.

Everything here operates on "static-or-traced" scalars: a value is either a
Python float (compile-time constant) or a (BE,)/(S,128) env-block array.
The helpers fold constants at trace time, so identity body quaternions,
world-axis root slides and zeroed offsets — the bulk of real robot MJCFs —
generate no vector ops at all. This matters: per-env scalar chains run at
1/8 VPU rate in the lanes layout (one sublane per (1, 128) value), so every
folded op is 8x its nominal cost.

The math mirrors ops/kinematics.kinematics (mj_kinematics semantics:
hinge/slide joints only, nq == nv, see kinematics.py:26-127) and the
plane-mesh manifold selection of ops/pallas_collision._make_kernel /
_topk_kernel_builder (mjc_PlaneConvex semantics). The XLA implementations
remain the reference; parity is asserted in tests/test_mega.py via
interpret mode.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


# ---------------------------------------------------------------------------
# static-or-traced scalar arithmetic
# ---------------------------------------------------------------------------
def is_static(x):
    return isinstance(x, (int, float))


def neg(a):
    return -a


def mul(a, b):
    if is_static(a) and is_static(b):
        return a * b
    if is_static(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if a == -1.0:
            return -b
        return a * b
    if is_static(b):
        return mul(b, a)
    return a * b


def add(*xs):
    const = 0.0
    arr = None
    for x in xs:
        if is_static(x):
            const += x
        else:
            arr = x if arr is None else arr + x
    if arr is None:
        return const
    return arr if const == 0.0 else arr + const


def sub(a, b):
    if is_static(b):
        return add(a, -b)
    if is_static(a) and a == 0.0:
        return -b
    return add(a, mul(-1.0, b))


def dot3(a, b):
    return add(mul(a[0], b[0]), mul(a[1], b[1]), mul(a[2], b[2]))


def cross3(a, b):
    return (
        sub(mul(a[1], b[2]), mul(a[2], b[1])),
        sub(mul(a[2], b[0]), mul(a[0], b[2])),
        sub(mul(a[0], b[1]), mul(a[1], b[0])),
    )


def vadd(a, b):
    return tuple(add(a[i], b[i]) for i in range(len(a)))


def vscale(a, s):
    return tuple(mul(a[i], s) for i in range(len(a)))


def quat_mul(a, b):
    """(w,x,y,z) Hamilton product, ops/math.py:quat_mul."""
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return (
        sub(sub(sub(mul(w1, w2), mul(x1, x2)), mul(y1, y2)), mul(z1, z2)),
        sub(add(mul(w1, x2), mul(x1, w2), mul(y1, z2)), mul(z1, y2)),
        add(sub(mul(w1, y2), mul(x1, z2)), mul(y1, w2), mul(z1, x2)),
        add(sub(add(mul(w1, z2), mul(x1, y2)), mul(y1, x2)), mul(z1, w2)),
    )


def quat_rotate(q, v):
    """Rotate 3-tuple v by quaternion q: v + 2(w c + u x c), c = u x v
    (ops/math.py:quat_rotate)."""
    w = q[0]
    u = q[1:]
    c = cross3(u, v)
    wc_uc = vadd(vscale(c, mul(2.0, w)), vscale(cross3(u, c), 2.0))
    return vadd(v, wc_uc)


def quat_to_mat(q):
    """Quaternion -> row-major 3x3 entries (ops/math.py:quat_to_mat)."""
    w, x, y, z = q
    xx, yy, zz = mul(x, x), mul(y, y), mul(z, z)
    wx, wy, wz = mul(w, x), mul(w, y), mul(w, z)
    xy, xz, yz = mul(x, y), mul(x, z), mul(y, z)
    return (
        (sub(1.0, mul(2.0, add(yy, zz))), mul(2.0, sub(xy, wz)),
         mul(2.0, add(xz, wy))),
        (mul(2.0, add(xy, wz)), sub(1.0, mul(2.0, add(xx, zz))),
         mul(2.0, sub(yz, wx))),
        (mul(2.0, sub(xz, wy)), mul(2.0, add(yz, wx)),
         sub(1.0, mul(2.0, add(xx, yy)))),
    )


def mat_vec(R, v):
    return tuple(dot3(R[i], v) for i in range(3))


def mat_t_vec(R, v):
    return tuple(dot3((R[0][i], R[1][i], R[2][i]), v) for i in range(3))


def mat_mul(A, B):
    return tuple(
        tuple(
            add(mul(A[i][0], B[0][j]), mul(A[i][1], B[1][j]),
                mul(A[i][2], B[2][j]))
            for j in range(3)
        )
        for i in range(3)
    )


def materialize(x, zero):
    """Force a static value into an env-block array (for stacking)."""
    return zero + x if is_static(x) else x


# ---------------------------------------------------------------------------
# FK plan + in-kernel FK
# ---------------------------------------------------------------------------
class FkPlan:
    """Static tables for in-kernel forward kinematics. Mirrors
    ops/kinematics.kinematics exactly (hinge/slide joints, nq == nv)."""

    def __init__(self, model, conc):
        from ..core.types import JointType

        jt = np.asarray(model.jnt_type)
        if jt.size and not np.all(jt >= int(JointType.SLIDE)):
            raise ValueError("hinge/slide joints only")
        need = [
            model.body_pos, model.body_quat, model.body_ipos,
            model.body_iquat, model.jnt_pos, model.jnt_axis, model.qpos0,
        ]
        vals = [conc(x) for x in need]
        if any(v is None for v in vals):
            raise ValueError("traced FK leaf")
        bpos, bquat, bipos, biquat, jpos, jaxis, qpos0 = [
            np.asarray(v, np.float64) for v in vals
        ]
        nb = model.nbody
        self.nbody = nb
        self.njnt = model.njnt
        parent = [int(b) for b in np.asarray(model.body_parentid)]
        self.parent = parent
        order, seen = [], {0}
        pending = list(range(1, nb))
        while pending:
            for b in list(pending):
                if parent[b] in seen:
                    order.append(b)
                    seen.add(b)
                    pending.remove(b)
        self.topo = order
        self.body_pos = [tuple(float(x) for x in bpos[b]) for b in range(nb)]
        self.body_quat = [tuple(float(x) for x in bquat[b]) for b in range(nb)]
        self.body_ipos = [tuple(float(x) for x in bipos[b]) for b in range(nb)]
        self.body_iquat = [
            tuple(float(x) for x in biquat[b]) for b in range(nb)
        ]
        jadr = np.asarray(model.body_jntadr)
        jnum = np.asarray(model.body_jntnum)
        qadr = np.asarray(model.jnt_qposadr)
        self.body_joints = [
            [
                dict(
                    j=int(j),
                    q=int(qadr[j]),
                    q0=float(qpos0[qadr[j]]),
                    hinge=int(jt[j]) == int(JointType.HINGE),
                    pos=tuple(float(x) for x in jpos[j]),
                    axis=tuple(float(x) for x in jaxis[j]),
                )
                for j in range(int(jadr[b]), int(jadr[b]) + int(jnum[b]))
            ]
            for b in range(nb)
        ]


class FkResult:
    """World-frame body/joint quantities as static-or-traced tuples."""

    __slots__ = ("xpos", "xquat", "xmat", "xipos", "ximat", "xanchor",
                 "xaxis")


_IDENT_Q = (1.0, 0.0, 0.0, 0.0)


def fk_env_block(fkp: FkPlan, qpos_row) -> FkResult:
    """Run FK for one env block. `qpos_row(q)` returns the (BE,) env-block
    value of qpos[q]. Returns per-body pos/quat/mat (+inertial frame) and
    per-joint anchors/axes as tuples of static-or-traced scalars."""
    nb = fkp.nbody
    out = FkResult()
    xpos = [None] * nb
    xquat = [None] * nb
    xanchor = [None] * max(fkp.njnt, 1)
    xaxis = [None] * max(fkp.njnt, 1)
    xpos[0] = (0.0, 0.0, 0.0)
    xquat[0] = _IDENT_Q

    for b in fkp.topo:
        p = fkp.parent[b]
        pos = vadd(xpos[p], quat_rotate(xquat[p], fkp.body_pos[b]))
        quat = (
            quat_mul(xquat[p], fkp.body_quat[b])
            if fkp.body_quat[b] != _IDENT_Q
            else xquat[p]
        )
        for jd in fkp.body_joints[b]:
            anchor = vadd(pos, quat_rotate(quat, jd["pos"]))
            axis = quat_rotate(quat, jd["axis"])
            xanchor[jd["j"]] = anchor
            xaxis[jd["j"]] = axis
            qd = sub(qpos_row(jd["q"]), jd["q0"])
            if jd["hinge"]:
                half = mul(0.5, qd)
                c, s = jnp.cos(half), jnp.sin(half)
                qloc = (c,) + vscale(jd["axis"], s)
                quat = quat_mul(quat, qloc)
                pos = sub3(anchor, quat_rotate(quat, jd["pos"]))
            else:
                pos = vadd(pos, vscale(axis, qd))
        xpos[b] = pos
        xquat[b] = quat

    xmat = [quat_to_mat(q) for q in xquat]
    xipos = [
        vadd(xpos[b], quat_rotate(xquat[b], fkp.body_ipos[b]))
        if fkp.body_ipos[b] != (0.0, 0.0, 0.0)
        else xpos[b]
        for b in range(nb)
    ]
    ximat = [
        quat_to_mat(quat_mul(xquat[b], fkp.body_iquat[b]))
        if fkp.body_iquat[b] != _IDENT_Q
        else xmat[b]
        for b in range(nb)
    ]
    out.xpos, out.xquat, out.xmat = xpos, xquat, xmat
    out.xipos, out.ximat = xipos, ximat
    out.xanchor, out.xaxis = xanchor, xaxis
    return out


def sub3(a, b):
    return tuple(sub(a[i], b[i]) for i in range(3))



def _dot3_split(tbl, A):
    """(V, 3) static vertex block x (3, *E) traced normal -> (V, *E)
    height map as THREE default-precision bf16 dots (manual bf16_3x:
    hi*hi + hi*lo + lo*hi): ~1e-5-relative accurate — inside the kernel's
    f32 parity envelope — at half the 6-pass HIGHEST f32 emulation this
    scope otherwise pins."""
    f32 = jnp.float32
    th = tbl.astype(jnp.bfloat16)
    tl = (tbl - th.astype(f32)).astype(jnp.bfloat16)

    def dot2d(a, b):
        with jax.default_matmul_precision("default"):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )

    def one(Ae):
        ah = Ae.astype(jnp.bfloat16)
        al = (Ae - ah.astype(f32)).astype(jnp.bfloat16)
        return dot2d(th, ah) + dot2d(th, al) + dot2d(tl, ah)

    if A.ndim == 2:
        return one(A)
    S = A.shape[1]
    return jnp.stack([one(A[:, si]) for si in range(S)], axis=1)


def _gather_dot(tbl, oh):
    """(R, V) static table x (V, *E) one-hot -> (R, *E) on the MXU.
    Grouped (S, 128) env blocks run one 2D dot per sublane slice (Mosaic
    dots are 2D-only); lanes blocks are a single dot.

    Precision: these dots inherit the physics scope's HIGHEST matmul
    precision (6-pass f32 emulation), which costs ~6 ms/step of the
    flagship bench. For the LARGE one-hot gathers (contraction over the
    V axis) HIGH (2-piece bf16, 3 passes) is enough: with the one-hot
    side exact in bf16 (0/1), each product reconstructs v_hi + v_lo —
    EXACT for the integer id rows (< 2^16) and ~1e-5-relative for the
    coordinate rows, far inside the kernel's f32 parity envelope
    (tests/test_mega.py asserts 5e-4 rel / 1e-5 dist). The small K=3
    height-map dots keep the scope's precision (depth accuracy matters
    and they are cheap)."""
    f32 = jnp.float32
    big = tbl.shape[1] > 8  # contraction over V: the expensive gathers

    if big:
        # explicit 2-piece split (Mosaic dot_general supports only
        # DEFAULT/HIGHEST precisions; HIGH raises)
        hi = tbl.astype(jnp.bfloat16)
        lo = (tbl - hi.astype(f32)).astype(jnp.bfloat16)

        def dot2d(o):
            ob = o.astype(jnp.bfloat16)

            def d(a):
                # DEFAULT precision scope: the surrounding physics trace
                # pins HIGHEST (contract_precision=fp32), which Mosaic
                # rejects for bf16 operands ("Bad lhs type")
                with jax.default_matmul_precision("default"):
                    return jax.lax.dot_general(
                        a, ob, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )

            return d(hi) + d(lo)
    else:
        def dot2d(o):
            return jax.lax.dot_general(
                tbl, o, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

    if oh.ndim == 2:
        return dot2d(oh)
    S = oh.shape[1]
    return jnp.stack([dot2d(oh[:, si]) for si in range(S)], axis=1)


# ---------------------------------------------------------------------------
# collision plan + in-kernel plane collision
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# collision plan + in-kernel plane collision
# ---------------------------------------------------------------------------
class ColPlan:
    """Static tables for in-kernel plane collision (box/cylinder/mesh).

    Valid only under RowPlan.uniform (one static world plane, uniform
    solref/solimp/margin across candidate pairs; pyramidal cones keep the
    plane's static contact frame for every slot — plane-capsule, whose
    frame follows the capsule axis, is rejected). Slot order matches
    ops/collision.contact_groups exactly: groups sorted by (t1, t2,
    condim); within a group, pairs in pid order when k == P, else top-k
    rank order by support distance (the same `mid - margin` key and
    first-index tie-break as the XLA driver, collision.py:772-813)."""

    def __init__(self, model, conc):
        from ..core.types import GeomType
        from .collision import contact_groups
        from .pallas_collision import pack_plane_mesh_buckets

        groups, total, _ = contact_groups(model)
        need = [model.geom_pos, model.geom_quat, model.geom_size,
                model.pair_margin]
        vals = [conc(x) for x in need]
        if any(v is None for v in vals):
            raise ValueError("traced collision leaf")
        gpos, gquat, gsize, pmarg = [np.asarray(v, np.float64) for v in vals]
        gbody = np.asarray(model.geom_bodyid)
        gtype = np.asarray(model.geom_type)

        _PLANE = int(GeomType.PLANE)
        _KIND = {
            int(GeomType.CYLINDER): "cyl",
            int(GeomType.BOX): "box",
            int(GeomType.MESH): "mesh",
        }

        from .collision import classic_ncon

        self.groups = []
        # convex GJK/EPA groups occupy the slot-layout TAIL and stay on
        # the staged (CPU/f64) driver; the in-kernel plan censors them by
        # sizing to the classic prefix (offsets unchanged)
        self.ncon = classic_ncon(model)
        plane_gid = None
        n_mesh = 0
        for g in groups:
            if g.convex:
                continue
            if int(g.t1) != _PLANE or int(g.condim) != 3:
                raise ValueError("non-plane or non-condim3 group")
            kind = _KIND.get(int(g.t2))
            if kind is None:
                raise ValueError("unsupported group type")
            pid = np.asarray(g.pair_ids)
            pg1 = np.asarray(model.pair_geom1)[pid]
            pg2 = np.asarray(model.pair_geom2)[pid]
            if plane_gid is None:
                plane_gid = int(pg1[0])
            if not np.all(pg1 == plane_gid):
                raise ValueError("multiple planes")
            if not np.all(pmarg[pid] == pmarg[pid[0]]):
                raise ValueError("non-uniform pair margins in group")

            gdesc = dict(
                kind=kind, k=int(g.k), slots=int(g.slots),
                margin=float(pmarg[pid[0]]),
            )
            if kind == "mesh":
                if g.slots != 3:
                    raise ValueError("plane-mesh slots != 3")
                n_mesh += 1
                if n_mesh > 1:
                    raise ValueError("multiple mesh groups")
                import os as _os

                vcap = int(_os.environ.get("LMT_MESH_VCAP", "5632"))
                packed = pack_plane_mesh_buckets(model, pid, vcap)
                if packed is None:
                    raise ValueError("mesh pack failed (brute/oversized)")
                subs, border = packed
                bpid = pid[border]  # bucket-major pair ids
                gdesc["subs"] = subs
                gdesc["pairs"] = [
                    dict(
                        gid=int(pg2b), body=int(gbody[pg2b]),
                        gpos=tuple(float(x) for x in gpos[pg2b]),
                        gquat=tuple(float(x) for x in gquat[pg2b]),
                    )
                    for pg2b in np.asarray(model.pair_geom2)[bpid]
                ]
            else:
                if g.slots != 4:
                    raise ValueError("plane box/cyl slots != 4")
                gdesc["pairs"] = [
                    dict(
                        gid=int(gid), body=int(gbody[gid]),
                        size=tuple(float(x) for x in gsize[gid]),
                        gpos=tuple(float(x) for x in gpos[gid]),
                        gquat=tuple(float(x) for x in gquat[gid]),
                    )
                    for gid in pg2
                ]
            self.groups.append(gdesc)

        # static plane frame (normal from geom_quat; plane on world body)
        if plane_gid is None:
            raise ValueError("no contacts")
        if int(gbody[plane_gid]) != 0:
            raise ValueError("plane not on world body")
        if int(gtype[plane_gid]) != _PLANE:
            raise ValueError("geom1 not a plane")
        w, xq, yq, zq = (float(v) for v in gquat[plane_gid])
        qn = (w * w + xq * xq + yq * yq + zq * zq) ** 0.5
        w, xq, yq, zq = w / qn, xq / qn, yq / qn, zq / qn
        self.n = (
            2 * (xq * zq + w * yq),
            2 * (yq * zq - w * xq),
            1 - 2 * (xq * xq + yq * yq),
        )
        self.pp = tuple(float(x) for x in gpos[plane_gid])
        self.plane_gid = plane_gid

    @property
    def n_mesh_tables(self):
        return 2 * sum(
            len(g["subs"]) for g in self.groups if g["kind"] == "mesh"
        )

    def mesh_table_arrays(self):
        """The bucketed static vertex/neighbor tables as jnp inputs for
        pallas_call: per bucket, the (Pb, 3+4D, V) table AND its
        (Pb, V, 3) transposed vertex block (the height map runs as an MXU
        dot (V, 3) @ (3, *E); building (V, *E) maps from the table's lane
        rows would need a lanes->leading shape cast Mosaic rejects)."""
        out = []
        for g in self.groups:
            if g["kind"] != "mesh":
                continue
            for ids, tbl_t, marg, D in g["subs"]:
                tbl = np.frombuffer(tbl_t[0], np.float32).reshape(tbl_t[1])
                out.append(jnp.asarray(tbl))
                out.append(jnp.asarray(
                    np.ascontiguousarray(tbl[:, 0:3].transpose(0, 2, 1))
                ))
        return out


def _pair_pose(fk, pair, body_t_cache, n):
    """World pose pieces of one candidate geom: qp (3-tuple), Rb (3x3
    tuples, = xmat[body] @ R(gquat)), and a = Rb' n (the plane normal in
    geom-local coords). Static-identity geom quats fold away."""
    b = pair["body"]
    if b not in body_t_cache:
        body_t_cache[b] = mat_t_vec(fk.xmat[b], n)
    Rg = quat_to_mat(pair["gquat"])
    Rb = (
        mat_mul(fk.xmat[b], Rg) if pair["gquat"] != _IDENT_Q else fk.xmat[b]
    )
    a = (
        mat_t_vec(Rg, body_t_cache[b])
        if pair["gquat"] != _IDENT_Q
        else body_t_cache[b]
    )
    qp = vadd(fk.xpos[b], mat_vec(fk.xmat[b], pair["gpos"]))
    return qp, Rb, a


def _box_slots(n, pp_n, qp, Rb, size, zero, f32):
    """4-deepest-of-8-corners plane-box manifold (collision.plane_box
    semantics: iterative argmin with first-index ties). qp/Rb/size are
    static-or-traced tuples; returns 4 (pos, dist) slots."""
    pts, hs = [], []
    sx, sy, sz = size
    for cx in (-1.0, 1.0):
        for cy in (-1.0, 1.0):
            for cz in (-1.0, 1.0):
                local = (mul(cx, sx), mul(cy, sy), mul(cz, sz))
                pt = vadd(qp, mat_vec(Rb, local))
                pts.append(pt)
                hs.append(materialize(sub(dot3(n, pt), pp_n), zero))
    slots = []
    hm = list(hs)
    for _ in range(4):
        m = hm[0]
        for i in range(1, 8):
            m = jnp.minimum(m, hm[i])
        sel_h = zero
        sel_p = [zero, zero, zero]
        found = zero  # first-index tie-break within this round
        for i in range(8):
            oh = (hm[i] == m).astype(f32) * (1.0 - found)
            sel_h = sel_h + oh * hs[i]
            for k3 in range(3):
                sel_p[k3] = sel_p[k3] + oh * materialize(pts[i][k3], zero)
            hm[i] = jnp.where(oh > 0, _BIG, hm[i])
            found = jnp.maximum(found, oh)
        slots.append((
            tuple(sel_p[k3] - n[k3] * 0.5 * sel_h for k3 in range(3)),
            sel_h,
        ))
    return slots


_SIN120 = float(np.sqrt(3.0) / 2.0)


def _cyl_slots(n, pp_n, qp, axis, col0, r, hl, zero):
    """Plane-cylinder manifold (collision.plane_cylinder semantics): the
    deepest rim point of the near cap, its ±120° rim companions, and the
    deepest rim point of the far cap. axis/col0 = cylinder z/x axes in
    world frame; r/hl radius and half-length (static-or-traced)."""
    ca = materialize(dot3(n, axis), zero)
    sgn = jnp.where(ca >= 0, -1.0, 1.0)
    shl = mul(sgn, hl)
    cap_near = vadd(qp, vscale(axis, shl))
    cap_far = sub3(qp, vscale(axis, shl))

    # deepest in-plane rim direction (⊥ axis); ⊥-degenerate (axis || n)
    # falls back to the cylinder's local x axis
    d = sub3(vscale(axis, ca), n)
    dn2 = add(mul(d[0], d[0]), mul(d[1], d[1]), mul(d[2], d[2]))
    dn = jnp.sqrt(materialize(dn2, zero))
    ok = dn > 1e-8
    dsafe = jnp.maximum(dn, 1e-15)
    d = tuple(
        jnp.where(ok, materialize(d[i], zero) / dsafe,
                  materialize(col0[i], zero))
        for i in range(3)
    )
    e = cross3(axis, d)
    en = jnp.sqrt(jnp.maximum(materialize(
        add(mul(e[0], e[0]), mul(e[1], e[1]), mul(e[2], e[2])), zero
    ), 1e-30))
    e = tuple(materialize(e[i], zero) / jnp.maximum(en, 1e-15)
              for i in range(3))

    rd = vscale(d, r)
    rot1 = tuple(
        mul(r, add(mul(-0.5, d[i]), mul(_SIN120, e[i]))) for i in range(3)
    )
    rot2 = tuple(
        mul(r, sub(mul(-0.5, d[i]), mul(_SIN120, e[i]))) for i in range(3)
    )
    pts = [
        vadd(cap_near, rd),
        vadd(cap_near, rot1),
        vadd(cap_near, rot2),
        vadd(cap_far, rd),
    ]
    slots = []
    for pt in pts:
        h = materialize(sub(dot3(n, pt), pp_n), zero)
        slots.append((
            tuple(materialize(pt[k3], zero) - n[k3] * 0.5 * h
                  for k3 in range(3)),
            h,
        ))
    return slots


def _support_key(kind, n, pp_n, qp, Rb, a, size, zero):
    """Per-pair support distance h - supp (the XLA midphase key before
    the margin shift, collision.py:776-796)."""
    h = sub(dot3(n, qp), pp_n)
    if kind == "box":
        supp = 0.0
        for i in range(3):
            ni = add(mul(Rb[0][i], n[0]), mul(Rb[1][i], n[1]),
                     mul(Rb[2][i], n[2]))
            ni = jnp.abs(materialize(ni, zero))
            supp = add(supp, mul(size[i], ni))
    else:  # cyl
        axis = (Rb[0][2], Rb[1][2], Rb[2][2])
        ca = jnp.abs(materialize(dot3(n, axis), zero))
        supp = add(
            mul(size[1], ca),
            mul(size[0], jnp.sqrt(jnp.maximum(1.0 - ca * ca, 0.0))),
        )
    return materialize(sub(h, supp), zero)


def _mesh_group_slots(g, fk, my_tbls, n, pp_n, zero, eshape, body_t):
    """Plane-mesh group: bucketed manifold selection + top-k, emitting
    k*3 slots as (world pos 3-tuple rows, dist row, gid row) — shared by
    the plane-only mega path (collide_env_block) and the extended plan
    (collide_env_block_ext)."""
    f32 = jnp.float32
    mesh_pairs = g["pairs"]
    P, k = len(mesh_pairs), g["k"]
    subs = g["subs"]

    a_rows, b_rows, qp_list, R2_list = [], [], [], []
    for bp in mesh_pairs:
        qp, Rb, a = _pair_pose(fk, bp, body_t, n)
        a_rows.append(tuple(materialize(x, zero) for x in a))
        b_rows.append(materialize(sub(dot3(n, qp), pp_n), zero))
        qp_list.append(qp)
        R2_list.append(Rb)

    def scoped(d0_ref, wpos_ref, slot_ref, subs=subs, my_tbls=my_tbls,
               a_rows=a_rows, b_rows=b_rows, qp_list=qp_list,
               R2_list=R2_list, P=P, k=k, mesh_pairs=mesh_pairs,
               g=g):
        ones_e = (1,) * len(eshape)
        pi = 0
        for ti, (ids, tbl_t, marg, D) in enumerate(subs):
            tbl_ref = my_tbls[2 * ti]
            tblT_ref = my_tbls[2 * ti + 1]
            V = tbl_ref.shape[2]
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (V,) + ones_e, 0
            ).astype(f32)
            for lp in range(len(ids)):
                p = pi + lp
                (margin, dedupe2, lox, loy, loz, hix, hiy, hiz) = (
                    float(x) for x in marg[lp]
                )
                # directed-extent support bound (see
                # pallas_collision._make_kernel): min height >=
                # b + sum_i min(a_i lo_i, a_i hi_i)
                lb = b_rows[p] - 1e-6
                for ai, loi, hii in (
                    (a_rows[p][0], lox, hix),
                    (a_rows[p][1], loy, hiy),
                    (a_rows[p][2], loz, hiz),
                ):
                    lb = lb + jnp.minimum(ai * loi, ai * hii)
                tbl = tbl_ref[lp]  # (3+4D, V)
                tblT = tblT_ref[lp]  # (V, 3)
                d0_ref[p, 0] = lb
                d0_ref[p, 1] = zero + _BIG
                d0_ref[p, 2] = zero + _BIG
                # wpos holds WORLD slot positions (pretransformed here
                # so the rank loop gathers 13 rows instead of 25 and
                # skips the per-rank qp/R2 transform); far pairs carry
                # the geom origin as a harmless inactive default
                for i3 in range(9):
                    wpos_ref[p, i3] = materialize(
                        qp_list[p][i3 % 3], zero
                    )

                @pl.when(jnp.min(lb) < margin)
                def _near(p=p, tbl=tbl, tblT=tblT, iota=iota,
                          margin=margin, dedupe2=dedupe2, D=D):
                    a0 = a_rows[p][0][None]
                    a1 = a_rows[p][1][None]
                    a2 = a_rows[p][2][None]
                    bb = b_rows[p][None]
                    A = jnp.concatenate([a0, a1, a2], axis=0)
                    h = _dot3_split(tblT, A) + bb  # (V, *E)
                    d0 = jnp.min(h, axis=0, keepdims=True)
                    d0_ref[p, 0] = d0[0]

                    @pl.when(jnp.min(d0) < margin)
                    def _manifold():
                        i0 = jnp.min(
                            jnp.where(h == d0, iota, float(V)),
                            axis=0, keepdims=True,
                        )
                        oh0 = (iota == i0).astype(f32)
                        q = _gather_dot(tbl, oh0)  # (3+3D | 3+4D, *E)
                        v0x, v0y, v0z = (
                            q[0][None], q[1][None], q[2][None]
                        )
                        # two table layouts (pack_plane_mesh_buckets):
                        # sentinel (3+3D, plane-mega — invalid neighbor
                        # slots carry the owner vertex, whose dedupe
                        # distance 0.25*d0^2 fails dist2 >= dedupe2, so
                        # the D id rows are gone: 23% fewer gather rows)
                        # vs legacy with-ids (3+4D, ext plans)
                        has_ids = tbl.shape[0] == 3 + 4 * D
                        o = 3 + (D if has_ids else 0)
                        cx = q[o:o + D]
                        cy = q[o + D:o + 2 * D]
                        cz = q[o + 2 * D:o + 3 * D]
                        hc = cx * a0 + cy * a1 + cz * a2 + bb
                        ex = cx - v0x + 0.5 * d0 * a0
                        ey = cy - v0y + 0.5 * d0 * a1
                        ez = cz - v0z + 0.5 * d0 * a2
                        dist2 = ex * ex + ey * ey + ez * ez
                        qual = (hc < margin) & (dist2 >= dedupe2)
                        if has_ids:
                            qual = qual & (q[3:3 + D] > -0.5)
                        qf = qual.astype(f32)
                        big = jnp.full_like(d0, _BIG)
                        zr = jnp.zeros_like(d0)
                        cnt = zr
                        d1 = d2 = big
                        v1 = [zr, zr, zr]
                        v2 = [zr, zr, zr]
                        # select, not accumulate-toward: the
                        # d1 + t1*(hc - d1) form cancels catastrophically
                        # in f32 when d1 = _BIG (hc - 1e10 rounds to
                        # -1e10 exactly), silently zeroing every
                        # neighbor slot depth
                        for dc in range(D):
                            qd = qf[dc][None]
                            t1 = (qd * (cnt == 0.0)) > 0
                            t2 = (qd * (cnt == 1.0)) > 0
                            d1 = jnp.where(t1, hc[dc][None], d1)
                            d2 = jnp.where(t2, hc[dc][None], d2)
                            for k3, cc in enumerate((cx, cy, cz)):
                                v1[k3] = jnp.where(
                                    t1, cc[dc][None], v1[k3]
                                )
                                v2[k3] = jnp.where(
                                    t2, cc[dc][None], v2[k3]
                                )
                            cnt = cnt + qd
                        d0_ref[p, 1] = d1[0]
                        d0_ref[p, 2] = d2[0]
                        # world slot positions: w = qp + R2 v - n d/2
                        qp, R2 = qp_list[p], R2_list[p]
                        for f, (vv, dd) in enumerate((
                            ((q[0][None], q[1][None], q[2][None]), d0),
                            (v1, d1), (v2, d2),
                        )):
                            d2h = 0.5 * dd[0]
                            for i3 in range(3):
                                w = add(
                                    qp[i3],
                                    mul(R2[i3][0], vv[0][0]),
                                    mul(R2[i3][1], vv[1][0]),
                                    mul(R2[i3][2], vv[2][0]),
                                )
                                wpos_ref[p, 3 * f + i3] = (
                                    materialize(w, zero) - n[i3] * d2h
                                )

            pi += len(ids)

        # ---- top-k pair selection + slot build ----
        d_all = d0_ref[...]       # (P, 3, BE)
        wpos_all = wpos_ref[...]  # (P, 9, BE) world slot positions
        gid_tab = jnp.stack([
            zero + float(mesh_pairs[p]["gid"]) for p in range(P)
        ])  # (P, BE)
        key = d_all[:, 0] - g["margin"]
        iota_p = jax.lax.broadcasted_iota(
            jnp.int32, (P,) + (1,) * len(eshape), 0
        ).astype(f32)

        gid0 = float(mesh_pairs[0]["gid"])
        for s in range(k):
            # selection bookkeeping is unconditional (cheap, and
            # `key` threads through the python loop); the one-hot
            # gathers + world transforms — the expensive part — run
            # only while some env still has an active (key < 0) pair
            # left at this rank. Keys only grow across ranks, so a
            # skipped rank implies all later ranks skip too; fallback
            # rows (dist = BIG -> act 0, slot-0 gid, zero pos) are
            # never read by the solver.
            m = jnp.min(key, axis=0, keepdims=True)
            i = jnp.min(
                jnp.where(key == m, iota_p, float(P)),
                axis=0, keepdims=True,
            )
            oh = (iota_p == i).astype(f32)  # (P, BE)
            key = jnp.where(oh > 0, _BIG, key)
            for f in range(3):
                slot_ref[s, f] = zero + _BIG
            for f in range(9):
                slot_ref[s, 3 + f] = zero
            slot_ref[s, 12] = zero + gid0

            @pl.when(jnp.min(m) < 0.0)
            def _build(s=s, oh=oh):
                ohe = oh[:, None]
                dsel = jnp.sum(ohe * d_all, axis=0)      # (3, BE)
                wsel = jnp.sum(ohe * wpos_all, axis=0)   # (9, BE)
                for f in range(3):
                    slot_ref[s, f] = dsel[f]
                    for i3 in range(3):
                        slot_ref[s, 3 + 3 * f + i3] = wsel[3 * f + i3]
                slot_ref[s, 12] = jnp.sum(oh * gid_tab, axis=0)

        return slot_ref[...]


    slot = pl.run_scoped(
        scoped,
        pltpu.VMEM((P, 3, *eshape), f32),
        pltpu.VMEM((P, 9, *eshape), f32),
        pltpu.VMEM((k, 13, *eshape), f32),
    )

    out = []
    for s in range(k):
        for f in range(3):
            out.append((
                tuple(slot[s, 3 + 3 * f + i3] for i3 in range(3)),
                slot[s, f],
                slot[s, 12],
            ))
    return out


def collide_env_block(colp: ColPlan, fk: FkResult, tbl_refs, zero, eshape):
    """In-kernel plane collision for one env block.

    Returns (cpos, dist, gid2): per-slot lists — cpos[s] a 3-tuple of env
    rows, dist[s]/gid2[s] env rows — in contact-slot order. Mesh manifold
    walks run through VMEM scratch with conservative-bound skip gates (the
    (V, BE) height maps only run for pairs near the plane anywhere in the
    block); box/cylinder groups with k < P gather the selected pairs'
    pose rows by one-hot sums before their (cheap) manifolds."""
    f32 = jnp.float32
    n = colp.n
    pp_n = dot3(colp.n, colp.pp)
    body_t = {}

    cpos, dist, gid2 = [], [], []
    tbl_i = 0

    for g in colp.groups:
        pairs = g["pairs"]
        P = len(pairs)
        k = g["k"]

        if g["kind"] in ("box", "cyl"):
            poses = [_pair_pose(fk, bp, body_t, n) for bp in pairs]
            if k == P:
                # no selection: static sizes/gids, pairs in pid order
                for bp, (qp, Rb, a) in zip(pairs, poses):
                    if g["kind"] == "box":
                        slots = _box_slots(n, pp_n, qp, Rb, bp["size"],
                                           zero, f32)
                    else:
                        col0 = (Rb[0][0], Rb[1][0], Rb[2][0])
                        axis = (Rb[0][2], Rb[1][2], Rb[2][2])
                        slots = _cyl_slots(n, pp_n, qp, axis, col0,
                                           bp["size"][0], bp["size"][1],
                                           zero)
                    for pos, d in slots:
                        cpos.append(pos)
                        dist.append(d)
                        gid2.append(zero + float(bp["gid"]))
            else:
                # top-k by support key, then narrowphase on the gathered
                # pose rows. Gather table per pair:
                #   box: [qp(3) Rb(9) size(3) gid]         (16 rows)
                #   cyl: [qp(3) axis(3) col0(3) r hl gid]  (12 rows)
                keys, tabs = [], []
                for bp, (qp, Rb, a) in zip(pairs, poses):
                    keys.append(
                        _support_key(g["kind"], n, pp_n, qp, Rb, a,
                                     bp["size"], zero)
                        - g["margin"]
                    )
                    if g["kind"] == "box":
                        rows = (
                            [materialize(qp[i], zero) for i in range(3)]
                            + [materialize(Rb[i][j], zero)
                               for i in range(3) for j in range(3)]
                            + [zero + bp["size"][i] for i in range(3)]
                            + [zero + float(bp["gid"])]
                        )
                    else:
                        rows = (
                            [materialize(qp[i], zero) for i in range(3)]
                            + [materialize(Rb[i][2], zero)
                               for i in range(3)]
                            + [materialize(Rb[i][0], zero)
                               for i in range(3)]
                            + [zero + bp["size"][0], zero + bp["size"][1],
                               zero + float(bp["gid"])]
                        )
                    tabs.append(jnp.stack(rows))
                key = jnp.stack(keys)      # (P, E)
                tab = jnp.stack(tabs)      # (P, T, E)
                iota_p = jax.lax.broadcasted_iota(
                    jnp.int32, (P,) + (1,) * len(eshape), 0
                ).astype(f32)
                for s in range(k):
                    m = jnp.min(key, axis=0, keepdims=True)
                    i = jnp.min(
                        jnp.where(key == m, iota_p, float(P)),
                        axis=0, keepdims=True,
                    )
                    oh = (iota_p == i).astype(f32)
                    key = jnp.where(oh > 0, _BIG, key)
                    meta = jnp.sum(oh[:, None] * tab, axis=0)  # (T, E)
                    qp = (meta[0], meta[1], meta[2])
                    if g["kind"] == "box":
                        Rb = tuple(
                            tuple(meta[3 + 3 * i + j] for j in range(3))
                            for i in range(3)
                        )
                        size = (meta[12], meta[13], meta[14])
                        gidv = meta[15]
                        slots = _box_slots(n, pp_n, qp, Rb, size, zero,
                                           f32)
                    else:
                        axis = (meta[3], meta[4], meta[5])
                        col0 = (meta[6], meta[7], meta[8])
                        gidv = meta[11]
                        slots = _cyl_slots(n, pp_n, qp, axis, col0,
                                           meta[9], meta[10], zero)
                    for pos, d in slots:
                        cpos.append(pos)
                        dist.append(d)
                        gid2.append(gidv)
            continue

        # ---- mesh group: bucketed manifold selection + top-k ----
        my_tbls = tbl_refs[tbl_i:tbl_i + 2 * len(g["subs"])]
        tbl_i += 2 * len(g["subs"])
        for pos, d, gid in _mesh_group_slots(
            g, fk, my_tbls, n, pp_n, zero, eshape, body_t
        ):
            cpos.append(pos)
            dist.append(d)
            gid2.append(gid)

    return cpos, dist, gid2

# ---------------------------------------------------------------------------
# muscle plan + in-kernel tendon/muscle stage (MXU form)
# ---------------------------------------------------------------------------
class MusclePlan:
    """Static tables for the in-kernel tendon + muscle-actuation stage.

    Covers the 92-muscle humanoid family: spatial tendons over site paths
    (no tendon stiffness/damping/limits — they only drive actuation) and
    tendon-transmission actuators with MUSCLE gain/bias/dynamics
    (ops/actuation.py mirrors mju_muscleGain/Bias/Dynamics; that XLA code
    stays the reference). The per-env work is restructured into small MXU
    matmuls against static incidence tables:

      site positions   = SB @ xpos_j + sum_k SBo_k @ xmatcol_jk
      segment ends     = GA/GB @ sites_j
      tendon lengths   = S @ |segment|
      tendon velocity  = sum_j cB_j (WB @ qvel-weighted cdof_j) - (A)
      qfrc_actuator    = sum_j cdof_j (WB' @ g-weighted cB_j) - (A)

    where WA/WB are the per-segment endpoint chain masks (nseg, nv) from
    ops/tendon._tendon_statics and g the per-segment muscle force."""

    def __init__(self, model, conc):
        from ..core.types import (
            BiasType, DisableBit, DynType, GainType, TrnType,
        )
        from .tendon import _tendon_statics

        if model.ntendon == 0:
            raise ValueError("no tendons")
        ts = np.asarray(model.tendon_stiffness)
        td = np.asarray(model.tendon_damping)
        tl = np.asarray(model.tendon_limited)
        if ts.any() or td.any() or tl.any():
            raise ValueError("tendon stiffness/damping/limits unsupported")

        site_ids, GA, GB, S, maskA, maskB = _tendon_statics(model)
        self.site_ids = [int(s) for s in site_ids]
        self.GA = np.asarray(GA, np.float32)
        self.GB = np.asarray(GB, np.float32)
        self.WA = np.asarray(maskA, np.float32)  # (nseg, nv)
        self.WB = np.asarray(maskB, np.float32)

        need = [
            model.site_pos, model.actuator_gear, model.actuator_gainprm,
            model.actuator_biasprm, model.actuator_dynprm,
            model.actuator_lengthrange, model.actuator_acc0,
            model.actuator_ctrlrange, model.actuator_forcerange,
        ]
        vals = [conc(x) for x in need]
        if any(v is None for v in vals):
            raise ValueError("traced muscle leaf")
        (spos, gear, gp, bp, dp, lr, acc0, cr, fr) = [
            np.asarray(v, np.float64) for v in vals
        ]

        # site -> body incidence + local-offset tables (MXU site stage)
        sbody = np.asarray(model.site_bodyid)[site_ids]
        ns, nb = len(site_ids), model.nbody
        self.SB = np.zeros((ns, nb), np.float32)
        self.SBo = np.zeros((3, ns, nb), np.float32)
        for i, (s, b) in enumerate(zip(site_ids, sbody)):
            self.SB[i, b] = 1.0
            for k in range(3):
                self.SBo[k, i, b] = spos[s, k]

        # muscle actuators (TENDON transmission, MUSCLE everything)
        trn = np.asarray(model.actuator_trntype)
        mus = np.nonzero(trn == int(TrnType.TENDON))[0]
        if len(mus) == 0:
            raise ValueError("no tendon actuators")
        for u in mus:
            if (
                int(model.actuator_gaintype[u]) != int(GainType.MUSCLE)
                or int(model.actuator_biastype[u]) != int(BiasType.MUSCLE)
                or int(model.actuator_dyntype[u]) != int(DynType.MUSCLE)
                or int(model.actuator_actadr[u]) < 0
            ):
                raise ValueError("non-muscle tendon actuator")
        self.mus = [int(u) for u in mus]
        # muscle-ordered tendon selection: S_u = P S (nmus, nseg)
        tid = np.asarray(model.actuator_trnid)[mus, 0]
        self.S_u = np.asarray(S, np.float32)[tid]
        self.gear = [float(gear[u, 0]) for u in mus]
        self.act_adr = [int(model.actuator_actadr[u]) for u in mus]
        self.ctrl_lim = [
            (float(cr[u, 0]), float(cr[u, 1]))
            if model.actuator_ctrllimited[u] else None
            for u in mus
        ]
        self.force_lim = [
            (float(fr[u, 0]), float(fr[u, 1]))
            if model.actuator_forcelimited[u] else None
            for u in mus
        ]
        # per-muscle parameter table, one column per muscle (rows are
        # parameters so (W, nmus) slices broadcast against (nmus, 1)):
        # [dyn_tau_act, dyn_tau_deact,
        #  g_range0, g_range1, g_force, g_scale, g_lmin, g_lmax, g_vmax,
        #  g_fpmax, g_fvmax,
        #  b_range0, b_range1, b_force, b_scale, b_lmin, b_lmax, b_vmax,
        #  b_fpmax, b_fvmax, lr0, lr1, acc0, gear]
        rows = []
        for u in mus:
            rows.append(
                [dp[u, 0], dp[u, 1]]
                + [gp[u, i] for i in range(9)]
                + [bp[u, i] for i in range(9)]
                + [lr[u, 0], lr[u, 1], acc0[u], gear[u, 0]]
            )
        self.prm = np.asarray(rows, np.float32)  # (nmus, 24)
        self.nmus = len(mus)
        self.nseg = self.GA.shape[0]
        self.ns = ns
        self.clampctrl = not (
            model.opt.disableflags & DisableBit.CLAMPCTRL
        )
        self.actuation_on = not (
            model.opt.disableflags & DisableBit.ACTUATION
        )

    def table_arrays(self):
        return [
            jnp.asarray(self.SB), jnp.asarray(self.SBo.reshape(-1,
                                                              self.SB.shape[1])),
            jnp.asarray(self.GA), jnp.asarray(self.GB),
            jnp.asarray(self.WA), jnp.asarray(self.WB),
            jnp.asarray(self.WA.T.copy()), jnp.asarray(self.WB.T.copy()),
            jnp.asarray(self.S_u), jnp.asarray(self.S_u.T.copy()),
            jnp.asarray(self.prm),
        ]


N_MUSCLE_TABLES = 11


def _mm(A_ref, x):
    """(m, k) static table ref  @  (k, *E) rows -> (m, *E) on the MXU
    (grouped blocks via _gather_dot's per-sublane-slice dots)."""
    return _gather_dot(A_ref[...], x)


def muscle_env_block(mp: MusclePlan, fk: FkResult, com_l, cdof_tab,
                     qvel, act_row, ctrl_row, refs, zero):
    """In-kernel tendon + muscle stage for one env block.

    qvel: (nv, BE); act_row(u)/ctrl_row(u): env rows for muscle u (by
    actuator order); refs: the MusclePlan.table_arrays() VMEM refs.
    Returns (qfrc_mus (nv, BE), act_dot list of (muscle-order) env rows,
    in mp.act_adr slot order handled by the caller)."""
    (SB_ref, SBo_ref, GA_ref, GB_ref, WA_ref, WB_ref, WAT_ref, WBT_ref,
     Su_ref, SuT_ref, prm_ref) = refs
    f32 = jnp.float32
    nv = len(cdof_tab)
    nb = fk.nbody if hasattr(fk, "nbody") else len(fk.xpos)

    # --- site positions via MXU: sites_j = SB @ xpos_j + sum_k SBo_k @ X_jk
    xpos_rows = [
        jnp.stack([materialize(fk.xpos[b][j], zero) for b in range(nb)])
        for j in range(3)
    ]  # 3 x (nb, BE)
    X = [
        [
            jnp.stack([
                materialize(fk.xmat[b][j][k], zero) for b in range(nb)
            ])
            for k in range(3)
        ]
        for j in range(3)
    ]
    SBo = SBo_ref[...]
    ns = mp.ns
    sites = []
    for j in range(3):
        s = _gather_dot(SB_ref[...], xpos_rows[j])
        for k in range(3):
            s = s + _gather_dot(SBo[k * ns:(k + 1) * ns], X[j][k])
        sites.append(s)  # (ns, *E)

    # --- segments ---
    posA = [_mm(GA_ref, sites[j]) for j in range(3)]
    posB = [_mm(GB_ref, sites[j]) for j in range(3)]
    d = [posB[j] - posA[j] for j in range(3)]
    seg_len = jnp.sqrt(
        jnp.maximum(d[0] * d[0] + d[1] * d[1] + d[2] * d[2], 1e-24)
    )
    inv = 1.0 / jnp.maximum(seg_len, 1e-12)
    vec = [d[j] * inv for j in range(3)]

    # com-referenced site offsets -> per-segment endpoint offsets
    offs = [sites[j] - materialize(com_l[j], zero)[None]
            for j in range(3)]
    offA = [_mm(GA_ref, offs[j]) for j in range(3)]
    offB = [_mm(GB_ref, offs[j]) for j in range(3)]

    def cross_rows(a, b):
        return [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]

    cA = cross_rows(offA, vec)  # 3 x (nseg, BE)
    cB = cross_rows(offB, vec)

    # --- tendon lengths / velocities (muscle order) ---
    len_u = _mm(Su_ref, seg_len)  # (nmus, BE)

    angm = [
        jnp.stack([materialize(cdof_tab[v][j], zero) for v in range(nv)])
        for j in range(6)
    ]  # 6 x (nv, BE)
    qc = [angm[j] * qvel for j in range(6)]  # qvel-weighted cdof columns
    PB = [_mm(WB_ref, qc[j]) for j in range(6)]  # (nseg, BE)
    PA = [_mm(WA_ref, qc[j]) for j in range(6)]
    segvel = None
    for j in range(3):
        t = cB[j] * PB[j] - cA[j] * PA[j] + vec[j] * (PB[3 + j] - PA[3 + j])
        segvel = t if segvel is None else segvel + t
    vel_u = _mm(Su_ref, segvel)  # (nmus, BE)

    # --- muscle FLV force law (rows over muscles; params from the table,
    # one (nmus, 1) column per parameter) ---
    prm = prm_ref[...]
    e_nd = qvel.ndim - 1  # trailing env-block rank (1 lanes, 2 grouped)

    if e_nd == 1:
        def P(i):
            return prm[:, i][:, None]
    else:
        # grouped: a (nmus,) table column reshaped to (nmus, 1, 1) is a
        # lanes->leading cast Mosaic rejects; the params are static, so
        # broadcast them as per-muscle rows instead
        def P(i):
            return jnp.stack([
                zero + float(mp.prm[u, i]) for u in range(mp.nmus)
            ])

    gearc = P(23)
    length = len_u * gearc
    velocity = vel_u * gearc

    ctrl = jnp.stack([ctrl_row(i) for i in range(mp.nmus)])
    if mp.clampctrl:
        lo = jnp.stack([
            zero + (cl[0] if cl is not None else -1e30)
            for cl in mp.ctrl_lim
        ])
        hi = jnp.stack([
            zero + (cl[1] if cl is not None else 1e30)
            for cl in mp.ctrl_lim
        ])
        ctrl = jnp.clip(ctrl, lo, hi)
    act = jnp.stack([act_row(i) for i in range(mp.nmus)])

    # mju_muscleDynamics (tausmooth = 0)
    ctrl_c = jnp.clip(ctrl, 0.0, 1.0)
    act_c = jnp.clip(act, 0.0, 1.0)
    tau_act = P(0) * (0.5 + 1.5 * act_c)
    tau_deact = P(1) / (0.5 + 1.5 * act_c)
    tau = jnp.where(ctrl_c > act, tau_act, tau_deact)
    act_dot = (ctrl_c - act) / jnp.maximum(tau, 1e-15)

    def lnorm(r0, r1):
        l0 = (P(21) - P(20)) / jnp.maximum(r1 - r0, 1e-15)
        return r0 + (length - P(20)) / jnp.maximum(l0, 1e-15), l0

    def bump(ln, lmin, mid, lmax):
        left = 0.5 * (lmin + mid)
        right = 0.5 * (mid + lmax)
        out = jnp.zeros_like(ln)
        x = (ln - lmin) / jnp.maximum(left - lmin, 1e-15)
        out = jnp.where((ln > lmin) & (ln <= left), 0.5 * x * x, out)
        x = (mid - ln) / jnp.maximum(mid - left, 1e-15)
        out = jnp.where((ln > left) & (ln <= mid), 1.0 - 0.5 * x * x, out)
        x = (ln - mid) / jnp.maximum(right - mid, 1e-15)
        out = jnp.where((ln > mid) & (ln <= right), 1.0 - 0.5 * x * x, out)
        x = (lmax - ln) / jnp.maximum(lmax - right, 1e-15)
        out = jnp.where((ln > right) & (ln < lmax), 0.5 * x * x, out)
        return out

    # gain (mju_muscleGain): prm cols 2..10 = gainprm[0..8]
    g_lmin, g_lmax = P(6), P(7)
    g_vmax, g_fvmax = P(8), P(10)
    g_force, g_scale = P(4), P(5)
    acc0 = P(22)
    forceg = jnp.where(
        g_force < 0, g_scale / jnp.maximum(acc0, 1e-15), g_force
    )
    ln_g, l0_g = lnorm(P(2), P(3))
    v = velocity / jnp.maximum(l0_g * g_vmax, 1e-15)
    fl = bump(ln_g, g_lmin, 1.0, g_lmax)
    y = g_fvmax - 1.0
    fv = jnp.where(
        v <= -1.0,
        0.0,
        jnp.where(
            v <= 0.0,
            (v + 1.0) * (v + 1.0),
            jnp.where(
                v <= y,
                g_fvmax - (y - v) * (y - v) / jnp.maximum(y, 1e-15),
                g_fvmax,
            ),
        ),
    )
    gain = -forceg * fl * fv

    # bias (mju_muscleBias): prm cols 11..19 = biasprm[0..8]
    b_lmax, b_fpmax = P(16), P(18)
    b_force, b_scale = P(13), P(14)
    forceb = jnp.where(
        b_force < 0, b_scale / jnp.maximum(acc0, 1e-15), b_force
    )
    ln_b, _ = lnorm(P(11), P(12))
    bmid = 0.5 * (1.0 + b_lmax)
    x_mid = (ln_b - 1.0) / jnp.maximum(bmid - 1.0, 1e-15)
    x_hi = (ln_b - bmid) / jnp.maximum(bmid - 1.0, 1e-15)
    fp = jnp.where(
        ln_b <= 1.0,
        0.0,
        jnp.where(ln_b <= bmid, 0.5 * b_fpmax * x_mid * x_mid,
                  b_fpmax * (0.5 + x_hi)),
    )
    bias = -forceb * fp

    force = gain * act + bias
    if any(flim is not None for flim in mp.force_lim):
        flo = jnp.stack([
            zero + (fl2[0] if fl2 is not None else -1e30)
            for fl2 in mp.force_lim
        ])
        fhi = jnp.stack([
            zero + (fl2[1] if fl2 is not None else 1e30)
            for fl2 in mp.force_lim
        ])
        force = jnp.clip(force, flo, fhi)
    if not mp.actuation_on:
        force = jnp.zeros_like(force)
        act_dot = jnp.zeros_like(act_dot)

    # --- qfrc_actuator = moment' force, via the chain-mask matmuls ---
    g = _mm(SuT_ref, force * gearc)  # (nseg, BE) per-segment force
    qfrc = None
    for j in range(3):
        RB = _mm(WBT_ref, g * cB[j])  # (nv, BE)
        RA = _mm(WAT_ref, g * cA[j])
        TB = _mm(WBT_ref, g * vec[j])
        TA = _mm(WAT_ref, g * vec[j])
        t = angm[j] * (RB - RA) + angm[3 + j] * (TB - TA)
        qfrc = t if qfrc is None else qfrc + t

    return qfrc, act_dot


# ---------------------------------------------------------------------------
# extended collision plan: ALL analytic group types, in-kernel, emitting the
# generic contact pack — the elliptic (A1-class) mega path
# ---------------------------------------------------------------------------
def _norm3(v, zero, eps=1e-15):
    """Normalize a static-or-traced 3-tuple; returns (unit tuple, length)."""
    ln2 = add(mul(v[0], v[0]), mul(v[1], v[1]), mul(v[2], v[2]))
    ln = jnp.sqrt(jnp.maximum(materialize(ln2, zero), 1e-30))
    inv = 1.0 / jnp.maximum(ln, eps)
    return tuple(materialize(v[i], zero) * inv for i in range(3)), ln


def _make_frame_rows(n, zero):
    """mju_makeFrame (collision.make_frame): t1 from the y axis when
    |n_y| < 0.5 else from z, normalized; t2 = n x t1. n: traced-or-static
    unit 3-tuple. Returns 9 rows [n(3), t1(3), t2(3)]."""
    n = tuple(materialize(n[i], zero) for i in range(3))
    use_y = jnp.abs(n[1]) < 0.5
    # t1 = ref - n (n.ref) for ref in {y, z}
    ty = (-n[0] * n[1], 1.0 - n[1] * n[1], -n[2] * n[1])
    tz = (-n[0] * n[2], -n[1] * n[2], 1.0 - n[2] * n[2])
    t1 = tuple(jnp.where(use_y, ty[i], tz[i]) for i in range(3))
    t1, _ = _norm3(t1, zero)
    t2 = cross3(n, t1)
    return [n[0], n[1], n[2], t1[0], t1[1], t1[2],
            materialize(t2[0], zero), materialize(t2[1], zero),
            materialize(t2[2], zero)]


def _frame_axis_rows(n, axis, zero):
    """collision._frame_with_axis: first tangent = axis projected into the
    contact plane (mjc_PlaneCapsule convention), falling back to
    make_frame when axis || n."""
    n = tuple(materialize(n[i], zero) for i in range(3))
    na = materialize(dot3(n, axis), zero)
    t1r = tuple(materialize(sub(axis[i], mul(1.0, n[i] * na)), zero)
                for i in range(3))
    ln2 = t1r[0] ** 2 + t1r[1] ** 2 + t1r[2] ** 2
    ln = jnp.sqrt(jnp.maximum(ln2, 1e-30))
    ok = ln > 1e-8
    t1 = tuple(jnp.where(ok, t1r[i] / jnp.maximum(ln, 1e-15), 0.0)
               for i in range(3))
    t2 = tuple(materialize(x, zero) for x in cross3(n, t1))
    fb = _make_frame_rows(n, zero)
    rows = [n[0], n[1], n[2]]
    for i in range(3):
        rows.append(jnp.where(ok, t1[i], fb[3 + i]))
    for i in range(3):
        rows.append(jnp.where(ok, t2[i], fb[6 + i]))
    return rows


def _sphere_sphere_slot(c1, r1, c2, r2, zero):
    """collision._sphere_sphere_core on scalars. Returns (pos, dist,
    frame_rows)."""
    d = sub3(tuple(materialize(x, zero) for x in c2),
             tuple(materialize(x, zero) for x in c1))
    n, ln = _norm3(d, zero)
    dist = ln - materialize(add(r1, r2), zero)
    pos = tuple(
        0.5 * (materialize(c1[i], zero) + n[i] * materialize(r1, zero)
               + materialize(c2[i], zero) - n[i] * materialize(r2, zero))
        for i in range(3)
    )
    return pos, dist, _make_frame_rows(n, zero)


def _sphere_capsule_slot(c1, r1, qp, axis, hl, r2, zero):
    """collision.sphere_capsule: clamp the sphere center onto the capsule
    segment, then sphere-sphere against that point."""
    t = materialize(dot3(sub3(c1, qp), axis), zero)
    hlv = materialize(hl if not is_static(hl) else hl + 0.0, zero)
    t = jnp.clip(t, -hlv, hlv)
    c2 = tuple(
        materialize(qp[i], zero) + materialize(axis[i], zero) * t
        for i in range(3)
    )
    return _sphere_sphere_slot(c1, r1, c2, r2, zero)


def _sphere_box_slot(pp, r, qp, Rb, size, zero):
    """collision.sphere_box on scalars: sphere (pp, r) vs box (qp, Rb,
    size). r/size may be static floats or traced rows (top-k gathered)."""
    def mt(x):
        return materialize(x, zero)

    rel = sub3(pp, qp)
    loc = tuple(
        mt(add(mul(Rb[0][i], rel[0]), mul(Rb[1][i], rel[1]),
               mul(Rb[2][i], rel[2])))
        for i in range(3)
    )
    sv = tuple(size[i] if is_static(size[i]) else mt(size[i])
               for i in range(3))
    clamped = tuple(jnp.clip(loc[i], -sv[i], sv[i]) for i in range(3))
    inside = (
        (jnp.abs(loc[0]) < sv[0]) & (jnp.abs(loc[1]) < sv[1])
        & (jnp.abs(loc[2]) < sv[2])
    )
    gap = tuple(mt(sub(sv[i], jnp.abs(loc[i]))) for i in range(3))
    m = jnp.minimum(jnp.minimum(gap[0], gap[1]), gap[2])
    is0 = gap[0] == m
    is1 = (gap[1] == m) & (~is0)
    sel = (is0, is1, ~(is0 | is1))
    closest = tuple(
        jnp.where(
            inside,
            jnp.where(sel[i], jnp.sign(loc[i]) * sv[i], loc[i]),
            clamped[i],
        )
        for i in range(3)
    )
    cw = tuple(
        mt(qp[i])
        + mt(add(mul(Rb[i][0], closest[0]), mul(Rb[i][1], closest[1]),
                 mul(Rb[i][2], closest[2])))
        for i in range(3)
    )
    d = tuple(cw[i] - mt(pp[i]) for i in range(3))
    n_out, ln = _norm3(d, zero)
    n = tuple(jnp.where(inside, -n_out[i], n_out[i]) for i in range(3))
    rr = r if is_static(r) else mt(r)
    dist = jnp.where(inside, -(ln + rr), ln - rr)
    pos = tuple(0.5 * (mt(pp[i]) + n[i] * rr + cw[i]) for i in range(3))
    return pos, dist, _make_frame_rows(n, zero)


def _seg_seg_closest_sc(p1, d1, l1, p2, d2, l2, zero):
    """collision._seg_seg_closest on scalars (centered params in ±l)."""
    r = sub3(tuple(materialize(x, zero) for x in p1),
             tuple(materialize(x, zero) for x in p2))
    a = materialize(dot3(d1, d1), zero)
    e = materialize(dot3(d2, d2), zero)
    f = materialize(dot3(d2, r), zero)
    c = materialize(dot3(d1, r), zero)
    b = materialize(dot3(d1, d2), zero)
    denom = a * e - b * b
    l1v = materialize(l1 * 1.0 if not is_static(l1) else l1, zero)
    l2v = materialize(l2 * 1.0 if not is_static(l2) else l2, zero)
    s = jnp.where(
        jnp.abs(denom) > 1e-12,
        (b * f - c * e) / jnp.maximum(denom, 1e-15), 0.0,
    )
    s = jnp.clip(s, -l1v, l1v)
    t = (b * s + f) / jnp.maximum(e, 1e-15)
    t_cl = jnp.clip(t, -l2v, l2v)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-15), -l1v, l1v)
    c1 = tuple(materialize(p1[i], zero) + s * materialize(d1[i], zero)
               for i in range(3))
    c2 = tuple(materialize(p2[i], zero) + t_cl * materialize(d2[i], zero)
               for i in range(3))
    return c1, c2


class ColPlanExt:
    """Static tables for in-kernel collision over ALL the analytic group
    types (plane-sphere/capsule/cylinder/box + sphere-sphere/capsule/box +
    capsule-capsule), with per-group UNIFORM pair parameters — the
    elliptic (A1-class) mega path. `collide_env_block_ext` consumes this
    and emits the generic contact pack (the same (ncon, 29) layout
    `fused_constraint` builds on the XLA side), so the constraint row
    build is unchanged; only the HBM round-trip and env-major relayout of
    the staged driver disappear (~75 ms of the 219 ms A1 step at 4096
    envs was XLA collision + pack fusions).

    Slot order, midphase keys and tie-breaks replicate
    ops/collision.collision exactly (groups in contact_groups order;
    plane groups ranked by exact support distance, self groups by
    center-distance minus static bounding radii, both minus pair margin;
    lax.top_k's first-index tie-break)."""

    _SUP = {
        ("plane", "sphere"), ("plane", "capsule"), ("plane", "cylinder"),
        ("plane", "box"), ("plane", "mesh"), ("sphere", "sphere"),
        ("sphere", "capsule"), ("sphere", "box"), ("capsule", "capsule"),
    }

    def __init__(self, model, conc):
        from ..core.types import GeomType
        from .collision import contact_groups

        _T = {
            int(GeomType.PLANE): "plane", int(GeomType.SPHERE): "sphere",
            int(GeomType.CAPSULE): "capsule",
            int(GeomType.CYLINDER): "cylinder", int(GeomType.BOX): "box",
            int(GeomType.MESH): "mesh",
        }
        from ..core.types import ConeType

        groups, total, _ = contact_groups(model)
        # friction components in the pack must match the consumer's
        # plan.nfric (5 for elliptic cones, 2 for pyramidal)
        self.nfric = (
            5 if int(model.opt.cone) == int(ConeType.ELLIPTIC) else 2
        )
        need = [
            model.geom_pos, model.geom_quat, model.geom_size,
            model.pair_margin, model.pair_gap, model.pair_solref,
            model.pair_solimp, model.pair_friction, model.body_invweight0,
        ]
        vals = [conc(x) for x in need]
        if any(v is None for v in vals):
            raise ValueError("traced collision leaf")
        (gpos, gquat, gsize, pmarg, pgap, psref, psimp, pfric, biw) = [
            np.asarray(v, np.float64) for v in vals
        ]
        gbody = np.asarray(model.geom_bodyid)
        gtype = np.asarray(model.geom_type)

        # static bounding radii (matches collision._rbound, static leaves)
        rb = np.zeros(model.ngeom)
        for gid in range(model.ngeom):
            t = _T.get(int(gtype[gid]))
            s = gsize[gid]
            if t == "sphere":
                rb[gid] = s[0]
            elif t == "capsule":
                rb[gid] = s[0] + s[1]
            elif t == "cylinder":
                rb[gid] = float(np.hypot(s[0], s[1]))
            elif t == "box":
                rb[gid] = float(np.linalg.norm(s))

        from .collision import classic_ncon

        self.groups = []
        # convex GJK/EPA tail groups stay on the staged driver (see
        # ColPlan); the ext plan sizes to the classic prefix
        self.ncon = classic_ncon(model)
        plane_gid = None
        for g in groups:
            if g.convex:
                continue
            t1, t2 = _T.get(int(g.t1)), _T.get(int(g.t2))
            if (t1, t2) not in self._SUP:
                raise ValueError(f"unsupported ext group {t1}-{t2}")
            pid = np.asarray(g.pair_ids)
            for arr in (psref, psimp, pmarg, pgap, pfric):
                if not np.all(arr[pid] == arr[pid[0]]):
                    raise ValueError("non-uniform pair params in group")
            pg1 = np.asarray(model.pair_geom1)[pid]
            pg2 = np.asarray(model.pair_geom2)[pid]
            if t1 == "plane":
                if plane_gid is None:
                    plane_gid = int(pg1[0])
                if not np.all(pg1 == plane_gid):
                    raise ValueError("multiple planes")
                if int(gbody[plane_gid]) != 0:
                    raise ValueError("plane not on world body")

            def side(gid):
                return dict(
                    gid=int(gid), body=int(gbody[gid]),
                    gpos=tuple(float(x) for x in gpos[gid]),
                    gquat=tuple(float(x) for x in gquat[gid]),
                    size=tuple(float(x) for x in gsize[gid]),
                    rb=float(rb[gid]),
                    iw=float(biw[gbody[gid], 0]),
                )

            p0 = pid[0]
            gdesc = dict(
                kind=(t1, t2), k=int(g.k), slots=int(g.slots),
                condim=int(g.condim),
                margin=float(pmarg[p0]),
                incl=float(pmarg[p0] - pgap[p0]),
                solref=[float(x) for x in psref[p0]],
                solimp=[float(x) for x in psimp[p0]],
                fric5=[float(x) for x in pfric[p0]],
            )
            if t2 == "mesh":
                # bucketed hull tables + bucket-major pair order (shared
                # with the plane-only mega path)
                import os as _os

                from .pallas_collision import pack_plane_mesh_buckets

                if g.slots != 3:
                    raise ValueError("plane-mesh slots != 3")
                vcap = int(_os.environ.get("LMT_MESH_VCAP", "5632"))
                packed = pack_plane_mesh_buckets(
                    model, pid, vcap, with_ids=True
                )
                if packed is None:
                    raise ValueError("mesh pack failed")
                subs, border = packed
                bpid = pid[border]
                gdesc["subs"] = subs
                gdesc["pairs"] = [
                    dict(gid=int(g2b), body=int(gbody[g2b]),
                         gpos=tuple(float(x) for x in gpos[g2b]),
                         gquat=tuple(float(x) for x in gquat[g2b]),
                         iw=float(biw[gbody[g2b], 0]))
                    for g2b in np.asarray(model.pair_geom2)[bpid]
                ]
            else:
                gdesc["pairs"] = [
                    dict(g1=side(a), g2=side(b))
                    for a, b in zip(pg1, pg2)
                ]
            self.groups.append(gdesc)

        # static world plane frame (when any plane group exists)
        self.plane_gid = plane_gid
        if plane_gid is not None:
            w, xq, yq, zq = (float(v) for v in gquat[plane_gid])
            qn = (w * w + xq * xq + yq * yq + zq * zq) ** 0.5
            w, xq, yq, zq = w / qn, xq / qn, yq / qn, zq / qn
            self.n = (
                2 * (xq * zq + w * yq),
                2 * (yq * zq - w * xq),
                1 - 2 * (xq * xq + yq * yq),
            )
            self.pp_n = float(np.dot(
                np.asarray(self.n), gpos[plane_gid]
            ))
        else:
            self.n = (0.0, 0.0, 1.0)
            self.pp_n = 0.0

    @property
    def n_mesh_tables(self):
        return 2 * sum(
            len(g["subs"]) for g in self.groups if g["kind"][1] == "mesh"
        )

    def mesh_table_arrays(self):
        out = []
        for g in self.groups:
            if g["kind"][1] != "mesh":
                continue
            for ids, tbl_t, marg, D in g["subs"]:
                tbl = np.frombuffer(tbl_t[0], np.float32).reshape(tbl_t[1])
                out.append(jnp.asarray(tbl))
                out.append(jnp.asarray(
                    np.ascontiguousarray(tbl[:, 0:3].transpose(0, 2, 1))
                ))
        return out

    def pack_width(self):
        # pos(3) frame(9) dist incl fric(nfric) solref(2) solimp(5) iw
        # bid1 bid2
        return 24 + self.nfric


def _geom_pose(fk, sd, cache):
    """World pose of one geom side: (center qp, rotation Rb)."""
    key = (sd["body"], sd["gpos"], sd["gquat"])
    if key in cache:
        return cache[key]
    b = sd["body"]
    Rg = quat_to_mat(sd["gquat"])
    Rb = mat_mul(fk.xmat[b], Rg) if sd["gquat"] != _IDENT_Q else fk.xmat[b]
    qp = (
        vadd(fk.xpos[b], mat_vec(fk.xmat[b], sd["gpos"]))
        if sd["gpos"] != (0.0, 0.0, 0.0) else fk.xpos[b]
    )
    cache[key] = (qp, Rb)
    return qp, Rb


def collide_env_block_ext(colp: ColPlanExt, fk, tbl_refs, zero, eshape):
    """In-kernel collision for the extended (elliptic-mega) plan.

    Returns (pack, gid1, gid2): pack a (ncon, 29, *E) array in the
    generic contact layout, gid1/gid2 per-slot geom-id env rows (for the
    contact-meta outputs the GRF readout consumes)."""
    f32 = jnp.float32
    n = colp.n
    pp_n = colp.pp_n
    pose_cache = {}
    plane_frame = _make_frame_rows(n, zero)

    slot_rows = []   # per slot: list of 29 static-or-traced scalars
    gid1_rows, gid2_rows = [], []
    tbl_i = 0
    body_t = {}

    def mt(x):
        return materialize(x, zero)

    def emit(g, pos, dist, frame9, gid1, gid2, iw, bid1, bid2):
        rows = [pos[0], pos[1], pos[2], *frame9, dist, g["incl"],
                *g["fric5"][:colp.nfric], *g["solref"], *g["solimp"],
                iw, bid1, bid2]
        slot_rows.append([mt(r) for r in rows])
        gid1_rows.append(mt(gid1))
        gid2_rows.append(mt(gid2))

    def emit_dummy(g):
        """Inactive filler slot (dist BIG)."""
        emit(g, (0.0, 0.0, 0.0), _BIG, plane_frame, -1.0, -1.0, 0.0,
             0.0, 0.0)

    for g in colp.groups:
        t1, t2 = g["kind"]
        pairs = g["pairs"]
        P, k = len(pairs), g["k"]

        if t2 == "mesh":
            # bucketed manifold machinery shared with the plane-only mega
            # path; traced gid -> body/iw via one-hot sums over the
            # group's candidate geoms
            my_tbls = tbl_refs[tbl_i:tbl_i + 2 * len(g["subs"])]
            tbl_i += 2 * len(g["subs"])
            gmap = {float(pr["gid"]): pr for pr in pairs}
            pf = _make_frame_rows(n, zero)
            for pos, d, gidv in _mesh_group_slots(
                dict(g, kind="mesh"), fk, my_tbls, n, pp_n, zero, eshape,
                body_t,
            ):
                bid2 = zero
                iwv = zero
                for gf, pr in gmap.items():
                    hit = (gidv == gf).astype(f32)
                    bid2 = bid2 + hit * float(pr["body"])
                    iwv = iwv + hit * pr["iw"]
                emit(g, pos, d, pf, float(colp.plane_gid), gidv, iwv,
                     0.0, bid2)
            continue

        # ---- per-pair values (direct mode) or gather rows (top-k) ----
        def pair_vals(pr):
            """Static-or-traced value dict for one pair."""
            v = {}
            if t1 == "plane":
                qp, Rb = _geom_pose(fk, pr["g2"], pose_cache)
                v.update(qp=qp, Rb=Rb, size=pr["g2"]["size"])
                v.update(gid1=float(colp.plane_gid), bid1=0.0,
                         gid2=float(pr["g2"]["gid"]),
                         bid2=float(pr["g2"]["body"]),
                         iw=pr["g2"]["iw"])
            else:
                p1, R1 = _geom_pose(fk, pr["g1"], pose_cache)
                p2, R2 = _geom_pose(fk, pr["g2"], pose_cache)
                v.update(p1=p1, R1=R1, s1=pr["g1"]["size"],
                         p2=p2, R2=R2, s2=pr["g2"]["size"])
                v.update(gid1=float(pr["g1"]["gid"]),
                         bid1=float(pr["g1"]["body"]),
                         gid2=float(pr["g2"]["gid"]),
                         bid2=float(pr["g2"]["body"]),
                         iw=pr["g1"]["iw"] + pr["g2"]["iw"])
            return v

        def key_of(pr, v):
            """Midphase key (collision.py:776-803), minus group margin."""
            if t1 == "plane":
                qp, Rb = v["qp"], v["Rb"]
                sz = v["size"]
                h = sub(dot3(n, qp), pp_n)
                if t2 == "sphere":
                    supp = sz[0]
                elif t2 == "capsule":
                    ax = (Rb[0][2], Rb[1][2], Rb[2][2])
                    ca = jnp.abs(mt(dot3(n, ax)))
                    supp = add(mul(sz[1], ca), sz[0])
                elif t2 == "cylinder":
                    supp = None  # via _support_key
                    return mt(sub(
                        _support_key("cyl", n, pp_n, qp, Rb, None, sz,
                                     zero),
                        g["margin"],
                    ))
                else:  # box
                    return mt(sub(
                        _support_key("box", n, pp_n, qp, Rb, None, sz,
                                     zero),
                        g["margin"],
                    ))
                return mt(sub(sub(h, supp), g["margin"]))
            d = sub3(v["p2"], v["p1"])
            ln = jnp.sqrt(jnp.maximum(mt(dot3(d, d)), 1e-30))
            return ln - (pr["g1"]["rb"] + pr["g2"]["rb"] + g["margin"])

        def slots_of(v):
            """List of (pos, dist, frame9) slots for one pair's values."""
            if t1 == "plane":
                qp, Rb, sz = v["qp"], v["Rb"], v["size"]
                if t2 == "sphere":
                    h = mt(sub(dot3(n, qp), pp_n))
                    dist = h - (sz[0] if is_static(sz[0]) else mt(sz[0]))
                    depth = (
                        (sz[0] if is_static(sz[0]) else mt(sz[0]))
                        + 0.5 * dist
                    )
                    pos = tuple(mt(qp[i]) - n[i] * depth for i in range(3))
                    return [(pos, dist, plane_frame)]
                if t2 == "capsule":
                    ax = (Rb[0][2], Rb[1][2], Rb[2][2])
                    fr = _frame_axis_rows(n, ax, zero)
                    out = []
                    for sgn in (1.0, -1.0):
                        c = vadd(qp, vscale(ax, mul(sgn, sz[1])))
                        h = mt(sub(dot3(n, c), pp_n))
                        r0 = sz[0] if is_static(sz[0]) else mt(sz[0])
                        dist = h - r0
                        depth = r0 + 0.5 * dist
                        pos = tuple(mt(c[i]) - n[i] * depth
                                    for i in range(3))
                        out.append((pos, dist, fr))
                    return out
                if t2 == "cylinder":
                    col0 = (Rb[0][0], Rb[1][0], Rb[2][0])
                    ax = (Rb[0][2], Rb[1][2], Rb[2][2])
                    ps = _cyl_slots(n, pp_n, qp, ax, col0, sz[0], sz[1],
                                    zero)
                    return [(p, d, plane_frame) for p, d in ps]
                # box
                ps = _box_slots(n, pp_n, qp, Rb, sz, zero, f32)
                return [(p, d, plane_frame) for p, d in ps]
            if (t1, t2) == ("sphere", "sphere"):
                pos, dist, fr = _sphere_sphere_slot(
                    v["p1"], v["s1"][0], v["p2"], v["s2"][0], zero
                )
                return [(pos, dist, fr)]
            if (t1, t2) == ("sphere", "capsule"):
                ax2 = (v["R2"][0][2], v["R2"][1][2], v["R2"][2][2])
                pos, dist, fr = _sphere_capsule_slot(
                    v["p1"], v["s1"][0], v["p2"], ax2, v["s2"][1],
                    v["s2"][0], zero
                )
                return [(pos, dist, fr)]
            if (t1, t2) == ("sphere", "box"):
                pos, dist, fr = _sphere_box_slot(
                    v["p1"], v["s1"][0], v["p2"], v["R2"], v["s2"], zero
                )
                return [(pos, dist, fr)]
            # capsule-capsule: 2 slots, second inactive (collision.py:647)
            ax1 = (v["R1"][0][2], v["R1"][1][2], v["R1"][2][2])
            ax2 = (v["R2"][0][2], v["R2"][1][2], v["R2"][2][2])
            c1, c2 = _seg_seg_closest_sc(
                v["p1"], ax1, v["s1"][1], v["p2"], ax2, v["s2"][1], zero
            )
            pos, dist, fr = _sphere_sphere_slot(
                c1, v["s1"][0], c2, v["s2"][0], zero
            )
            return [(pos, dist, fr), ((0.0, 0.0, 0.0), _BIG, fr)]

        if k == P:
            for pr in pairs:
                v = pair_vals(pr)
                for pos, dist, fr in slots_of(v):
                    emit(g, pos, dist, fr, v["gid1"], v["gid2"], v["iw"],
                         v["bid1"], v["bid2"])
            continue

        # ---- top-k: gather pair value rows by rank one-hots ----
        # row schema per kind (traced after selection)
        if t1 == "plane":
            schema = (
                ["qp0", "qp1", "qp2"]
                + (["ax0", "ax1", "ax2"] if t2 in ("capsule", "cylinder")
                   else [])
                + (["R%d%d" % (i, j) for i in range(3) for j in range(3)]
                   if t2 == "box" else [])
                + ["sz0", "sz1", "sz2"]
            )
        else:
            schema = ["p10", "p11", "p12", "p20", "p21", "p22",
                      "s10", "s11", "s20", "s21"]
            if t2 == "capsule":
                schema += ["a20", "a21", "a22"]
            if t1 == "capsule":
                schema += ["a10", "a11", "a12"]
            if t2 == "box":
                schema += ["s22"]
                schema += ["R%d%d" % (i, j)
                           for i in range(3) for j in range(3)]
        schema += ["gid1", "gid2", "iw", "bid1", "bid2"]

        keys, tabs = [], []
        for pr in pairs:
            v = pair_vals(pr)
            keys.append(key_of(pr, v))
            row = {}
            if t1 == "plane":
                row.update(qp0=v["qp"][0], qp1=v["qp"][1], qp2=v["qp"][2],
                           sz0=v["size"][0], sz1=v["size"][1],
                           sz2=v["size"][2])
                if t2 in ("capsule", "cylinder"):
                    Rb = v["Rb"]
                    row.update(ax0=Rb[0][2], ax1=Rb[1][2], ax2=Rb[2][2])
                if t2 == "box":
                    for i in range(3):
                        for j in range(3):
                            row["R%d%d" % (i, j)] = v["Rb"][i][j]
            else:
                row.update(p10=v["p1"][0], p11=v["p1"][1], p12=v["p1"][2],
                           p20=v["p2"][0], p21=v["p2"][1], p22=v["p2"][2],
                           s10=v["s1"][0], s11=v["s1"][1],
                           s20=v["s2"][0], s21=v["s2"][1])
                if t2 == "box":
                    row["s22"] = v["s2"][2]
                if t2 == "capsule":
                    R2 = v["R2"]
                    row.update(a20=R2[0][2], a21=R2[1][2], a22=R2[2][2])
                if t1 == "capsule":
                    R1 = v["R1"]
                    row.update(a10=R1[0][2], a11=R1[1][2], a12=R1[2][2])
                if t2 == "box":
                    for i in range(3):
                        for j in range(3):
                            row["R%d%d" % (i, j)] = v["R2"][i][j]
            row.update(gid1=v["gid1"], gid2=v["gid2"], iw=v["iw"],
                       bid1=v["bid1"], bid2=v["bid2"])
            tabs.append(jnp.stack([mt(row[name]) for name in schema]))

        key = jnp.stack(keys)      # (P, E)
        tab = jnp.stack(tabs)      # (P, T, E)
        iota_p = jax.lax.broadcasted_iota(
            jnp.int32, (P,) + (1,) * len(eshape), 0
        ).astype(f32)
        for _rank in range(k):
            # sequential strict-< argmin (first index wins ties, matching
            # lax.top_k). NO value-equality against a separately reduced
            # min: XLA may duplicate the key subgraph into different
            # fusions whose f32 roundings differ (excess precision), so
            # `key == jnp.min(key)` can miss by an ulp and select nothing
            # (observed under pallas interpret on CPU; the sequential scan
            # keeps selection within one value chain).
            best = key[0]
            ib = jnp.zeros_like(best)
            for pi_ in range(1, P):
                cond = key[pi_] < best
                best = jnp.where(cond, key[pi_], best)
                ib = jnp.where(cond, float(pi_), ib)
            oh = (iota_p == ib[None]).astype(f32)
            key = jnp.where(oh > 0, _BIG, key)
            meta = jnp.sum(oh[:, None] * tab, axis=0)  # (T, E)
            mv = {name: meta[ci] for ci, name in enumerate(schema)}
            if t1 == "plane":
                v = dict(
                    qp=(mv["qp0"], mv["qp1"], mv["qp2"]),
                    size=(mv["sz0"], mv["sz1"], mv["sz2"]),
                )
                if t2 in ("capsule", "cylinder"):
                    ax = (mv["ax0"], mv["ax1"], mv["ax2"])
                    # only columns 0/2 of Rb are consumed downstream;
                    # column 0 (cylinder degenerate fallback) uses a
                    # plane tangent (any unit vector ⊥ nothing specific
                    # is acceptable only for the axis||n fallback; use
                    # the static plane t1 direction)
                    t1dir = (plane_frame[3], plane_frame[4],
                             plane_frame[5])
                    v["Rb"] = (
                        (t1dir[0], 0.0, ax[0]),
                        (t1dir[1], 0.0, ax[1]),
                        (t1dir[2], 0.0, ax[2]),
                    )
                if t2 == "box":
                    v["Rb"] = tuple(
                        tuple(mv["R%d%d" % (i2, j2)] for j2 in range(3))
                        for i2 in range(3)
                    )
            else:
                v = dict(
                    p1=(mv["p10"], mv["p11"], mv["p12"]),
                    p2=(mv["p20"], mv["p21"], mv["p22"]),
                    s1=(mv["s10"], mv["s11"]),
                    s2=(mv["s20"], mv["s21"]),
                )
                if t2 == "capsule":
                    v["R2"] = (
                        (0.0, 0.0, mv["a20"]),
                        (0.0, 0.0, mv["a21"]),
                        (0.0, 0.0, mv["a22"]),
                    )
                if t1 == "capsule":
                    v["R1"] = (
                        (0.0, 0.0, mv["a10"]),
                        (0.0, 0.0, mv["a11"]),
                        (0.0, 0.0, mv["a12"]),
                    )
                if t2 == "box":
                    v["R2"] = tuple(
                        tuple(mv["R%d%d" % (i2, j2)] for j2 in range(3))
                        for i2 in range(3)
                    )
                if t2 == "box":
                    v["s2"] = (mv["s20"], mv["s21"], mv["s22"])
            for pos, dist, fr in slots_of(v):
                emit(g, pos, dist, fr, mv["gid1"], mv["gid2"], mv["iw"],
                     mv["bid1"], mv["bid2"])

    assert len(slot_rows) == colp.ncon, (len(slot_rows), colp.ncon)
    pack = jnp.stack([jnp.stack(rows) for rows in slot_rows])
    return pack, gid1_rows, gid2_rows
