"""Domain randomization — batched parameter resampling on Model leaves.

Redesign of reference `loco_mujoco/utils/domain_randomization.py` (C10): the
reference edits the MJCF XML and RECOMPILES an MjModel per episode, fanned
out over a multiprocessing worker pool (:191-227, 535-556). Here the
randomized physics parameters are numeric leaves of the Model pytree, so a
fresh sample is a handful of gather/scatter ops inside the jitted reset —
thousands of envs re-randomize per episode with no recompilation at all
(SURVEY.md §2 parallelism inventory, item 1).

Config format and semantics follow the reference YAML schema
(reference :244-294):

- ``Default`` section with an optional ``exclude`` joint list and
  ``Joints`` / ``Geoms`` / ``Inertial`` subsections applied to every object
  of that kind; an object-specific section entry *overrides* the default
  (the reference dispatches specific-elif-default, :267-294). ``exclude``
  only filters the Joints default, as in the reference (:272-274).
- ``Joints``: damping / stiffness / frictionloss / armature
  (set_joint_conf, :299-377).
- ``Geoms``: keyed by BODY name, applied to each geom of that body
  (reference iterates ``bh.geom``, :286-293); friction (3-vector),
  mass, density (set_geom_conf, :386-455).
- ``Inertial``: keyed by body name; mass, diaginertia, fullinertia
  (set_inertial_conf, :458-514). diaginertia/fullinertia accept only
  ``uniform_range_delta``; fullinertia randomizes the SINGULAR VALUES of
  the upper-triangular inertia matrix (SVD rule, :487-501) and recomposes.
- Distributions: ``sigma`` — N(base, sigma) clipped to >= 0;
  ``uniform_range`` — U(lo, hi); ``uniform_range_delta`` — U(base-d,
  base+d) with positivity asserted at build time. (The reference draws
  normal() where it documents uniform for some joint uniform_range
  branches, :342-347 — an upstream bug we do not reproduce.)

Geom mass/density: in MuJoCo these only affect the compiled model when the
body's inertial is geom-derived (no explicit <inertial> element —
mjCBody::MakeInertial). The reference likewise asserts the attribute is
explicit in the XML (:407-409, 442-444). Here the body's (mass, ipos,
inertia, iquat) are recomputed in-trace from per-geom constants
(unit-density volume, center, unit-mass inertia tensor in the body frame)
measured at build time by compiling a one-geom micro-model with MuJoCo
itself — exactly the compiler's own shape formulas, no transcription.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..core.types import Model

# distribution codes
GAUSS = 0
UNIFORM = 1
UNIFORM_DELTA = 2

_JOINT_FIELDS = {
    "damping": ("dof_damping", "dof"),
    "stiffness": ("jnt_stiffness", "jnt"),
    "frictionloss": ("dof_frictionloss", "dof"),
    "armature": ("dof_armature", "dof"),
}


def _dist_params(param: dict, base, name: str, prop: str):
    """Map one YAML distribution spec to (code, p1, p2) arrays broadcast to
    base's shape. Validates like the reference's check_* helpers."""
    base = np.atleast_1d(np.asarray(base, dtype=np.float64))
    keys = {"sigma", "uniform_range", "uniform_range_delta"} & set(param)
    if len(keys) != 1:
        raise ValueError(
            f"exactly one distribution must be given for {name}.{prop}, "
            f"found {sorted(param)}"
        )
    if "sigma" in param:
        sig = np.broadcast_to(
            np.asarray(param["sigma"], dtype=np.float64), base.shape
        )
        return GAUSS, sig, np.zeros_like(base)
    if "uniform_range" in param:
        lo, hi = param["uniform_range"]
        if not hi > lo:
            raise ValueError(f"uniform_range for {name}.{prop}: high <= low")
        if lo < 0.0:
            raise ValueError(f"uniform_range for {name}.{prop}: low < 0")
        return (
            UNIFORM,
            np.full_like(base, float(lo)),
            np.full_like(base, float(hi)),
        )
    d = np.broadcast_to(
        np.asarray(param["uniform_range_delta"], dtype=np.float64),
        base.shape,
    )
    if np.any(d != 0.0) and np.any(base - d <= 0.0):
        raise ValueError(
            f"uniform_range_delta for {name}.{prop} exceeds the base value "
            f"({base}); negative physics parameters are not allowed"
        )
    return UNIFORM_DELTA, d.copy(), np.zeros_like(base)


def _micro_geom_constants(gtype: int, size, quat, density: float):
    """Compile a one-geom micro-model to read MuJoCo's own shape constants:
    (unit-density mass, unit-mass inertia tensor in the geom's parent
    frame). The compiler's formulas (mjCGeom::SetInertia) are thereby used
    verbatim instead of transcribed."""
    import mujoco

    type_names = {
        mujoco.mjtGeom.mjGEOM_SPHERE: "sphere",
        mujoco.mjtGeom.mjGEOM_CAPSULE: "capsule",
        mujoco.mjtGeom.mjGEOM_ELLIPSOID: "ellipsoid",
        mujoco.mjtGeom.mjGEOM_CYLINDER: "cylinder",
        mujoco.mjtGeom.mjGEOM_BOX: "box",
    }
    name = type_names.get(mujoco.mjtGeom(gtype))
    if name is None:
        raise ValueError(
            f"geom mass/density randomization supports primitive geoms "
            f"only (got type {gtype}); mesh-geom bodies need explicit "
            f"inertials"
        )
    spec = mujoco.MjSpec()
    b = spec.worldbody.add_body(name="b")
    g = b.add_geom(type=getattr(mujoco.mjtGeom, f"mjGEOM_{name.upper()}"))
    g.size = np.asarray(size, dtype=np.float64)
    g.quat = np.asarray(quat, dtype=np.float64)
    g.density = float(density)
    b.add_joint(type=mujoco.mjtJoint.mjJNT_SLIDE)  # keep body non-static
    m = spec.compile()
    mass = float(m.body_mass[1])
    # inertia tensor about the geom center, in the parent frame
    q = np.asarray(m.body_iquat[1])
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    inertia_unit = (R * np.asarray(m.body_inertia[1])) @ R.T / mass
    return mass / float(density), inertia_unit  # unit-density volume, K


def _mat_to_quat_np_like(m):
    """Traced 3x3 rotation matrix -> quaternion (w, x, y, z), branchless
    (Shepperd's method via jnp.where), valid under vmap."""
    t = jnp.trace(m)
    d = jnp.diagonal(m)
    cand = jnp.stack([t, d[0], d[1], d[2]])
    case = jnp.argmax(cand)

    def q_from(k):
        if k == 0:
            r = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12))
            return 0.5 * jnp.stack([
                r,
                (m[2, 1] - m[1, 2]) / r,
                (m[0, 2] - m[2, 0]) / r,
                (m[1, 0] - m[0, 1]) / r,
            ])
        i = k - 1
        j, l = (i + 1) % 3, (i + 2) % 3
        r = jnp.sqrt(jnp.maximum(1.0 + m[i, i] - m[j, j] - m[l, l], 1e-12))
        q = [None] * 4
        q[0] = (m[l, j] - m[j, l]) / r
        q[1 + i] = r
        q[1 + j] = (m[j, i] + m[i, j]) / r
        q[1 + l] = (m[l, i] + m[i, l]) / r
        return 0.5 * jnp.stack(q)

    qs = jnp.stack([q_from(0), q_from(1), q_from(2), q_from(3)])
    q = qs[case]
    return q / jnp.linalg.norm(q)


class DomainRandomizationHandler:
    """Build-time: compile the YAML into static scatter plans; run-time
    (traced, per env under vmap): ``sample(rng) -> dict`` then
    ``apply(model, samples) -> model``."""

    def __init__(self, model: Model, config_path: str):
        with open(config_path) as fh:
            conf = yaml.safe_load(fh) or {}

        jmap = model.names["joint"]
        bmap = model.names["body"]

        default = conf.get("Default", {}) or {}
        exclude = set(default.get("exclude", []) or [])
        sec_joints = conf.get("Joints", {}) or {}
        sec_geoms = conf.get("Geoms", {}) or {}
        sec_inertial = conf.get("Inertial", {}) or {}

        host = {
            "dof_damping": np.asarray(model.dof_damping, dtype=np.float64),
            "jnt_stiffness": np.asarray(model.jnt_stiffness, np.float64),
            "dof_frictionloss": np.asarray(
                model.dof_frictionloss, np.float64
            ),
            "dof_armature": np.asarray(model.dof_armature, np.float64),
            "body_mass": np.asarray(model.body_mass, np.float64),
            "body_inertia": np.asarray(model.body_inertia, np.float64),
            "geom_friction": np.asarray(model.geom_friction, np.float64),
        }
        body_iquat = np.asarray(model.body_iquat, np.float64)
        geom_bodyid = np.asarray(model.geom_bodyid)

        scatter: dict = {}  # leaf -> lists of (idx, dist, p1, p2, base)

        def add_scatter(leaf, flats, dist, p1, p2, base):
            if dist == GAUSS and np.all(p1 == 0.0):
                return  # sigma 0 = keep deterministic
            if dist == UNIFORM_DELTA and np.all(p1 == 0.0):
                return
            m = scatter.setdefault(
                leaf, {"idx": [], "dist": [], "p1": [], "p2": [], "base": []}
            )
            flats = np.atleast_1d(np.asarray(flats, dtype=np.int64))
            m["idx"].append(flats)
            m["dist"].append(np.full(len(flats), dist))
            m["p1"].append(np.broadcast_to(p1, flats.shape))
            m["p2"].append(np.broadcast_to(p2, flats.shape))
            m["base"].append(np.broadcast_to(base, flats.shape))

        # ---- Joints: specific overrides default; exclude filters default
        dflt_joints = default.get("Joints") or {}
        for jname, j in jmap.items():
            if jname in sec_joints:
                jconf = sec_joints[jname]
            elif dflt_joints and jname not in exclude:
                jconf = dflt_joints
            else:
                continue
            for prop, param in (jconf or {}).items():
                if prop not in _JOINT_FIELDS:
                    raise ValueError(
                        f"joint property {prop!r} is not supported for "
                        f"domain randomization"
                    )
                leaf, kind = _JOINT_FIELDS[prop]
                flat = (
                    int(model.jnt_dofadr[j]) if kind == "dof" else int(j)
                )
                base = host[leaf].ravel()[flat]
                dist, p1, p2 = _dist_params(param, base, jname, prop)
                add_scatter(leaf, flat, dist, p1, p2, base)

        # ---- Inertial: mass / diaginertia scatters; fullinertia SVD jobs
        self.fi_jobs: list[dict] = []
        dflt_inertial = default.get("Inertial") or {}
        for bname, b in bmap.items():
            if bname in sec_inertial:
                bconf = sec_inertial[bname]
            elif dflt_inertial and b != 0:
                bconf = dflt_inertial
            else:
                continue
            for prop, param in (bconf or {}).items():
                if prop == "mass":
                    base = host["body_mass"][b]
                    dist, p1, p2 = _dist_params(param, base, bname, prop)
                    add_scatter("body_mass", int(b), dist, p1, p2, base)
                elif prop == "diaginertia":
                    if "uniform_range_delta" not in param:
                        raise ValueError(
                            "inertia randomization only supports "
                            "uniform_range_delta (reference :487-489)"
                        )
                    flats = [int(b) * 3 + k for k in range(3)]
                    base = host["body_inertia"][b]
                    dist, p1, p2 = _dist_params(param, base, bname, prop)
                    add_scatter("body_inertia", flats, dist, p1, p2, base)
                elif prop == "fullinertia":
                    if "uniform_range_delta" not in param:
                        raise ValueError(
                            "inertia randomization only supports "
                            "uniform_range_delta (reference :487-489)"
                        )
                    # reconstruct the full inertia tensor from the compiled
                    # principal form, then the reference's SVD rule on the
                    # upper-triangular matrix (:493-501)
                    q = body_iquat[b]
                    w, x, y, z = q
                    R = np.array([
                        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                         2 * (x * z + y * w)],
                        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                         2 * (y * z - x * w)],
                        [2 * (x * z - y * w), 2 * (y * z + x * w),
                         1 - 2 * (x * x + y * y)],
                    ])
                    M = (R * host["body_inertia"][b]) @ R.T
                    triu = np.array([
                        [M[0, 0], M[0, 1], M[0, 2]],
                        [0.0, M[1, 1], M[1, 2]],
                        [0.0, 0.0, M[2, 2]],
                    ])
                    U, s, Vh = np.linalg.svd(triu)
                    delta = float(param["uniform_range_delta"])
                    if np.any(s - delta <= 0.0):
                        raise ValueError(
                            f"fullinertia uniform_range_delta ({delta}) for "
                            f"body {bname} exceeds the smallest singular "
                            f"value ({s.min()})"
                        )
                    self.fi_jobs.append(
                        dict(body=int(b), U=U, Vh=Vh, s=s, delta=delta)
                    )
                else:
                    raise ValueError(
                        f"inertial property {prop!r} is not supported"
                    )

        # ---- Geoms: keyed by body name; friction scatters + mass jobs
        self.gm_jobs: list[dict] = []
        dflt_geoms = default.get("Geoms") or {}
        gtype = np.asarray(model.geom_type)
        gsize = np.asarray(model.geom_size, np.float64)
        gpos = np.asarray(model.geom_pos, np.float64)
        gquat = np.asarray(model.geom_quat, np.float64)
        for bname, b in bmap.items():
            if bname in sec_geoms:
                gconf = sec_geoms[bname]
            elif dflt_geoms and b != 0:
                gconf = dflt_geoms
            else:
                continue
            geoms = np.nonzero(geom_bodyid == b)[0]
            if len(geoms) == 0:
                continue
            mass_dists = {}
            for prop, param in (gconf or {}).items():
                if prop == "friction":
                    for g in geoms:
                        flats = [int(g) * 3 + k for k in range(3)]
                        base = host["geom_friction"][g]
                        dist, p1, p2 = _dist_params(
                            param, base, bname, prop
                        )
                        add_scatter(
                            "geom_friction", flats, dist, p1, p2, base
                        )
                elif prop in ("mass", "density"):
                    mass_dists[prop] = param
                else:
                    raise ValueError(
                        f"geom property {prop!r} is not supported"
                    )
            if mass_dists:
                self.gm_jobs.append(
                    self._build_geom_mass_job(
                        model, int(b), bname, geoms, mass_dists,
                        gtype, gsize, gpos, gquat, host, body_iquat,
                    )
                )

        # merge scatter specs per leaf for single-scatter application
        self.merged = {
            leaf: {k: np.concatenate(v) for k, v in d.items()}
            for leaf, d in scatter.items()
        }

        # static pair-friction mixing plan: MuJoCo combines pair friction
        # with the element-wise max rule at equal geom priority, and COPIES
        # the higher-priority geom's friction otherwise (core/io.py
        # _mix_pair_params). w1/w2 select each geom's contribution.
        if "geom_friction" in self.merged and len(model.pair_geom1):
            prio = np.zeros(host["geom_friction"].shape[0])
            if getattr(model, "geom_priority", None) is not None:
                prio = np.asarray(model.geom_priority)
            p1 = prio[np.asarray(model.pair_geom1)]
            p2 = prio[np.asarray(model.pair_geom2)]
            self._pair_w1 = np.where(p1 >= p2, 1.0, 0.0)[:, None]
            self._pair_w2 = np.where(p2 >= p1, 1.0, 0.0)[:, None]
        self.n_params = (
            sum(len(d["idx"]) for d in self.merged.values())
            + 3 * len(self.fi_jobs)
            + sum(len(j["dists"]) for j in self.gm_jobs)
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _build_geom_mass_job(model, b, bname, geoms, mass_dists,
                             gtype, gsize, gpos, gquat, host, body_iquat):
        """Constants for recomputing one body's inertial from its geoms.

        Validity check mirrors the compiler: the recombination below with
        the BASE masses must reproduce the compiled body inertial; if it
        does not, the body has an explicit <inertial> and geom mass/density
        cannot affect it (the reference's XML-edit would equally be erased
        by the recompile)."""
        vols, centers, Ks, m0 = [], [], [], []
        for g in geoms:
            V, K = _micro_geom_constants(
                int(gtype[g]), gsize[g], gquat[g], 1000.0
            )
            vols.append(V)
            centers.append(gpos[g])
            Ks.append(K)
            m0.append(1000.0 * V)
        m0 = np.asarray(m0)
        centers = np.asarray(centers)
        Ks = np.asarray(Ks)

        # check geom-derived == compiled (explicit-inertial detection)
        Mtot = m0.sum()
        com = (m0[:, None] * centers).sum(0) / Mtot
        I = np.zeros((3, 3))
        for i in range(len(geoms)):
            d = centers[i] - com
            I += m0[i] * (Ks[i] + (d @ d) * np.eye(3) - np.outer(d, d))
        q = body_iquat[b]
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
             2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
             2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w),
             1 - 2 * (x * x + y * y)],
        ])
        I_compiled = (R * host["body_inertia"][b]) @ R.T
        if not (
            np.allclose(Mtot, host["body_mass"][b], rtol=1e-4)
            and np.allclose(I, I_compiled, rtol=1e-3, atol=1e-9)
        ):
            raise ValueError(
                f"geom mass/density randomization of body {bname!r} has no "
                f"effect: the body carries an explicit <inertial> element, "
                f"which overrides geom-derived masses at compile (the "
                f"reference likewise requires the attribute in the XML)"
            )

        dists = []
        for i, g in enumerate(geoms):
            if "mass" in mass_dists:
                dist, p1, p2 = _dist_params(
                    mass_dists["mass"], m0[i], bname, "mass"
                )
                dists.append(("mass", i, dist, float(p1[0]), float(p2[0])))
            if "density" in mass_dists:
                dist, p1, p2 = _dist_params(
                    mass_dists["density"], 1000.0, bname, "density"
                )
                dists.append(
                    ("density", i, dist, float(p1[0]), float(p2[0]))
                )
        return dict(
            body=b, m0=m0, centers=centers, Ks=Ks,
            vols=np.asarray(vols), dists=dists,
        )

    # ------------------------------------------------------------------
    def sample(self, rng, dtype=jnp.float32) -> dict:
        """Draw one randomized parameter set (traced; per-env under vmap)."""
        out = {}
        for leaf, d in self.merged.items():
            rng, k1, k2 = jax.random.split(rng, 3)
            n = len(d["idx"])
            base = jnp.asarray(d["base"], dtype=dtype)
            p1 = jnp.asarray(d["p1"], dtype=dtype)
            p2 = jnp.asarray(d["p2"], dtype=dtype)
            dist = jnp.asarray(d["dist"])
            gauss = jnp.clip(
                base + p1 * jax.random.normal(k1, (n,), dtype=dtype),
                0.0, jnp.inf,
            )
            u = jax.random.uniform(k2, (n,), dtype=dtype)
            uni = p1 + u * (p2 - p1)
            uni_d = (base - p1) + u * (2.0 * p1)
            out[leaf] = jnp.where(
                dist == GAUSS, gauss, jnp.where(dist == UNIFORM, uni, uni_d)
            )
        if self.fi_jobs:
            rng, k = jax.random.split(rng)
            s = jnp.asarray(
                np.stack([j["s"] for j in self.fi_jobs]), dtype=dtype
            )
            deltas = jnp.asarray(
                np.asarray([j["delta"] for j in self.fi_jobs])[:, None],
                dtype=dtype,
            )
            u = jax.random.uniform(k, s.shape, dtype=dtype)
            out["_fullinertia_sv"] = s - deltas + u * (2.0 * deltas)
        if self.gm_jobs:
            draws = []
            for job in self.gm_jobs:
                masses = jnp.asarray(job["m0"], dtype=dtype)
                for kind, i, dist, p1, p2 in job["dists"]:
                    rng, k = jax.random.split(rng)
                    base = (
                        job["m0"][i] if kind == "mass" else 1000.0
                    )
                    if dist == GAUSS:
                        v = jnp.clip(
                            base + p1 * jax.random.normal(k, (), dtype=dtype),
                            0.0, jnp.inf,
                        )
                    elif dist == UNIFORM:
                        v = p1 + jax.random.uniform(k, (), dtype=dtype) * (
                            p2 - p1
                        )
                    else:
                        v = (base - p1) + jax.random.uniform(
                            k, (), dtype=dtype
                        ) * (2.0 * p1)
                    if kind == "density":
                        v = v * dtype(job["vols"][i])
                    masses = masses.at[i].set(v.astype(dtype))
                draws.append(masses)
            out["_geom_masses"] = draws
        return out

    # ------------------------------------------------------------------
    def apply(self, model: Model, samples: dict) -> Model:
        """Scatter a sampled parameter set into the model leaves."""
        updates: dict = {}

        def leaf(name):
            return updates.get(name, getattr(model, name))

        for name, val in samples.items():
            if name.startswith("_"):
                continue
            d = self.merged[name]
            arr = leaf(name)
            flat = arr.reshape(-1)
            flat = flat.at[jnp.asarray(d["idx"])].set(val.astype(flat.dtype))
            updates[name] = flat.reshape(arr.shape)

        if "_fullinertia_sv" in samples:
            inertia = leaf("body_inertia")
            iquat = leaf("body_iquat")
            for n, job in enumerate(self.fi_jobs):
                sv = samples["_fullinertia_sv"][n]
                U = jnp.asarray(job["U"], inertia.dtype)
                Vh = jnp.asarray(job["Vh"], inertia.dtype)
                triu = U @ jnp.diag(sv) @ Vh
                # reference keeps the upper triangle as the new fullinertia
                full = jnp.array([
                    [triu[0, 0], triu[0, 1], triu[0, 2]],
                    [triu[0, 1], triu[1, 1], triu[1, 2]],
                    [triu[0, 2], triu[1, 2], triu[2, 2]],
                ])
                evals, evecs = jnp.linalg.eigh(full)
                evals, evecs = evals[::-1], evecs[:, ::-1]  # descending
                evecs = evecs * jnp.sign(jnp.linalg.det(evecs))
                b = job["body"]
                inertia = inertia.at[b].set(evals.astype(inertia.dtype))
                iquat = iquat.at[b].set(
                    _mat_to_quat_np_like(evecs).astype(iquat.dtype)
                )
            updates["body_inertia"] = inertia
            updates["body_iquat"] = iquat

        if "_geom_masses" in samples:
            mass_l = leaf("body_mass")
            ipos_l = leaf("body_ipos")
            inertia = updates.get("body_inertia", leaf("body_inertia"))
            iquat = updates.get("body_iquat", leaf("body_iquat"))
            for job, masses in zip(self.gm_jobs, samples["_geom_masses"]):
                centers = jnp.asarray(job["centers"], masses.dtype)
                Ks = jnp.asarray(job["Ks"], masses.dtype)
                Mtot = masses.sum()
                com = (masses[:, None] * centers).sum(0) / jnp.maximum(
                    Mtot, 1e-12
                )
                d = centers - com  # (G, 3)
                dd = jnp.sum(d * d, axis=1)
                I = jnp.einsum("g,gij->ij", masses, Ks)
                I = I + jnp.einsum(
                    "g,ij,g->ij", masses, jnp.eye(3, dtype=masses.dtype), dd
                ) - jnp.einsum("g,gi,gj->ij", masses, d, d)
                evals, evecs = jnp.linalg.eigh(I)
                evals, evecs = evals[::-1], evecs[:, ::-1]
                evecs = evecs * jnp.sign(jnp.linalg.det(evecs))
                b = job["body"]
                mass_l = mass_l.at[b].set(Mtot.astype(mass_l.dtype))
                ipos_l = ipos_l.at[b].set(com.astype(ipos_l.dtype))
                inertia = inertia.at[b].set(evals.astype(inertia.dtype))
                iquat = iquat.at[b].set(
                    _mat_to_quat_np_like(evecs).astype(iquat.dtype)
                )
            updates["body_mass"] = mass_l
            updates["body_ipos"] = ipos_l
            updates["body_inertia"] = inertia
            updates["body_iquat"] = iquat

        model = model.replace(**updates)
        if "geom_friction" in samples and len(model.pair_geom1):
            # re-mix affected contact-pair frictions: element-wise max at
            # equal priority, higher-priority geom's own friction otherwise
            # (the w1/w2 one-sided masks zero out the lower-priority geom,
            # turning max into a copy — same rule as io._mix_pair_params)
            gf = model.geom_friction
            w1 = jnp.asarray(self._pair_w1, gf.dtype)
            w2 = jnp.asarray(self._pair_w2, gf.dtype)
            f1 = gf[jnp.asarray(model.pair_geom1)] * w1
            f2 = gf[jnp.asarray(model.pair_geom2)] * w2
            fri = jnp.maximum(f1, f2)
            pair_friction = jnp.stack(
                [fri[:, 0], fri[:, 0], fri[:, 1], fri[:, 2], fri[:, 2]],
                axis=1,
            )
            model = model.replace(pair_friction=pair_friction)
        return model
