"""Domain randomization — batched parameter resampling on Model leaves.

Redesign of reference `loco_mujoco/utils/domain_randomization.py` (C10): the
reference edits the MJCF XML and RECOMPILES an MjModel per episode, fanned
out over a multiprocessing worker pool (:191-227, 535-556). Here the
randomized physics parameters are numeric leaves of the Model pytree, so a
fresh sample is a handful of gather/scatter ops inside the jitted reset —
thousands of envs re-randomize per episode with no recompilation at all
(SURVEY.md §2 parallelism inventory, item 1).

Config format: the reference's YAML schema (Default/Joints/Geoms/Inertial
sections, `exclude` list; distributions `sigma` — N(base, sigma) clipped to
>= 0, `uniform_range` — U(lo, hi), `uniform_range_delta` — U(base-d,
base+d); see reference :134-179).

Supported targets: joint damping/stiffness/frictionloss/armature, inertial
body mass/diaginertia, geom friction (contact-pair frictions are re-mixed
with the max rule for affected pairs). Geom mass/density randomization is a
no-op for this robot suite even in the reference: every body carries an
explicit <inertial>, which overrides geometry-derived masses at compile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..core.types import Model

# distribution codes
GAUSS = 0
UNIFORM = 1
UNIFORM_DELTA = 2


class _Spec(NamedTuple):
    leaf: str  # Model attribute name
    idx: np.ndarray  # flat indices into the raveled leaf
    dist: int
    p1: np.ndarray  # sigma / lo / delta
    p2: np.ndarray  # unused / hi / unused
    base: np.ndarray  # build-time values


def _dist_params(param: dict, base: float):
    if "sigma" in param:
        return GAUSS, float(param["sigma"]), 0.0
    if "uniform_range" in param:
        lo, hi = param["uniform_range"]
        return UNIFORM, float(lo), float(hi)
    if "uniform_range_delta" in param:
        d = float(param["uniform_range_delta"])
        return UNIFORM_DELTA, d, 0.0
    raise ValueError(f"unknown distribution spec {param}")


class DomainRandomizationHandler:
    def __init__(self, model: Model, config_path: str):
        with open(config_path) as fh:
            conf = yaml.safe_load(fh)

        self.specs: list[_Spec] = []
        jmap = model.names["joint"]
        bmap = model.names["body"]
        gmap = model.names["geom"]

        default = conf.get("Default", {}) or {}
        exclude = set(default.get("exclude", []) or [])

        host = {
            "dof_damping": np.asarray(model.dof_damping),
            "jnt_stiffness": np.asarray(model.jnt_stiffness),
            "dof_frictionloss": np.asarray(model.dof_frictionloss),
            "dof_armature": np.asarray(model.dof_armature),
            "body_mass": np.asarray(model.body_mass),
            "body_inertia": np.asarray(model.body_inertia),
            "geom_friction": np.asarray(model.geom_friction),
        }

        joint_field = {
            "damping": ("dof_damping", "dof"),
            "stiffness": ("jnt_stiffness", "jnt"),
            "frictionloss": ("dof_frictionloss", "dof"),
            "armature": ("dof_armature", "dof"),
        }

        def add_joint(jname, jconf):
            j = jmap.get(jname)
            if j is None:
                return
            for prop, param in (jconf or {}).items():
                if prop not in joint_field:
                    continue
                leaf, kind = joint_field[prop]
                flat = (
                    int(model.jnt_dofadr[j]) if kind == "dof" else int(j)
                )
                base = host[leaf].ravel()[flat]
                dist, p1, p2 = _dist_params(param, base)
                if dist == GAUSS and p1 == 0.0:
                    continue  # sigma 0 = keep deterministic
                self.specs.append(
                    _Spec(leaf, np.asarray([flat]), dist,
                          np.asarray([p1]), np.asarray([p2]),
                          np.asarray([base]))
                )

        # Default section applied to every joint not excluded
        for prop_conf_key, names in (("Joints", jmap),):
            dsec = default.get(prop_conf_key, {}) or {}
            if dsec:
                for name in names:
                    if name in exclude:
                        continue
                    add_joint(name, dsec)

        for jname, jconf in (conf.get("Joints", {}) or {}).items():
            add_joint(jname, jconf)

        # Inertial section: body mass / diaginertia
        for bname, bconf in (conf.get("Inertial", {}) or {}).items():
            b = bmap.get(bname)
            if b is None:
                continue
            for prop, param in (bconf or {}).items():
                if prop == "mass":
                    leaf, flats = "body_mass", [int(b)]
                elif prop in ("diaginertia", "fullinertia"):
                    leaf, flats = "body_inertia", [int(b) * 3 + k for k in range(3)]
                else:
                    continue
                for flat in flats:
                    base = host[leaf].ravel()[flat]
                    dist, p1, p2 = _dist_params(param, base)
                    if dist == GAUSS and p1 == 0.0:
                        continue
                    self.specs.append(
                        _Spec(leaf, np.asarray([flat]), dist,
                              np.asarray([p1]), np.asarray([p2]),
                              np.asarray([base]))
                    )

        # Geoms section: friction (3 components)
        for gname, gconf in (conf.get("Geoms", {}) or {}).items():
            g = gmap.get(gname)
            if g is None:
                continue
            for prop, param in (gconf or {}).items():
                if prop != "friction":
                    continue
                flats = [int(g) * 3 + k for k in range(3)]
                for flat in flats:
                    base = host["geom_friction"].ravel()[flat]
                    dist, p1, p2 = _dist_params(param, base)
                    if dist == GAUSS and p1 == 0.0:
                        continue
                    self.specs.append(
                        _Spec("geom_friction", np.asarray([flat]), dist,
                              np.asarray([p1]), np.asarray([p2]),
                              np.asarray([base]))
                    )

        # merge specs per leaf for single-scatter application
        merged: dict = {}
        for s in self.specs:
            m = merged.setdefault(
                s.leaf, {"idx": [], "dist": [], "p1": [], "p2": [], "base": []}
            )
            m["idx"].append(s.idx)
            m["dist"].append(np.full(len(s.idx), s.dist))
            m["p1"].append(np.broadcast_to(s.p1, s.idx.shape))
            m["p2"].append(np.broadcast_to(s.p2, s.idx.shape))
            m["base"].append(s.base)
        self.merged = {
            leaf: {k: np.concatenate(v) for k, v in d.items()}
            for leaf, d in merged.items()
        }
        self.n_params = sum(len(d["idx"]) for d in self.merged.values())

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
            val = jnp.where(
                dist == GAUSS, gauss, jnp.where(dist == UNIFORM, uni, uni_d)
            )
            out[leaf] = val
        return out

    def apply(self, model: Model, samples: dict) -> Model:
        """Scatter a sampled parameter set into the model leaves."""
        updates = {}
        for leaf, val in samples.items():
            d = self.merged[leaf]
            arr = getattr(model, leaf)
            flat = arr.reshape(-1)
            flat = flat.at[jnp.asarray(d["idx"])].set(val.astype(flat.dtype))
            updates[leaf] = flat.reshape(arr.shape)
        model = model.replace(**updates)
        if "geom_friction" in samples:
            # re-mix affected contact-pair frictions (max rule; the suite's
            # pairs share equal priority except the A1 floor, whose priority
            # mixing keeps the floor's own friction and is unaffected here)
            gf = model.geom_friction
            f1 = gf[jnp.asarray(model.pair_geom1)]
            f2 = gf[jnp.asarray(model.pair_geom2)]
            fri = jnp.maximum(f1, f2)
            pair_friction = jnp.stack(
                [fri[:, 0], fri[:, 0], fri[:, 1], fri[:, 2], fri[:, 2]],
                axis=1,
            )
            model = model.replace(pair_friction=pair_friction)
        return model
