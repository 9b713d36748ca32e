"""Observation-spec compiler.

The reference describes observations as a list of (key, mujoco-name, type)
entries materialized by mushroom-rl's ObservationHelper (SURVEY.md §1,
"Contract assumed from the external mushroom-rl layer"). Here the spec is
compiled ONCE at build time into static gather indices; building the
observation vector is then a couple of fused gathers — no per-entry Python
in the hot path.

Types cover what the robot suite uses: JOINT_POS, JOINT_VEL, SITE_ROT
(reference `environments/humanoids/base_humanoid.py:303-389`,
`quadrupeds/unitreeA1.py:230,789-833`).
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.types import Data, Model


class ObservationType(enum.IntEnum):
    JOINT_POS = 0
    JOINT_VEL = 1
    SITE_ROT = 2


class ObsEntry(NamedTuple):
    key: str
    name: str
    otype: ObservationType


class ObsIndex:
    """Compiled observation spec: static gather tables + entry layout."""

    def __init__(self, model: Model, spec: Sequence[ObsEntry]):
        self.spec = [ObsEntry(k, n, ObservationType(t)) for k, n, t in spec]
        jmap = model.names["joint"]
        smap = model.names["site"]

        qpos_idx, qvel_idx, site_idx = [], [], []
        layout = []  # (key, otype, offset, size)
        offset = 0
        for key, name, ot in self.spec:
            if ot == ObservationType.JOINT_POS:
                j = jmap[name]
                qpos_idx.append(int(model.jnt_qposadr[j]))
                layout.append((key, ot, offset, 1))
                offset += 1
            elif ot == ObservationType.JOINT_VEL:
                j = jmap[name]
                qvel_idx.append(int(model.jnt_dofadr[j]))
                layout.append((key, ot, offset, 1))
                offset += 1
            elif ot == ObservationType.SITE_ROT:
                site_idx.append(smap[name])
                layout.append((key, ot, offset, 9))
                offset += 9
            else:
                raise NotImplementedError(ot)
        self.qpos_idx = np.asarray(qpos_idx, dtype=np.int32)
        self.qvel_idx = np.asarray(qvel_idx, dtype=np.int32)
        self.site_idx = np.asarray(site_idx, dtype=np.int32)
        self.layout = layout
        self.size = offset
        self.obs_idx_map = {
            key: list(range(off, off + size)) for key, ot, off, size in layout
        }

        # scatter plan: position of each entry's slice in the flat vector
        self._plan = []
        qp = qv = st = 0
        for key, ot, off, size in layout:
            if ot == ObservationType.JOINT_POS:
                self._plan.append(("qpos", qp, off))
                qp += 1
            elif ot == ObservationType.JOINT_VEL:
                self._plan.append(("qvel", qv, off))
                qv += 1
            else:
                self._plan.append(("site", st, off))
                st += 1

    def build_obs(self, data: Data) -> jnp.ndarray:
        """Materialize the observation vector from Data (traced)."""
        parts = {}
        if len(self.qpos_idx):
            parts["qpos"] = data.qpos[self.qpos_idx]
        if len(self.qvel_idx):
            parts["qvel"] = data.qvel[self.qvel_idx]
        if len(self.site_idx):
            parts["site"] = data.site_xmat[self.site_idx].reshape(
                len(self.site_idx), 9
            )
        chunks = []
        for kind, i, _ in self._plan:
            if kind == "site":
                chunks.append(parts["site"][i])
            else:
                chunks.append(parts[kind][i][None])
        return jnp.concatenate(chunks)

    def sample_to_state(self, model: Model, data: Data, sample: jnp.ndarray) -> Data:
        """set_sim_state equivalent (reference base.py:478-497): write the
        JOINT_POS/JOINT_VEL entries of a trajectory sample into Data.
        SITE_ROT entries are environment decorations (goal arrows) whose
        pose is driven separately — they are skipped here."""
        qpos, qvel = data.qpos, data.qvel
        qp_vals, qv_vals = [], []
        for (key, ot, off, size) in self.layout:
            if ot == ObservationType.JOINT_POS:
                qp_vals.append(sample[off])
            elif ot == ObservationType.JOINT_VEL:
                qv_vals.append(sample[off])
        if qp_vals:
            qpos = qpos.at[self.qpos_idx].set(jnp.stack(qp_vals))
        if qv_vals:
            qvel = qvel.at[self.qvel_idx].set(jnp.stack(qv_vals))
        return data.replace(qpos=qpos, qvel=qvel)
