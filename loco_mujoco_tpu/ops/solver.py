"""Constraint solver (stub for the smooth-dynamics milestone)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Data, Model


def solve(model: Model, data: Data, efc) -> Data:
    return data.replace(
        qacc=data.qacc_smooth,
        qfrc_constraint=jnp.zeros_like(data.qfrc_smooth),
    )
