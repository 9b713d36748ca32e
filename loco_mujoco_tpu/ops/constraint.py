"""Constraint assembly (stub for the smooth-dynamics milestone)."""

from __future__ import annotations

from ..core.types import Data, Model


def make_constraint(model: Model, data: Data):
    return None
