"""Collision narrowphase (stub for the smooth-dynamics milestone).

Real narrowphase lands with the constraint milestone; until then every
contact slot stays inactive (dist = +inf sentinel set in make_data).
"""

from __future__ import annotations

from ..core.types import Data, Model


def collision(model: Model, data: Data) -> Data:
    return data
