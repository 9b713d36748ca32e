"""Pytree dataclass helpers for the TPU-native physics core.

Design: model/data containers are frozen dataclasses registered as JAX pytrees.
Numeric leaves are traced; *structural* fields (tree topology, joint types,
static sizes) are numpy arrays / python scalars carried as hashable aux data so
a Model can be passed straight into ``jax.jit`` without re-tracing on every
call and without device transfers of topology tables.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax
import numpy as np

T = TypeVar("T")

_STATIC_KEY = "static"


def static_field(**kwargs):
    """A field treated as auxiliary (non-traced) pytree data."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_STATIC_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def _hashable(v):
    if isinstance(v, np.ndarray):
        return (v.shape, v.dtype.str, v.tobytes())
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    return v


class _HashableStatic:
    """Wraps static fields so jit caching works with numpy arrays inside."""

    __slots__ = ("values", "_hash")

    def __init__(self, values: tuple):
        self.values = values
        self._hash = hash(tuple(_hashable(v) for v in values))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        if not isinstance(other, _HashableStatic):
            return NotImplemented
        if self._hash != other._hash:
            return False
        if len(self.values) != len(other.values):
            return False
        for a, b in zip(self.values, other.values):
            # arrays may hide inside tuples/dicts (e.g. Model.mesh_nbr);
            # _hashable canonicalizes every container to plain hashables
            if _hashable(a) != _hashable(b):
                return False
        return True


def pytree_dataclass(cls: type) -> type:
    """Decorator: frozen dataclass + pytree registration with static fields."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = dataclasses.fields(cls)
    data_names = tuple(f.name for f in fields if not f.metadata.get(_STATIC_KEY))
    static_names = tuple(f.name for f in fields if f.metadata.get(_STATIC_KEY))

    def flatten(obj):
        data = tuple(getattr(obj, n) for n in data_names)
        aux = _HashableStatic(tuple(getattr(obj, n) for n in static_names))
        return data, aux

    def flatten_with_keys(obj):
        data = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names
        )
        aux = _HashableStatic(tuple(getattr(obj, n) for n in static_names))
        return data, aux

    def unflatten(aux, data):
        obj = object.__new__(cls)
        for n, v in zip(data_names, data):
            object.__setattr__(obj, n, v)
        for n, v in zip(static_names, aux.values):
            object.__setattr__(obj, n, v)
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def replace(self: T, **changes) -> T:
        return dataclasses.replace(self, **changes)

    cls.replace = replace
    return cls
