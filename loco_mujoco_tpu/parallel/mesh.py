"""Device-mesh construction and sharding helpers.

The reference has no distributed runtime at all (SURVEY.md §2, parallelism
inventory) — one env, one process, CPU-serial. The TPU-native scaling
scheme replacing it:

* **dp ("env" axis)** — environments are embarrassingly parallel; the
  batched `EnvState` pytree is sharded over the mesh's "env" axis with
  `NamedSharding(mesh, P("env"))` on every leaf's leading batch dim.
  Physics stepping then runs with zero collectives; the learner's gradient
  all-reduce is the only cross-device traffic, inserted automatically by
  GSPMD when replicated parameters meet sharded minibatches.
* **tp ("mp" axis)** — the learner MLPs' hidden dimension is sharded over
  an optional second mesh axis (`param_tp_sharding`), partitioning the
  policy/critic/discriminator matmuls across chips (column-parallel then
  row-parallel, the Megatron layout) with GSPMD inserting the reduce.

Multi-host: build the mesh over `jax.devices()` after
`jax.distributed.initialize()`; shardings below are process-agnostic
(single-controller JAX).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_env_shards=None, n_model_shards=1, devices=None) -> Mesh:
    """Build an ("env",) or ("env", "mp") mesh.

    n_env_shards defaults to n_devices // n_model_shards. With
    n_model_shards == 1 the mesh is 1-D ("env",) — pure env data
    parallelism, the framework's default scaling mode.
    """
    if devices is None:
        devices = jax.devices()
        # honor a pinned default device (e.g. tests pin CPU while a TPU
        # plugin that ignores JAX_PLATFORMS is present): build the mesh
        # from the pinned platform's devices so all computation colocates.
        dd = jax.config.jax_default_device
        if dd is not None:
            platform = getattr(dd, "platform", str(dd))
            devices = jax.local_devices(backend=platform)
    devices = list(devices)
    if n_env_shards is None:
        n_env_shards = len(devices) // n_model_shards
    need = n_env_shards * n_model_shards
    if len(devices) < need:
        raise ValueError(
            f"mesh needs {need} devices "
            f"({n_env_shards} env x {n_model_shards} mp), "
            f"have {len(devices)}"
        )
    arr = np.empty(need, dtype=object)
    for i, d in enumerate(devices[:need]):
        arr[i] = d
    devices = arr
    if n_model_shards == 1:
        return Mesh(devices.reshape(n_env_shards), axis_names=("env",))
    return Mesh(
        devices.reshape(n_env_shards, n_model_shards),
        axis_names=("env", "mp"),
    )


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched env-state pytrees: leading axis over "env"."""
    return NamedSharding(mesh, P("env"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_states(states, mesh: Mesh):
    """Place every leaf of a batched EnvState on the mesh, batch axis
    split over "env". Scalar-per-env leaves shard their only axis."""
    return jax.device_put(states, env_sharding(mesh))


def param_tp_sharding(params, mesh: Mesh):
    """Megatron-style tensor-parallel layout for MLP params over "mp".

    Alternating Dense layers are column-/row-partitioned: layer 2i kernels
    (in, hidden) shard the output dim, layer 2i+1 kernels shard the input
    dim, so activations stay sharded between the pair and GSPMD inserts a
    single reduce per pair. Biases follow their layer's output sharding.
    Falls back to replication when the mesh has no "mp" axis or a dim
    does not divide.
    """
    if "mp" not in mesh.axis_names:
        return jax.tree.map(lambda _: replicated(mesh), params)
    mp = mesh.shape["mp"]

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        layer = next(
            (int(n.rsplit("_", 1)[1]) for n in names
             if n.startswith("Dense_") and n.rsplit("_", 1)[1].isdigit()),
            None,
        )
        spec = P()
        if layer is not None:
            col = layer % 2 == 0
            if "kernel" in names and leaf.ndim == 2:
                if col and leaf.shape[1] % mp == 0:
                    spec = P(None, "mp")
                elif not col and leaf.shape[0] % mp == 0:
                    spec = P("mp", None)
            elif "bias" in names and leaf.ndim == 1:
                # column-parallel bias shards with its outputs; the
                # row-parallel layer's bias is added after the reduce.
                if col and leaf.shape[0] % mp == 0:
                    spec = P("mp")
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)
