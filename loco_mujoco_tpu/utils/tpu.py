"""TPU compiler configuration helpers.

The fused constraint kernels keep a whole env block's solver state on the
Mosaic scoped-VMEM stack; large elliptic models (UnitreeA1: 306 rows x 128
envs of live Newton state) exceed the compiler's default 16 MiB scoped
limit. The limit is a per-executable XLA option — raising it costs nothing
when unused (it only bounds what the compiler may allocate), so every jit
of an env step should carry it on TPU backends.

Usage: ``jax.jit(fn, compiler_options=tpu_compiler_options())``.
The value is mirrored into ``LMT_SCOPED_VMEM_KIB`` so the kernel plan gate
(`ops/pallas_constraint.py`) knows the budget it may assume.
"""

from __future__ import annotations

import os

SCOPED_VMEM_KIB = int(os.environ.get("LMT_SCOPED_VMEM_KIB", "81920"))
# Mosaic SCHEDULES its live-ranges to this jit-level budget (and
# overshoots it ~10%); the pallas-level CompilerParams value only sets
# the acceptance check. Keep the schedule target at the calibrated
# 80 MiB and let pallas_newton.vmem_params grant the ~10% overshoot
# headroom (96 MiB) — raising THIS value inflates every kernel's
# schedule and G1's megastep then overshoots any limit.

# Persistent compilation cache: the flagship step executable costs ~85 s to
# compile; cache it on disk so each tool/test/bench pays it once per machine
# (VERDICT r1 weak #3). JAX only persists compilations above the min time.
_CACHE_DIR = os.environ.get(
    "LMT_COMPILATION_CACHE", os.path.expanduser("~/.cache/lmt_jax_cache")
)


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at a per-machine dir.

    Idempotent; called at package import. Respects an explicit user
    setting of ``jax_compilation_cache_dir`` / the JAX env var.
    """
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    # CPU-only runs (tests, oracle parity): the jaxlib CPU executable
    # serializer is unreliable (segfaults after many large compiles, and
    # cached artifacts are machine-feature-pinned), and CPU compiles are
    # cheap anyway — only accelerator executables are worth persisting.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        try:
            os.makedirs(_CACHE_DIR, exist_ok=True)
        except OSError:
            return  # read-only $HOME (shared pods/CI): skip silently
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0
            )
# the gate reads LMT_SCOPED_VMEM_KIB at plan-build time; make the default
# visible to it even when the caller never set the env var
os.environ.setdefault("LMT_SCOPED_VMEM_KIB", str(SCOPED_VMEM_KIB))


def tpu_compiler_options() -> dict | None:
    """Per-jit compiler options for env-step executables, or None off-TPU.

    Passed as ``jax.jit(..., compiler_options=...)``; these ride the
    compile request as proto-backed DebugOptions, so they work through
    remote-compile tunnels where process-level XLA_FLAGS cannot carry
    TPU-only flags.
    """
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return None
    if platform not in ("tpu", "axon"):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}
