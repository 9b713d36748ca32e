"""Task registry and the `make("Env.task[.mode].dataset_type")` factory —
behavior of the reference's mushroom-rl `Environment.make` + LocoEnv
registration (reference base.py:820-832, 950-969)."""

from __future__ import annotations

_REGISTRY: dict = {}


def register(cls):
    """Class decorator: register an environment class by name."""
    _REGISTRY[cls.__name__] = cls
    return cls


def registered_envs():
    return dict(_REGISTRY)


def make(task_string: str, **kwargs):
    """Build an environment from a task string "Env.task[.mode].dtype"."""
    parts = task_string.split(".")
    name, args = parts[0], parts[1:]
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown environment {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name].generate(*args, **kwargs)


def get_all_task_names():
    """All registered "Env.task[.mode].dtype" strings (base.py:950-969)."""
    names = []
    for env_name, cls in _REGISTRY.items():
        for conf in cls.valid_task_confs.get_all_combinations():
            names.append(".".join([env_name] + list(conf.values())))
    return names
