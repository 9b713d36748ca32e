from .base import EnvState, LocoEnv
from .observation import ObservationType, ObsEntry, ObsIndex

__all__ = ["EnvState", "LocoEnv", "ObservationType", "ObsEntry", "ObsIndex"]
