"""Imitation-learning algorithms, fully jitted on the batched envs.

TPU-native replacement for the reference's examples/imitation_learning
stack (mushroom-rl Core + imitation_lib GAIL_TRPO/VAIL_TRPO — reference
examples/imitation_learning/utils.py:14-196). Lives in the package (not
examples/) because the trainers are first-class framework components here:
rollout collection and all updates run inside one jitted XLA program.
"""

from .gail import GAIL, GAILConfig, MLP
from .vail import VAIL, VAILConfig

__all__ = ["GAIL", "GAILConfig", "MLP", "VAIL", "VAILConfig"]
