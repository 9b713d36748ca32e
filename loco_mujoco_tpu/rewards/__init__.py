from .rewards import (
    CustomReward,
    MultiTargetVelocityReward,
    NoReward,
    PosReward,
    RewardFn,
    TargetVelocityReward,
    VelocityVectorReward,
    make_reward,
)

__all__ = [
    "RewardFn",
    "NoReward",
    "PosReward",
    "CustomReward",
    "TargetVelocityReward",
    "MultiTargetVelocityReward",
    "VelocityVectorReward",
    "make_reward",
]
