"""Utility surface (reference loco_mujoco/utils/__init__.py): math helpers,
goal containers, dataset download CLIs, mocap retargeting, domain
randomization, MyoSkeleton asset management, video conversion."""

from .checks import ValidTaskConf, check_validity_task_mode_dataset
from .dataset import (
    adapt_mocap,
    download_all_datasets,
    download_perfect_datasets,
    download_real_datasets,
)
from .domain_randomization import DomainRandomizationHandler
from .goals import GoalDirectionVelocity
from .math import (
    angle2mat_xy,
    mat2angle_xy,
    rotate_obs,
    transform_angle_2pi,
)
from .myomodel_init import clear_myoskeleton, fetch_myoskeleton
from .video import video2gif

__all__ = [
    "ValidTaskConf",
    "check_validity_task_mode_dataset",
    "adapt_mocap",
    "download_all_datasets",
    "download_perfect_datasets",
    "download_real_datasets",
    "DomainRandomizationHandler",
    "GoalDirectionVelocity",
    "angle2mat_xy",
    "mat2angle_xy",
    "rotate_obs",
    "transform_angle_2pi",
    "clear_myoskeleton",
    "fetch_myoskeleton",
    "video2gif",
]
