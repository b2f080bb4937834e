"""visfs_tpu — a TPU-native visual-inertial-wheel fusion SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
supersaiyajinggod/VISFS: stereo/RGBD/wheel/laser sensor fusion odometry with
sliding-window bundle adjustment and cartographer-style 2D occupancy
submaps — built as array programs on fixed-capacity masked state so the whole
per-frame pipeline compiles into a single XLA computation.
"""

from .config import (  # noqa: F401
    DEFAULT_PARAMETERS,
    PARAMETER_DESCRIPTIONS,
    PARAMETER_TYPES,
    VISFSConfig,
    config_from_parameters,
    config_to_parameters,
)

__version__ = "0.1.0"
