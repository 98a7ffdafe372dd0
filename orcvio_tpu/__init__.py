"""orcvio_tpu — a TPU-native object-residual-constrained VIO framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of shanmo/OrcVIO
(IROS 2020): MSCKF/hybrid-EKF visual-inertial odometry with object-level
(semantic keypoint + bounding-box quadric) residual updates, built around pure
pytree filter states, static shapes, batched/vmapped per-feature math, and
jax.sharding-based scale-out (many-sequence data parallelism, sequence
parallelism via information-form reduction).
"""

__version__ = "0.1.0"
