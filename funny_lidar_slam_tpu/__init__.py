"""funny_lidar_slam_tpu: TPU-native LiDAR-inertial SLAM engine (JAX/XLA/Pallas).

Brand-new implementation of the capability surface of zm0612/funny_lidar_slam
re-architected for TPU: padded-tensor scan pipeline, device-resident
voxel-hash maps, batched Gauss-Newton registration, analytic fusion, sharded
pose-graph backend. See SURVEY.md for the reference blueprint.
"""

import jax as _jax

# Geometry pipelines cannot tolerate the TPU default bf16 matmul passes:
# residual/Jacobian reductions and Lie-group algebra must run in true f32.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
