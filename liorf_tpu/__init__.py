"""liorf_tpu — a TPU-native LiDAR-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference ROS/C++ system (jimmyshe/liorf): IMU-aided scan deskew,
scan-to-map point-to-plane Gauss-Newton registration, keyframe pose graph
with IMU-preintegration / GPS / ScanContext loop-closure factors, and
global map maintenance — expressed as jit'd pure functions over fixed-shape
masked arrays, sharded across device meshes with jax.sharding.
"""

__version__ = "0.1.0"
