"""slide_slam_tpu — TPU-native decentralized metric-semantic SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SlideSLAM
(lunarlab-gatech/SLIDE_SLAM): sparse object-landmark SLAM for multi-robot
teams. All engine state lives in fixed-capacity device arrays with validity
masks; the per-keyframe path (data association -> map update -> factor
emission -> Gauss-Newton solve) is a single jitted program; loop closure and
inter-robot map merging run as batched dense kernels; multi-robot
decentralization is SPMD over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
