"""CAPTRA-TPU: TPU-native category-level 9-DoF pose tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CAPTRA
(HalfSummer11/CAPTRA, ICCV 2021): per-part rotation / translation / scale
tracking of unseen rigid (NOCS-REAL275) and articulated (SAPIEN) object
instances from depth point-cloud video.

Design stance (not a port):
  * one functional core — all pose math and networks are pure functions over
    pytrees; RNG is explicit `jax.random` keys;
  * the frame-recurrent tracking loop is a single jitted `lax.scan`;
  * point-cloud preprocessing (backprojection, ball crop, FPS) is fixed-shape
    and jittable so a tracked frame never leaves the chip;
  * scale-out is data-parallel `jax.sharding.Mesh` + collectives, not NCCL.

Subpackages:
  pose      -- rotations, Procrustes, per-part pose algebra, metrics, bbox IoU
  ops       -- point-cloud ops (FPS, ball query, kNN, interpolation) in XLA +
               Pallas TPU kernels
  nn        -- PointNet++ backbone, CoordNet, RotationNet (flax.linen)
  tracking  -- the lax.scan tracking loop
  training  -- optax trainer, checkpointing, train entry points
  data      -- dataset readers, on-device preprocessing, synthetic generators
  parallel  -- device-mesh / sharding helpers
  eval      -- offline eval harness (err.csv / pkl parity)
"""

__version__ = "0.1.0"
