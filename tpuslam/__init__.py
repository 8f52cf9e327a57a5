"""tpuslam — TPU-native point+line visual SLAM.

A ground-up JAX/XLA/Pallas rebuild of a C++ line-SLAM system
(BTREE-C802/3DLine-SLAM capability class; see SURVEY.md):

- front-end: image pyramid, LSD-style line detection, LBD descriptors,
  descriptor matching — jitted XLA programs / Pallas kernels (SURVEY §2 L1-L2)
- back-end: batched Levenberg-Marquardt with explicit Schur elimination of
  landmarks over SE(3) poses + Pluecker/orthonormal 3D lines, replacing
  g2o/Ceres (SURVEY §2 L4, §5)
- host: sequential tracking control flow, map bookkeeping (SURVEY §2 L5-L6)
"""

__version__ = "0.1.0"
