"""Optimization back-end (SURVEY §2 L4): the g2o/Ceres replacement.

Batched Levenberg-Marquardt with explicit Schur-complement elimination of
landmarks, over SE(3) poses + Pluecker/orthonormal 3D lines (+ 3D points for
the hybrid point+line configuration). All solves are jitted XLA programs with
fixed-capacity, mask-padded problem layouts (SURVEY §4.5, §9.4).
"""

from tpuslam.backend.residuals import (  # noqa: F401
    line_residual,
    point_residual,
)
from tpuslam.backend.lm import (  # noqa: F401
    BAProblem,
    BAState,
    run_lm,
)
from tpuslam.backend.pose_opt import pose_optimize  # noqa: F401
