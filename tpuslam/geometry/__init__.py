"""Math/geometry core (SURVEY §2 L0): SE(3), Pluecker lines, cameras.

Pure jax.numpy functions, batchable via vmap, f32 on device. Replaces the
reference's Eigen + hand-written converters (SURVEY §3.2).
"""

from tpuslam.geometry.se3 import (  # noqa: F401
    so3_hat,
    so3_vee,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inverse,
    se3_compose,
    se3_apply,
    se3_retract,
    se3_identity,
)
from tpuslam.geometry.plucker import (  # noqa: F401
    plucker_from_points,
    plucker_transform,
    plucker_normalize,
    plucker_to_orthonormal,
    orthonormal_to_plucker,
    plucker_retract,
    plucker_closest_point,
    plucker_distance_to_origin,
)
from tpuslam.geometry.camera import (  # noqa: F401
    Intrinsics,
    project_points,
    backproject_pixels,
    line_projection_matrix,
    project_plucker_line,
    image_line_through,
)
from tpuslam.geometry.triangulate import (  # noqa: F401
    triangulate_points,
    triangulate_plucker_two_view,
    plane_from_image_line,
)
