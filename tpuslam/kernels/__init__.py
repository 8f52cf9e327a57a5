"""Image-ops + matching kernels (SURVEY §2 L1-L2).

Jitted XLA programs (Pallas-fused where profitable) replacing the reference's
OpenCV LSD / line_descriptor LBD and descriptor matchers. All outputs are
fixed-capacity, mask-padded arrays (SURVEY §4.5).
"""

from tpuslam.kernels.image import build_pyramid, image_gradients  # noqa: F401
from tpuslam.kernels.lsd import detect_lines, LSDParams  # noqa: F401
from tpuslam.kernels.lbd import lbd_descriptors, LBDParams  # noqa: F401
from tpuslam.kernels.match import (  # noqa: F401
    match_descriptors,
    hamming_distance_matrix,
)
