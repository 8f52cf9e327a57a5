from tpuslam.frontend.frame import (
    FrameFeatures,
    FrontendParams,
    extract_features,
    stereo_line_depths,
)

__all__ = [
    "FrameFeatures",
    "FrontendParams",
    "extract_features",
    "stereo_line_depths",
]
