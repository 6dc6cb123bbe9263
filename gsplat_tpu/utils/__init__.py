from .camera_path import CameraPath, capture_path  # noqa: F401
from .debug import (  # noqa: F401
    debug_enabled,
    device_memory_stats,
    memory_usage,
    nonfinite_gradient_report,
)
