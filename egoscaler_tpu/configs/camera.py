"""Camera configuration (reference: egoscaler/configs/camera.py:1-13).

The reference models the Project Aria RGB camera after undistortion to an
ideal pinhole: square 1408x1408 image, focal length 605.343 px, principal
point at (703.5, 703.5), 20 fps sampling over a +/-2 s action window.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class AriaCameraConfig:
    """Pinhole intrinsics of the undistorted Aria RGB stream."""

    pinhole_image_size: int = 1408
    focal_len: float = 605.343
    principal_point: float = 703.5

    @property
    def width(self) -> int:
        return self.pinhole_image_size

    @property
    def height(self) -> int:
        return self.pinhole_image_size


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Temporal sampling parameters for clip extraction."""

    fps: float = 20.0
    time_window: float = 2.0  # seconds before/after the action timestamp
    aria: AriaCameraConfig = dataclasses.field(default_factory=AriaCameraConfig)

    @property
    def frames_per_clip(self) -> int:
        """80 frames: 20 fps x 4 s window (reference 4_get_image.py)."""
        return int(round(2 * self.time_window * self.fps))
