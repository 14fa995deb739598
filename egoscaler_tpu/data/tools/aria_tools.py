"""Aria sensor helpers: timestamp conversion + frame fetch + key frames.

Rebuild of egoscaler/data/tools/aria_tools.py.  The VRS/provider calls
need projectaria_tools (optional, host-side IO); the undistortion math
itself is TPU-native (ops/undistort.py) so preprocessing can run
on-device (SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def convert_to_ns(seconds: float, start_ns: int = 0) -> int:
    """Seconds-offset -> device nanoseconds (aria_tools.py:5-8)."""
    return int(start_ns + seconds * 1e9)


def get_image(
    t_sec: float,
    provider,
    start_ns: int,
    stream_id,
    time_domain,
    option,
    pinhole,
    camera_calib,
) -> np.ndarray:
    """Undistorted pinhole frame at t (aria_tools.py:10-15): fetch the
    closest raw frame, resample to pinhole, rotate 90 cw."""
    from projectaria_tools.core import calibration

    t_ns = convert_to_ns(t_sec, start_ns)
    image_data = provider.get_image_data_by_time_ns(
        stream_id, t_ns, time_domain, option
    )
    raw = image_data[0].to_numpy_array()
    undistorted = calibration.distort_by_calibration(
        raw, pinhole, camera_calib
    )
    return np.rot90(undistorted, -1)


def get_key_timestamps(
    provider, stream_id, time_domain, fps: float = 20.0
) -> List[int]:
    """Evenly spaced key timestamps over the recording
    (aria_tools.py:17-24)."""
    start_ns = provider.get_first_time_ns(stream_id, time_domain)
    end_ns = provider.get_last_time_ns(stream_id, time_domain)
    step = int(1e9 / fps)
    return list(range(start_ns, end_ns, step))
