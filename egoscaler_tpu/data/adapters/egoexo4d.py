"""Ego-Exo4D corpus adapter.

Rebuild of egoscaler/data/utils/egoexo4d_utils.py: annotation loading and
take/description unpacking are pure-JSON (no heavy deps); VRS frame
extraction requires projectaria_tools, which is optional — when absent,
`extract_images` raises with a clear message and mp4-based corpora use
the cv2 path in stage4.
"""
from __future__ import annotations

import json
import os
from glob import glob
from typing import Dict, List, Tuple

import numpy as np

from egoscaler_tpu.configs import CameraConfig
from egoscaler_tpu.data.tools.nlp_tools import (
    hand_transfer_flag,
    process_hand_mentions,
)

_CAMERA = CameraConfig()


def load_annotations(split: str, root_dir: str):
    """atomic_descriptions_{split}.json + takes.json (egoexo4d_utils.py:13-18)."""
    with open(
        os.path.join(root_dir, "annotations", f"atomic_descriptions_{split}.json")
    ) as f:
        descriptions = json.load(f)["annotations"]
    with open(os.path.join(root_dir, "takes.json")) as f:
        takes = json.load(f)
    return descriptions, takes


def process_take(take: Dict, descriptions: Dict):
    """(egoexo4d_utils.py:20-24)."""
    video_uid = take["take_uid"]
    task_name = take["parent_task_name"]
    desc_infos = descriptions.get(video_uid, [{}])[0].get("descriptions", [])
    return video_uid, task_name, desc_infos


def process_description(desc_info: Dict):
    """(egoexo4d_utils.py:26-30)."""
    raw_desc = desc_info["text"]
    not_interaction = hand_transfer_flag(raw_desc)
    raw_desc = process_hand_mentions(raw_desc)
    return (
        raw_desc,
        desc_info["timestamp"],
        desc_info["subject"],
        desc_info["ego_visible"],
        desc_info["unsure"],
        not_interaction,
    )


def clip_duration(timestamp: float) -> np.ndarray:
    """Frame timestamps for the +/-2 s window at 20 fps
    (egoexo4d_utils.py:48-52)."""
    start = timestamp - _CAMERA.time_window
    end = timestamp + _CAMERA.time_window
    return np.arange(start, end, 1.0 / _CAMERA.fps)


def has_projectaria() -> bool:
    try:
        import projectaria_tools  # noqa: F401

        return True
    except ImportError:
        return False


def extract_images(vrs_path: str, data: Dict, save_path: str) -> None:
    """VRS -> undistorted pinhole JPEGs (egoexo4d_utils.py:32-79).

    Requires projectaria_tools (C++ VRS decoding is inherently host-side
    IO — SURVEY.md §2.3).  Idempotent: existing valid frames are kept.
    """
    if not has_projectaria():
        raise RuntimeError(
            "projectaria_tools is required for VRS extraction; install it "
            "on the ingest host or pre-extract frames to "
            f"{save_path}/<timestamp>.jpg"
        )
    from projectaria_tools.core import calibration, data_provider
    from projectaria_tools.core.sensor_data import TimeDomain, TimeQueryOptions
    from PIL import Image

    provider = data_provider.create_vrs_data_provider(vrs_path)
    camera_label = "camera-rgb"
    stream_id = provider.get_stream_id_from_label(camera_label)
    device_calibration = provider.get_device_calibration()
    rgb_calib = device_calibration.get_camera_calib(camera_label)
    pinhole = calibration.get_linear_camera_calibration(
        _CAMERA.aria.pinhole_image_size,
        _CAMERA.aria.pinhole_image_size,
        _CAMERA.aria.focal_len,
        camera_label,
        rgb_calib.get_transform_device_camera(),
    )
    time_domain = TimeDomain.DEVICE_TIME
    option = TimeQueryOptions.CLOSEST
    start_ns = provider.get_first_time_ns(stream_id, time_domain)

    os.makedirs(save_path, exist_ok=True)
    for _t in clip_duration(data["timestamp"]):
        image_file = os.path.join(save_path, f"{round(_t, 3)}.jpg")
        if os.path.exists(image_file):
            continue
        t_ns = start_ns + int(_t * 1e9)
        img_data = provider.get_image_data_by_time_ns(
            stream_id, t_ns, time_domain, option
        )
        raw = img_data[0].to_numpy_array()
        undistorted = calibration.distort_by_calibration(
            raw, pinhole, rgb_calib
        )
        undistorted = np.rot90(undistorted, -1)
        Image.fromarray(undistorted).save(image_file)
