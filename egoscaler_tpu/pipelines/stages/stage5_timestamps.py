"""Stage 5: temporal action localization (start/end frame of the action).

Rebuild of egoscaler/data/train/5_get_timestamp.py: the reference shows
GPT-4o eight numbered frames and asks for start/end indices.  Two
backends here:

* `VlmLocalizer`: the same protocol over any ChatModel that accepts
  images (API adapter);
* `MotionLocalizer`: a zero-egress, deterministic fallback — track
  points through the clip with pyramidal LK and pick the window where
  median track motion exceeds a threshold (the action's motion profile).

Both write start_sec/end_sec back into infos/ files like the reference.
"""
from __future__ import annotations

import argparse
import os
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from egoscaler_tpu.configs import CameraConfig
from egoscaler_tpu.pipelines.stages.common import (
    list_stage_files,
    read_json,
    write_json,
)

_CAM = CameraConfig()

# Task prompt for the VLM protocol (the reference ships it as
# data/prompt/get_timestamp.txt and feeds it as the system message,
# 5_get_timestamp.py:30-44; any custom text file drops in via
# --prompt_file).
TIMESTAMP_PROMPT = """\
You are shown numbered frames subsampled from a first-person video, plus
an action description and the manipulated object.  Identify the frame
where the hand-object interaction described begins (start frame) and the
frame where it ends (end frame).  The clip may contain irrelevant frames
before and after the action.  The start frame number must be less than
the end frame number.  Answer with exactly the two frame numbers, e.g.
"start frame: 2, end frame: 6".  If the described interaction does not
appear in the frames, answer exactly "invalid"."""


def number_frames(frames: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Stamp each frame with its index (5_get_timestamp.py:155-166:
    white index text near the bottom center)."""
    from PIL import Image, ImageDraw

    out = []
    for i, fr in enumerate(frames):
        img = Image.fromarray(np.asarray(fr).astype(np.uint8))
        draw = ImageDraw.Draw(img)
        text = str(i)
        bbox = draw.textbbox((0, 0), text)
        tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
        pos = ((img.width - tw) // 2, max(img.height - th - 100, 0))
        draw.text(pos, text, fill="white")
        out.append(np.asarray(img))
    return out


class VlmLocalizer:
    """VLM frame localization (AzureGpt4o protocol,
    5_get_timestamp.py:30-90,150-202): number `n_frames` subsampled
    frames, send them with the task prompt and the action/object query,
    parse the two frame indices from the reply ("invalid" -> None).

    `vlm(system_prompt, query_text, images) -> str` is any
    vision-capable chat backend (llm.OpenAIChat.vision on API hosts, a
    stub in tests).
    """

    def __init__(
        self,
        vlm: Callable[[str, str, List[np.ndarray]], str],
        prompt: str = TIMESTAMP_PROMPT,
        n_frames: int = 8,
    ):
        self.vlm = vlm
        self.prompt = prompt
        self.n_frames = n_frames

    def localize(
        self,
        frames: np.ndarray,
        query: str = "",
        active_object: str = "",
    ) -> Optional[Tuple[int, int]]:
        t = len(frames)
        sub = np.round(
            np.arange(0, t, max(t // self.n_frames, 1))
        ).astype(int)[: self.n_frames]
        stamped = number_frames([frames[i] for i in sub])
        text = (
            f"action description: {query}, manipulated object: {active_object}"
        )
        response = self.vlm(self.prompt, text, stamped)
        if response.strip().lower() == "invalid":
            return None
        nums = [int(v) for v in re.findall(r"\d+", response)]
        if len(nums) != 2:
            return None
        s, e = nums
        if not (0 <= s < len(sub) and 0 <= e < len(sub) and s < e):
            return None
        return int(sub[s]), int(sub[e])


class MotionLocalizer:
    """Pick [start, end] by thresholding aggregate frame motion."""

    def __init__(self, grid: int = 12, motion_quantile: float = 0.6):
        self.grid = grid
        self.q = motion_quantile

    def localize(self, frames: np.ndarray) -> Tuple[int, int]:
        """(T, H, W, 3) -> (start_idx, end_idx) inclusive frame indices."""
        import jax
        import jax.numpy as jnp

        from egoscaler_tpu.ops.lucas_kanade import lk_track_clip

        t, h, w, _ = frames.shape
        ys = np.linspace(h * 0.2, h * 0.8, self.grid)
        xs = np.linspace(w * 0.2, w * 0.8, self.grid)
        q = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)
        depths = jnp.ones((t, h, w), jnp.float32)
        tracks = np.asarray(
            lk_track_clip(jnp.asarray(frames, jnp.float32), depths,
                          jnp.asarray(q))
        )[..., :2]
        step = np.linalg.norm(np.diff(tracks, axis=0), axis=-1)  # (T-1, Q)
        motion = np.median(step, axis=1)  # (T-1,)
        thresh = np.quantile(motion, self.q)
        active = motion >= max(thresh, 1e-3)
        if not active.any():
            return 0, t - 1
        idx = np.nonzero(active)[0]
        return int(idx[0]), int(min(idx[-1] + 1, t - 1))


def load_clip_frames(images_dir: str, data: Dict,
                     stride: int = 1) -> Tuple[np.ndarray, List[float]]:
    from PIL import Image

    from egoscaler_tpu.data.adapters.egoexo4d import clip_duration

    duration = [round(float(t), 3) for t in clip_duration(data["timestamp"])]
    frames, times = [], []
    for t in duration[::stride]:
        f = os.path.join(images_dir, f"{t}.jpg")
        if not os.path.exists(f):
            continue
        frames.append(np.asarray(Image.open(f)))
        times.append(t)
    return (np.stack(frames) if frames else np.zeros((0,))), times


def run(args, localizer=None) -> List[Dict]:
    localizer = localizer or MotionLocalizer()
    infos = list_stage_files(args.data_dir, "infos")
    updated = []
    for f in infos:
        data = read_json(f)
        if "start_sec" in data:
            continue
        images_dir = os.path.join(
            args.data_dir, "images", data["dataset_name"],
            data["video_uid"], data["file_name"],
        )
        frames, times = load_clip_frames(images_dir, data, stride=args.stride)
        if getattr(frames, "size", 0) == 0:
            continue
        if isinstance(localizer, VlmLocalizer):
            se = localizer.localize(
                frames,
                query=data.get("action_description", ""),
                active_object=data.get("manipulated_object", ""),
            )
            if se is None:  # "invalid" / unparseable: drop, 5_get:189-199
                continue
            s, e = se
        else:
            s, e = localizer.localize(frames)
        data["start_sec"] = times[s]
        data["end_sec"] = times[e]
        write_json(f, data)
        updated.append(data)
    print(f"Localized {len(updated)} clips")
    return updated


def build_localizer(kind: str = "motion", prompt_file: Optional[str] = None):
    """'motion' (zero-egress default) or 'vlm' (OpenAI-compatible API
    host; reads OPENAI_API_KEY like the reference)."""
    if kind == "motion":
        return MotionLocalizer()
    from egoscaler_tpu.pipelines.llm import OpenAIChat

    prompt = TIMESTAMP_PROMPT
    if prompt_file:
        with open(prompt_file) as f:
            prompt = f.read()
    return VlmLocalizer(OpenAIChat().vision, prompt=prompt)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--stride", type=int, default=4,
                   help="frame subsampling for localization")
    p.add_argument("--localizer", default="motion",
                   choices=("motion", "vlm"))
    p.add_argument("--prompt_file", default=None,
                   help="task prompt text (data/prompt/get_timestamp.txt "
                   "schema) for the vlm localizer")
    args = p.parse_args()
    run(args, localizer=build_localizer(args.localizer, args.prompt_file))


if __name__ == "__main__":
    main()
