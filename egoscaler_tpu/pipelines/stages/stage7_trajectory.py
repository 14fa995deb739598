"""Stage 7: 6DoF trajectory extraction (the heaviest stage).

Rebuild of egoscaler/data/train/7_get_object_trajectory.py:34-361 on the
TPU-native stack: depth from models/depth_wrapper (batched clip
inference), pixel-accurate object mask from detector boxes -> segmenter
(JAX SAM / GrabCut) -> polygon refine -> HOD IoU arbitration
(7_get:130-152), tracks seeded in the mask (LK or the learned tracker),
then ONE compiled `extract_trajectory` call replaces the per-frame
Open3D loop.

Outputs byte-compatible artifacts (7_get:321-354):
  trajs/{ds}/{uid}/{file}.pkl   {init_bbox (8,3), traj_quat (n,7),
                                 traj_rotvec (n,6)}
  obs_images/{...}.jpg          the observation frame
  depths/{...}.npy              observation metric depth
  pcrgbs/{...}.npy              (N, 6) colored point cloud for training
"""
from __future__ import annotations

import argparse
import os
import pickle
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import CameraConfig, DataConfig
from egoscaler_tpu.geometry.camera import bbox_exclusion_mask, get_points_colors
from egoscaler_tpu.ops.lucas_kanade import lk_track_clip, mask_query_points
from egoscaler_tpu.pipelines.stages.common import read_json, shard_files, list_stage_files
from egoscaler_tpu.pipelines.trajectory import extract_trajectory

_CAM = CameraConfig()


def boxes_to_mask_arrays(bboxes: Dict, times, height: int, width: int,
                         max_boxes: int = 16) -> np.ndarray:
    """Per-frame exclusion masks from the stage-6 detections
    (pcm_tools.py:81-83 semantics: all detected boxes are excluded)."""
    t = len(times)
    masks = np.zeros((t, height, width), bool)
    for i, tm in enumerate(times):
        dets = bboxes.get(str(tm), [])
        for d in dets[:max_boxes]:
            b = d["box"]
            masks[i, max(b["ymin"], 0): b["ymax"], max(b["xmin"], 0): b["xmax"]] = True
    return masks


def _hod_iou_fn(hod_box, height: int, width: int):
    hod_mask = np.zeros((height, width), bool)
    hod_mask[hod_box[1]: hod_box[3], hod_box[0]: hod_box[2]] = True

    def iou(m):
        inter = (m & hod_mask).sum()
        union = (m | hod_mask).sum()
        return inter / union if union else 0.0

    return iou


def _label_candidates(bboxes_t0, obj_label: str):
    cands = [d for d in bboxes_t0 if obj_label.lower() in d["label"].lower()]
    return cands or list(bboxes_t0)


def object_mask_from_boxes(bboxes_t0, obj_label: str, height: int,
                           width: int, hod_box=None) -> Optional[np.ndarray]:
    """Rectangle target mask (weight-free fallback for 7_get:130-152):
    choose the detection matching the object label — arbitrated by HOD
    IoU when present, else the most confident."""
    cands = _label_candidates(bboxes_t0, obj_label)
    if not cands:
        return None

    def to_mask(d):
        m = np.zeros((height, width), bool)
        b = d["box"]
        m[max(b["ymin"], 0): b["ymax"], max(b["xmin"], 0): b["xmax"]] = True
        return m

    if hod_box is not None:
        iou = _hod_iou_fn(hod_box, height, width)
        best = max(cands, key=lambda d: iou(to_mask(d)))
    else:
        best = max(cands, key=lambda d: d["score"])
    return to_mask(best)


def object_segmentation_mask(
    image: np.ndarray,
    bboxes_t0,
    obj_label: str,
    hod_box=None,
    segmenter=None,
    polygon_refinement: bool = True,
) -> Optional[np.ndarray]:
    """Pixel-accurate target mask (7_get:130-152): candidate detection
    boxes -> segmenter (JAX SAM / GrabCut) -> polygon refine -> HOD IoU
    arbitration (7_get:139-152), score arbitration otherwise.

    Falls back to the rectangle mask when no segmenter is given or the
    segmentation comes back empty — rectangle seeding puts background
    pixels in the track set and degrades Kabsch rotations, so callers
    should pass a segmenter whenever one is available."""
    height, width = image.shape[:2]
    cands = _label_candidates(bboxes_t0, obj_label)
    if not cands:
        return None
    if segmenter is None:
        return object_mask_from_boxes(cands, obj_label, height, width, hod_box)

    from egoscaler_tpu.models.grounded_sam import refine_masks

    boxes = [
        [d["box"]["xmin"], d["box"]["ymin"], d["box"]["xmax"], d["box"]["ymax"]]
        for d in cands
    ]
    masks = segmenter.segment(np.asarray(image), boxes)
    masks = [m.astype(bool) for m in refine_masks(masks, polygon_refinement)]
    if hod_box is not None:
        iou = _hod_iou_fn(hod_box, height, width)
        best = max(range(len(cands)), key=lambda i: iou(masks[i]))
    else:
        best = max(range(len(cands)), key=lambda i: cands[i]["score"])
    mask = masks[best]
    if not mask.any():
        return object_mask_from_boxes(cands, obj_label, height, width, hod_box)
    return mask


def build_segmenter(kind: str = "auto", sam_checkpoint: Optional[str] = None):
    """Stage-7 segmenter factory: 'sam' (JAX SAM, models/sam.py),
    'grabcut' (weight-free), 'none' (rectangle masks), or 'auto'
    (sam when a checkpoint is given, else grabcut)."""
    if kind == "none":
        return None
    if kind == "sam" or (kind == "auto" and sam_checkpoint):
        from egoscaler_tpu.models.grounded_sam import JaxSamSegmenter

        return JaxSamSegmenter(checkpoint_path=sam_checkpoint)
    from egoscaler_tpu.models.grounded_sam import GrabCutSegmenter

    return GrabCutSegmenter()


def build_tracker(kind: str = "auto", checkpoint: Optional[str] = None):
    """Stage-7 tracker factory: 'learned' (models/tracker.SpaTracker with
    trained weights — the checked-in occlusion-distilled asset or a .npz
    path; the default when the asset exists, matching the reference's
    learned SpaTracker and measured both faster and more accurate than
    LK: 223 vs 354 ms/clip, 4.6 vs 16.9 px post-occlusion), 'lk'
    (weight-free pyramidal LK fallback), or 'auto'.

    The learned callable matches process_clip's tracker interface:
    (clip [0,1], depths, queries (Q,3)) -> (T, Q, 3) tracks.
    """
    from egoscaler_tpu.models.tracker import (
        SpaTracker,
        SpaTrackerPredictor,
        default_asset_path,
        load_tracker_asset,
    )

    default_path = default_asset_path()
    if kind == "auto":
        kind = (
            "learned"
            if (checkpoint or os.path.exists(default_path)) else "lk"
        )
    if kind == "lk":
        return None
    asset = load_tracker_asset(checkpoint or default_path)
    if asset is None:
        raise FileNotFoundError(
            f"learned tracker weights not found at "
            f"{checkpoint or default_path}; run scripts/train_tracker.py "
            "or pass --tracker_checkpoint"
        )
    cfg, params = asset
    predictor = SpaTrackerPredictor(SpaTracker(cfg), params)

    def tracker(clip, depths, queries):
        return predictor(clip, depths, queries)

    return tracker


def process_clip(
    data: Dict,
    data_dir: str,
    depth_model,
    cfg: DataConfig = DataConfig(),
    max_tracks: int = 800,
    max_keypoints: int = 4096,
    num_hypotheses: int = 4096,
    key=None,
    tracker=None,
    segmenter=None,
) -> Optional[Dict]:
    """One candidate -> trajectory dict, or None when any guard trips."""
    from PIL import Image

    from egoscaler_tpu.data.adapters.egoexo4d import clip_duration

    key = key if key is not None else jax.random.PRNGKey(0)
    ds_name, uid, fname = (
        data["dataset_name"], data["video_uid"], data["file_name"]
    )
    traj_path = f"{data_dir}/trajs/{ds_name}/{uid}/{fname}.pkl"
    if os.path.exists(traj_path):
        return None

    duration = [round(float(t), 3) for t in clip_duration(data["timestamp"])]
    start_sec, end_sec = data["start_sec"], data["end_sec"]
    window = [t for t in duration if start_sec <= t <= end_sec]
    images_dir = f"{data_dir}/images/{ds_name}/{uid}/{fname}"

    frames, times = [], []
    for t in window:
        f = os.path.join(images_dir, f"{t}.jpg")
        if os.path.exists(f):
            frames.append(np.asarray(Image.open(f)))
            times.append(t)
    if len(frames) < 2:
        return None
    clip = np.stack(frames)
    t_n, h, w, _ = clip.shape

    bbox_path = f"{data_dir}/bboxes/{ds_name}/{uid}/{fname}.json"
    if not os.path.exists(bbox_path):
        return None
    bboxes = read_json(bbox_path)

    # depth for all frames (batched, 7_get:112-124)
    depths = np.asarray(depth_model.get_depth_batch(jnp.asarray(clip)))

    # target object mask (7_get:130-152; HOD arbitration when available)
    hod_path = f"{data_dir}/hods/{ds_name}/{uid}/{fname}.pkl"
    hod_box = None
    if os.path.exists(hod_path):
        with open(hod_path, "rb") as f:
            hod = pickle.load(f)
        res = hod.get(start_sec, {})
        if res.get("obj-bbox"):
            hod_box = [int(v) for v in res["obj-bbox"][0]]
    obj_mask = object_segmentation_mask(
        frames[0], bboxes.get(str(times[0]), []),
        data["manipulated_object"], hod_box, segmenter,
    )
    if obj_mask is None:
        return None

    # tracks seeded in the mask (predictor.py:160-175)
    qpts, qvalid = mask_query_points(
        jnp.asarray(obj_mask), max_tracks, key
    )
    n_q = int(np.asarray(qvalid).sum())
    if n_q < 4:
        return None
    if tracker is not None:
        # learned tracker (models/tracker.SpaTrackerPredictor interface)
        z0 = depths[0][
            np.clip(np.asarray(qpts[:, 1]).astype(int), 0, h - 1),
            np.clip(np.asarray(qpts[:, 0]).astype(int), 0, w - 1),
        ]
        queries = jnp.concatenate(
            [qpts, jnp.asarray(z0)[:, None]], axis=1
        )
        tracks = np.asarray(
            tracker(jnp.asarray(clip, jnp.float32) / 255.0,
                    jnp.asarray(depths), queries)
        )
    else:
        tracks = np.asarray(
            lk_track_clip(jnp.asarray(clip, jnp.float32),
                          jnp.asarray(depths), qpts)
        )
    tracks = tracks[:, :n_q]

    masks = boxes_to_mask_arrays(bboxes, times, h, w)
    rgbd = np.concatenate(
        [clip.astype(np.float32), depths[..., None]], axis=-1
    )

    res = extract_trajectory(
        jnp.asarray(rgbd), jnp.asarray(masks), jnp.asarray(tracks),
        jnp.asarray(t_n),
        _CAM.aria.focal_len, _CAM.aria.principal_point,
        cfg=cfg, max_keypoints=max_keypoints,
        num_hypotheses=num_hypotheses, key=key,
    )
    if not bool(res.ok):
        return None

    traj = {
        "init_bbox": np.asarray(res.init_bbox),
        "traj_quat": np.asarray(res.traj_quat)[: t_n],
        "traj_rotvec": np.asarray(res.traj_rotvec)[: t_n],
    }

    # observation artifacts (7_get:347-354)
    obs_img = frames[0]
    obs_depth = depths[0]
    for sub in ("obs_images", "depths", "trajs", "pcrgbs"):
        os.makedirs(f"{data_dir}/{sub}/{ds_name}/{uid}", exist_ok=True)
    Image.fromarray(obs_img).save(
        f"{data_dir}/obs_images/{ds_name}/{uid}/{fname}.jpg"
    )
    np.save(f"{data_dir}/depths/{ds_name}/{uid}/{fname}", obs_depth)
    with open(traj_path, "wb") as f:
        pickle.dump(traj, f)

    # training point cloud (pcrgbs): full-frame colored back-projection
    pts, cols, valid = get_points_colors(
        jnp.asarray(rgbd[0]), _CAM.aria.focal_len, _CAM.aria.focal_len,
        _CAM.aria.principal_point, d_thres=cfg.depth_threshold,
    )
    pv = np.asarray(valid)
    pcrgb = np.concatenate(
        [np.asarray(pts)[pv], np.asarray(cols)[pv]], axis=1
    ).astype(np.float32)
    np.save(f"{data_dir}/pcrgbs/{ds_name}/{uid}/{fname}", pcrgb)
    return traj


def run(args, depth_model=None) -> int:
    from egoscaler_tpu.models.depth_wrapper import DepthAnything
    from egoscaler_tpu.models.depth_anything import DepthAnythingConfig

    if depth_model is None:
        cfg = (
            DepthAnythingConfig.vitl()
            if args.depth_checkpoint
            else DepthAnythingConfig.vits().tiny()
        )
        depth_model = DepthAnything(
            cfg=cfg, checkpoint_path=args.depth_checkpoint
        )

    segmenter = build_segmenter(
        getattr(args, "segmenter", "auto"),
        getattr(args, "sam_checkpoint", None),
    )
    tracker = build_tracker(
        getattr(args, "tracker", "auto"),
        getattr(args, "tracker_checkpoint", None),
    )

    infos_path = os.path.join(args.data_dir, "infos.json")
    if os.path.exists(infos_path):
        all_data = read_json(infos_path)
    else:
        all_data = [read_json(f) for f in list_stage_files(args.data_dir, "infos")]
    all_data = shard_files(
        all_data, start_index=args.start_index, end_index=args.end_index
    )
    n = 0
    for data in all_data:
        if "start_sec" not in data:
            continue
        t0 = time.time()
        out = process_clip(data, args.data_dir, depth_model,
                           segmenter=segmenter, tracker=tracker)
        if out is not None:
            n += 1
            print(
                f"{data['file_name']}: trajectory ok "
                f"({time.time() - t0:.1f}s)", flush=True,
            )
    print(f"Extracted {n} trajectories")
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--depth_checkpoint", default=None)
    p.add_argument("--sam_checkpoint", default=None)
    p.add_argument(
        "--segmenter", default="auto",
        choices=("auto", "sam", "grabcut", "none"),
        help="object-mask source: JAX SAM, GrabCut, or rectangle boxes",
    )
    p.add_argument(
        "--tracker", default="auto", choices=("auto", "lk", "learned"),
        help="point tracker: trained window tracker "
        "(assets/tracker_occlusion.npz, the default when present) or "
        "weight-free pyramidal LK",
    )
    p.add_argument("--tracker_checkpoint", default=None)
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=-1)
    args = p.parse_args()
    run(args)


if __name__ == "__main__":
    main()
