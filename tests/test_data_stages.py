"""End-to-end data-construction pipeline on a synthetic mini-corpus.

Builds Ego-Exo4D-layout annotations + rendered clip frames on disk, then
runs stages 1 -> 2 -> 3 -> 5 -> 6 -> 7 (stage 4 frame extraction is
replaced by writing the rendered frames directly — VRS decode needs
projectaria) and asserts the trajs/pcrgbs artifacts appear with the
reference pickle schema.
"""
import argparse
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from egoscaler_tpu.configs import CameraConfig, DataConfig, PCMConfig
from egoscaler_tpu.data.tools import nlp_tools
from egoscaler_tpu.pipelines.stages import (
    stage1_candidates,
    stage2_filter,
    stage3_object,
    stage5_timestamps,
    stage6_boxes,
    stage7_trajectory,
)

CAM = CameraConfig()


def make_corpus(root, save, rng):
    """Annotations + takes in egoexo4d layout."""
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    uid = "take0001"
    descriptions = {
        uid: [
            {
                "descriptions": [
                    {
                        "text": "C picks up the cup with his right hand.",
                        "timestamp": 10.0,
                        "subject": "C",
                        "ego_visible": True,
                        "unsure": False,
                    },
                    {   # transitive but blacklisted verb: survives
                        # stage 1 (has an object), filtered in stage 2
                        "text": "C watches the pot.",
                        "timestamp": 20.0,
                        "subject": "C",
                        "ego_visible": True,
                        "unsure": False,
                    },
                ]
            }
        ]
    }
    takes = [
        {
            "take_uid": uid,
            "parent_task_name": "Cooking",
            "take_name": "t1",
            "capture": {"cameras": [{"cam_id": "aria01"}]},
        }
    ]
    with open(os.path.join(root, "annotations", "atomic_descriptions_train.json"), "w") as f:
        json.dump({"annotations": descriptions}, f)
    with open(os.path.join(root, "annotations", "atomic_descriptions_val.json"), "w") as f:
        json.dump({"annotations": {}}, f)
    with open(os.path.join(root, "takes.json"), "w") as f:
        json.dump(takes, f)
    return uid


def render_clip_frames(save_dir, data, rng, h=96, w=96):
    """Write rendered frames for the clip window (stage-4 substitute)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_trajectory_pipeline import make_world, render_frame

    world_pts, world_cols = make_world(rng, n=20000)
    obj_local = rng.uniform(-0.06, 0.06, (20, 3)).astype(np.float32)
    obj0 = np.array([0.0, 0.0, 1.2], np.float32)
    obj_cols = np.tile(np.array([[0.9, 0.2, 0.1]], np.float32), (20, 1))

    from egoscaler_tpu.data.adapters.egoexo4d import clip_duration

    duration = [round(float(t), 3) for t in clip_duration(data["timestamp"])]
    out_dir = os.path.join(
        save_dir, "images", data["dataset_name"], data["video_uid"],
        data["file_name"],
    )
    os.makedirs(out_dir, exist_ok=True)
    # object moves only in the middle third of the clip
    t0 = len(duration) // 3
    t1 = 2 * len(duration) // 3
    pos = obj0.copy()
    for i, t in enumerate(duration):
        if t0 <= i < t1:
            pos = pos + np.array([0.02, 0.0, 0.0], np.float32)
        scene = np.concatenate([world_pts, obj_local + pos])
        cols = np.concatenate([world_cols, obj_cols])
        rgbd = render_frame(scene, cols, cam_pos=np.zeros(3, np.float32))
        Image.fromarray(rgbd[..., :3].astype(np.uint8)).save(
            os.path.join(out_dir, f"{t}.jpg")
        )


class PatchedCam:
    """Scale camera helpers to the 96x96 test frames."""

    F = 80.0
    PP = 47.5


def test_full_data_pipeline(tmp_path, rng, monkeypatch):
    root = str(tmp_path / "corpus")
    save = str(tmp_path / "out")
    os.makedirs(save, exist_ok=True)
    uid = make_corpus(root, save, rng)

    # stage 1
    cands = stage1_candidates.run("egoexo4d", root, save)
    assert len(cands) == 2  # 'watches the pot' survives stage 1
    assert cands[0]["verb"] == "pick up"
    assert cands[0]["object"] == "cup"

    # stage 2 (rule-based judge)
    kept = stage2_filter.run(save)
    assert len(kept) == 1
    assert "pick" in kept[0]["action_description"]

    # stage 3
    infos = stage3_object.run(save)
    assert len(infos) == 1
    assert infos[0]["manipulated_object"] == "cup"
    data = infos[0]

    # stage 4 substitute: render frames
    render_clip_frames(save, data, rng)

    # stage 5: motion localization
    args5 = argparse.Namespace(data_dir=save, stride=4)
    updated = stage5_timestamps.run(args5)
    assert len(updated) == 1
    data = updated[0]
    assert data["start_sec"] < data["end_sec"]

    # stage 6: motion-detector boxes
    args6 = argparse.Namespace(data_dir=save, threshold=0.3)
    stage6_boxes.run(args6)
    bbox_file = os.path.join(
        save, "bboxes", data["dataset_name"], data["video_uid"],
        data["file_name"] + ".json",
    )
    assert os.path.exists(bbox_file)

    # stage 7 with a tiny random-weight depth model and scaled intrinsics
    from egoscaler_tpu.models.depth_anything import DepthAnythingConfig
    from egoscaler_tpu.models.depth_wrapper import DepthAnything

    depth_model = DepthAnything(
        cfg=DepthAnythingConfig.vitl().tiny(), input_size=56
    )
    monkeypatch.setattr(
        stage7_trajectory._CAM.aria.__class__, "focal_len", PatchedCam.F,
        raising=False,
    )
    monkeypatch.setattr(
        stage7_trajectory._CAM.aria.__class__, "principal_point",
        PatchedCam.PP, raising=False,
    )
    out = stage7_trajectory.process_clip(
        data, save, depth_model,
        cfg=DataConfig(pcm=PCMConfig(voxel_size=0.1)),
        max_tracks=32, max_keypoints=1024, num_hypotheses=512,
    )
    # the tiny random depth model gives garbage depth; the pipeline may
    # reject the clip (ok=False) — what we assert is that the machinery
    # runs end to end and, if accepted, artifacts exist in schema
    if out is not None:
        traj_file = os.path.join(
            save, "trajs", data["dataset_name"], data["video_uid"],
            data["file_name"] + ".pkl",
        )
        with open(traj_file, "rb") as f:
            traj = pickle.load(f)
        assert set(traj) == {"init_bbox", "traj_quat", "traj_rotvec"}
        assert traj["init_bbox"].shape == (8, 3)
        assert traj["traj_quat"].shape[1] == 7
        assert traj["traj_rotvec"].shape[1] == 6
        assert os.path.exists(
            os.path.join(save, "pcrgbs", data["dataset_name"],
                         data["video_uid"], data["file_name"] + ".npy")
        )


def test_nlp_tools_reference_behavior():
    assert nlp_tools.hand_transfer_flag(
        "C moves the cup from his right hand to his left hand."
    )
    assert not nlp_tools.hand_transfer_flag("C picks up the cup.")
    assert (
        nlp_tools.process_hand_mentions("C stirs the pot with his left hand")
        == "C stirs the pot"
    )
    assert (
        nlp_tools.process_hand_mentions(
            "C holds with the knife in his right hand"
        )
        == "C holds with the knife"
    )
    assert nlp_tools.format_description(" C picks  up the cup") == "C picks up the cup."
    assert nlp_tools.which_hand("with his left hand") == "left"
    assert nlp_tools.time_str_to_sec("00:01:30.500000") == 90.5


def test_lemmatizer_and_svo():
    lemma = nlp_tools.lemmatize_description("C picks up the cup.")
    assert "pick up the cup" in lemma
    verb, obj = nlp_tools.extract_verb_obj("c pick up the cup .")
    assert verb == "pick up"
    assert obj == "cup"
    verb, obj = nlp_tools.extract_verb_obj("c place the knife on the table .")
    assert verb == "place"
    assert obj == "knife"
    verb, obj = nlp_tools.extract_verb_obj("c open the drawer with his hand .")
    assert verb == "open"
    assert obj == "drawer"


def test_stage7_hod_arbitration(tmp_path, rng):
    """7_get:139-152: when hods/<clip>.pkl exists, the object mask is
    chosen by IoU against the HOD object box, not by detector score."""
    import pickle

    from egoscaler_tpu.pipelines.stages.stage7_trajectory import (
        object_mask_from_boxes,
    )

    h = w = 64
    # two candidate detections: det A higher score, det B overlaps HOD box
    dets = [
        {"label": "cup", "score": 0.9,
         "box": {"xmin": 2, "ymin": 2, "xmax": 12, "ymax": 12}},
        {"label": "cup", "score": 0.4,
         "box": {"xmin": 40, "ymin": 40, "xmax": 60, "ymax": 60}},
    ]
    # without HOD: highest score wins (det A)
    m = object_mask_from_boxes(dets, "cup", h, w, hod_box=None)
    assert m[5, 5] and not m[50, 50]
    # with HOD box over det B's region: IoU arbitration picks det B
    m = object_mask_from_boxes(dets, "cup", h, w, hod_box=[42, 42, 58, 58])
    assert m[50, 50] and not m[5, 5]
    # label filtering: unrelated label falls back to all candidates
    m = object_mask_from_boxes(dets, "wrench", h, w, hod_box=None)
    assert m is not None


def test_stage7_segmentation_mask_beats_rectangle(rng):
    """7_get:130-173: the reference seeds tracks in a GroundedSAM
    *segmentation* mask, not the detection rectangle.  A static
    distractor inside the detection box corrupts rectangle-seeded
    queries (background points dilute the object motion estimate) but
    not segmentation-seeded ones."""
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.models.grounded_sam import GrabCutSegmenter
    from egoscaler_tpu.ops.lucas_kanade import mask_query_points
    from egoscaler_tpu.pipelines.stages.stage7_trajectory import (
        object_mask_from_boxes,
        object_segmentation_mask,
    )

    h = w = 96
    # dark textured background + bright uniform object blob; the detector
    # box is loose and includes a big static background margin
    img = (20 + 30 * rng.random((h, w, 3))).astype(np.uint8)
    oy0, oy1, ox0, ox1 = 40, 60, 40, 60
    img[oy0:oy1, ox0:ox1] = (230, 60, 50)
    obj_px = np.zeros((h, w), bool)
    obj_px[oy0:oy1, ox0:ox1] = True
    dets = [{
        "label": "cup", "score": 0.9,
        "box": {"xmin": 24, "ymin": 24, "xmax": 76, "ymax": 76},
    }]

    rect = object_mask_from_boxes(dets, "cup", h, w)
    seg = object_segmentation_mask(
        img, dets, "cup", segmenter=GrabCutSegmenter()
    )
    # rectangle covers the distractor margin; segmentation doesn't
    assert rect[30, 30] and not obj_px[30, 30]
    assert seg[50, 50]
    seg_purity = (seg & obj_px).sum() / max(seg.sum(), 1)
    rect_purity = (rect & obj_px).sum() / max(rect.sum(), 1)
    assert seg_purity > 0.9, seg_purity
    assert rect_purity < 0.2, rect_purity

    # seeded query sets: object moves (+2, 0) px/frame, background static.
    # displacement error of the seed set vs the object's true motion:
    key = jax.random.PRNGKey(0)
    for mask, want_clean in ((rect, False), (seg, True)):
        pts, valid = mask_query_points(jnp.asarray(mask), 128, key)
        pts = np.asarray(pts)[np.asarray(valid)]
        on_obj = obj_px[
            pts[:, 1].astype(int).clip(0, h - 1),
            pts[:, 0].astype(int).clip(0, w - 1),
        ]
        # per-seed displacement: (2, 0) on object, (0, 0) on background
        err = np.where(on_obj, 0.0, 2.0).mean()
        if want_clean:
            assert err < 0.2, err
        else:
            assert err > 1.0, err


def test_stage7_segmentation_hod_arbitration(rng):
    """object_segmentation_mask keeps the HOD-IoU arbitration of
    7_get:139-152 when choosing among segmented candidates."""
    from egoscaler_tpu.models.grounded_sam import GrabCutSegmenter
    from egoscaler_tpu.pipelines.stages.stage7_trajectory import (
        object_segmentation_mask,
    )

    h = w = 96
    img = (20 + 30 * rng.random((h, w, 3))).astype(np.uint8)
    img[10:26, 10:26] = (230, 60, 50)    # det A blob
    img[60:80, 60:80] = (60, 220, 80)    # det B blob
    dets = [
        {"label": "cup", "score": 0.9,
         "box": {"xmin": 6, "ymin": 6, "xmax": 30, "ymax": 30}},
        {"label": "cup", "score": 0.4,
         "box": {"xmin": 56, "ymin": 56, "xmax": 84, "ymax": 84}},
    ]
    seg = object_segmentation_mask(
        img, dets, "cup", segmenter=GrabCutSegmenter()
    )
    assert seg[18, 18] and not seg[70, 70]  # score arbitration -> det A
    seg = object_segmentation_mask(
        img, dets, "cup", hod_box=[58, 58, 82, 82],
        segmenter=GrabCutSegmenter(),
    )
    assert seg[70, 70] and not seg[18, 18]  # HOD IoU -> det B


def test_stage7_build_tracker_learned():
    """build_tracker('learned') loads the checked-in occlusion-distilled
    asset and exposes the process_clip tracker interface (clip, depths,
    queries (Q,3)) -> (T, Q, 3) for arbitrary clip lengths (sliding
    windows)."""
    import jax.numpy as jnp

    from egoscaler_tpu.pipelines.stages.stage7_trajectory import build_tracker

    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "egoscaler_tpu", "assets", "tracker_occlusion.npz",
    )
    if not os.path.exists(asset):
        pytest.skip("tracker asset not trained yet")

    assert build_tracker("lk") is None
    tracker = build_tracker("learned")
    rng = np.random.default_rng(0)
    t, h, w, q = 12, 64, 64, 8  # t > train window: exercises the slide
    clip = jnp.asarray(rng.random((t, h, w, 3)).astype(np.float32))
    depths = jnp.asarray((1 + rng.random((t, h, w))).astype(np.float32))
    queries = jnp.asarray(
        np.stack([rng.uniform(10, 50, q), rng.uniform(10, 50, q),
                  np.ones(q)], 1).astype(np.float32)
    )
    tracks = np.asarray(tracker(clip, depths, queries))
    assert tracks.shape == (t, q, 3)
    assert np.isfinite(tracks).all()
    # frame-0 coords are refined too (not pinned); on textureless noise
    # they stay near the queries but not exactly on them
    np.testing.assert_allclose(tracks[0, :, :2], np.asarray(queries)[:, :2],
                               atol=8.0)


def test_stage7_build_tracker_missing_checkpoint():
    from egoscaler_tpu.pipelines.stages.stage7_trajectory import build_tracker

    with pytest.raises(FileNotFoundError):
        build_tracker("learned", checkpoint="/nonexistent/weights.npz")


def _write_hod_fixture(tmp_path):
    """A candidate dir with synthetic hand-object frames (the HOD
    training scene generator) in the images/ layout."""
    from PIL import Image

    from egoscaler_tpu.data.adapters.egoexo4d import clip_duration
    from egoscaler_tpu.training.hod_train import synthetic_hand_scene

    rng = np.random.default_rng(5)
    data = {
        "dataset_name": "egoexo4d", "video_uid": "vidA",
        "file_name": "cand0", "timestamp": 10.0,
        "start_sec": 9.9, "end_sec": 10.1,
    }
    duration = [round(float(t), 3) for t in clip_duration(10.0)]
    window = [t for t in duration if 9.9 <= t <= 10.1]
    img_dir = tmp_path / "images" / "egoexo4d" / "vidA" / "cand0"
    os.makedirs(img_dir, exist_ok=True)
    scene = synthetic_hand_scene(rng, 128)
    for i, t in enumerate(window):
        frame = scene["clip"][min(i, 1)]
        Image.fromarray(frame).save(img_dir / f"{t}.jpg")
    import json

    with open(tmp_path / "infos.json", "w") as f:
        json.dump([data], f)
    return data, window, scene


@pytest.mark.parametrize("kind", ["heuristic", "trained"])
def test_stage_hod_writes_reference_schema(tmp_path, kind):
    import pickle

    from egoscaler_tpu.pipelines.stages import stage_hod

    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "egoscaler_tpu", "assets", "hod_synthetic.npz",
    )
    if kind == "trained" and not os.path.exists(asset):
        pytest.skip("HOD weights not trained yet")

    data, window, scene = _write_hod_fixture(tmp_path)
    args = argparse.Namespace(data_dir=str(tmp_path), hod=kind)
    n = stage_hod.run(args)
    assert n == 1
    pkl = tmp_path / "hods" / "egoexo4d" / "vidA" / "cand0.pkl"
    with open(pkl, "rb") as f:
        hod = pickle.load(f)
    assert set(hod.keys()) == set(window)
    entry = hod[window[0]]
    assert set(entry.keys()) == {"obj-bbox", "hand-bbox"}
    for hb in entry["hand-bbox"]:
        assert len(hb) == 6  # x1 y1 x2 y2 state side (X_prepare:16-21)
    # idempotency: a second run skips
    assert stage_hod.run(args) == 0

    if kind == "trained":
        # the trained detector must localize the synthetic hand
        hb = entry["hand-bbox"]
        assert hb, "trained HOD found no hand"
        x1, y1, x2, y2 = hb[0][:4]
        gx1, gy1, gx2, gy2 = scene["hand_box"]
        ix1, iy1 = max(x1, gx1), max(y1, gy1)
        ix2, iy2 = min(x2, gx2), min(y2, gy2)
        inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
        union = ((x2 - x1) * (y2 - y1)
                 + (gx2 - gx1) * (gy2 - gy1) - inter)
        assert inter / max(union, 1e-9) > 0.4
