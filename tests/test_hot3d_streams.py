"""HOT3D annotation-stream providers tested against the REAL reference
fixtures (data_loaders/tests/data_sample/Aria/P0003_c701bd11): 2D box
CSVs, frame-validity masks, hand-pose jsonl, and pose CSVs — mirroring
the vendored loader test suite's invariants
(tests/test_ObjectBox2dDataProvider.py, test_HandBox2dDataProvider.py,
test_ObjectPose3dProvider.py:44-87).
"""
import os

import numpy as np
import pytest

from egoscaler_tpu.data.eval.providers import (
    HeadsetPose3dProvider,
    Hot3dDataProvider,
    ObjectPose3dProvider,
)
from egoscaler_tpu.data.eval.streams import (
    Handedness,
    TimeQueryOptions,
    combine_masks,
    load_hand_box2d_csv,
    load_hand_poses,
    load_mask_csv,
    load_object_box2d_csv,
    lookup_timestamp,
    query_left_right,
)

SEQ = (
    "/root/reference/egoscaler/data/eval/data_loaders/tests/"
    "data_sample/Aria/P0003_c701bd11"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SEQ), reason="reference HOT3D sample unavailable"
)

EXPECTED_STREAMS = {"214-1", "1201-1", "1201-2"}


def test_object_box2d_provider():
    """test_ObjectBox2dDataProvider.py:39-71 invariants."""
    provider = load_object_box2d_csv(os.path.join(SEQ, "box2d_objects.csv"))
    assert provider is not None
    assert len(provider.uids) == 6
    assert set(provider.stream_ids) == EXPECTED_STREAMS

    for sid in provider.stream_ids:
        ts_list = provider.get_timestamp_ns_list(sid)
        assert ts_list and ts_list == sorted(ts_list)
        query = ts_list[len(ts_list) // 2]
        got = provider.get_box2d_at_timestamp(
            sid, query, TimeQueryOptions.CLOSEST
        )
        assert got is not None
        assert got.time_delta_ns == 0  # exact timestamp
        coll = got.box2d_collection
        assert coll.timestamp_ns == query
        assert len(coll.uid_list) > 0
        for entry in coll.box2ds.values():
            if entry.box2d is not None:
                assert entry.box2d.right >= entry.box2d.left
                assert entry.box2d.bottom >= entry.box2d.top
            if entry.visibility_ratio is not None:
                assert 0.0 <= entry.visibility_ratio <= 1.0


def test_hand_box2d_provider():
    """test_HandBox2dDataProvider.py:39-66 invariants; keys are hand
    indices 0 (left) / 1 (right)."""
    provider = load_hand_box2d_csv(os.path.join(SEQ, "box2d_hands.csv"))
    assert provider is not None
    assert set(provider.stream_ids) == EXPECTED_STREAMS
    assert provider.uids <= {0, 1}

    for sid in provider.stream_ids:
        ts_list = provider.get_timestamp_ns_list(sid)
        assert ts_list
        got = provider.get_box2d_at_timestamp(
            sid, ts_list[len(ts_list) // 2], TimeQueryOptions.CLOSEST
        )
        assert got is not None and len(got.box2d_collection.box2ds) > 0


def test_box2d_time_queries():
    provider = load_object_box2d_csv(os.path.join(SEQ, "box2d_objects.csv"))
    sid = sorted(provider.stream_ids)[0]
    ts_list = provider.get_timestamp_ns_list(sid)
    assert len(ts_list) >= 2
    mid = (ts_list[0] + ts_list[1]) // 2

    before = provider.get_box2d_at_timestamp(sid, mid, TimeQueryOptions.BEFORE)
    after = provider.get_box2d_at_timestamp(sid, mid, TimeQueryOptions.AFTER)
    assert before.box2d_collection.timestamp_ns == ts_list[0]
    assert after.box2d_collection.timestamp_ns == ts_list[1]
    assert before.time_delta_ns > 0 and after.time_delta_ns < 0

    # out-of-range BEFORE has no left bracket
    assert (
        provider.get_box2d_at_timestamp(
            sid, ts_list[0] - 1, TimeQueryOptions.BEFORE
        )
        is None
    )
    # acceptable_time_delta filter
    assert (
        provider.get_box2d_at_timestamp(
            sid, mid, TimeQueryOptions.CLOSEST, acceptable_time_delta=0
        )
        is None
    )
    with pytest.raises(ValueError):
        provider.get_box2d_at_timestamp("999-9", mid, TimeQueryOptions.CLOSEST)


def test_mask_data_and_combination():
    """loader_masks.py semantics on the real mask files."""
    good = load_mask_csv(os.path.join(SEQ, "masks", "mask_good_exposure.csv"))
    obj_vis = load_mask_csv(os.path.join(SEQ, "masks", "mask_object_visible.csv"))
    assert good is not None and obj_vis is not None
    assert set(good.stream_ids) == EXPECTED_STREAMS

    for sid in good.stream_ids:
        assert good.length(sid) > 0
        assert good.num_true(sid) + good.num_false(sid) == good.length(sid)
    assert good.stats()

    both = combine_masks([good, obj_vis], "and")
    either = combine_masks([good, obj_vis], "or")
    for sid in EXPECTED_STREAMS:
        n_and = both.num_true(sid)
        n_or = either.num_true(sid)
        assert n_and <= min(good.num_true(sid), obj_vis.num_true(sid))
        assert n_or >= max(good.num_true(sid), obj_vis.num_true(sid))
        assert both.length(sid) == good.length(sid)

    with pytest.raises(ValueError):
        combine_masks([good, obj_vis], "xor")
    with pytest.raises(ValueError):
        combine_masks([])


def test_hand_pose_providers():
    """loader_hand_poses.py on the real MANO + UmeTrack jsonl files."""
    mano = load_hand_poses(os.path.join(SEQ, "mano_hand_pose_trajectory.jsonl"))
    ume = load_hand_poses(
        os.path.join(SEQ, "umetrack_hand_pose_trajectory.jsonl")
    )
    assert mano is not None and ume is not None
    assert len(mano.timestamps) > 0
    # both files annotate the same capture: same timestamp domain
    assert mano.timestamps == ume.timestamps

    got = mano.get_pose_at_timestamp(mano.timestamps[0])
    assert got is not None
    coll, dt = got
    assert dt == 0
    for handedness, pose in coll.poses.items():
        assert handedness in (Handedness.Left, Handedness.Right)
        assert pose.wrist_pose is not None
        # rotation must be orthonormal
        r = pose.wrist_pose.rotation
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert pose.joint_angles is not None and len(pose.joint_angles) > 0
    # MANO records carry betas; UmeTrack records do not
    mano_pose = next(iter(coll.poses.values()))
    assert mano_pose.betas is not None and len(mano_pose.betas) == 10
    ume_coll, _ = ume.get_pose_at_timestamp(ume.timestamps[0])
    assert next(iter(ume_coll.poses.values())).betas is None


def test_object_pose_provider_on_real_csv():
    """test_ObjectPose3dProvider.py:44-87 invariants on the real
    dynamic_objects.csv, against OUR pose provider."""
    provider = ObjectPose3dProvider(os.path.join(SEQ, "dynamic_objects.csv"))
    assert len(provider.timestamps) > 0
    assert len(provider.object_uids) > 0

    got = provider.get_pose_at_timestamp(
        int(provider.timestamps[0]), acceptable_time_delta_ns=0
    )
    assert got is not None
    poses, dt = got
    assert dt == 0
    assert set(poses) == set(provider.object_uids)
    for uid, pose in poses.items():
        assert pose.matrix().shape == (4, 4)
        r = pose.rotation
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_headset_pose_provider_on_real_csv():
    provider = HeadsetPose3dProvider(
        os.path.join(SEQ, "headset_trajectory.csv")
    )
    assert len(provider.timestamps) > 0
    pose, dt = provider.get_pose_at_timestamp(int(provider.timestamps[-1]))
    assert dt == 0
    np.testing.assert_allclose(
        pose.rotation @ pose.rotation.T, np.eye(3), atol=1e-5
    )


def test_facade_bundles_all_streams():
    """Hot3dDataProvider exposes every stream of the real sequence
    (dataset_api.py:93-180)."""
    dp = Hot3dDataProvider(SEQ)
    assert dp.get_device_type() == "Aria"
    assert dp.object_pose_data_provider is not None
    assert dp.device_pose_data_provider is not None
    assert dp.object_box2d_data_provider is not None
    assert dp.hand_box2d_data_provider is not None
    assert dp.mano_hand_data_provider is not None
    assert dp.umetrack_hand_data_provider is not None
    assert set(dp.mask_data) == {
        "mask_good_exposure",
        "mask_hand_pose_available",
        "mask_hand_visible",
        "mask_headset_pose_available",
        "mask_object_pose_available",
        "mask_object_visible",
    }
    stats = dp.get_data_statistics()
    assert stats["objects"]["num_objects"] > 0
    assert stats["object_box2ds"]["num_uids"] == 6
    assert "masks" in stats and "hand_box2ds" in stats


def test_lookup_timestamp_edges():
    d = {10: "a", 20: "b", 40: "c"}
    ts = [10, 20, 40]
    assert query_left_right(ts, 25) == (20, 40, 0.25)
    assert lookup_timestamp(d, ts, 20, TimeQueryOptions.CLOSEST) == ("b", 0)
    assert lookup_timestamp(d, ts, 29, TimeQueryOptions.CLOSEST) == ("b", 9)
    assert lookup_timestamp(d, ts, 31, TimeQueryOptions.CLOSEST) == ("c", -9)
    assert lookup_timestamp(d, ts, 5, TimeQueryOptions.BEFORE) == (None, None)
    assert lookup_timestamp(d, ts, 5, TimeQueryOptions.AFTER) == ("a", -5)
    assert lookup_timestamp(d, ts, 99, TimeQueryOptions.AFTER) == (None, None)
    assert lookup_timestamp(d, ts, 99, TimeQueryOptions.BEFORE) == ("c", 59)
