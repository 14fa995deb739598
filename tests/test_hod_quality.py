"""HOD quality: the trained Faster-RCNN must beat the weight-free
heuristic on held-out synthetic hand-object scenes (the round-1 VERDICT
bar for "untrained HOD"; the reference capability is the pretrained
100-DOH detector, hod.py:59-106, lib/model/faster_rcnn/).

Weights come from scripts/train_hod.py (checked-in asset).  Scenes
include skin-tone distractors (the heuristic's color rule merges them
into the hand box) and motion smear (its frame-difference object box
covers both object positions).
"""
import os

import numpy as np
import pytest

from flax import traverse_util

from egoscaler_tpu.models.hand_object import HandObjectRCNN, HODConfig
from egoscaler_tpu.training.hod_train import (
    eval_detector,
    eval_heuristic,
    synthetic_hand_scene,
)

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "egoscaler_tpu", "assets", "hod_synthetic.npz",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(ASSET), reason="HOD weights not trained yet"
)


@pytest.fixture(scope="module")
def detector():
    model = HandObjectRCNN(HODConfig().tiny())
    with np.load(ASSET) as z:
        params = traverse_util.unflatten_dict(
            {k: z[k] for k in z.files}, sep="/"
        )
    return model, params


@pytest.fixture(scope="module")
def scenes():
    rng = np.random.default_rng(777)  # held out from train + script eval
    return [synthetic_hand_scene(rng, 128) for _ in range(12)]


def test_trained_hod_beats_heuristic(detector, scenes):
    model, params = detector
    ours = eval_detector(model, params, scenes)
    heur = eval_heuristic(scenes)
    assert ours["hand_iou"] > heur["hand_iou"], (ours, heur)
    assert ours["obj_iou"] > heur["obj_iou"], (ours, heur)
    # absolute floors: localization, not merely "less wrong"
    assert ours["hand_iou"] > 0.5, ours
    assert ours["obj_iou"] > 0.4, ours


def test_trained_hod_side_above_chance(detector, scenes):
    model, params = detector
    ours = eval_detector(model, params, scenes)
    assert ours["side_acc"] > 0.6, ours
