"""VLM temporal-localization protocol (5_get_timestamp.py parity)."""
import numpy as np

from egoscaler_tpu.pipelines.stages.stage5_timestamps import (
    TIMESTAMP_PROMPT,
    VlmLocalizer,
    number_frames,
)


def _frames(t=32, h=48, w=64):
    return np.zeros((t, h, w, 3), np.uint8) + 40


def test_number_frames_stamps_indices():
    frames = list(_frames(3))
    stamped = number_frames(frames)
    assert len(stamped) == 3
    for orig, st in zip(frames, stamped):
        assert st.shape == orig.shape
        assert (st != orig).any()  # white digits drawn


def test_vlm_localizer_parses_indices_and_maps_back():
    calls = {}

    def fake_vlm(prompt, text, images):
        calls["prompt"] = prompt
        calls["text"] = text
        calls["n_images"] = len(images)
        return "start frame: 2, end frame: 5"

    loc = VlmLocalizer(fake_vlm, n_frames=8)
    out = loc.localize(_frames(32), query="cut the apple",
                       active_object="knife")
    assert calls["prompt"] == TIMESTAMP_PROMPT
    assert calls["n_images"] == 8
    assert "cut the apple" in calls["text"] and "knife" in calls["text"]
    # 32 frames / 8 -> stride 4: subsampled index i maps to frame 4*i
    assert out == (8, 20)


def test_vlm_localizer_invalid_and_garbage():
    loc = VlmLocalizer(lambda p, t, i: "invalid")
    assert loc.localize(_frames()) is None
    loc = VlmLocalizer(lambda p, t, i: "no numbers here")
    assert loc.localize(_frames()) is None
    loc = VlmLocalizer(lambda p, t, i: "7, 2")  # start >= end
    assert loc.localize(_frames()) is None
    loc = VlmLocalizer(lambda p, t, i: "1 2 3")  # wrong count
    assert loc.localize(_frames()) is None


def test_vlm_localizer_short_clip():
    loc = VlmLocalizer(lambda p, t, i: "0, 1", n_frames=8)
    out = loc.localize(_frames(4))
    assert out == (0, 1)
