"""Language-grounded synthetic corpus (training/dataset.py).

The corpus underpins the flagship generalization run
(scripts/train_flagship_grounding.py, GROUNDING_FLAGSHIP.json): these
tests pin the properties that make val ADE a grounding measurement —
deterministic trajectory given (verb, object position), a stable
background for pc_norm, and a high mean-predictor baseline.
"""
import numpy as np

from egoscaler_tpu.configs import PointLLMConfig
from egoscaler_tpu.training.dataset import (
    STRUCTURED_OBJECTS,
    STRUCTURED_VERBS,
    TrajectoryDataset,
    mean_predictor_ade,
    synthetic_structured_samples,
)


def test_schema_and_determinism():
    cfg = PointLLMConfig().tiny()
    a = synthetic_structured_samples(cfg, 4, seed=7)
    b = synthetic_structured_samples(cfg, 4, seed=7)
    for sa, sb in zip(a, b):
        assert sa.description == sb.description
        np.testing.assert_array_equal(sa.pcrgb, sb.pcrgb)
        np.testing.assert_array_equal(sa.traj_rotvec, sb.traj_rotvec)
        assert sa.pcrgb.ndim == 2 and sa.pcrgb.shape[1] == 6
        assert sa.traj_rotvec.shape == (cfg.traj.num_steps, 6)
        obj = sa.description.split()[-1]
        assert obj in STRUCTURED_OBJECTS
        if " onto " not in sa.description:
            assert any(sa.description.startswith(v) for v in STRUCTURED_VERBS)


def _cluster_center(s, obj):
    color = np.asarray(STRUCTURED_OBJECTS[obj])
    d = np.linalg.norm(s.pcrgb[:, 3:] - color, axis=1)
    cluster = s.pcrgb[d < 0.15, :3]
    assert cluster.shape[0] >= 64, f"cluster for {obj} missing"
    return cluster.mean(axis=0)


def test_trajectory_grounded_in_named_clusters():
    """Single-object samples: start at the named cluster, end displaced
    by the verb delta.  Transfer samples: start at cluster A, END at
    cluster B — the endpoint exists only in the point cloud, which is
    what makes transfer FDE a visual-grounding metric."""
    cfg = PointLLMConfig().tiny()
    samples = synthetic_structured_samples(cfg, 24, seed=3, noise=0.0)
    saw_transfer = saw_verb = False
    for s in samples:
        start = s.traj_rotvec[0, :3]
        end = s.traj_rotvec[-1, :3]
        if " onto " in s.description:
            saw_transfer = True
            words = s.description.split()
            a, b = words[2], words[-1]
            assert np.linalg.norm(start - _cluster_center(s, a)) < 0.05
            assert np.linalg.norm(end - _cluster_center(s, b)) < 0.05
        else:
            saw_verb = True
            obj = s.description.split()[-1]
            assert np.linalg.norm(start - _cluster_center(s, obj)) < 0.05
            verb = next(v for v in STRUCTURED_VERBS
                        if s.description.startswith(v))
            dt, dr = STRUCTURED_VERBS[verb]
            np.testing.assert_allclose(end - start, dt, atol=0.02)
            np.testing.assert_allclose(s.traj_rotvec[-1, 3:], dr, atol=0.02)
    assert saw_transfer and saw_verb


def test_fixed_background_across_samples():
    cfg = PointLLMConfig().tiny()
    a, b = synthetic_structured_samples(cfg, 2, seed=11)
    # the non-cluster region is the shared lattice (first rows are the 3
    # clusters; everything beyond 3*256 is untouched background)
    np.testing.assert_array_equal(a.pcrgb[3 * 256:], b.pcrgb[3 * 256:])


def test_mean_predictor_baseline_is_hard():
    """Object positions spread over the workspace: predicting the mean
    trajectory must be badly wrong (else val ADE would be trivial)."""
    cfg = PointLLMConfig().tiny()
    train = synthetic_structured_samples(cfg, 64, seed=0)
    val = synthetic_structured_samples(cfg, 32, seed=1)
    assert mean_predictor_ade(train, val) > 0.4


def test_batches_encode():
    cfg = PointLLMConfig().tiny()
    ds = TrajectoryDataset(
        cfg, samples=synthetic_structured_samples(cfg, 8, seed=5), seed=0
    )
    b = next(ds.batches(4, shuffle=False))
    assert b["input_ids"].shape[0] == 4
    assert np.isfinite(b["point_clouds"]).all()


def test_locate_corpus_grounds_endpoint_only():
    """Alignment-pretrain samples: wp0 is the FIXED origin (so the
    prompt reveals nothing) and the endpoint is the named cluster —
    dense name->position supervision for the stage-1 analogue."""
    from egoscaler_tpu.training.dataset import (
        LOCATE_ORIGIN,
        synthetic_locate_samples,
    )

    cfg = PointLLMConfig().tiny()
    a = synthetic_locate_samples(cfg, 12, seed=9, noise=0.0)
    b = synthetic_locate_samples(cfg, 12, seed=9, noise=0.0)
    for sa, sb in zip(a, b):
        assert sa.description == sb.description
        np.testing.assert_array_equal(sa.pcrgb, sb.pcrgb)
        assert sa.description.startswith("point to the ")
        obj = sa.description.split()[-1]
        assert obj in STRUCTURED_OBJECTS
        np.testing.assert_allclose(
            sa.traj_rotvec[0, :3], LOCATE_ORIGIN, atol=1e-6
        )
        end = sa.traj_rotvec[-1, :3]
        assert np.linalg.norm(end - _cluster_center(sa, obj)) < 0.05
        np.testing.assert_array_equal(
            sa.traj_rotvec[:, 3:], np.zeros_like(sa.traj_rotvec[:, 3:])
        )


def test_locate_scene_distribution_matches_structured():
    """Both corpora share _structured_scene: same background lattice and
    the same cluster geometry statistics (the fine-tune sees no scene
    distribution shift after alignment pretraining)."""
    from egoscaler_tpu.training.dataset import synthetic_locate_samples

    cfg = PointLLMConfig().tiny()
    loc = synthetic_locate_samples(cfg, 2, seed=0)[0]
    st = synthetic_structured_samples(cfg, 2, seed=0)[0]
    np.testing.assert_array_equal(loc.pcrgb[3 * 256:], st.pcrgb[3 * 256:])


def test_repeat_wp0_baseline_fails_on_transfers():
    from egoscaler_tpu.training.dataset import repeat_wp0_baseline

    cfg = PointLLMConfig().tiny()
    val = synthetic_structured_samples(cfg, 48, seed=2)
    transfer = [s for s in val if " onto " in s.description]
    assert len(transfer) >= 8
    b = repeat_wp0_baseline(transfer)
    # endpoints are other clusters spread over the workspace: copying
    # wp0 must miss them badly
    assert b["fde"] > 0.4, b
