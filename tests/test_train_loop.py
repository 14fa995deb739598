"""Full train loop: runs epochs, evaluates, checkpoints, resumes."""
import os

import numpy as np
import jax.numpy as jnp

from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
from egoscaler_tpu.training.dataset import TrajectoryDataset, synthetic_samples
from egoscaler_tpu.training.train_loop import train


def test_train_loop_end_to_end(tmp_path):
    cfg = PointLLMConfig().tiny()
    tcfg = TrainConfig(batch_size=2, epochs=2, lr=1e-3)
    train_ds = TrajectoryDataset(cfg, samples=synthetic_samples(cfg, 6), seed=0)
    val_ds = TrajectoryDataset(cfg, samples=synthetic_samples(cfg, 2, seed=1),
                               seed=1)
    out = train(
        cfg, tcfg, train_ds, val_ds,
        run_dir=str(tmp_path / "run"), eval_batches=1,
    )
    hist = out["history"]
    assert len(hist["train_loss"]) == 2
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][1] < hist["train_loss"][0]
    # metrics were produced
    assert len(hist["ade"]) == 2 and np.isfinite(hist["ade"]).all()
    # checkpoints + logs exist
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")
    assert os.path.isdir(tmp_path / "run" / "checkpoints" / "latest")

    # resume continues from saved step
    tcfg2 = TrainConfig(batch_size=2, epochs=3, lr=1e-3)
    out2 = train(
        cfg, tcfg2, train_ds, val_ds,
        run_dir=str(tmp_path / "run"), resume=True, eval_batches=1,
    )
    # epochs 0-1 were done; resume runs only epoch 2
    assert len(out2["history"]["train_loss"]) == 1
