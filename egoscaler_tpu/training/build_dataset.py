"""Assemble COCO-style train/val/test.json from pipeline outputs.

Rebuild of the implicit dataset-assembly step consumed by
models/utils/dataset_base.py:31-39: images[{id, file_name}] +
annotations[{id, image_id, action_description}] referencing the
obs_images/ trajs/ pcrgbs/ artifacts of stage 7 (or the eval stage 4).
"""
from __future__ import annotations

import argparse
import json
import os
from glob import glob
from typing import Dict, List, Tuple

import numpy as np


def collect_samples(data_dir: str) -> List[Dict]:
    """Every info with a completed trajectory + point cloud."""
    samples = []
    for f in sorted(glob(os.path.join(data_dir, "infos", "*", "*", "*.json"))):
        with open(f) as fh:
            data = json.load(fh)
        ds, uid, fn = (
            data["dataset_name"], data["video_uid"], data["file_name"]
        )
        stem = os.path.join(ds, uid, fn)
        if not os.path.exists(
            os.path.join(data_dir, "trajs", stem + ".pkl")
        ):
            continue
        if not os.path.exists(
            os.path.join(data_dir, "pcrgbs", stem + ".npy")
        ):
            continue
        samples.append(
            {
                "file_name": stem + ".jpg",
                "action_description": data.get(
                    "action_description",
                    f"manipulate the {data.get('manipulated_object', 'object')}",
                ),
            }
        )
    return samples


def build_splits(
    data_dir: str,
    out_dir: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    seed: int = 0,
) -> Dict[str, int]:
    samples = collect_samples(data_dir)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(samples))
    n_val = int(len(samples) * val_fraction)
    n_test = int(len(samples) * test_fraction)
    splits = {
        "test": order[:n_test],
        "val": order[n_test: n_test + n_val],
        "train": order[n_test + n_val:],
    }
    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    for split, idxs in splits.items():
        images, annotations = [], []
        for i, idx in enumerate(idxs):
            s = samples[int(idx)]
            images.append({"id": i, "file_name": s["file_name"]})
            annotations.append(
                {
                    "id": i,
                    "image_id": i,
                    "action_description": s["action_description"],
                }
            )
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
        counts[split] = len(images)
    return counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--val_fraction", type=float, default=0.1)
    p.add_argument("--test_fraction", type=float, default=0.1)
    args = p.parse_args()
    counts = build_splits(
        args.data_dir, args.out_dir or args.data_dir,
        args.val_fraction, args.test_fraction,
    )
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
