"""Shared stage-CLI utilities: idempotent outputs, sharding, layout.

The reference's resilience model is filesystem idempotency + manual
index sharding (SURVEY.md §5.3); we keep that contract (byte-identical
directory layout, README egoscaler/data:96-152) and add host-count
sharding via jax.process_index when running under jax.distributed.
"""
from __future__ import annotations

import json
import os
from glob import glob
from typing import Dict, Iterable, List, Optional, Sequence


def data_layout(save_dir: str) -> Dict[str, str]:
    return {
        name: os.path.join(save_dir, name)
        for name in (
            "cands", "fil_cands", "infos", "images", "bboxes", "hods",
            "trajs", "obs_images", "depths", "pcrgbs",
        )
    }


def stage_path(save_dir: str, stage: str, dataset: str, video_uid: str,
               file_name: str, ext: str) -> str:
    return os.path.join(save_dir, stage, dataset, video_uid, file_name + ext)


def write_json(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def list_stage_files(save_dir: str, stage: str, pattern: str = "*/*/*.json"):
    return sorted(glob(os.path.join(save_dir, stage, pattern)))


def shard_files(
    files: Sequence[str],
    rank: Optional[int] = None,
    world_size: Optional[int] = None,
    start_index: int = 0,
    end_index: int = -1,
) -> List[str]:
    """rank-strided sharding (2_filtering_candidate.py:78-80) plus the
    manual --start_index/--end_index job-array slicing (7_get:396-397)."""
    files = list(files)
    if not (start_index == 0 and end_index == -1):
        files = files[start_index: end_index if end_index != -1 else None]
    if rank is None:
        try:
            import jax

            rank = jax.process_index()
            world_size = jax.process_count()
        except Exception:
            rank, world_size = 0, 1
    return files[rank:: world_size or 1]


def chunkify(lst: Sequence, chunk_size: int) -> Iterable[Sequence]:
    for i in range(0, len(lst), chunk_size):
        yield lst[i : i + chunk_size]
