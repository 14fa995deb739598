"""Stage 1: candidate extraction from corpus annotations.

Rebuild of egoscaler/data/train/1_get_candidate.py: iterate takes,
filter scenario / subject / visibility, clean descriptions, extract
(verb, object), write cands/{dataset}/{uid}/{file}.json — idempotent.
"""
from __future__ import annotations

import argparse
import os
import re
from typing import Dict, List

from egoscaler_tpu.data.adapters import egoexo4d
from egoscaler_tpu.data.tools.nlp_tools import (
    extract_verb_obj,
    format_description,
    lemmatize_description,
)
from egoscaler_tpu.pipelines.stages.common import stage_path, write_json

DATASET_MODULES = {"egoexo4d": egoexo4d}

USABLE_SCENARIO = {
    "egoexo4d": ["Cooking", "Bike Repair", "Music", "Health"],
}


def build_candidate(dataset_name: str, take: Dict, desc_info: Dict,
                    video_uid: str, task_name: str) -> Dict | None:
    """One description -> candidate dict (1_get_candidate.py:52-88), or
    None when filtered."""
    mod = DATASET_MODULES[dataset_name]
    (raw_desc, timestamp, subject, ego_visible, unsure,
     not_interaction) = mod.process_description(desc_info)
    if unsure or subject != "C" or not ego_visible or not_interaction:
        return None
    desc = format_description(raw_desc)
    lemma_desc = lemmatize_description(desc)
    verb, obj = extract_verb_obj(lemma_desc, surface=desc)
    if verb is None or obj is None:
        return None
    # extract_verb_obj now has reference parity: negated verbs come back
    # '!'-marked and bare pronouns pass through as objects.  Neither is
    # a usable manipulation candidate — a negation is a non-action and a
    # pronoun cannot seed the stage-6 text-conditioned detector.
    from egoscaler_tpu.data.tools.nlp_tools import PRONOUN_OBJECTS

    if verb.startswith("!") or obj in PRONOUN_OBJECTS:
        return None
    action_description = re.sub(r"\s+\.", ".", re.sub("c ", "", lemma_desc))
    file_name = f"{video_uid}_{round(timestamp, 3)}"
    return {
        "dataset_name": dataset_name,
        "video_uid": video_uid,
        "take_name": take.get("take_name"),
        "vrs_file_name": take.get("capture", {}).get("cameras", [{}])[0].get("cam_id"),
        "timestamp": timestamp,
        "raw_description": desc,
        "lemma_description": lemma_desc,
        "action_description": action_description,
        "verb": verb,
        "object": obj,
        "task_name": task_name,
        "file_name": file_name,
    }


def run(dataset_name: str, root_dir: str, save_dir: str,
        splits=("train", "val")) -> List[Dict]:
    mod = DATASET_MODULES[dataset_name]
    candidates = []
    for split in splits:
        descriptions, takes = mod.load_annotations(split, root_dir)
        for take in takes:
            video_uid, task_name, desc_infos = mod.process_take(
                take, descriptions
            )
            if task_name not in USABLE_SCENARIO[dataset_name]:
                continue
            for desc_info in desc_infos:
                cand = build_candidate(
                    dataset_name, take, desc_info, video_uid, task_name
                )
                if cand is None:
                    continue
                path = stage_path(
                    save_dir, "cands", dataset_name, video_uid,
                    cand["file_name"], ".json",
                )
                if os.path.exists(path):
                    continue
                write_json(path, cand)
                candidates.append(cand)
    print(f"Total candidates: {len(candidates)}")
    return candidates


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root_dir", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--dataset_name", default="egoexo4d",
                   choices=list(DATASET_MODULES))
    args = p.parse_args()
    run(args.dataset_name, args.root_dir, args.save_dir)


if __name__ == "__main__":
    main()
