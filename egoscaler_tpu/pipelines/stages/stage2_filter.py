"""Stage 2: actionability filtering (rule blacklist + LLM judge).

Rebuild of egoscaler/data/train/2_filtering_candidate.py: verb blacklist,
then a boolean LLM judgment per description; passing candidates copied
to fil_cands/.  The judge is any `ChatModel` (mesh-sharded JAX LLaMA or
the rule-based fallback); rank sharding comes from jax.distributed
instead of torchrun/NCCL (SURVEY.md §2.4).
"""
from __future__ import annotations

import argparse
import os
from typing import List, Optional

from egoscaler_tpu.pipelines.llm import ChatModel, RuleBasedAnnotator
from egoscaler_tpu.pipelines.prompts import (
    DEFAULT_FILTER_DIALOG,
    load_dialog,
    render_dialog,
)
from egoscaler_tpu.pipelines.stages.common import (
    chunkify,
    list_stage_files,
    read_json,
    shard_files,
    write_json,
)

# zero-shot variant, kept for single-string callers; the default path is
# the few-shot dialog (2_filtering_candidate.py:111-127 uses
# data/prompt/filtering_candidate.json — pass any file in that schema
# via --prompt_file)
FILTER_PROMPT = """Decide whether the following egocentric action \
description shows a person moving or manipulating a single physical \
object with their hand, in a way a robot arm could reproduce as one \
continuous 6DoF motion. Answer with exactly True or False.
{desc}"""


def _strtobool(s: str) -> Optional[bool]:
    s = s.strip().lower()
    if s in ("true", "yes", "1", "t", "y"):
        return True
    if s in ("false", "no", "0", "f", "n"):
        return False
    return None


def run(
    data_dir: str,
    chat: Optional[ChatModel] = None,
    batch_size: int = 128,
    start_index: int = 0,
    end_index: int = -1,
    prompt_file: Optional[str] = None,
    prompt_style: str = "plain",
) -> List[dict]:
    chat = chat or RuleBasedAnnotator()
    dialog = load_dialog(prompt_file) if prompt_file else DEFAULT_FILTER_DIALOG
    cands = shard_files(
        list_stage_files(data_dir, "cands"),
        start_index=start_index, end_index=end_index,
    )
    done = set(list_stage_files(data_dir, "fil_cands"))

    todo = []
    for f in cands:
        if f.replace("cands", "fil_cands") in done:
            continue
        todo.append(read_json(f))

    kept = []
    rule = RuleBasedAnnotator()
    for batch in chunkify(todo, batch_size):
        batch = [
            d for d, ok in zip(
                batch, rule.filter_actionable(
                    [d["action_description"] for d in batch]
                )
            )
            # rule blacklist only (2_filtering_candidate.py:95-106): LLM
            # still judges everything not blacklisted
            if not any(
                v in d["action_description"].split()
                for v in ("walk", "run", "sit", "watch", "look", "read",
                          "listen", "talk")
            )
        ]
        if not batch:
            continue
        outputs = chat.completions(
            [
                render_dialog(dialog, d["action_description"], prompt_style)
                for d in batch
            ]
        )
        for d, out in zip(batch, outputs):
            verdict = _strtobool(out.strip().splitlines()[-1])
            if verdict is None:
                print(f"Warning: invalid output {out!r}; skipping")
                continue
            if verdict:
                write_json(
                    os.path.join(
                        data_dir, "fil_cands", d["dataset_name"],
                        d["video_uid"], d["file_name"] + ".json",
                    ),
                    d,
                )
                kept.append(d)
    print(f"Total candidates: {len(kept)}")
    return kept


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=-1)
    p.add_argument(
        "--prompt_file", default=None,
        help="few-shot dialog JSON (data/prompt/filtering_candidate.json "
        "schema); defaults to the built-in dialog",
    )
    p.add_argument("--prompt_style", default="plain",
                   choices=("plain", "llama3"))
    args = p.parse_args()
    run(args.data_dir, batch_size=args.batch_size,
        start_index=args.start_index, end_index=args.end_index,
        prompt_file=args.prompt_file, prompt_style=args.prompt_style)


if __name__ == "__main__":
    main()
