"""Stage 3: manipulated-object + rigidity annotation.

Rebuild of egoscaler/data/train/3_get_manipulated_object.py: the LLM
names the manipulated object and judges rigidity in the parseable form
'manipulated object: X, rigid: true/false'; only rigid, non-hand objects
survive to infos/.
"""
from __future__ import annotations

import argparse
import os
import re
from typing import List, Optional

from egoscaler_tpu.pipelines.llm import ChatModel, RuleBasedAnnotator
from egoscaler_tpu.pipelines.prompts import (
    DEFAULT_OBJECT_DIALOG,
    load_dialog,
    render_dialog,
)
from egoscaler_tpu.pipelines.stages.common import (
    chunkify,
    list_stage_files,
    read_json,
    write_json,
)

# zero-shot variant; the default path is the few-shot dialog
# (3_get_manipulated_object.py:57-98 uses
# data/prompt/get_manipulated_object.json — any file in that schema
# drops in via --prompt_file)
OBJECT_PROMPT = """For the egocentric action description below, name the \
single object being manipulated by the person's hand, and state whether \
it is a rigid body (keeps its shape when moved). Respond in exactly this \
form: manipulated object: <name>, rigid: <true|false>. If no object is \
manipulated answer: manipulated object: none, rigid: none.
{desc}"""

_PATTERN = re.compile(
    r"manipulated object: (.+?), rigid: (true|false|none)", re.IGNORECASE
)


def run(
    data_dir: str,
    chat: Optional[ChatModel] = None,
    batch_size: int = 256,
    prompt_file: Optional[str] = None,
    prompt_style: str = "plain",
) -> List[dict]:
    chat = chat or RuleBasedAnnotator()
    dialog = load_dialog(prompt_file) if prompt_file else DEFAULT_OBJECT_DIALOG
    fil = list_stage_files(data_dir, "fil_cands")
    done = set(list_stage_files(data_dir, "infos"))
    todo = []
    for f in fil:
        if f.replace("fil_cands", "infos") in done:
            continue
        d = read_json(f)
        if "start_sec" in d:
            continue
        todo.append(d)

    kept = []
    for batch in chunkify(todo, batch_size):
        outputs = chat.completions(
            [
                render_dialog(dialog, d["action_description"], prompt_style)
                for d in batch
            ]
        )
        for d, out in zip(batch, outputs):
            m = _PATTERN.search(out)
            if not m:
                print(f"Regex did not match for output: {out}", flush=True)
                continue
            obj = m.group(1).strip().lower()
            rigid = m.group(2).strip().lower()
            if obj in {"none", "hand"} or rigid != "true":
                continue
            d = dict(d, rigid=True, manipulated_object=obj)
            write_json(
                os.path.join(
                    data_dir, "infos", d["dataset_name"], d["video_uid"],
                    d["file_name"] + ".json",
                ),
                d,
            )
            kept.append(d)
    print(f"Original: {len(todo)}\nRemains: {len(kept)}")
    return kept


def format_all(data_dir: str) -> List[dict]:
    """--format_all aggregation (5_get_timestamp.py:93-105): collect all
    infos/ into one infos.json list."""
    import json

    infos = [read_json(f) for f in list_stage_files(data_dir, "infos")]
    with open(os.path.join(data_dir, "infos.json"), "w") as f:
        json.dump(infos, f)
    return infos


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--format_all", action="store_true")
    p.add_argument(
        "--prompt_file", default=None,
        help="few-shot dialog JSON (data/prompt/get_manipulated_object"
        ".json schema); defaults to the built-in dialog",
    )
    p.add_argument("--prompt_style", default="plain",
                   choices=("plain", "llama3"))
    args = p.parse_args()
    if args.format_all:
        format_all(args.data_dir)
    else:
        run(args.data_dir, batch_size=args.batch_size,
            prompt_file=args.prompt_file, prompt_style=args.prompt_style)


if __name__ == "__main__":
    main()
