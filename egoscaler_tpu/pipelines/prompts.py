"""Few-shot dialog prompt templates for the LLM pipeline stages.

The reference drives its LLM judgments with dialog-style few-shot
templates shipped as assets (egoscaler/data/prompt/
filtering_candidate.json, get_manipulated_object.json — lists of
{"role", "content"} turns consumed by ChatCompletion,
2_filtering_candidate.py:111-127, 3_get_manipulated_object.py:57-98)
instead of zero-shot instructions.  This module rebuilds that
capability:

* `load_dialog` reads any file in the reference's prompt-JSON schema, so
  the original assets drop in unchanged;
* built-in default dialogs (our own examples) cover zero-egress hosts;
* `render_dialog` flattens a dialog + the query into a single completion
  prompt, either as labeled plain text (rule-based / generic models) or
  as the LLaMA-3-Instruct chat template (JaxChatModel with converted
  Meta checkpoints — llama3 ChatFormat.encode_dialog_prompt semantics).
"""
from __future__ import annotations

import json
from typing import Dict, List, Sequence

Dialog = List[Dict[str, str]]

# Stage-2 actionability judgment (filtering_candidate.json role): decide
# whether a description is one hand-held object manipulation.  Examples
# are ours; the task definition matches 2_filtering_candidate.py:111-127.
DEFAULT_FILTER_DIALOG: Dialog = [
    {
        "role": "system",
        "content": (
            "Decide whether the description shows a person moving or "
            "manipulating a single physical object with their hand, in a "
            "way a robot arm could reproduce as one continuous 6DoF "
            "motion. Answer with exactly True or False."
        ),
    },
    {"role": "user", "content": "rinse both hands under the tap."},
    {"role": "assistant", "content": "False"},
    {"role": "user", "content": "place the mug on the shelf."},
    {"role": "assistant", "content": "True"},
    {"role": "user", "content": "glance around the workshop."},
    {"role": "assistant", "content": "False"},
    {"role": "user", "content": "pick up the wrench from the bench."},
    {"role": "assistant", "content": "True"},
    {"role": "user", "content": "chat with the instructor."},
    {"role": "assistant", "content": "False"},
]

# Stage-3 manipulated-object + rigidity judgment
# (get_manipulated_object.json role, 3_get_manipulated_object.py:87-98).
DEFAULT_OBJECT_DIALOG: Dialog = [
    {
        "role": "system",
        "content": (
            "Name the single object manipulated by the person's hand and "
            "state whether it is a rigid body (keeps its shape when "
            "moved). Respond in exactly this form: "
            "manipulated object: <name>, rigid: <true|false>. "
            "If no object is manipulated answer: "
            "manipulated object: none, rigid: none."
        ),
    },
    {"role": "user", "content": "tighten the bolt with the silver spanner."},
    {"role": "assistant", "content": "manipulated object: spanner, rigid: true"},
    {"role": "user", "content": "fold the kitchen towel in half."},
    {"role": "assistant", "content": "manipulated object: towel, rigid: false"},
    {"role": "user", "content": "set the glass jar on the counter."},
    {"role": "assistant", "content": "manipulated object: jar, rigid: true"},
    {"role": "user", "content": "wave to the camera."},
    {"role": "assistant", "content": "manipulated object: none, rigid: none"},
]


def load_dialog(path: str) -> Dialog:
    """Read a dialog template in the reference prompt-JSON schema (a list
    of {"role": system|user|assistant, "content": str})."""
    with open(path) as f:
        dialog = json.load(f)
    if not isinstance(dialog, list):
        raise ValueError(f"{path}: expected a list of turns")
    for turn in dialog:
        if not {"role", "content"} <= set(turn):
            raise ValueError(f"{path}: malformed turn {turn!r}")
        if turn["role"] not in ("system", "user", "assistant"):
            raise ValueError(f"{path}: unknown role {turn['role']!r}")
    return dialog


def render_dialog(dialog: Sequence[Dict[str, str]], query: str,
                  style: str = "plain") -> str:
    """Flatten a few-shot dialog plus the final user `query` into one
    completion prompt.

    plain:  labeled turns, query last (the rule-based annotator strips
            the 'USER:' label — llm.RuleBasedAnnotator.completions).
    llama3: the LLaMA-3-Instruct header/eot template so converted Meta
            instruct checkpoints see their native chat format.
    """
    if style == "llama3":
        parts = ["<|begin_of_text|>"]
        for turn in dialog:
            parts.append(
                f"<|start_header_id|>{turn['role']}<|end_header_id|>\n\n"
                f"{turn['content']}<|eot_id|>"
            )
        parts.append(
            f"<|start_header_id|>user<|end_header_id|>\n\n{query}<|eot_id|>"
            "<|start_header_id|>assistant<|end_header_id|>\n\n"
        )
        return "".join(parts)
    if style != "plain":
        raise ValueError(f"unknown dialog style {style!r}")
    lines = []
    for turn in dialog:
        label = turn["role"].upper()
        lines.append(f"{label}: {turn['content']}")
    lines.append(f"USER: {query}")
    return "\n".join(lines)
