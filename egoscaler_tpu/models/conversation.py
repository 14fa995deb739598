"""Conversation templates (vicuna_v1_1-style chat state machine).

Rebuild of models/pointllm/pointllm/conversation.py:14-375: a small
immutable conversation builder used by the upstream PointLLM chat /
two-stage training data path.  Covers the states the reference exercises
(system prompt, role alternation, prompt rendering with separators,
copy/append).
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    SINGLE = "single"
    TWO = "two"


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.TWO
    sep: str = " "
    sep2: str = "</s>"

    def get_prompt(self) -> str:
        if self.sep_style == SeparatorStyle.SINGLE:
            out = self.system + self.sep
            for role, msg in self.messages:
                out += f"{role}: {msg}{self.sep}" if msg else f"{role}:"
            return out
        seps = [self.sep, self.sep2]
        out = self.system + seps[0]
        for i, (role, msg) in enumerate(self.messages):
            if msg:
                out += f"{role}: {msg}{seps[i % 2]}"
            else:
                out += f"{role}:"
        return out

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[list(m) for m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
        )


conv_vicuna_v1_1 = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

conv_templates = {"vicuna_v1_1": conv_vicuna_v1_1}
default_conversation = conv_vicuna_v1_1
