"""Conversation prompt templates.

The reference carries ~20 templates in a dataclass prompt builder
(reference: conversation.py:30-592); BLiM only ever uses the `qwen_2` ChatML
template (reference: base_dataset.py:21,68,73,89,94 and
modeling_videochat_flash.py:673). We implement the template machinery for the
styles the model family actually uses (CHATML + a plain style for
pretrain-format data) with the exact same rendered strings.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple

from blim_tpu.core.constants import DEFAULT_IMAGE_TOKEN  # noqa: F401


class SeparatorStyle(enum.Enum):
    CHATML = enum.auto()
    PLAIN = enum.auto()
    MPT = enum.auto()


@dataclasses.dataclass
class Conversation:
    """ChatML-style conversation prompt builder.

    `get_prompt()` renders exactly the string the reference's CHATML branch
    produces (reference: conversation.py:118-127):

        system + sep + "\\n"
        + for each (role, message):
            role + "\\n" + message + sep + "\\n"   if message
            role + "\\n"                            otherwise
    """

    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]] = dataclasses.field(default_factory=list)
    sep_style: SeparatorStyle = SeparatorStyle.CHATML
    sep: str = "<|im_end|>"
    sep2: Optional[str] = None
    version: str = "qwen"

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
            version=self.version,
        )

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append([role, message])

    def get_prompt(self) -> str:
        if self.sep_style == SeparatorStyle.CHATML:
            ret = "" if self.system == "" else self.system + self.sep + "\n"
            for role, message in self.messages:
                if message:
                    ret += role + "\n" + message + self.sep + "\n"
                else:
                    ret += role + "\n"
            return ret
        if self.sep_style == SeparatorStyle.MPT:
            ret = self.system + self.sep
            for role, message in self.messages:
                if message:
                    ret += role + message + self.sep
                else:
                    ret += role
            return ret
        if self.sep_style == SeparatorStyle.PLAIN:
            seps = [self.sep, self.sep2 or self.sep]
            ret = self.system
            for i, (_, message) in enumerate(self.messages):
                if message:
                    ret += message + seps[i % 2]
            return ret
        raise ValueError(f"Unsupported separator style: {self.sep_style}")


conv_qwen = Conversation(
    system="<|im_start|>system\nYou are a helpful assistant.",
    roles=("<|im_start|>user", "<|im_start|>assistant"),
    sep_style=SeparatorStyle.CHATML,
    sep="<|im_end|>",
    version="qwen",
)

conv_plain = Conversation(
    system="",
    roles=("", ""),
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
    version="plain",
)

conv_templates = {
    "qwen_1_5": conv_qwen,
    "qwen_2": conv_qwen,
    "plain": conv_plain,
}

default_conversation = conv_qwen
