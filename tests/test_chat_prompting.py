"""Chat prompt construction: first turn embeds the time message + <image>,
follow-up turns replay history (reference: modeling_videochat_flash.py:673-685)."""

import numpy as np

from blim_tpu.core.constants import DEFAULT_IMAGE_TOKEN
from blim_tpu.data.conversation import conv_templates
from blim_tpu.data.video import sample_frame_indices


def test_first_turn_prompt_shape():
    conv = conv_templates["qwen_2"].copy()
    time_msg = "The video lasts for 8.00 seconds, and 8 frames are uniformly sampled from it."
    conv.append_message(conv.roles[0], f"{DEFAULT_IMAGE_TOKEN}\n{time_msg} What happens?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt.count(DEFAULT_IMAGE_TOKEN) == 1
    assert prompt.endswith("<|im_start|>assistant\n")
    assert time_msg in prompt


def test_history_replay():
    conv = conv_templates["qwen_2"].copy()
    history = [
        {"role": conv.roles[0], "content": f"{DEFAULT_IMAGE_TOKEN}\nDescribe."},
        {"role": conv.roles[1], "content": "A cat."},
    ]
    for msg in history:
        conv.append_message(msg["role"], msg["content"])
    conv.append_message(conv.roles[0], "What color?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert "A cat.<|im_end|>" in prompt
    assert prompt.index("Describe.") < prompt.index("A cat.") < prompt.index("What color?")


def test_frame_sampling_multiple_of_clip():
    idx = sample_frame_indices(vlen=300, fps=30.0, max_num_frames=512, local_num_frames=4)
    assert len(idx) % 4 == 0
    assert len(idx) == 8  # ~10s at 1fps -> 10 -> rounded down to 8
    idx = sample_frame_indices(vlen=30000, fps=30.0, max_num_frames=512, local_num_frames=4)
    assert len(idx) == 512  # capped
    idx = sample_frame_indices(vlen=10, fps=30.0)
    assert len(idx) == 4  # minimum one clip
