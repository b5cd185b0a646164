"""Golden tests for ChatML prompt rendering and VTG/TVG prompt strings.

These pin the exact strings the reference's qwen_2 template produces
(reference: conversation.py:118-127,440-449; base_dataset.py:60-105) — any
drift here shifts every likelihood score.
"""

from blim_tpu.data.conversation import conv_templates
from blim_tpu.data.prompts import (
    TVG_INSTRUCTION,
    VTG_INSTRUCTIONS,
    build_tvg_example,
    build_vtg_example,
    get_tvg_prefix_length,
    tvg_prompt_strings,
    tokenizer_image_token,
    vtg_prompt_strings,
)
from blim_tpu.core.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX

SYSTEM = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"


def test_chatml_render_basic():
    conv = conv_templates["qwen_2"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], None)
    assert conv.get_prompt() == (
        SYSTEM + "<|im_start|>user\nhello<|im_end|>\n<|im_start|>assistant\n"
    )


def test_chatml_render_full_turn():
    conv = conv_templates["qwen_2"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], "world")
    assert conv.get_prompt() == (
        SYSTEM
        + "<|im_start|>user\nhello<|im_end|>\n"
        + "<|im_start|>assistant\nworld<|im_end|>\n"
    )


def test_vtg_prompt_strings_msrvtt():
    prompt_only, full = vtg_prompt_strings("a cat sits", "MSRVTT")
    assert prompt_only == (
        SYSTEM
        + "<|im_start|>user\n<image>\nDescribe this video briefly.<|im_end|>\n"
        + "<|im_start|>assistant\n"
    )
    assert full == prompt_only + "a cat sits<|im_end|>\n"


def test_vtg_instructions_per_dataset():
    assert VTG_INSTRUCTIONS["DiDeMo"] == "Describe this video in detail."
    assert VTG_INSTRUCTIONS["ActivityNet"] == "Describe this video in detail."
    assert VTG_INSTRUCTIONS["LSMDC"] == "Describe this video in one sentence."
    assert VTG_INSTRUCTIONS["MSRVTT"] == "Describe this video briefly."


def test_tvg_prompt_strings():
    prompt_only, full = tvg_prompt_strings("a cat sits")
    assert prompt_only == (
        SYSTEM
        + "<|im_start|>user\nGenerate a video given the caption.\nCaption: a cat sits<|im_end|>\n"
        + "<|im_start|>assistant\n"
    )
    assert full == prompt_only + "<image><|im_end|>\n"


def test_tokenizer_image_token_splits_on_placeholder(tokenizer):
    ids = tokenizer_image_token("ab<image>cd", tokenizer)
    assert ids == [ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("c"), ord("d")]


def test_tokenizer_image_token_specials(tokenizer):
    ids = tokenizer_image_token("<|im_end|><image>x", tokenizer)
    assert ids == [151645, IMAGE_TOKEN_INDEX, ord("x")]


def test_vtg_example_labels_mask_prompt(tokenizer):
    ex = build_vtg_example("hi", "MSRVTT", tokenizer)
    ids, labels = ex["input_ids"], ex["labels"]
    # prompt region ignored, caption + <|im_end|> + "\n" labeled
    n_prompt = int(ex["prompt_len"])
    assert (labels[:n_prompt] == IGNORE_INDEX).all()
    assert list(labels[n_prompt:]) == [ord("h"), ord("i"), 151645, ord("\n")]
    assert (ids[n_prompt:] == labels[n_prompt:]).all()
    assert (ex["attention_mask"] == 1).all()  # no pads in a flat example
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1


def test_tvg_example_tail_is_image_imend(tokenizer):
    ex = build_tvg_example("hi", tokenizer)
    ids, labels = ex["input_ids"], ex["labels"]
    n_prompt = int(ex["prompt_len"])
    assert list(ids[n_prompt:]) == [IMAGE_TOKEN_INDEX, 151645, ord("\n")]
    assert list(labels[n_prompt:]) == [IMAGE_TOKEN_INDEX, 151645, ord("\n")]


def test_tvg_prefix_length_formula(tokenizer):
    # reference: base_dataset.py:20-24 — token count of the bare-instruction
    # turn minus 2.
    conv = conv_templates["qwen_2"].copy()
    conv.append_message(conv.roles[0], TVG_INSTRUCTION)
    expect = len(tokenizer(conv.get_prompt()).input_ids) - 2
    assert get_tvg_prefix_length(tokenizer) == expect
