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


def test_all_reference_templates_render():
    """Every template in the reference's conv_templates table exists and
    renders golden strings per its style's algorithm
    (reference: conversation.py:316-592)."""
    expected_names = {
        "default", "v0", "v1", "vicuna_v1", "llama_2", "mistral_instruct",
        "mistral_orca", "mistral_zephyr", "mistral_direct", "plain",
        "v0_plain", "chatml_direct", "llava_v0", "llava_v0_mmtag", "llava_v1",
        "llava_v1_mmtag", "llava_llama_2", "llava_llama_2_simple",
        "llava_llama_2_mmtag", "llava_mistral_instruct", "mpt", "qwen_1_5",
        "qwen_2", "internlm_2", "gemma_instruct",
    }
    assert expected_names <= set(conv_templates)

    # SINGLE (vicuna v0): "sys###Human: q###Assistant:"
    c = conv_templates["llava_v0"].copy()
    c.append_message(c.roles[0], "q")
    c.append_message(c.roles[1], None)
    assert c.get_prompt() == c.system + "###" + "Human: q###" + "Assistant:"

    # TWO (vicuna v1): "sys USER: q ASSISTANT: a</s>"
    c = conv_templates["vicuna_v1"].copy()
    c.append_message(c.roles[0], "q")
    c.append_message(c.roles[1], "a")
    assert c.get_prompt() == c.system + " " + "USER: q " + "ASSISTANT: a</s>"

    # LLAMA_2: sys wrapped into the first [INST], leading sep stripped
    c = conv_templates["llama_2"].copy()
    c.append_message(c.roles[0], "q")
    c.append_message(c.roles[1], "a")
    assert c.get_prompt() == (
        f"[INST] <<SYS>>\n{c.system}\n<</SYS>>\n\nq [/INST] a </s>"
    )

    # GEMMA: role-prefixed turns, "<end_of_turn>\n" separator
    c = conv_templates["gemma_instruct"].copy()
    c.append_message(c.roles[0], "q")
    c.append_message(c.roles[1], "a")
    assert c.get_prompt() == (
        "<start_of_turn>user\nq<end_of_turn>\n<start_of_turn>model\na<end_of_turn>\n"
    )

    # v0 seed conversation renders (offset messages included, like reference)
    c = conv_templates["default"].copy()
    out = c.get_prompt()
    assert out.startswith(c.system + "###Human: What are the key differences")
    assert out.endswith("###")

    # every template renders a 2-turn exchange without raising
    for name, tpl in conv_templates.items():
        c = tpl.copy()
        c.append_message(c.roles[0], "hello")
        c.append_message(c.roles[1], "world")
        assert isinstance(c.get_prompt(), str) and len(c.get_prompt()) > 0, name
