"""Static-layout parity: the TPU layouts must agree token-for-token with the
reference splice algorithm (flat -200 placeholder expansion + CPN masks,
reference: modeling_videochat_flash.py:356-515) on the real (non-pad) region.
"""

import numpy as np

from blim_tpu.core.constants import IGNORE_INDEX
from blim_tpu.data.prompts import (
    build_tvg_example,
    build_vtg_example,
    get_tvg_prefix_length,
    make_tvg_layout,
    make_vtg_layout,
    splice_flat_example,
)

NV = 256  # video tokens in VTG (4 clips x 64)
NC = 4    # clips (TVG uses 1 token per clip)


def test_vtg_layout_matches_reference_splice(tokenizer):
    layout = make_vtg_layout(tokenizer, "MSRVTT", num_video_tokens=NV, max_caption_tokens=32)
    for caption in ["a cat sits", "x", "many people dance in the rain"]:
        flat = build_vtg_example(caption, "MSRVTT", tokenizer)
        ref = splice_flat_example(flat, NV, tvg=False, tvg_prefix_length=0)
        enc = layout.encode_caption(caption, tokenizer, "MSRVTT")
        n = int(enc["real_len"])
        assert n == len(ref["input_ids"])
        # ids match everywhere except inside the video block (embeds there)
        nonvid = ref["is_video"][:n] == 0
        assert (enc["input_ids"][:n][nonvid] == ref["input_ids"][nonvid]).all()
        assert (enc["is_video"][:n] == ref["is_video"]).all()
        assert (enc["labels"][:n] == ref["labels"]).all()
        assert (enc["cpn_mask"][:n] == ref["cpn_mask"]).all()
        # pads: fully masked
        assert (enc["attention_mask"][n:] == 0).all()
        assert (enc["labels"][n:] == IGNORE_INDEX).all()


def test_vtg_label_window_covers_exactly_the_labels(tokenizer):
    layout = make_vtg_layout(tokenizer, "DiDeMo", num_video_tokens=NV, max_caption_tokens=32)
    enc = layout.encode_caption("hello world", tokenizer, "DiDeMo")
    start, length = layout.label_window
    labeled = np.nonzero(enc["labels"] != IGNORE_INDEX)[0]
    assert labeled.min() == start + 1  # hidden[start] predicts first label
    assert labeled.max() < start + 1 + length


def test_tvg_layout_matches_reference_splice(tokenizer):
    tpl = get_tvg_prefix_length(tokenizer)
    layout = make_tvg_layout(tokenizer, num_clips=NC, max_caption_tokens=32)
    for caption in ["a cat sits", "x", "many people dance in the rain"]:
        flat = build_tvg_example(caption, tokenizer)
        ref = splice_flat_example(flat, NC, tvg=True, tvg_prefix_length=tpl)
        enc = layout.encode_caption(caption, tokenizer)
        n = int(enc["real_len"])
        assert n == len(ref["input_ids"])
        off = layout.seq_len - n  # left padding offset
        nonvid = ref["is_video"] == 0
        assert (enc["input_ids"][off:][nonvid] == ref["input_ids"][nonvid]).all()
        assert (enc["is_video"][off:] == ref["is_video"]).all()
        assert (enc["cpn_mask"][off:] == ref["cpn_mask"]).all()
        assert (enc["attention_mask"][:off] == 0).all()
        assert (enc["attention_mask"][off:] == 1).all()
        # the two terminator labels exist and everything else is ignored
        labeled = np.nonzero(enc["labels"] != IGNORE_INDEX)[0]
        assert list(labeled) == [layout.seq_len - 2, layout.seq_len - 1]


def test_tvg_gather_positions_precede_video_tokens(tokenizer):
    layout = make_tvg_layout(tokenizer, num_clips=NC)
    enc = layout.encode_caption("a cat", tokenizer)
    gp = layout.gather_positions
    assert len(gp) == NC
    # hidden at gp[i] predicts the video token at gp[i] + 1
    vid_positions = np.nonzero(enc["is_video"])[0]
    assert (gp + 1 == vid_positions).all()
    # reference arithmetic: (labels == IMAGE_TOKEN_ID) position + arange(NC) - (NC+1)
    im_end_pos = int(np.nonzero(enc["labels"] == 151645)[0][0])
    ref_gp = im_end_pos + np.arange(NC) - (NC + 1)
    assert (gp == ref_gp).all()


def test_tvg_caption_overflow_truncates_but_keeps_tail(tokenizer):
    layout = make_tvg_layout(tokenizer, num_clips=NC, max_caption_tokens=8, align=1)
    long_caption = "a" * 500
    enc = layout.encode_caption(long_caption, tokenizer)
    assert enc["input_ids"].shape[0] == layout.seq_len
    assert (enc["attention_mask"] == 1).all()  # exactly full
    vs = layout.video_start
    assert (enc["is_video"][vs : vs + NC] == 1).all()
    assert list(enc["input_ids"][vs + NC :]) == list(layout.terminator_ids)
