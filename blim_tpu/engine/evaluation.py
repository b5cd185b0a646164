"""Evaluation driver: bidirectional top-k rerank + score-matrix assembly.

Mirrors the reference's `evaluation` (reference: retrieval_utils.py:170-281)
and the scoring-direction semantics of compute_{v2t,t2v}_scores_x:

  v2t candidate likelihood (VTG): P(candidate caption | query video)
  v2t query     likelihood (TVG): P(query video | candidate caption)
  t2v query     likelihood (VTG): P(query caption | candidate video)
  t2v candidate likelihood (TVG): P(candidate video | query caption)
  (+ CPN priors for both candidate directions)

Zero-shot gating: without a fine-tuned checkpoint the TVG paths (untrained
visual_head) are skipped (reference: retrieval_utils.py:227-250 gated on
`args.resume != '' or not args.eval`).

Items are (video, caption) annotation rows; score matrices are (N x N) over
items, exactly like the reference (datasets with multiple captions per video
appear as multiple items sharing a video)."""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs
from blim_tpu.models.videochat_flash import make_video_vocab


@dataclasses.dataclass
class EvalInputs:
    captions: Sequence[str]            # per item
    item_video_idx: np.ndarray         # (N,) item -> unique-video index
    features: np.ndarray               # (V, clips, tokens_per_clip, mm)
    t2v_iv2: np.ndarray                # (N, N) InternVideo2 text->video scores
    v2t_iv2: np.ndarray                # (N, N) InternVideo2 video->text scores


def evaluation(
    engine: RerankEngine,
    inputs: EvalInputs,
    tokenizer,
    dataset: str,
    topk: int = 16,
    cpn: bool = False,
    has_tvg: bool = True,
    fill: float = -100.0,
    verbose: bool = True,
    shared_prefix: bool = True,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    t_start = time.time()
    n = len(inputs.captions)
    item_vid = np.asarray(inputs.item_video_idx)

    vtg_bank = CaptionBank.build_vtg(inputs.captions, tokenizer, dataset, engine.vtg_layout)
    vtg_banks = engine.upload(vtg_bank, inputs.features)
    if has_tvg:
        tvg_bank = CaptionBank.build_tvg(inputs.captions, tokenizer, engine.tvg_layout)
        tvg_banks = engine.upload(tvg_bank, inputs.features)
        video_vocab = jnp.asarray(make_video_vocab(inputs.features), jnp.float32)

    t2v_dict: Dict[str, np.ndarray] = {}
    v2t_dict: Dict[str, np.ndarray] = {}

    def vtg_grid(rows, cols, cap_idx, vid_idx, with_prior):
        if shared_prefix:
            return engine.score_grid_vtg_shared(
                vtg_banks, rows, cols, cap_idx=cap_idx, vid_idx=vid_idx,
                out_shape=(n, n), with_prior=with_prior, topk=topk, fill=fill,
            )
        return engine.score_grid_vtg(
            vtg_banks, rows, cols, cap_idx=cap_idx, vid_idx=vid_idx,
            out_shape=(n, n), with_prior=with_prior, fill=fill,
        )

    # ---- V2T grid: rows = items-as-videos, cols = candidate captions -------
    rows, cols = topk_pairs(inputs.v2t_iv2, topk)
    if verbose:
        print(f"V2T grid: {len(rows)} pairs (topk={topk})")
    cand, cand_prior = vtg_grid(rows, cols, cap_idx=cols, vid_idx=item_vid[rows], with_prior=cpn)
    v2t_dict["candidate_likelihood"] = cand
    if cpn:
        v2t_dict["candidate_prior"] = cand_prior
    def tvg_grid(rows, cols, cap_idx, vid_idx, with_prior):
        if shared_prefix:
            return engine.score_grid_tvg_shared(
                tvg_banks, video_vocab, rows, cols, cap_idx=cap_idx, vid_idx=vid_idx,
                out_shape=(n, n), with_prior=with_prior, topk=topk, fill=fill,
            )
        return engine.score_grid_tvg(
            tvg_banks, video_vocab, rows, cols, cap_idx=cap_idx, vid_idx=vid_idx,
            out_shape=(n, n), with_prior=with_prior, fill=fill,
        )

    if has_tvg:
        query, _ = tvg_grid(rows, cols, cap_idx=cols, vid_idx=item_vid[rows], with_prior=False)
        v2t_dict["query_likelihood"] = query
    v2t_dict["internvideo2"] = np.asarray(inputs.v2t_iv2, np.float32)

    # ---- T2V grid: rows = items-as-texts, cols = candidate videos ----------
    rows, cols = topk_pairs(inputs.t2v_iv2, topk)
    if verbose:
        print(f"T2V grid: {len(rows)} pairs (topk={topk})")
    query, _ = vtg_grid(rows, cols, cap_idx=rows, vid_idx=item_vid[cols], with_prior=False)
    t2v_dict["query_likelihood"] = query
    if has_tvg:
        cand, cand_prior = tvg_grid(rows, cols, cap_idx=rows, vid_idx=item_vid[cols], with_prior=cpn)
        t2v_dict["candidate_likelihood"] = cand
        if cpn:
            t2v_dict["candidate_prior"] = cand_prior
    t2v_dict["internvideo2"] = np.asarray(inputs.t2v_iv2, np.float32)

    if verbose:
        print(f"Evaluation time {time.time() - t_start:.1f}s")
    return t2v_dict, v2t_dict
