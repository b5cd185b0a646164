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
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs, unique_pairs


@dataclasses.dataclass
class EvalInputs:
    captions: Sequence[str]            # per item
    item_video_idx: np.ndarray         # (N,) item -> unique-video index
    features: np.ndarray               # (V, clips, tokens_per_clip, mm)
    t2v_iv2: np.ndarray                # (N, N) InternVideo2 text->video scores
    v2t_iv2: np.ndarray                # (N, N) InternVideo2 video->text scores


def warm_session(
    engine: RerankEngine,
    inputs: EvalInputs,
    tokenizer,
    dataset: str,
    has_tvg: bool = True,
    cpn: bool = True,
    naive_batches: int = 0,
    packed: bool = True,
    workers: int = 8,
    verbose: bool = False,
) -> int:
    """Load every executable an evaluation at these bank shapes dispatches,
    WITHOUT the O(N^2) scoring sweep of a full warm evaluation.

    Coverage argument: the packed executables are exhaustively enumerated by
    engine.packed_combo_sets (tests/test_pack_schedule.py pins that a real
    evaluation's dispatch is a subset); the remaining executables an eval
    touches are the upload path's reshard/concat/projection ops and the
    prior-prefix KV forward, which this function exercises by performing a
    REAL upload at the same shapes. A full warm evaluation at 1000 queries
    cost ~80-160s of redundant scoring on top of this (r4 bench).

    `naive_batches` > 0 additionally touches the naive full-sequence step
    executables (score_grid_vtg/_tvg's `_vtg_step`/`_tvg_step` at the
    engine's batch size, both with_prior variants) — the A/B comparator's
    warm set. Requires the device-resident feature bank.

    Returns the packed-executable count; wall time in engine.last_warmup_s."""
    import jax

    vtg_bank = CaptionBank.build_vtg(inputs.captions, tokenizer, dataset,
                                     engine.vtg_layout)
    banks = engine.upload(vtg_bank, inputs.features)
    tvg_banks = video_vocab = None
    if has_tvg:
        tvg_bank = CaptionBank.build_tvg(inputs.captions, tokenizer,
                                         engine.tvg_layout)
        tvg_banks = engine.upload(tvg_bank, inputs.features, shared_feats=banks)
        video_vocab = engine.video_vocab(banks, inputs.features)
    count = 0
    if packed:
        count = engine.warmup_packed(banks, tvg_banks, video_vocab,
                                     with_prior=cpn, verbose=verbose,
                                     workers=workers)
    if naive_batches > 0:
        from blim_tpu.core.mesh import DATA_AXIS

        B = engine.batch_size
        sh = jax.sharding.NamedSharding(
            engine.mesh, jax.sharding.PartitionSpec(DATA_AXIS))
        ci = jax.device_put(jnp.zeros((B,), jnp.int32), sh)
        vi = jax.device_put(jnp.zeros((B,), jnp.int32), sh)
        last = None
        for wp in (False, True):
            last = engine._vtg_step(engine.params, engine.lora,
                                    engine._dev_banks(banks), ci, vi,
                                    with_prior=wp)
            if has_tvg:
                last = engine._tvg_step(engine.params, engine.lora,
                                        engine._dev_banks(tvg_banks),
                                        video_vocab, ci, vi, with_prior=wp)
        np.asarray(jax.tree_util.tree_leaves(last)[-1])
    return count


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
    packed: bool = True,
    timings: Dict[str, float] | None = None,
    warmup_shapes: bool = False,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    t_start = time.time()
    n = len(inputs.captions)
    item_vid = np.asarray(inputs.item_video_idx)

    def mark(name: str) -> None:
        # wall-clock milestones since t_start; dispatch marks measure host
        # blocking (the step itself drains async), sync marks measure the
        # wait for results. Cheap enough to leave on in production.
        if timings is not None:
            timings[name] = time.time() - t_start

    vtg_bank = CaptionBank.build_vtg(inputs.captions, tokenizer, dataset, engine.vtg_layout)
    mark("build_vtg")
    # defer the feature-bank wire transfer: the tunnel is one FIFO wire, so
    # a big put here would serialize ahead of every scoring request. The
    # feature-INDEPENDENT CPN prior pass dispatches first (deferred), then
    # flush_feats streams the bank while the device chews priors.
    vtg_banks = engine.upload(vtg_bank, inputs.features, defer_feats=shared_prefix)
    mark("upload_vtg")
    prior_fin = None
    if shared_prefix and cpn and packed:
        # the CPN prior is feature-independent (text-only prefix)
        prior_fin = engine.compute_vtg_priors_packed(vtg_banks, deferred=True)
        mark("prior_dispatch")
    engine.flush_feats(vtg_banks)
    mark("flush_feats")
    if has_tvg:
        tvg_bank = CaptionBank.build_tvg(inputs.captions, tokenizer, engine.tvg_layout)
        tvg_banks = engine.upload(tvg_bank, inputs.features, shared_feats=vtg_banks)
        mark("upload_tvg")
        # on-device token-mean of the resident bank: zero host pooling, zero
        # extra wire bytes (the host mean + re-upload was part of the
        # fine-tuned flow's serial startup ramp, PERF_NOTES_R4 §1)
        video_vocab = engine.video_vocab(vtg_banks, inputs.features)
        mark("video_vocab")

    if warmup_shapes and shared_prefix and packed:
        # pre-touch every packed-step executable this bank shape can reach:
        # which (size[, qcap], batch) combos a flow dispatches depends on the
        # top-k pair list, and a cold executable's first call both blocks the
        # dispatch thread and ships the binary over the same FIFO wire the
        # results ride (engine.warmup_packed docstring has the measurements).
        # Callers set this on an UNTIMED pass (e.g. the bench warmup) — the
        # combo set is exhaustive and executables are keyed on bank shapes,
        # so any later evaluation at the same item count runs fully warm
        # whatever its captions or pair list.
        engine.warmup_packed(
            vtg_banks, tvg_banks if has_tvg else None,
            video_vocab if has_tvg else None,
            with_prior=cpn, verbose=verbose)
        mark("warmup_shapes")

    t2v_dict: Dict[str, np.ndarray] = {}
    v2t_dict: Dict[str, np.ndarray] = {}

    # v2t grid: rows = items-as-videos, cols = candidate captions
    v_rows, v_cols = topk_pairs(inputs.v2t_iv2, topk)
    # t2v grid: rows = items-as-texts, cols = candidate videos
    t_rows, t_cols = topk_pairs(inputs.t2v_iv2, topk)
    n1 = len(v_rows)

    if shared_prefix:
        # Cross-grid dedup: v2t_candidate[i,j] and t2v_query[j,i] are the SAME
        # number P(caption j | video i) — the reference scores each twice
        # (retrieval_utils.py:218-241). Score the union of unique
        # (caption, vocab-video) keys once and scatter into both matrices.
        all_caps = np.concatenate([v_cols, t_rows])
        all_vids = np.concatenate([item_vid[v_rows], item_vid[t_cols]])
        u_cap, u_vid, inv = unique_pairs(all_caps, all_vids)
        if verbose:
            print(f"VTG union: {len(u_cap)} unique pairs of {len(all_caps)} "
                  f"grid cells (topk={topk})")
        # Dispatch order around the FIFO wire + device queue: the CPN prior
        # pass went out first (no feature dependency), the feature transfer
        # streams under it, TVG (reads only the small precomputed
        # tvg_embeds) dispatches DEFERRED so the host assembles + dispatches
        # the VTG pass while the device drains TVG, and every result sync
        # happens after all passes are in flight.
        tvg_fin = None
        if has_tvg:
            # TVG dedup: v2t_query[i,j] == t2v_candidate[j,i] == P(video i | caption j)
            if packed:
                tvg_fin = engine.score_pairs_tvg_packed(
                    tvg_banks, video_vocab, u_cap, u_vid, with_prior=cpn,
                    deferred=True,
                )
                mark("tvg_dispatch")
            else:
                tscores, tpriors = engine.score_pairs_tvg_shared(
                    tvg_banks, video_vocab, u_cap, u_vid, 2 * topk, with_prior=cpn
                )

        # union groups hold ~2*topk pairs per video on average (each video is
        # in its own v2t row AND ~topk queries' t2v lists). Default: packed
        # variable-length suffixes (varlen, ~40% fewer dispatched tokens);
        # packed=False keeps the bucketed (K, W) rectangle schedule.
        prior = None
        if packed:
            vtg_fin = engine.score_pairs_vtg_packed(
                vtg_banks, u_cap, u_vid, deferred=True)
            mark("vtg_dispatch")
            # the TVG + prior steps were dispatched AHEAD of VTG, so their
            # buffers materialize while the device still drains VTG compute:
            # fetching them first rides those tunnel roundtrips (~25ms each,
            # one per step) under the VTG drain instead of paying them as a
            # serial tail after it
            if tvg_fin is not None:
                tscores, tpriors = tvg_fin()
                tvg_fin = None
                mark("tvg_done")
            if cpn and prior_fin is not None:
                prior = prior_fin()
                mark("prior_done")
            scores = vtg_fin()
            mark("vtg_done")
        else:
            scores = engine.score_pairs_vtg_shared(vtg_banks, u_cap, u_vid, 2 * topk)
        cand = np.full((n, n), fill, np.float32)
        cand[v_rows, v_cols] = scores[inv[:n1]]
        query = np.full((n, n), fill, np.float32)
        query[t_rows, t_cols] = scores[inv[n1:]]
        v2t_dict["candidate_likelihood"] = cand
        t2v_dict["query_likelihood"] = query

        if has_tvg:
            if tvg_fin is not None:
                tscores, tpriors = tvg_fin()
                mark("tvg_done")
            vq = np.full((n, n), fill, np.float32)
            vq[v_rows, v_cols] = tscores[inv[:n1]]
            tc = np.full((n, n), fill, np.float32)
            tc[t_rows, t_cols] = tscores[inv[n1:]]
            v2t_dict["query_likelihood"] = vq
            t2v_dict["candidate_likelihood"] = tc
            if cpn:
                tp = np.full((n, n), fill, np.float32)
                tp[t_rows, t_cols] = tpriors[inv[n1:]]
                t2v_dict["candidate_prior"] = tp
        if cpn:
            if prior is None:  # not already consumed under the VTG drain
                prior = (prior_fin() if prior_fin is not None
                         else engine.compute_vtg_priors(vtg_banks))
                mark("prior_done")
            pmat = np.full((n, n), fill, np.float32)
            pmat[v_rows, v_cols] = prior[v_cols]
            v2t_dict["candidate_prior"] = pmat
    else:
        # naive per-pair full-sequence forwards (reference-style)
        if verbose:
            print(f"V2T grid: {n1} pairs, T2V grid: {len(t_rows)} pairs (topk={topk})")
        cand, cand_prior = engine.score_grid_vtg(
            vtg_banks, v_rows, v_cols, cap_idx=v_cols, vid_idx=item_vid[v_rows],
            out_shape=(n, n), with_prior=cpn, fill=fill,
        )
        v2t_dict["candidate_likelihood"] = cand
        if cpn:
            v2t_dict["candidate_prior"] = cand_prior
        query, _ = engine.score_grid_vtg(
            vtg_banks, t_rows, t_cols, cap_idx=t_rows, vid_idx=item_vid[t_cols],
            out_shape=(n, n), with_prior=False, fill=fill,
        )
        t2v_dict["query_likelihood"] = query
        if has_tvg:
            vq, _ = engine.score_grid_tvg(
                tvg_banks, video_vocab, v_rows, v_cols,
                cap_idx=v_cols, vid_idx=item_vid[v_rows],
                out_shape=(n, n), with_prior=False, fill=fill,
            )
            v2t_dict["query_likelihood"] = vq
            tc, tc_prior = engine.score_grid_tvg(
                tvg_banks, video_vocab, t_rows, t_cols,
                cap_idx=t_rows, vid_idx=item_vid[t_cols],
                out_shape=(n, n), with_prior=cpn, fill=fill,
            )
            t2v_dict["candidate_likelihood"] = tc
            if cpn:
                t2v_dict["candidate_prior"] = tc_prior

    v2t_dict["internvideo2"] = np.asarray(inputs.v2t_iv2, np.float32)
    t2v_dict["internvideo2"] = np.asarray(inputs.t2v_iv2, np.float32)

    mark("total")
    if verbose:
        print(f"Evaluation time {time.time() - t_start:.1f}s")
    return t2v_dict, v2t_dict
