"""VideoChat-Flash multimodal model: LLM + projector + visual_head.

Re-design of the reference's `VideoChatFlashQwenForCausalLM`
(reference: modeling_videochat_flash.py:561-745) around static TPU layouts:

  * the embedding splice (`prepare_inputs_labels_for_multimodal`,
    reference :185-515) becomes a `dynamic_update_slice` at a *static*
    offset — the VTG/TVG layouts (data/prompts.py) guarantee the video block
    position is shape-constant;
  * the CPN attention-mask pair is precomputed by the layouts;
  * `visual_head` is a bias-free Linear(hidden -> mm_hidden) kept in fp32
    (reference: :584, main.py:108-111);
  * scoring forwards return per-row likelihoods directly (the reference
    materializes full-sequence logits and computes CE outside the model).

Batch dict contract (produced by engine/rerank.py or data collators):
  input_ids       (B, T) int32   — layout token ids (video slots arbitrary)
  attention_mask  (B, T) int32   — 1 = real token
  cpn_mask        (B, T) int32   — CPN prior visibility mask
  video           (B, clips, tokens_per_clip, mm_hidden) — cached features
  window_labels   (B, W) int32   — VTG only: labels for the static window
  video_label     (B,) int32     — TVG only: index of the true video
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from blim_tpu.core.config import ModelConfig
from blim_tpu.models import projector as projector_lib
from blim_tpu.models import qwen2
from blim_tpu.scoring import criteria

Params = Dict[str, Any]


def init_params(config: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    llm = qwen2.init_params(config.llm, k1, dtype)
    proj = projector_lib.init_params(k2, config.mm_hidden_size, config.llm.hidden_size, dtype)
    vh = (
        jax.random.normal(k3, (config.llm.hidden_size, config.mm_hidden_size), jnp.float32) * 0.02
    )
    return {"llm": llm, "projector": proj, "visual_head": {"kernel": vh}}


def _lora_parts(lora: Optional[Params]):
    if lora is None:
        return None, None
    return lora.get("llm"), lora.get("projector")


def splice_video(
    token_embeds: jax.Array,   # (B, T, D)
    video_embeds: jax.Array,   # (B, Nv, D)
    video_start: int,
) -> jax.Array:
    """Overwrite the layout's video slot with projected video embeddings
    (the static-shape equivalent of the reference's per-sample concat splice,
    modeling_videochat_flash.py:395-444)."""
    return jax.lax.dynamic_update_slice(
        token_embeds, video_embeds.astype(token_embeds.dtype), (0, video_start, 0)
    )


def vtg_hidden(
    params: Params,
    config: ModelConfig,
    input_ids: jax.Array,
    mask: jax.Array,
    video: jax.Array,
    video_start: int,
    *,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    lora_dropout: float = 0.0,
    remat: bool = False,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Embed + splice + decode for the VTG direction; returns (B, T, D)."""
    llm_lora, proj_lora = _lora_parts(lora)
    vid = projector_lib.project_vtg(
        params["projector"], video, lora=proj_lora,
        dropout_rng=dropout_rng, lora_scale=lora_scale, lora_dropout=lora_dropout,
    )
    emb = qwen2.embed_tokens(params["llm"], input_ids)
    emb = splice_video(emb, vid, video_start)
    return qwen2.forward_hidden(
        params["llm"], config.llm, emb, mask,
        lora=llm_lora, lora_scale=lora_scale, remat=remat, use_pallas=use_pallas,
    )


def pdrop_total_dropped(config: ModelConfig) -> int:
    """Static count of video tokens PyramidDrop removes by the last layer —
    downstream window offsets (caption region, gather positions) shift by
    this much when mm_llm_compress is on."""
    if not config.mm_llm_compress or not config.llm_compress_layer_list:
        return 0
    final_ratio = config.llm_image_token_ratio_list[len(config.llm_compress_layer_list)]
    return config.video_tokens_vtg - int(config.video_tokens_vtg * final_ratio)


def vtg_hidden_pdrop(
    params: Params,
    config: ModelConfig,
    input_ids: jax.Array,
    mask: jax.Array,
    video: jax.Array,
    video_start: int,
    query_pos: int,                # last instruction token (prompt end)
    *,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    lora_dropout: float = 0.0,
    remat: bool = False,
    use_pallas: Optional[bool] = None,
):
    """VTG forward with PyramidDrop in-LLM video-token pruning (reference:
    modeling_qwen2_flash.py:1081-1357; enabled via config.mm_llm_compress).
    Returns (post-norm hidden (B, S - pdrop_total_dropped(config), D),
    kept-index map into the original sequence). Right-padded layouts only,
    matching the reference's own restriction."""
    from blim_tpu.models.pyramid_drop import pdrop_forward_hidden

    llm_lora, proj_lora = _lora_parts(lora)
    vid = projector_lib.project_vtg(
        params["projector"], video, lora=proj_lora,
        dropout_rng=dropout_rng, lora_scale=lora_scale, lora_dropout=lora_dropout,
    )
    emb = qwen2.embed_tokens(params["llm"], input_ids)
    emb = splice_video(emb, vid, video_start)
    return pdrop_forward_hidden(
        params["llm"], config.llm, emb, mask, video_start,
        config.video_tokens_vtg, query_pos,
        config.llm_compress_layer_list, config.llm_image_token_ratio_list,
        compress_type=config.llm_compress_type,
        lora=llm_lora, lora_scale=lora_scale, remat=remat, use_pallas=use_pallas,
    )


def tvg_hidden(
    params: Params,
    config: ModelConfig,
    input_ids: jax.Array,
    mask: jax.Array,
    video: jax.Array,
    video_start: int,
    *,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    lora_dropout: float = 0.0,
    remat: bool = False,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Embed + splice + decode for the TVG direction (1 token per clip)."""
    llm_lora, proj_lora = _lora_parts(lora)
    vid = projector_lib.project_tvg(
        params["projector"], video, lora=proj_lora,
        dropout_rng=dropout_rng, lora_scale=lora_scale, lora_dropout=lora_dropout,
    )
    emb = qwen2.embed_tokens(params["llm"], input_ids)
    emb = splice_video(emb, vid, video_start)
    return qwen2.forward_hidden(
        params["llm"], config.llm, emb, mask,
        lora=llm_lora, lora_scale=lora_scale, remat=remat, use_pallas=use_pallas,
    )


def _lm_head_parts(params: Params, lora: Optional[Params], ):
    kernel = params["llm"]["lm_head"]["kernel"]
    if kernel is None:
        kernel = params["llm"]["embed_tokens"]["embedding"].T
    llm_lora, _ = _lora_parts(lora)
    if llm_lora is not None and "lm_head" in llm_lora:
        return kernel, llm_lora["lm_head"]["a"], llm_lora["lm_head"]["b"]
    return kernel, None, None


def vtg_window_logits(
    params: Params,
    config: ModelConfig,
    hidden: jax.Array,
    window_start: int,
    window_len: int,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
) -> jax.Array:
    """Slice the static label window and apply the LM head there only."""
    win = jax.lax.dynamic_slice_in_dim(hidden, window_start, window_len, axis=1)
    llm_lora, _ = _lora_parts(lora)
    return qwen2.lm_logits(params["llm"], win, config.llm, lora=llm_lora, lora_scale=lora_scale)


def score_vtg(
    params: Params,
    config: ModelConfig,
    batch: Dict[str, jax.Array],
    video_start: int,
    window_start: int,
    window_len: int,
    *,
    cpn: bool = False,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """P(caption | video) per row — or the CPN prior P(caption) with cpn=True
    (video block masked out of attention, reference:
    modeling_videochat_flash.py:433, retrieval_utils.py:91-96)."""
    mask = batch["cpn_mask"] if cpn else batch["attention_mask"]
    hidden = vtg_hidden(
        params, config, batch["input_ids"], mask, batch["video"], video_start,
        lora=lora, lora_scale=lora_scale, use_pallas=use_pallas,
    )
    win = jax.lax.dynamic_slice_in_dim(hidden, window_start, window_len, axis=1)
    kernel, la, lb = _lm_head_parts(params, lora)
    return criteria.vtg_likelihood_from_hidden(
        win, kernel, batch["window_labels"], la, lb, lora_scale
    )


def score_tvg(
    params: Params,
    config: ModelConfig,
    batch: Dict[str, jax.Array],
    video_vocab: jax.Array,     # (V, clips, mm_hidden)
    video_start: int,
    gather_start: int,
    *,
    cpn: bool = False,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """P(video | caption) per row via the visual_head classifier over the
    video vocabulary — or the CPN prior P(video) with cpn=True (caption
    masked down to the instruction prefix, reference:
    modeling_videochat_flash.py:414-417, retrieval_utils.py:98-108)."""
    mask = batch["cpn_mask"] if cpn else batch["attention_mask"]
    hidden = tvg_hidden(
        params, config, batch["input_ids"], mask, batch["video"], video_start,
        lora=lora, lora_scale=lora_scale, use_pallas=use_pallas,
    )
    clip_hidden = jax.lax.dynamic_slice_in_dim(hidden, gather_start, config.num_clips, axis=1)
    logits = criteria.tvg_clip_logits(clip_hidden, params["visual_head"]["kernel"], video_vocab)
    return criteria.tvg_likelihood(logits, batch["video_label"])


# ---------------------------------------------------------------------------
# Interactive generation (generate / chat)
# ---------------------------------------------------------------------------

def encode_image_tiles(
    params: Params,                # must include "vision_tower"
    config: ModelConfig,
    pixels: jax.Array,             # (N, 3, H, W) — anyres tiles, base first
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Single-image encode path: each anyres tile runs the tower as a 1-frame
    clip, ToMe-compresses to 64 tokens, and projects through `mlp`
    (reference: encode_video_image with compress=False -> 64 tokens/image,
    mm_projector_builder.py:149-152; num_image_patches_per_side=8).
    Returns (N, 64, hidden)."""
    from blim_tpu.models import umt_vit

    n = pixels.shape[0]
    _, pos_img = umt_vit.build_pos_tables(config.vision)
    feats = umt_vit.encode_clips(
        params["vision_tower"], pixels[:, None], jnp.asarray(pos_img, jnp.float32),
        config.vision, use_pallas=use_pallas,
    )                                                       # (N, patches, mm)
    raw = feats.reshape(n, -1, config.mm_hidden_size)
    compressed = projector_lib.compress_image_tokens(
        raw, config.vision.num_attention_heads, target=64
    )
    return projector_lib.mlp_apply(
        params["projector"]["mlp"], compressed,
        lora=None if lora is None else lora["projector"].get("mlp"),
        lora_scale=lora_scale,
    )


def merge_image_patches(
    image_feature: jax.Array,      # (N_tiles, 64, hidden) — base tile first
    image_size,                    # original (width, height)
    config: ModelConfig,
    image_grid_pinpoints,
    image_aspect_ratio: str = "anyres_nopad",
    mm_patch_merge_type: str = "spatial_nopad",
) -> jax.Array:
    """Reassemble anyres tile features into one token sequence
    (reference: modeling_videochat_flash.py:255-298 'spatial' multi-patch
    branch): grid tiles view as (nph, npw, 8, 8, C), transpose to raster
    order, flatten, and prepend the base view. Branches the reference itself
    leaves unimplemented (maxpool2x2 / unpad / anyres_max) raise."""
    from blim_tpu.data.images import get_anyres_image_grid_shape

    if image_feature.shape[0] == 1:
        if "unpad" in mm_patch_merge_type:
            raise NotImplementedError("unpad newline: unimplemented in the reference path")
        return image_feature[0]
    base = image_feature[0]
    tiles = image_feature[1:]
    hw = 8  # num_image_patches_per_side (reference: mm_projector_builder.py:96)
    assert hw * hw == tiles.shape[1], tiles.shape
    if "anyres" not in image_aspect_ratio:
        raise NotImplementedError(image_aspect_ratio)
    npw, nph = get_anyres_image_grid_shape(
        image_size, image_grid_pinpoints, config.vision.image_size
    )
    if "maxpool2x2" in mm_patch_merge_type or "unpad" in mm_patch_merge_type:
        raise NotImplementedError("unimplemented in the reference path")
    feat = tiles.reshape(nph, npw, hw, hw, tiles.shape[-1])
    feat = feat.transpose(0, 2, 1, 3, 4).reshape(-1, tiles.shape[-1])
    if "nobase" in mm_patch_merge_type:
        return feat
    return jnp.concatenate([base, feat], axis=0)


def generate(
    params: Params,
    config: ModelConfig,
    input_ids,                     # flat prompt ids containing one -200 image slot
    video_embeds: jax.Array,       # (Nv, D) projected video embeddings
    tokenizer,
    max_new_tokens: int = 256,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    lora: Optional[Params] = None,   # {"llm": ..., "projector": ...}
    lora_scale: float = 0.0,
):
    """Single-prompt generation: splice + prefill + KV-cache decode
    (reference: modeling_videochat_flash.py:632-654). A fine-tuned model's
    LoRA adapters apply throughout (reference generates through the
    peft-wrapped model, main.py:100-105)."""
    import numpy as np

    from blim_tpu.core.constants import IMAGE_TOKEN_INDEX
    from blim_tpu.models import generation

    ids = np.asarray(input_ids)
    (img_pos,) = np.nonzero(ids == IMAGE_TOKEN_INDEX)
    if len(img_pos):
        ip = int(img_pos[0])
        before = jnp.asarray(ids[:ip], jnp.int32)
        after = jnp.asarray(ids[ip + 1 :], jnp.int32)
        emb = jnp.concatenate(
            [
                qwen2.embed_tokens(params["llm"], before),
                video_embeds.astype(params["llm"]["embed_tokens"]["embedding"].dtype),
                qwen2.embed_tokens(params["llm"], after),
            ],
            axis=0,
        )[None]
    else:
        emb = qwen2.embed_tokens(params["llm"], jnp.asarray(ids, jnp.int32))[None]
    mask = jnp.ones(emb.shape[:2], jnp.int32)
    eos = [tokenizer.eos_token_id] if tokenizer.eos_token_id is not None else [151645]
    tokens = generation.generate_tokens(
        params["llm"], config.llm, emb, mask, max_new_tokens, eos,
        temperature=temperature, rng=rng,
        lora=None if lora is None else lora["llm"], lora_scale=lora_scale,
    )
    return np.asarray(tokens[0])


def chat(
    params: Params,
    config: ModelConfig,
    video_path: str,
    tokenizer,
    user_prompt: str,
    featurize,                     # pixels -> cached features (pipelines.extract.make_featurizer)
    image_processor,
    chat_history: Optional[list] = None,
    return_history: bool = True,
    max_num_frames: int = 512,
    max_new_tokens: int = 256,
    temperature: float = 0.0,
    lora: Optional[Params] = None,   # {"llm": ..., "projector": ...}
    lora_scale: float = 0.0,
):
    """Video chat: decode -> featurize -> prompt -> generate -> detokenize
    (reference: modeling_videochat_flash.py:656-729)."""
    import numpy as np

    from blim_tpu.core.constants import DEFAULT_IMAGE_TOKEN
    from blim_tpu.data.conversation import conv_templates
    from blim_tpu.data.prompts import tokenizer_image_token
    from blim_tpu.data.video import load_video
    from blim_tpu.models.generation import KeywordsStoppingCriteria

    frames, time_msg = load_video(
        video_path, max_num_frames=max_num_frames,
        local_num_frames=config.mm_local_num_frames,
    )
    pixels = image_processor.preprocess(frames)  # (T, 3, H, W)
    lf = config.mm_local_num_frames
    clips = len(pixels) // lf
    pix = jnp.asarray(pixels[: clips * lf].reshape(1, clips, lf, *pixels.shape[1:]))
    feats = featurize(pix)[0]                    # (clips, tokens_per_clip, mm)
    video_embeds = projector_lib.project_vtg(
        params["projector"], feats[None],
        lora=None if lora is None else lora["projector"], lora_scale=lora_scale,
    )[0]

    conv = conv_templates["qwen_2"].copy()
    if chat_history:
        for msg in chat_history:
            conv.append_message(msg["role"], msg["content"])
        conv.append_message(conv.roles[0], user_prompt)
    else:
        conv.append_message(
            conv.roles[0], f"{DEFAULT_IMAGE_TOKEN}\n{time_msg.strip()} {user_prompt}"
        )
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    input_ids = tokenizer_image_token(prompt, tokenizer)

    tokens = generate(
        params, config, input_ids, video_embeds, tokenizer,
        max_new_tokens=max_new_tokens, temperature=temperature,
        lora=lora, lora_scale=lora_scale,
    )
    text = tokenizer.decode(list(tokens), skip_special_tokens=True)
    text = KeywordsStoppingCriteria([conv.sep], tokenizer).trim(text)

    history = list(chat_history or [])
    history.append({"role": conv.roles[0], "content": user_prompt})
    history.append({"role": conv.roles[1], "content": text})
    return (text, history) if return_history else text


# ---------------------------------------------------------------------------
# Shared-prefix VTG scoring (prefix-KV reuse)
# ---------------------------------------------------------------------------
#
# Every VTG pair sharing a video also shares the whole [pre][video][post]
# prefix (the caption is the only varying part, and it sits at the end of the
# right-padded layout). The reference recomputes the full sequence for each of
# the topk candidates (retrieval_utils.py:62-108); here the prefix runs once
# per video and only short caption suffixes run per pair. The CPN prior is
# video-independent (the video block is masked out of attention), so its
# text-only prefix is computed once per dataset and each caption's prior once
# per caption instead of once per pair.

def vtg_prefix_hidden_kv(
    params: Params,
    config: ModelConfig,
    prefix_ids: jax.Array,      # (G, P) — layout tokens before the suffix
    video: jax.Array,           # (G, clips, tokens_per_clip, mm)
    video_start: int,
    position_ids: Optional[jax.Array] = None,
    prefix_mask: Optional[jax.Array] = None,   # (G, P); None = all real
    *,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
):
    """Prefix forward returning per-layer K/V. The prefix may carry trailing
    alignment pads (mask 0) so the suffix kernel tiles onto the MXU."""
    llm_lora, proj_lora = _lora_parts(lora)
    vid = projector_lib.project_vtg(params["projector"], video, lora=proj_lora,
                                    lora_scale=lora_scale)
    emb = qwen2.embed_tokens(params["llm"], prefix_ids)
    emb = splice_video(emb, vid, video_start)
    if prefix_mask is None:
        prefix_mask = jnp.ones(prefix_ids.shape, jnp.int32)
    _, kv = qwen2.forward_collect_kv(
        params["llm"], config.llm, emb, prefix_mask, position_ids,
        lora=llm_lora, lora_scale=lora_scale, use_pallas=use_pallas,
    )
    return kv


def vtg_text_prefix_kv(
    params: Params,
    config: ModelConfig,
    prefix_ids: jax.Array,      # (1, P2) text-only prefix (pre + post[:-1])
    position_ids: jax.Array,    # (1, P2) original layout positions (gap at video)
    prefix_mask: Optional[jax.Array] = None,
    *,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
):
    """Prefix K/V for the CPN prior P(t): the video block is invisible, so the
    prefix is pure text at its original (gapped) positions."""
    llm_lora, _ = _lora_parts(lora)
    emb = qwen2.embed_tokens(params["llm"], prefix_ids)
    if prefix_mask is None:
        prefix_mask = jnp.ones(prefix_ids.shape, jnp.int32)
    _, kv = qwen2.forward_collect_kv(
        params["llm"], config.llm, emb, prefix_mask, position_ids,
        lora=llm_lora, lora_scale=lora_scale, use_pallas=use_pallas,
    )
    return kv


def score_vtg_suffix(
    params: Params,
    config: ModelConfig,
    prefix_kv,
    suffix_ids: jax.Array,      # (G, K, W)
    suffix_mask: jax.Array,     # (G, K, W)
    suffix_labels: jax.Array,   # (G, K, W-1): label for hidden position i is
                                # token i+1 (IGNORE on pads/terminator overrun)
    position_offset: int,
    *,
    prefix_mask: Optional[jax.Array] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Likelihood of each suffix given its group's prefix -> (G, K)."""
    llm_lora, _ = _lora_parts(lora)
    emb = qwen2.embed_tokens(params["llm"], suffix_ids)
    hidden = qwen2.forward_suffix_with_prefix(
        params["llm"], config.llm, emb, prefix_kv, suffix_mask, position_offset,
        prefix_mask=prefix_mask, lora=llm_lora, lora_scale=lora_scale,
        use_pallas=use_pallas,
    )
    kernel, la, lb = _lm_head_parts(params, lora)
    return criteria.vtg_likelihood_from_hidden(
        hidden[:, :, :-1], kernel, suffix_labels, la, lb, lora_scale
    )


def tvg_prefix_kv(
    params: Params,
    config: ModelConfig,
    prefix_ids: jax.Array,      # (G, P) left-padded text prompt through "assistant\n"[:-1]
    prefix_mask: jax.Array,     # (G, P) — attention mask OR the CPN prior mask
    position_ids: Optional[jax.Array] = None,   # absolute positions when the
                                # left-pad has been trimmed to a width bucket
    *,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
):
    """Per-caption TVG prefix K/V. For the CPN prior P(v), pass the CPN prefix
    mask: only the instruction head stays visible (reference:
    modeling_videochat_flash.py:414-417)."""
    llm_lora, _ = _lora_parts(lora)
    emb = qwen2.embed_tokens(params["llm"], prefix_ids)
    _, kv = qwen2.forward_collect_kv(
        params["llm"], config.llm, emb, prefix_mask, position_ids,
        lora=llm_lora, lora_scale=lora_scale, use_pallas=use_pallas,
    )
    return kv


def score_vtg_packed(
    params: Params,
    config: ModelConfig,
    prefix_kv,                   # k/v: (L, G, P, Hkv, hd)
    pack_ids: jax.Array,         # (G, T) packed caption suffix tokens
    pack_seg: jax.Array,         # (G, T) segment id per token; -1 = padding
    pack_pos: jax.Array,         # (G, T) global positions (restart per segment)
    pack_labels: jax.Array,      # (G, T) next-token labels; IGNORE elsewhere
    n_segments: int,             # static: max segments per pack
    *,
    prefix_mask: Optional[jax.Array] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
) -> jax.Array:
    """Per-segment mean log-likelihoods for a PACK of variable-length caption
    suffixes sharing one prefix -> (G, n_segments).

    The packed counterpart of `score_vtg_suffix`: captions lie back to back
    with segment ids instead of a width-padded (K, W) rectangle, so short
    captions stop paying for the group's longest one (the reference's
    flash-attn varlen idea, done with static shapes)."""
    llm_lora, _ = _lora_parts(lora)
    emb = qwen2.embed_tokens(params["llm"], pack_ids)
    hidden = qwen2.forward_packed_suffix(
        params["llm"], config.llm, emb, prefix_kv, pack_seg, pack_pos,
        prefix_mask=prefix_mask, lora=llm_lora, lora_scale=lora_scale,
    )
    kernel, la, lb = _lm_head_parts(params, lora)
    ce, valid = criteria.ce_from_hidden(hidden, kernel, pack_labels, la, lb, lora_scale)
    seg_oh = jax.nn.one_hot(
        jnp.clip(pack_seg, 0, n_segments - 1), n_segments, dtype=jnp.float32
    ) * (pack_seg >= 0)[..., None].astype(jnp.float32)
    total = jnp.einsum("gts,gt->gs", seg_oh, ce)
    count = jnp.einsum("gts,gt->gs", seg_oh, valid.astype(jnp.float32))
    return -(total / jnp.maximum(count, 1.0))


def score_tvg_shared(
    params: Params,
    config: ModelConfig,
    prefix_kv,
    prefix_mask: jax.Array,       # (G, P)
    first_ids: jax.Array,         # (G,) last text token (suffix position 0)
    video: jax.Array,             # (G, K, clips, tokens_per_clip, mm)
    video_label: jax.Array,       # (G, K) vocab index of each pair's video
    video_vocab: jax.Array,       # (V, clips, mm)
    terminator_ids,               # static tuple of term token ids
    position_offset: int,         # global position of suffix token 0
    *,
    cpn: bool = False,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Shared-prefix TVG likelihood/prior -> (G, K).

    Suffix = [last text token | clip tokens | terminators]; hidden at suffix
    positions 0..clips-1 predicts clips 0..clips-1 (the reference's gather
    arithmetic, training_utils.py:72). In the CPN prior the last text token is
    itself masked (it lies beyond tvg_prefix_length)."""
    llm_lora, proj_lora = _lora_parts(lora)
    g, k = video.shape[:2]
    clips = config.num_clips
    emb_dtype = params["llm"]["embed_tokens"]["embedding"].dtype

    first = qwen2.embed_tokens(params["llm"], first_ids)[:, None, None, :]   # (G,1,1,D)
    first = jnp.broadcast_to(first, (g, k, 1, first.shape[-1]))
    if video.ndim == 4:
        # precomputed per-video TVG embeddings (G, K, clips, D) — the
        # projection is pair-independent, so the rerank engine computes it
        # once per video at upload instead of per (group, candidate): the
        # tvg_mlp's (G,K,clips,64,hidden) intermediate otherwise dominates
        # the step's HBM (234MB at G=4, K=32)
        vid = video.astype(emb_dtype)
    else:
        vid = projector_lib.project_tvg(params["projector"], video, lora=proj_lora,
                                        lora_scale=lora_scale).astype(emb_dtype)  # (G,K,clips,D)
    term = qwen2.embed_tokens(params["llm"], jnp.asarray(list(terminator_ids), jnp.int32))
    term = jnp.broadcast_to(term[None, None], (g, k, len(terminator_ids), term.shape[-1]))
    suffix = jnp.concatenate([first.astype(emb_dtype), vid, term.astype(emb_dtype)], axis=2)

    w = suffix.shape[2]
    suffix_mask = jnp.ones((g, k, w), jnp.int32)
    if cpn:
        suffix_mask = suffix_mask.at[:, :, 0].set(0)  # last text token masked in the prior

    hidden = qwen2.forward_suffix_with_prefix(
        params["llm"], config.llm, suffix, prefix_kv, suffix_mask, position_offset,
        prefix_mask=prefix_mask, lora=llm_lora, lora_scale=lora_scale,
        use_pallas=use_pallas,
    )
    clip_hidden = hidden[:, :, :clips].reshape(g * k, clips, -1)
    logits = criteria.tvg_clip_logits(clip_hidden, params["visual_head"]["kernel"], video_vocab)
    scores = criteria.tvg_likelihood(logits, video_label.reshape(-1))
    return scores.reshape(g, k)


def tvg_pack_prefix_kv(
    params: Params,
    config: ModelConfig,
    pack_ids: jax.Array,     # (G, T) caption prefixes packed back-to-back
    pack_seg: jax.Array,     # (G, T) segment id per token; -1 = padding
    pack_pos: jax.Array,     # (G, T) absolute positions (P_full - L_c + j)
    *,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
):
    """Packed-prefix K/V for the TVG direction: many variable-length caption
    prefixes share one (G, T) row with block-diagonal causal attention —
    replacing the width-bucketed left-pad trim (whose bucket padding was
    dispatched work). The TVG prefix is pure text, so no video splice."""
    llm_lora, _ = _lora_parts(lora)
    emb = qwen2.embed_tokens(params["llm"], pack_ids)
    _, kv = qwen2.forward_collect_kv_packed(
        params["llm"], config.llm, emb, pack_seg, pack_pos,
        lora=llm_lora, lora_scale=lora_scale,
    )
    return kv


def score_tvg_packed(
    params: Params,
    config: ModelConfig,
    pack_kv,                      # k/v: (L, G, T, Hkv, hd) packed prefix KV
    pack_seg: jax.Array,          # (G, T) segment id per pack token
    q_seg: jax.Array,             # (G, Q) segment id per query; -1 = unused slot
    q_first: jax.Array,           # (G, Q) last text token of the query's caption
    q_video: jax.Array,           # (G, Q, clips, D) precomputed TVG embeddings
    q_label: jax.Array,           # (G, Q) vocab index of each query's video
    video_vocab: jax.Array,       # (V, clips, mm)
    position_offset: int,         # global position of suffix token 0 (= P_full)
    *,
    cpn=False,                    # bool or traced scalar; see note below
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
) -> jax.Array:
    """Packed-TVG likelihood/prior -> (G, Q): a flat query list per pack, each
    query attending to its own segment of the packed prefix.

    `cpn` (mask the query's last text token, the CPN prior semantics) is a
    TRACED value, not a Python static: it only flips one mask column, so
    keeping it dynamic lets the likelihood and prior passes share ONE
    compiled executable per (size, qn, g) combo — halving the TVG warmup's
    trace/lowering work (~1s per combo on the 1-core host, GIL-serial).

    Two deliberate reductions vs `score_tvg_shared` (numerically identical —
    causality makes the dropped tokens unreadable):
      * suffix width is `clips` (= 4), not 1+clips+terminators (= 7): hidden
        positions 0..clips-1 are the only ones the TVG head reads
        (training_utils.py:72 gathers -(num_clips+1)..-2), and position i
        only attends to inputs 0..i — the last clip token and the
        terminators are compute that nothing consumes;
      * queries are a flat (Q,) axis with a query->segment map instead of a
        (K,) axis per caption — captions with few candidates stop padding to
        the group's candidate count.
    """
    g, qn = q_seg.shape
    clips = config.num_clips
    emb_dtype = params["llm"]["embed_tokens"]["embedding"].dtype
    llm_lora, _ = _lora_parts(lora)

    first = qwen2.embed_tokens(params["llm"], q_first)[:, :, None, :]   # (G,Q,1,D)
    vid = q_video.astype(emb_dtype)[:, :, : clips - 1]                  # (G,Q,clips-1,D)
    suffix = jnp.concatenate([first.astype(emb_dtype), vid], axis=2)    # (G,Q,W=clips,D)

    w = clips
    valid = (q_seg >= 0).astype(jnp.int32)
    suffix_mask = jnp.broadcast_to(valid[:, :, None], (g, qn, w))
    # last text token masked in the prior pass (cpn=1); arithmetic, not `if`,
    # so a traced cpn works and both passes hit the same executable
    keep_head = 1 - jnp.asarray(cpn, jnp.int32)
    suffix_mask = suffix_mask.at[:, :, 0].multiply(keep_head)
    # per-query prefix visibility: only the query's own segment of the pack
    prefix_mask = (pack_seg[:, None, :] == q_seg[:, :, None]) & (q_seg >= 0)[:, :, None]

    hidden = qwen2.forward_suffix_with_prefix(
        params["llm"], config.llm, suffix, pack_kv, suffix_mask, position_offset,
        prefix_mask=prefix_mask.astype(jnp.int32), lora=llm_lora, lora_scale=lora_scale,
        use_pallas=False,
    )
    clip_hidden = hidden.reshape(g * qn, clips, -1)
    logits = criteria.tvg_clip_logits(clip_hidden, params["visual_head"]["kernel"], video_vocab)
    scores = criteria.tvg_likelihood(logits, q_label.reshape(-1))
    return scores.reshape(g, qn)


def make_video_vocab(features: jax.Array) -> jax.Array:
    """(V, clips, tokens_per_clip, mm) cached features -> (V, clips, mm) vocab
    by mean-pooling the token axis (reference: base_dataset.py:33-37)."""
    return features.mean(axis=-2)
