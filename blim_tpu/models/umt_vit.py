"""UMT ViT-L vision tower (functional JAX).

Re-design of the reference tower (reference:
videochat_flash/vision_tower_builder.py:33-433,480-618): tubelet Conv3D
patch embed (tubelet=1 => per-frame patchify, done as reshape+matmul on the
MXU), interpolated sin-cos position tables, 23 pre-norm blocks (24 + return_idx
-2 + 1 truncation), packed-QKV non-causal attention with separate q/v biases
(k bias implicitly zero), GELU MLP, and a final eps=1e-12 LayerNorm.

Position tables reproduce the reference's torch `F.interpolate(bicubic,
align_corners=False)` numerics via a hand-rolled A=-0.75 cubic resampler
(jax.image.resize uses A=-0.5, which would shift every cached feature).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blim_tpu.core.config import VisionConfig
from blim_tpu.kernels.attention import multi_head_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Position embeddings (host-side, numpy fp64, computed once)
# ---------------------------------------------------------------------------

def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """Classic transformer sin-cos table (reference:
    vision_tower_builder.py:225-235)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel, torch bicubic's A=-0.75."""
    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1
    out[m1] = (a + 2) * t[m1] ** 3 - (a + 3) * t[m1] ** 2 + 1
    m2 = (t > 1) & (t < 2)
    out[m2] = a * t[m2] ** 3 - 5 * a * t[m2] ** 2 + 8 * a * t[m2] - 4 * a
    return out


def pil_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix reproducing one axis of PIL Image.resize BICUBIC.

    PIL semantics (the reference preprocesses via HF `resize(...,
    PILImageResampling.BICUBIC)`, vision_tower_builder.py:441-477): kernel
    a=-0.5, window renormalisation at the borders (not clamp-accumulate),
    and antialias filter widening on downscale. Applied as two separable
    passes — horizontal FIRST, quantising to the uint8 image domain between
    passes exactly like PIL's uint8 pipeline — this matches Image.resize to
    within ±1 grey level on <0.02% of pixels (fixed-point tie rounding).
    Used by the TPU-side resize in the extraction featurizer so raw decoded
    frames can ship over the wire instead of res-448 ones."""
    scale = n_in / n_out
    fs = max(scale, 1.0)
    support = 2.0 * fs
    m = np.zeros((n_out, n_in))
    for i in range(n_out):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), n_in)
        w = _cubic_kernel((np.arange(lo, hi) - center + 0.5) / fs, a=-0.5)
        m[i, lo:hi] = w / w.sum()
    return m


def cubic_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix implementing torch's 1-D bicubic interpolation
    with align_corners=False (clamped borders)."""
    scale = n_in / n_out
    w = np.zeros((n_out, n_in))
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        for k in range(-1, 3):
            idx = min(max(x0 + k, 0), n_in - 1)
            w[i, idx] += _cubic_kernel(np.asarray(x - (x0 + k)))
    return w


def _linear_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) as a matrix."""
    scale = n_in / n_out
    w = np.zeros((n_out, n_in))
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        t = x - x0
        for k, coef in ((x0, 1 - t), (x0 + 1, t)):
            idx = min(max(k, 0), n_in - 1)
            w[i, idx] += coef
    return w


def interpolated_pos_table(
    n_position: int,
    d_hid: int,
    cur_frame: int,
    ckpt_num_frame: int,
    pre_n_position: int,
) -> np.ndarray:
    """Reference get_sinusoid_encoding_table2 (vision_tower_builder.py:225-269):
    generate the pretrained-resolution table, bicubic-resize space 14->P and
    linear-resize time ckpt->cur as needed. Returns (1, n_position, d_hid)."""
    table = sinusoid_table(pre_n_position, d_hid)[None]  # (1, pre_n, C)

    if n_position != pre_n_position:
        T, P, C = ckpt_num_frame, 14, d_hid
        new_p = int(round((n_position // cur_frame) ** 0.5))
        x = table.reshape(-1, T, P, P, C).reshape(-1, P, P, C)   # (T, P, P, C)
        m = cubic_resize_matrix(P, new_p)
        # separable bicubic: rows then cols
        x = np.einsum("op,tpqc->toqc", m, x)
        x = np.einsum("oq,tpqc->tpoc", m, x)
        table = x.reshape(1, T, new_p, new_p, C).reshape(1, T * new_p * new_p, C)

    if cur_frame != ckpt_num_frame:
        T, new_t, C = ckpt_num_frame, cur_frame, d_hid
        P = int(round((n_position // cur_frame) ** 0.5))
        x = table.reshape(-1, T, P, P, C).transpose(0, 2, 3, 4, 1).reshape(-1, C, T)
        m = _linear_resize_matrix(T, new_t)
        x = np.einsum("ot,bct->bco", m, x)
        x = x.reshape(1, P, P, C, new_t).transpose(0, 4, 1, 2, 3)
        table = x.reshape(1, new_t * P * P, C)
    return table


def build_pos_tables(config: VisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(video pos table, single-image pos table) for this tower config
    (reference: vision_tower_builder.py:300-307)."""
    c = config
    frames = c.num_frames // c.tubelet_size
    num_patches = c.patches_per_frame * frames
    if c.image_size != 224:
        video = interpolated_pos_table(
            num_patches, c.hidden_size, cur_frame=frames,
            ckpt_num_frame=c.ckpt_num_frame, pre_n_position=784,
        )
        image = interpolated_pos_table(
            c.patches_per_frame, c.hidden_size, cur_frame=1, ckpt_num_frame=1,
            pre_n_position=196,
        )
    else:
        video = sinusoid_table(num_patches, c.hidden_size)[None]
        image = sinusoid_table(c.patches_per_frame, c.hidden_size)[None]
    return video, image


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(config: VisionConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    c = config
    L, D = c.depth, c.hidden_size
    I = int(D * c.mlp_ratio)
    keys = iter(jax.random.split(key, 8))

    def w(k, shape):
        scale = (2.0 / (shape[-2] + shape[-1])) ** 0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    blocks = {
        "norm1": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
        "norm2": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
        "qkv": {"kernel": w(next(keys), (L, D, 3 * D))},
        "q_bias": jnp.zeros((L, D), dtype),
        "v_bias": jnp.zeros((L, D), dtype),
        "proj": {"kernel": w(next(keys), (L, D, D)), "bias": jnp.zeros((L, D), dtype)},
        "fc1": {"kernel": w(next(keys), (L, D, I)), "bias": jnp.zeros((L, I), dtype)},
        "fc2": {"kernel": w(next(keys), (L, I, D)), "bias": jnp.zeros((L, D), dtype)},
    }
    patch = {
        "kernel": w(next(keys), (c.tubelet_size, c.patch_size, c.patch_size, 3, D)).astype(dtype),
        "bias": jnp.zeros((D,), dtype),
    }
    return {
        "patch_embed": patch,
        "blocks": blocks,
        "final_norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def patch_embed(params: Params, pixels: jax.Array, config: VisionConfig) -> jax.Array:
    """(B, C, T, H, W) -> (B, T*L, D). Tubelet Conv3D as patchify + one matmul
    (reference: vision_tower_builder.py:162-187; stride == kernel, so the conv
    is an exact block reshape + dense — better MXU utilization than conv)."""
    c = config
    b, ch, t, h, w = pixels.shape
    ts, ps = c.tubelet_size, c.patch_size
    nt, nh, nw = t // ts, h // ps, w // ps
    x = pixels.reshape(b, ch, nt, ts, nh, ps, nw, ps)
    # -> (B, nt, nh, nw, ts, ps, ps, ch)
    x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
    x = x.reshape(b, nt * nh * nw, ts * ps * ps * ch)
    kernel = params["patch_embed"]["kernel"].reshape(-1, params["patch_embed"]["kernel"].shape[-1])
    # kernel layout (ts, ps, ps, ch, D) matches the transpose order above
    return x @ kernel + params["patch_embed"]["bias"]


def vit_block(
    bp: Params,
    x: jax.Array,               # (B, N, D)
    config: VisionConfig,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """One pre-norm ViT block: LN -> packed-QKV attention (q/v biases, zero k
    bias, reference: vision_tower_builder.py:99-126) -> proj -> LN -> GELU MLP."""
    c = config
    H = c.num_attention_heads
    D = c.hidden_size
    hd = D // H
    y = _layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"], c.layer_norm_eps)
    qkv_bias = jnp.concatenate([bp["q_bias"], jnp.zeros_like(bp["q_bias"]), bp["v_bias"]])
    qkv = y @ bp["qkv"]["kernel"] + qkv_bias
    b, n, _ = qkv.shape
    qkv = qkv.reshape(b, n, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = multi_head_attention(
        q, k, v, causal=False, scale=hd ** -0.5, use_pallas=use_pallas
    )
    attn = attn.reshape(b, n, D) @ bp["proj"]["kernel"] + bp["proj"]["bias"]
    x = x + attn
    y = _layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"], c.layer_norm_eps)
    y = jax.nn.gelu(y @ bp["fc1"]["kernel"] + bp["fc1"]["bias"], approximate=False)
    y = y @ bp["fc2"]["kernel"] + bp["fc2"]["bias"]
    return x + y


def forward_features(
    params: Params,
    pixels: jax.Array,          # (B, C, T, H, W)
    pos_table: jax.Array,       # (1, T*L, D)
    config: VisionConfig,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Full tower: patchify + pos + truncated blocks + final LN -> (B, T*L, D)
    (reference: vision_tower_builder.py:329-352,427-433)."""
    c = config
    x = patch_embed(params, pixels, c)
    x = x + pos_table.astype(x.dtype)

    def block(x, bp):
        return vit_block(bp, x, c, use_pallas), None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return _layer_norm(
        x, params["final_norm"]["scale"], params["final_norm"]["bias"], c.final_layer_norm_eps
    )


def encode_clips(
    params: Params,
    clips: jax.Array,           # (B, T, C, H, W) frames of one or more clips
    pos_table: jax.Array,
    config: VisionConfig,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """(B, T, C, H, W) -> (B, T*L, D): the UMTVisionTower.forward contract
    (reference: vision_tower_builder.py:564-576)."""
    pixels = clips.transpose(0, 2, 1, 3, 4)
    return forward_features(params, pixels, pos_table, config, use_pallas)


# ---------------------------------------------------------------------------
# Image preprocessing (host-side)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class UMTImageProcessor:
    """Resize(bicubic) + rescale(1/255) + ImageNet-normalize, channels-first
    (reference: vision_tower_builder.py:441-477)."""

    def __init__(self, size: Tuple[int, int] = (224, 224)):
        self.size = size
        self.image_mean = IMAGENET_MEAN
        self.image_std = IMAGENET_STD

    def preprocess(self, frames: np.ndarray, target_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """frames: (T, H, W, 3) uint8 -> (T, 3, h, w) float32."""
        h, w = target_size or self.size
        out = np.empty((len(frames), 3, h, w), np.float32)
        resized = self.resize_frames(frames, (h, w))
        for i, f in enumerate(resized):
            arr = f.astype(np.float32) / 255.0
            out[i] = ((arr - self.image_mean) / self.image_std).transpose(2, 0, 1)
        return out

    def resize_frames(self, frames: np.ndarray, target_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """frames: (T, H, W, 3) uint8 -> (T, h, w, 3) uint8, bicubic.

        The cheap half of `preprocess`: resize only, staying in uint8 (the
        reference also resizes in the uint8 image domain,
        vision_tower_builder.py:441-477). Rescale + ImageNet-normalize +
        channels-first belong on the device — host-side they cost ~5x the
        decode itself (fp32 temporaries over 38MB/video on a 1-core host);
        folded into the jitted featurizer XLA fuses them into the
        patch-embed convolution for free (`make_featurizer(...,
        device_preprocess=True)`)."""
        h, w = target_size or self.size
        if frames.shape[1] == h and frames.shape[2] == w:
            return frames
        out = np.empty((len(frames), h, w, 3), np.uint8)
        try:
            from PIL import Image

            for i, f in enumerate(frames):
                out[i] = np.asarray(Image.fromarray(f).resize((w, h), Image.BICUBIC))
        except ImportError:
            # PIL-exact fallback: horizontal pass first, uint8 quantisation
            # between passes (see pil_resize_matrix)
            mh = pil_resize_matrix(frames.shape[1], h)
            mw = pil_resize_matrix(frames.shape[2], w)
            for i, f in enumerate(frames):
                arr = np.einsum("ow,hwc->hoc", mw, f.astype(np.float64))
                arr = np.clip(np.rint(arr), 0, 255)
                arr = np.einsum("oh,hwc->owc", mh, arr)
                out[i] = np.clip(np.rint(arr), 0, 255).astype(np.uint8)
        return out
