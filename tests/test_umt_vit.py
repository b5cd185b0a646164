"""Vision tower tests: cubic interpolation parity with torch, patch-embed
parity with Conv3d, position tables, truncated depth, and the featurizer
pipeline shape contract."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.core.config import VisionConfig
from blim_tpu.models import umt_vit


def test_cubic_resize_matches_torch_bicubic():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 14, 14)).astype(np.float32)
    expect = F.interpolate(torch.tensor(x), size=(28, 28), mode="bicubic",
                           align_corners=False).numpy()
    m = umt_vit.cubic_resize_matrix(14, 28)
    got = np.einsum("oh,bchw->bcow", m, x)
    got = np.einsum("ow,bchw->bcho", m, got)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_linear_resize_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 4)).astype(np.float32)  # (B, C, T)
    expect = F.interpolate(torch.tensor(x), size=7, mode="linear", align_corners=False).numpy()
    m = umt_vit._linear_resize_matrix(4, 7)
    got = np.einsum("ot,bct->bco", m, x)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_pos_table_res448_shape_and_dc():
    cfg = VisionConfig()  # 448, 4 frames
    video, image = umt_vit.build_pos_tables(cfg)
    assert video.shape == (1, 4 * 28 * 28, 1024)
    assert image.shape == (1, 28 * 28, 1024)
    # sin/cos structure survives interpolation approximately: bounded values
    assert np.abs(video).max() < 1.5


def test_patch_embed_matches_torch_conv3d():
    import torch

    cfg = VisionConfig(image_size=32, hidden_size=24, num_attention_heads=4,
                       num_hidden_layers=2, return_idx=-1, num_frames=2)
    rng = np.random.default_rng(2)
    w = rng.standard_normal((24, 3, 1, 16, 16)).astype(np.float32) * 0.1
    b = rng.standard_normal((24,)).astype(np.float32)
    pixels = rng.standard_normal((2, 3, 2, 32, 32)).astype(np.float32)

    conv = torch.nn.Conv3d(3, 24, kernel_size=(1, 16, 16), stride=(1, 16, 16))
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w))
        conv.bias.copy_(torch.tensor(b))
        expect = conv(torch.tensor(pixels)).flatten(2).transpose(1, 2).numpy()

    params = {"patch_embed": {
        "kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),  # (t,h,w,in,out)
        "bias": jnp.asarray(b),
    }}
    got = np.asarray(umt_vit.patch_embed(params, jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_truncated_depth():
    cfg = VisionConfig()
    assert cfg.depth == 23  # 24 layers + return_idx(-2) + 1 (reference :289)
    params = umt_vit.init_params(VisionConfig(image_size=32, hidden_size=16,
                                              num_attention_heads=2,
                                              num_hidden_layers=4, return_idx=-2,
                                              num_frames=2), jax.random.key(0))
    assert params["blocks"]["qkv"]["kernel"].shape[0] == 3


def test_tower_and_featurizer_shapes():
    from blim_tpu.core.config import ModelConfig
    from blim_tpu.pipelines.extract import make_featurizer

    vcfg = VisionConfig(image_size=32, hidden_size=16, num_attention_heads=2,
                        num_hidden_layers=2, return_idx=-1, num_frames=2)
    cfg = ModelConfig(vision=vcfg, mm_hidden_size=16, mm_local_num_frames=2,
                      num_clips=2, tokens_per_frame=2)
    params = umt_vit.init_params(vcfg, jax.random.key(0))
    pos, _ = umt_vit.build_pos_tables(vcfg)
    clips = jnp.asarray(np.random.default_rng(3).standard_normal((3, 2, 3, 32, 32)), jnp.float32)
    feats = umt_vit.encode_clips(params, clips, jnp.asarray(pos, jnp.float32), vcfg)
    assert feats.shape == (3, 2 * 4, 16)  # 2 frames x (32/16)^2 patches

    featurize = make_featurizer(params, cfg)
    pixels = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, cfg.num_clips, 2, 3, 32, 32)), jnp.float32
    )
    out = featurize(pixels)
    # tokens_per_clip = tokens_per_frame * local_frames = 4
    assert out.shape == (2, cfg.num_clips, 4, 16)


def test_image_processor_normalizes():
    proc = umt_vit.UMTImageProcessor(size=(32, 32))
    frames = (np.random.default_rng(5).uniform(0, 255, (2, 48, 64, 3))).astype(np.uint8)
    out = proc.preprocess(frames)
    assert out.shape == (2, 3, 32, 32)
    assert out.dtype == np.float32
    assert -4 < out.min() and out.max() < 4  # ImageNet-normalized range


def test_device_preprocess_matches_host_preprocess():
    """make_featurizer(device_preprocess=True) on resized uint8 frames must
    produce the same features as the host-normalize path — the production
    extraction pipeline moved rescale/normalize/transpose onto the TPU (r4,
    host normalize cost ~5x the decode on a 1-core host)."""
    from blim_tpu.core.config import ModelConfig
    from blim_tpu.pipelines.extract import make_featurizer

    vcfg = VisionConfig(image_size=32, hidden_size=16, num_attention_heads=2,
                        num_hidden_layers=2, return_idx=-1, num_frames=2)
    cfg = ModelConfig(vision=vcfg, mm_hidden_size=16, mm_local_num_frames=2,
                      num_clips=2, tokens_per_frame=2)
    params = umt_vit.init_params(vcfg, jax.random.key(0))
    proc = umt_vit.UMTImageProcessor(size=(32, 32))
    rng = np.random.default_rng(6)
    # two videos, already at tower res (resize_frames is a no-op then —
    # resize parity is test_image_processor_normalizes' job)
    frames = rng.uniform(0, 255, (2, cfg.num_clips * 2, 32, 32, 3)).astype(np.uint8)

    host = np.stack([proc.preprocess(f) for f in frames])  # (B, T, 3, h, w)
    host = host.reshape(2, cfg.num_clips, 2, 3, 32, 32)
    ref = make_featurizer(params, cfg)(jnp.asarray(host, jnp.float32))

    dev_in = frames.reshape(2, cfg.num_clips, 2, 32, 32, 3)
    got = make_featurizer(params, cfg, device_preprocess=True)(jnp.asarray(dev_in))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
