"""AnyRes image tiling + single-image encode path.

Geometry functions are checked against hand-computed oracles of the
reference's algorithms (reference: mm_utils.py:395-745 — the reference
itself cannot be imported here: it hard-imports decord/av). The encode path
runs a tiny tower end-to-end and checks the raster-order patch merge
(reference: modeling_videochat_flash.py:255-298).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.core.config import tiny_model_config
from blim_tpu.data import images as im
from blim_tpu.models import videochat_flash as vcf
from blim_tpu.models.umt_vit import UMTImageProcessor


def test_parse_grid_pinpoints_range_syntax():
    grid = im.parse_grid_pinpoints("(1x1),...,(3x3)", 448)
    assert [1 * 448, 1 * 448] in [list(g) for g in grid]
    assert len(grid) == 9
    assert [3 * 448, 2 * 448] in [list(g) for g in grid]
    # literal list passes through
    assert im.parse_grid_pinpoints([[448, 896]], 448) == [[448, 896]]


def test_select_best_resolution_max_effective_then_min_waste():
    # 900x600 at patch 448: 2x2 grid wastes less than wide/tall grids at
    # equal effective resolution
    possible = [[448, 448], [896, 448], [448, 896], [896, 896], [1344, 896]]
    best = im.select_best_resolution((900, 600), possible)
    # scale for 1344x896 = min(1.49, 1.49) -> full 900x600 effective (540000)
    # scale for 896x896 = 0.995 -> 895x596 = 533420; 1344x896 wins on effective
    assert best == (1344, 896)
    # tiny image: everything covers it; min waste picks the smallest grid
    assert im.select_best_resolution((100, 100), possible) == (448, 448)


def test_select_best_resolution_max_resolutions_filter():
    possible = [[448, 448], [1344, 896]]
    best = im.select_best_resolution(
        (900, 600), possible, max_resolutions=448 * 448 * 3, patch_size=448
    )
    # 1344*896 + 448^2 > 3*448^2 is filtered out
    assert best == (448, 448)


def test_divide_to_patches_row_major():
    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    patches = im.divide_to_patches(arr, 2)   # 2 rows x 3 cols of 2x2 tiles
    assert len(patches) == 6
    first = np.asarray(patches[0])
    np.testing.assert_array_equal(first, arr[:2, :2])
    second = np.asarray(patches[1])           # next column, same row
    np.testing.assert_array_equal(second, arr[:2, 2:4])


def test_expand2square_and_resize_pad():
    tall = np.zeros((10, 4, 3), np.uint8)
    sq = im.expand2square(tall, (255, 0, 0))
    assert sq.size == (10, 10)
    padded = im.resize_and_pad_image(np.zeros((10, 20, 3), np.uint8), (8, 8))
    assert padded.size == (8, 8)


def test_anyres_grid_shape_and_nopad_tiles():
    proc = UMTImageProcessor((448, 448))
    # landscape 900x600 -> best grid 1344x896 -> 3 wide x 2 high
    assert im.get_anyres_image_grid_shape((900, 600), "(1x1),...,(3x3)", 448) == (3, 2)
    img = np.random.default_rng(0).integers(0, 255, (600, 900, 3)).astype(np.uint8)
    tiles = im.process_anyres_image_nopad(img, proc, "(1x1),...,(3x3)")
    assert tiles.shape == (1 + 6, 3, 448, 448)   # base + 3x2 tiles


def test_process_images_dispatch():
    proc = UMTImageProcessor((448, 448))
    img = np.zeros((100, 160, 3), np.uint8)
    assert im.process_images([img], proc, "pad").shape == (1, 3, 448, 448)
    assert im.process_images([img], proc, None).shape == (1, 3, 448, 448)
    with pytest.raises(NotImplementedError):
        im.process_images([img], proc, "highres")
    with pytest.raises(NotImplementedError):
        im.process_images([img], proc, "crop_split")
    with pytest.raises(NotImplementedError):
        im.process_images([img], proc, "anyres")  # padded variant: dead in reference


def test_merge_image_patches_raster_order():
    cfg = tiny_model_config()
    C = 5
    nph, npw, hw = 2, 3, 8
    base = jnp.zeros((1, hw * hw, C))
    # tile t filled with value t+1 -> after merge, raster rows interleave tiles
    tiles = jnp.stack([jnp.full((hw * hw, C), float(t + 1)) for t in range(nph * npw)])
    feat = jnp.concatenate([base, tiles], axis=0)
    # grid (3 wide x 2 high) at the tiny tower's 64px patch: fake pinpoints
    merged = vcf.merge_image_patches(
        feat, image_size=(3 * cfg.vision.image_size, 2 * cfg.vision.image_size),
        config=cfg, image_grid_pinpoints=[[3 * cfg.vision.image_size, 2 * cfg.vision.image_size]],
    )
    assert merged.shape == (hw * hw + nph * npw * hw * hw, C)
    body = np.asarray(merged[hw * hw:]).reshape(nph, hw, npw, hw, C)
    for r in range(nph):
        for c in range(npw):
            expect = r * npw + c + 1
            assert (body[r, :, c] == expect).all()


def test_single_tile_image_passthrough():
    cfg = tiny_model_config()
    feat = jnp.ones((1, 64, 7))
    out = vcf.merge_image_patches(feat, (64, 64), cfg, [[64, 64]])
    assert out.shape == (64, 7)


@pytest.mark.slow
def test_encode_image_tiles_end_to_end(rng):
    """Anyres tiles -> tiny tower -> ToMe-64 -> projector mlp."""
    # 192px tower => (192/16)^2 = 144 patches per tile > the 64-token target
    cfg = tiny_model_config(image_size=192)
    params = vcf.init_params(cfg, jax.random.key(0))
    from blim_tpu.models import umt_vit

    params["vision_tower"] = umt_vit.init_params(cfg.vision, jax.random.key(1))
    sz = cfg.vision.image_size
    pixels = jnp.asarray(rng.standard_normal((3, 3, sz, sz)), jnp.float32)
    out = vcf.encode_image_tiles(params, cfg, pixels)
    assert out.shape == (3, 64, cfg.llm.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


# --- the mm_utils tail (reference: mm_utils.py:395-500, 747-825) -----------


def test_auto_pad_images_grid_and_centering():
    from PIL import Image

    img = Image.new("RGB", (300, 200), (255, 0, 0))
    out = im.auto_pad_images(img, [224, 448])
    # aspect 1.5 -> closest candidate aspect 1.0; target (448, 448) wins on
    # |max(size)/max(res) - 1|; resize to 448x298, centered black pad
    assert out.size == (448, 448)
    arr = np.asarray(out)
    assert (arr[0] == 0).all() and (arr[-1] == 0).all()      # pad bands
    assert tuple(arr[224, 224]) == (255, 0, 0)               # centered content
    assert (arr[75] != 0).any() and (arr[74] == 0).all()     # top pad = 75 rows


def test_auto_pad_images_rejects_empty_grid():
    from PIL import Image

    with pytest.raises(AssertionError):
        im.auto_pad_images(Image.new("RGB", (8, 8)), [])


def test_load_image_from_base64_round_trip():
    import base64
    from io import BytesIO

    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (5, 7, 3), dtype=np.uint8)
    buf = BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    out = im.load_image_from_base64(b64)
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_get_model_name_from_path():
    assert im.get_model_name_from_path("/ckpts/VideoChat-Flash-7B/") == "VideoChat-Flash-7B"
    assert im.get_model_name_from_path("a/b/checkpoint-500") == "b_checkpoint-500"
    assert im.get_model_name_from_path("plain") == "plain"


def test_process_highres_image_crop_split_geometry():
    from PIL import Image

    proc = UMTImageProcessor(size=(4, 4))
    img = Image.new("RGB", (20, 12), (0, 128, 0))
    out = im.process_highres_image_crop_split(img, crop_resolution=8,
                                              split_resolution=4, processor=proc)
    # 8x8 center crop -> 2x2 grid of 4x4 tiles
    assert out.shape == (4, 3, 4, 4)
    # solid-color input: every tile normalizes identically
    np.testing.assert_allclose(out[0], out[3], atol=1e-6)


def test_process_images_crop_split_dispatch_still_raises():
    proc = UMTImageProcessor(size=(4, 4))
    with pytest.raises(NotImplementedError):
        im.process_images([np.zeros((8, 8, 3), np.uint8)], proc, "crop_split")
