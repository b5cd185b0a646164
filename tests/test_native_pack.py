"""Native feature-pack reader: build, gather parity with numpy, zero fallback."""

import numpy as np
import pytest

from blim_tpu.data.features import FeatureStore
from blim_tpu.data.native_pack import NativePack, load_library

SHAPE = (4, 8, 16)


@pytest.fixture(scope="module")
def pack(tmp_path_factory):
    root = tmp_path_factory.mktemp("pack")
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((5, *SHAPE)).astype(np.float32)
    vids = [f"v{i}" for i in range(5)]
    FeatureStore.write_pack(str(root), vids, feats, dtype="float16")
    return root, vids, feats


def test_library_builds():
    assert load_library() is not None, "g++ build of feature_pack.cpp failed"


def test_native_gather_matches_numpy(pack):
    root, vids, feats = pack
    np_store_expect = feats.astype(np.float16).astype(np.float32)
    native = NativePack(str(root / "features.pack"), 5, SHAPE, "float16")
    out = native.gather(np.asarray([3, 0, 4], np.int64))
    np.testing.assert_allclose(out, np_store_expect[[3, 0, 4]], rtol=0, atol=0)
    native.close()


def test_negative_index_zero_fallback(pack):
    root, _, _ = pack
    native = NativePack(str(root / "features.pack"), 5, SHAPE, "float16")
    out = native.gather(np.asarray([-1, 2], np.int64))
    assert (out[0] == 0).all() and not (out[1] == 0).all()
    native.close()


def test_store_uses_native_path(pack):
    root, vids, feats = pack
    store = FeatureStore(str(root), shape=SHAPE)
    out = store.load_many(["v1", "v2"])
    np.testing.assert_allclose(
        out, feats[[1, 2]].astype(np.float16).astype(np.float32)
    )


def test_fp16_conversion_edge_values(tmp_path):
    # subnormals, inf, nan, negative zero round-trip through the C converter
    vals = np.asarray(
        [0.0, -0.0, 1.0, -2.5, 6.1e-5, 5.96e-8, 65504.0, np.inf, -np.inf, np.nan,
         1e-7, 3.14159, -1e-6, 0.333251953125, 2.0, 4.0], np.float32,
    ).reshape(1, 1, 16).repeat(4, 0).repeat(8, 1)
    FeatureStore.write_pack(str(tmp_path), ["x"], vals[None], dtype="float16")
    native = NativePack(str(tmp_path / "features.pack"), 1, (4, 8, 16), "float16")
    out = native.gather(np.asarray([0], np.int64))[0]
    expect = vals.astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(np.isnan(out), np.isnan(expect))
    np.testing.assert_allclose(out[~np.isnan(out)], expect[~np.isnan(expect)], rtol=0, atol=0)
