"""Test configuration: run JAX on a simulated 8-device CPU mesh.

This is the TPU-world substitute for "multi-node without a cluster"
(SURVEY.md §4): sharding/pjit paths compile and execute against 8 virtual
devices exactly as they would against a v5e-8 slice.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone is not enough on machines where a TPU plugin (e.g. axon)
# ignores JAX_PLATFORMS; the config update reliably pins the backend to CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from blim_tpu.data.tokenization import ByteFallbackTokenizer

# tests use the package's deterministic byte-level tokenizer (Qwen2-compatible
# special-token ids) so test and bench tokenization can never diverge
ByteTokenizer = ByteFallbackTokenizer


@pytest.fixture(scope="session")
def tokenizer():
    return ByteTokenizer()


@pytest.fixture()
def rng():
    # function-scoped: a shared session generator made test INPUTS depend on
    # which other tests ran first (a seed-0 stream advanced by earlier tests
    # once steered the flash-attention parity test into a degenerate
    # masked-row case that only repros with specific file selections)
    return np.random.default_rng(0)
