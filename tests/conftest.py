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


class ByteTokenizer:
    """Deterministic toy tokenizer for tests.

    Byte-level with Qwen2-compatible special tokens so that prompt/label/mask
    construction is testable without the real BPE files: each UTF-8 byte is a
    token (id = byte), and the special strings map to their real Qwen2 ids.
    """

    SPECIALS = {
        "<|im_start|>": 151644,
        "<|im_end|>": 151645,
        "<|endoftext|>": 151643,
    }

    bos_token_id = None
    eos_token_id = 151645
    pad_token_id = 151643

    class _Enc:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text: str):
        ids = []
        i = 0
        while i < len(text):
            for s, tid in self.SPECIALS.items():
                if text.startswith(s, i):
                    ids.append(tid)
                    i += len(s)
                    break
            else:
                ids.extend(text[i].encode("utf-8"))
                i += 1
        return self._Enc(ids)

    def decode(self, ids, skip_special_tokens=False):
        inv = {v: k for k, v in self.SPECIALS.items()}
        out = []
        buf = bytearray()
        for t in ids:
            if t in inv:
                if buf:
                    out.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                if not skip_special_tokens:
                    out.append(inv[t])
            elif 0 <= t < 256:
                buf.append(t)
        if buf:
            out.append(buf.decode("utf-8", errors="replace"))
        return "".join(out)

    def batch_decode(self, batch, skip_special_tokens=False):
        return [self.decode(ids, skip_special_tokens=skip_special_tokens) for ids in batch]


@pytest.fixture(scope="session")
def tokenizer():
    return ByteTokenizer()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
