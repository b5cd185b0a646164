"""Scoring criteria parity vs torch oracles (the reference's criteria are
thin wrappers over torch.nn.CrossEntropyLoss, reference:
retrieval_utils.py:18-43, training_utils.py:17-37)."""

import math

import numpy as np
import jax.numpy as jnp

from blim_tpu.core.constants import IGNORE_INDEX
from blim_tpu.scoring import criteria


def test_vtg_likelihood_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    b, w, v = 3, 10, 50
    logits = rng.standard_normal((b, w, v)).astype(np.float32)
    labels = rng.integers(0, v, (b, w)).astype(np.int32)
    labels[:, 7:] = IGNORE_INDEX
    labels[1, :2] = IGNORE_INDEX

    # oracle: -(sum of per-token CE) / (count of labeled tokens)
    lt = torch.tensor(logits).reshape(-1, v)
    yt = torch.tensor(labels.astype(np.int64)).reshape(-1)
    ce = F.cross_entropy(lt, yt, reduction="none", ignore_index=IGNORE_INDEX).reshape(b, w)
    expect = -(ce.sum(1) / (torch.tensor(labels) != IGNORE_INDEX).sum(1)).numpy()

    ours = np.asarray(criteria.vtg_likelihood(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, expect, rtol=1e-5, atol=1e-6)


def test_vtg_train_loss_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    b, w, v = 4, 8, 30
    logits = rng.standard_normal((b, w, v)).astype(np.float32)
    labels = rng.integers(0, v, (b, w)).astype(np.int32)
    labels[:, :3] = IGNORE_INDEX
    expect = F.cross_entropy(
        torch.tensor(logits).reshape(-1, v),
        torch.tensor(labels.astype(np.int64)).reshape(-1),
        ignore_index=IGNORE_INDEX,
    ).item()
    ours = float(criteria.vtg_train_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert math.isclose(ours, expect, rel_tol=1e-5)


def test_tvg_clip_logits_match_torch_bmm(rng):
    """logits = bmm(visual_head(h) over clips, vocab^T) / sqrt(mm)
    (reference: training_utils.py:76-79)."""
    import torch

    b, c, d, mm, V = 2, 4, 12, 8, 6
    h = rng.standard_normal((b, c, d)).astype(np.float32)
    vh = rng.standard_normal((d, mm)).astype(np.float32)
    vocab = rng.standard_normal((V, c, mm)).astype(np.float32)

    proj = torch.tensor(h) @ torch.tensor(vh)                      # (b,c,mm)
    tl = torch.bmm(
        proj.permute(1, 0, 2), torch.tensor(vocab).permute(1, 2, 0)
    ).transpose(0, 1) / math.sqrt(mm)                              # (b,c,V)

    ours = np.asarray(
        criteria.tvg_clip_logits(jnp.asarray(h), jnp.asarray(vh), jnp.asarray(vocab))
    )
    np.testing.assert_allclose(ours, tl.numpy(), rtol=1e-5, atol=1e-6)


def test_tvg_likelihood_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    b, c, V = 3, 4, 7
    logits = rng.standard_normal((b, c, V)).astype(np.float32)
    labels = rng.integers(0, V, (b,)).astype(np.int32)
    rep = torch.tensor(labels.astype(np.int64))[:, None].repeat(1, c)
    ce = F.cross_entropy(
        torch.tensor(logits).reshape(-1, V), rep.reshape(-1), reduction="none"
    ).reshape(b, c)
    expect = -ce.mean(1).numpy()
    ours = np.asarray(criteria.tvg_likelihood(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, expect, rtol=1e-5, atol=1e-6)
