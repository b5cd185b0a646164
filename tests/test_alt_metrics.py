"""Alt retrieval metrics vs the ACTUAL reference module (util/metrics.py).

The reference keeps a legacy metrics surface (diagonal-rank recalls with
tie expansion, multi-sentence 3D variants, DSL report formatting); our
numpy implementation must reproduce it bit-for-bit, including the tie and
NaN semantics of the sort-and-match trick.
"""

import sys

import numpy as np
import pytest

from blim_tpu.scoring import alt_metrics

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_metrics():
    sys.path.insert(0, REFERENCE)
    try:
        import util.metrics as m
    except Exception as e:  # pragma: no cover - reference not mounted
        pytest.skip(f"reference not importable: {e}")
    finally:
        if REFERENCE in sys.path:
            sys.path.remove(REFERENCE)
    return m


def _assert_same(ours, theirs):
    assert set(ours) == set(theirs)
    for k, v in theirs.items():
        if k == "cols":
            assert ours[k] == v
        else:
            assert ours[k] == pytest.approx(float(v), abs=1e-9), k


def test_compute_metrics_random(ref_metrics):
    x = np.random.default_rng(0).standard_normal((40, 40))
    _assert_same(alt_metrics.compute_metrics(x), ref_metrics.compute_metrics(x))


def test_compute_metrics_ties_and_nan(ref_metrics):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 4, size=(24, 24)).astype(np.float64)  # heavy ties
    x[3, :] = np.nan  # NaN diagonal contributes no rank
    ours, theirs = alt_metrics.compute_metrics(x), ref_metrics.compute_metrics(x)
    assert len(ours["cols"]) > 24  # tie expansion really happened
    _assert_same(ours, theirs)


def test_tensor_metrics_with_padding(ref_metrics):
    rng = np.random.default_rng(2)
    sim = rng.standard_normal((12, 5, 12))
    sim[4, 3:, :] = -np.inf  # padded texts, filtered by the valid mask
    sim[7, 4, :] = np.nan
    ours = alt_metrics.tensor_text_to_video_metrics(sim)
    theirs = ref_metrics.tensor_text_to_video_metrics(sim)
    for k in ours:
        # the reference's R@k go through torch float32 scalars
        assert ours[k] == pytest.approx(float(theirs[k]), rel=1e-6), k

    v2t_ours = alt_metrics.tensor_video_to_text_sim(sim)
    v2t_theirs = ref_metrics.tensor_video_to_text_sim(sim).numpy()
    np.testing.assert_allclose(v2t_ours, v2t_theirs)


def test_multi_sentence_retrieval(ref_metrics):
    rng = np.random.default_rng(3)
    n_videos, cuts = 6, [2, 5, 6, 10, 12, 14]  # ragged texts-per-video
    logits = rng.standard_normal((cuts[-1] + 1, n_videos))
    tv_ours, vt_ours = alt_metrics.multi_sentence_retrieval(logits, cuts)
    tv_ref, vt_ref = ref_metrics.multi_setence_retrieval(logits, cuts)
    for k in tv_ours:
        assert tv_ours[k] == pytest.approx(float(tv_ref[k]), rel=1e-6), k
    _assert_same(vt_ours, vt_ref)


def test_report_formatting_matches_reference_strings(ref_metrics, capsys):
    rng = np.random.default_rng(4)
    m = alt_metrics.compute_metrics(rng.standard_normal((30, 30)))
    ref_metrics.print_metrics(30, 30, m, m, m, m)
    theirs = capsys.readouterr().out
    alt_metrics.print_metrics(30, 30, m, m, m, m)
    ours = capsys.readouterr().out
    # same numbers and labels; the reference uses a different separator width
    strip = lambda s: [l for l in s.splitlines() if set(l.strip()) != {"-"}]
    assert strip(ours) == strip(theirs)
