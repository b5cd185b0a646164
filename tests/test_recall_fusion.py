"""Recall metric + fusion algebra tests against tiny hand-checkable oracles
(reference: training_utils.py:106-221)."""

import numpy as np

from blim_tpu.scoring import fusion
from blim_tpu.scoring.recall import get_recall


def _ids(n):
    return {i: i for i in range(n)}


def test_get_recall_perfect_and_shuffled():
    n = 12
    eye = np.eye(n) + 0.1 * np.random.default_rng(0).standard_normal((n, n)) * 0.01
    res = get_recall(eye, eye, _ids(n), _ids(n))
    assert res["t2v_r1"] == 100.0 and res["v2t_r1"] == 100.0 and res["r_mean"] == 100.0


def test_get_recall_known_ranks():
    # row 0: gt rank 0; row 1: gt rank 2 (inside R@5); row 2: gt rank 6 (inside R@10)
    scores = np.full((3, 12), -1.0)
    scores += np.random.default_rng(1).uniform(-0.01, 0.01, scores.shape)
    order = np.argsort(scores[1])[::-1]
    scores[0, 0] = 5.0
    scores[1, 1] = scores[1, order[0]] - 0.001  # just below top... construct directly:
    scores[1] = -np.arange(12, dtype=float) - 1.0  # descending by index (no 0.0: sentinel!)
    scores[1, 1] = -3.5  # gt col 1 sits between cols 2 and 3 -> rank 2
    scores[2] = -np.arange(12, dtype=float) - 1.0
    scores[2, 2] = -7.5  # rank 6
    res = get_recall(scores, scores, _ids(3), _ids(3))
    assert res["t2v_r1"] == round(100 / 3, 2)
    assert res["t2v_r5"] == round(200 / 3, 2)
    assert res["t2v_r10"] == 100.0


def test_get_recall_multi_ground_truth():
    scores = np.array([[0.1, 0.9, 0.8]])
    ids = {0: [0, 2]}  # best-ranked gt counts (rank of col2 = 1)
    res = get_recall(scores, scores, ids, ids)
    assert res["t2v_r1"] == 0.0 and res["t2v_r5"] == 100.0


def test_zero_matrix_sentinel():
    z = np.zeros((4, 4))
    res = get_recall(z, z, _ids(4), _ids(4))
    assert res["r_mean"] == 0.0


def test_blim_ensemble_algebra():
    rng = np.random.default_rng(2)
    n = 5
    t2v = {k: rng.standard_normal((n, n)) for k in
           ["candidate_likelihood", "query_likelihood", "candidate_prior", "internvideo2"]}
    v2t = {k: rng.standard_normal((n, n)) for k in
           ["candidate_likelihood", "query_likelihood", "candidate_prior", "internvideo2"]}
    alpha = (0.2, 0.9)
    c = (1.0, 0.4, 0.9, 0.8)
    cpn_t2v, cpn_v2t, blim_t2v, blim_v2t = fusion.blim_ensemble(t2v, v2t, alpha, c)

    exp_cpn_t2v = t2v["candidate_likelihood"] - 0.2 * t2v["candidate_prior"]
    exp_cpn_v2t = v2t["candidate_likelihood"] - 0.9 * v2t["candidate_prior"]
    np.testing.assert_allclose(cpn_t2v, exp_cpn_t2v)
    np.testing.assert_allclose(cpn_v2t, exp_cpn_v2t)
    exp_b_t2v = 0.9 * (1.0 * t2v["query_likelihood"] + 0.0 * exp_cpn_t2v) + 0.1 * t2v["internvideo2"]
    exp_b_v2t = 0.8 * (0.4 * v2t["query_likelihood"] + 0.6 * exp_cpn_v2t) + 0.2 * v2t["internvideo2"]
    np.testing.assert_allclose(blim_t2v, exp_b_t2v)
    np.testing.assert_allclose(blim_v2t, exp_b_v2t)


def test_blim_ensemble_zeroshot_gating():
    """Zero-shot (no TVG paths): t2v cpn is a zero matrix; v2t blim skips the
    query term (reference: training_utils.py:158-162)."""
    rng = np.random.default_rng(3)
    n = 4
    t2v = {k: rng.standard_normal((n, n)) for k in ["query_likelihood", "internvideo2"]}
    v2t = {k: rng.standard_normal((n, n)) for k in
           ["candidate_likelihood", "candidate_prior", "internvideo2"]}
    alpha, c = (0.0, 0.8), (1.0, 0.0, 0.8, 0.6)
    cpn_t2v, cpn_v2t, blim_t2v, blim_v2t = fusion.blim_ensemble(t2v, v2t, alpha, c, has_tvg=False)
    np.testing.assert_allclose(cpn_t2v, 0.0)
    exp_b_v2t = 0.6 * cpn_v2t + 0.4 * v2t["internvideo2"]
    np.testing.assert_allclose(blim_v2t, exp_b_v2t)


def test_calculate_score_grid_search_finds_pure_best():
    n = 8
    # strictly nonzero everywhere (a 0.0 anywhere triggers the sentinel)
    good = np.eye(n) * 10 + np.random.default_rng(5).uniform(0.01, 0.02, (n, n))
    bad = np.random.default_rng(4).standard_normal((n, n)) + 100.0
    t2v, v2t, t2v_c, v2t_c = fusion.calculate_score(good, good, bad, bad, _ids(n), _ids(n))
    # the grid keeps the FIRST maximizer (reference: `best < res` strict
    # improvement), so c is the smallest weight that achieves perfect R@1
    assert t2v_c > 0.0 and v2t_c > 0.0
    res = get_recall(t2v, v2t, _ids(n), _ids(n))
    assert res["t2v_r1"] == 100.0
