"""Schedule-knob regression tests: the default pack-size grid / TVG class
table and their packing efficiency on the bench's caption-length profile.

The r2->r3 grid change (step-128 -> step-64 sizes, +(448,160) TVG class) was
chosen by the offline analyzer (scripts/analyze_schedule.py --sweep): these
tests pin the knobs' invariants and the pack_tail efficiency so a future
knob edit that silently regresses packing shows up on CPU, not in a TPU
bench three rounds later.
"""

import numpy as np

from blim_tpu.engine.rerank import (
    build_packs,
    build_tvg_packs,
    default_pack_sizes,
    default_tvg_pack_classes,
)


def test_default_pack_sizes_grid():
    sizes = default_pack_sizes(768)
    assert sizes == tuple(range(64, 769, 64))
    # suffix widths beyond the grid get one extra 128-aligned top size
    sizes_big = default_pack_sizes(900)
    assert sizes_big[-1] == 1024 and set(sizes) < set(sizes_big)
    assert list(sizes_big) == sorted(sizes_big)


def test_default_tvg_classes():
    cls = default_tvg_pack_classes(512)
    assert cls == ((128, 160), (256, 96), (448, 160), (512, 160))
    # ascending sizes, top fits a full-budget prefix
    cls_big = default_tvg_pack_classes(600)
    assert cls_big[-1] == (640, 160)
    assert [s for s, _ in cls_big] == sorted(s for s, _ in cls_big)
    # tiny prefixes still get the 512 floor and a strictly ascending table
    cls_tiny = default_tvg_pack_classes(100)
    assert cls_tiny[-1][0] == 512
    assert [s for s, _ in cls_tiny] == sorted({s for s, _ in cls_tiny})


def _bench_like_lengths(rng, n, cap=94):
    """The bench's caption-length profile (lognormal, median ~12 tokens)."""
    lens = np.minimum(
        np.maximum(rng.lognormal(np.log(12.0), 0.6, size=n), 3.0), cap
    ).astype(np.int32)
    return lens


def test_vtg_pack_tail_fraction():
    """Dispatched suffix rows / real token load <= 1.15 at the production
    length profile (the step-64 grid measures 1.14 here; the old step-128
    grid 1.26 — FLOP-level waste is smaller because the per-pack prefix
    forward dominates, see the analyzer's pack_tail 7.5% -> ~4%)."""
    rng = np.random.default_rng(0)
    n_videos, k = 300, 16
    lens = _bench_like_lengths(rng, n_videos * k)
    key_idx = np.repeat(np.arange(n_videos), k)
    cap_idx = np.arange(n_videos * k)
    sizes = default_pack_sizes(96)
    dispatched = real = 0
    for size, packs in build_packs(key_idx, cap_idx, lens, sizes):
        for _key, caps, _pos in packs:
            dispatched += size
            real += int(lens[np.asarray(caps)].sum())
    assert real > 0
    assert dispatched / real <= 1.15, (dispatched, real)
    # and strictly no worse than the old step-128 grid
    old = tuple(sorted({128, 256, 384, 512, 640, 768}))
    disp_old = sum(
        size * len(packs) for size, packs in build_packs(key_idx, cap_idx, lens, old)
    )
    assert dispatched <= disp_old


def test_tvg_class_assignment_prefers_smallest_fit():
    """Every pack lands in the smallest class covering both its token load
    and its query count; all packs fit their class bounds."""
    rng = np.random.default_rng(1)
    n_caps, k = 120, 16
    prefix_lens = (_bench_like_lengths(rng, n_caps) + 17).astype(np.int32)
    cap_idx = np.repeat(np.arange(n_caps), k)
    vid_idx = rng.integers(0, 500, size=n_caps * k).astype(np.int32)
    classes = default_tvg_pack_classes(512)
    for size, qcap, packs in build_tvg_packs(cap_idx, vid_idx, prefix_lens, classes):
        for segs in packs:
            load = sum(int(prefix_lens[c]) for c, _v, _p in segs)
            nq = sum(len(v) for _c, v, _p in segs)
            assert load <= size and nq <= qcap
            # smallest fit: no strictly smaller class also covers this pack
            for s2, q2 in classes:
                if (s2, q2) == (size, qcap):
                    break
                assert not (s2 >= load and q2 >= nq), (size, qcap, s2, q2)


def test_default_q_buckets():
    from blim_tpu.engine.rerank import default_tvg_q_buckets

    cls = default_tvg_pack_classes(512)
    assert default_tvg_q_buckets(cls) == (32, 64, 96, 128, 160)
    # non-multiple qmax still terminates the grid exactly at qmax
    assert default_tvg_q_buckets(((128, 100),)) == (32, 64, 96, 100)


def test_decoupled_q_buckets_classification():
    """With q_buckets, a pack's size covers its token load and its qcap is
    the smallest bucket covering its query count — independently."""
    rng = np.random.default_rng(2)
    n_caps, k = 80, 16
    prefix_lens = (_bench_like_lengths(rng, n_caps) + 17).astype(np.int32)
    cap_idx = np.repeat(np.arange(n_caps), k)
    vid_idx = rng.integers(0, 300, size=n_caps * k).astype(np.int32)
    classes = default_tvg_pack_classes(512)
    qb = (32, 64, 96, 128, 160)
    sizes = [s for s, _ in classes]
    for size, qcap, packs in build_tvg_packs(cap_idx, vid_idx, prefix_lens,
                                             classes, q_buckets=qb):
        assert qcap in qb
        for segs in packs:
            load = sum(int(prefix_lens[c]) for c, _v, _p in segs)
            nq = sum(len(v) for _c, v, _p in segs)
            assert load <= size and nq <= qcap
            assert not any(s >= load and s < size for s in sizes)
            assert not any(q >= nq and q < qcap for q in qb)


def test_batch_plan_ladder():
    """Tail batches step down a power-of-two ladder: every batch is a
    multiple of n_data, the plan covers m, and pad stays under half the
    tail batch (the old pad-to-G scheme wasted up to G-1 pack forwards)."""
    from blim_tpu.engine.rerank import RerankEngine

    class _E:
        pass

    for n_data in (1, 2, 4):
        e = _E()
        e.n_data = n_data
        for base in (1, 2, 3, 6, 8):
            G = base * n_data
            for m in range(0, 4 * G + 3):
                plan = RerankEngine._batch_plan(e, m, G)
                cov = sum(plan)
                assert cov >= m
                assert all(g % n_data == 0 and 0 < g <= G for g in plan)
                # greedy descending: batch sizes never grow
                assert all(a >= b for a, b in zip(plan, plan[1:])), (m, G, plan)
                # padding only in the final sub-n_data remainder (the old
                # pad-to-G scheme wasted up to G-1 pack forwards)
                assert cov - m < n_data, (m, G, plan)
