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


def test_bulk_assembly_matches_loop_vtg_and_tvg(tokenizer):
    """The vectorized pack assemblers must be byte-identical to the
    per-segment loops they replaced (r4: the loops cost ~5s of host time
    per fine-tuned eval, starving the device during the dispatch ramp)."""
    import jax

    from blim_tpu.core.config import tiny_model_config
    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
    from blim_tpu.engine.rerank import (
        CaptionBank, RerankEngine, build_packs, build_tvg_packs,
    )
    from blim_tpu.models import videochat_flash as vcf

    rng = np.random.default_rng(0)
    n = 40
    words = ["cat", "dog", "runs", "jumps", "a", "man", "kitchen", "slowly"]
    caps = [
        " ".join(words[rng.integers(len(words))] for _ in range(rng.integers(3, 14)))
        for _ in range(n)
    ]
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    vtg_l = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, 48)
    tvg_l = make_tvg_layout(tokenizer, cfg.num_clips, 48)
    params = vcf.init_params(cfg, jax.random.key(0))
    engine = RerankEngine(params, cfg, vtg_l, tvg_l,
                          make_mesh(devices=jax.devices()[:1]))

    vtg_bank = CaptionBank.build_vtg(caps, tokenizer, "MSRVTT", vtg_l)
    banks = {
        "suffix_ids_host": vtg_bank.suffix_ids,
        "suffix_labels_host": vtg_bank.suffix_labels,
        "suffix_len_host": vtg_bank.suffix_mask.sum(axis=1).astype(np.int32),
    }
    cap_idx = rng.integers(0, n, 120)
    vid_idx = rng.integers(0, 10, 120)
    for size, packs in build_packs(vid_idx, cap_idx,
                                   banks["suffix_len_host"], engine.pack_sizes):
        bulk = engine._assemble_packs_bulk(banks, packs, size)
        for i, (_key, cc, _pos) in enumerate(packs):
            loop = engine._assemble_pack(banks, cc, size)
            for a, b in zip(loop, (x[i] for x in bulk)):
                np.testing.assert_array_equal(a, b)

    tvg_bank = CaptionBank.build_tvg(caps, tokenizer, tvg_l)
    tbanks = {
        "prefix_ids_host": tvg_bank.prefix_ids,
        "prefix_len_host": tvg_bank.prefix_mask.sum(axis=1).astype(np.int32),
    }
    for head_len in (None, tvg_l.tvg_prefix_length):
        eff = (tbanks["prefix_len_host"] if head_len is None
               else np.full(n, head_len, np.int32))
        for size, qn, packs in build_tvg_packs(
            cap_idx, vid_idx, eff, engine.tvg_pack_classes,
            q_buckets=engine.tvg_q_buckets,
        ):
            *bulk, ppos = engine._assemble_tvg_packs_bulk(
                tbanks, packs, size, qn, head_len)
            for i, segs in enumerate(packs):
                loop = engine._assemble_tvg_pack(tbanks, segs, size, qn, head_len)
                for a, b in zip(loop[:6], (x[i] for x in bulk)):
                    np.testing.assert_array_equal(a, b)
                np.testing.assert_array_equal(loop[6], ppos[i])
    engine.close()


def test_ladder_batches_covers_batch_plan():
    from blim_tpu.engine.rerank import batch_plan, ladder_batches

    for G in (1, 2, 3, 5, 8, 16):
        for n_data in (1, 2, 4):
            rungs = set(ladder_batches(G, n_data))
            for m in range(1, 4 * G + 2):
                assert set(batch_plan(m, G, n_data)) <= rungs, (G, n_data, m)


def test_warmup_packed_covers_evaluation_dispatch(tokenizer):
    """packed_combo_sets' exhaustive enumeration must cover every executable
    a real evaluation dispatches (else the warmup misses shapes and the flow
    pays a mid-flight executable load — r4 probe: 0.3-0.5s per cold shape,
    and the binary transfer starves the device on the tunnel's FIFO wire)."""
    import jax

    from blim_tpu.core.config import tiny_model_config
    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
    from blim_tpu.engine.evaluation import EvalInputs, evaluation
    from blim_tpu.engine.rerank import RerankEngine
    from blim_tpu.models import videochat_flash as vcf

    rng = np.random.default_rng(11)
    n, topk = 24, 4
    words = ["cat", "dog", "runs", "jumps", "a", "man", "kitchen", "slowly"]
    caps = [
        " ".join(words[rng.integers(len(words))]
                 for _ in range(rng.integers(3, 14)))
        for _ in range(n)
    ]
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    vtg_l = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, 48)
    tvg_l = make_tvg_layout(tokenizer, cfg.num_clips, 48)
    params = vcf.init_params(cfg, jax.random.key(0))
    engine = RerankEngine(params, cfg, vtg_l, tvg_l,
                          make_mesh(devices=jax.devices()[:1]), batch_size=8)
    feats = (rng.standard_normal(
        (n, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size))
        * 0.5).astype(np.float32)

    seen = {"vtg": set(), "vtg_prior": set(), "tvg": set()}
    orig_v, orig_p, orig_t = (engine._vtg_packed_step,
                              engine._vtg_prior_packed_step,
                              engine._tvg_packed_step)

    def rec_v(params, lora, dev_banks, pid, pm, vi, ids, *a, **kw):
        seen["vtg"].add((ids.shape[1], ids.shape[0]))
        return orig_v(params, lora, dev_banks, pid, pm, vi, ids, *a, **kw)

    def rec_p(params, lora, kv, m, ids, *a, **kw):
        seen["vtg_prior"].add((ids.shape[1], ids.shape[0]))
        return orig_p(params, lora, kv, m, ids, *a, **kw)

    def rec_t(params, lora, fi, te, vv, ids, seg, pos, q_seg, *a, **kw):
        seen["tvg"].add((ids.shape[1], q_seg.shape[1], ids.shape[0]))
        return orig_t(params, lora, fi, te, vv, ids, seg, pos, q_seg, *a, **kw)

    engine._vtg_packed_step = rec_v
    engine._vtg_prior_packed_step = rec_p
    engine._tvg_packed_step = rec_t
    try:
        for trial in range(3):
            r = np.random.default_rng(trial)
            inputs = EvalInputs(
                captions=caps, item_video_idx=np.arange(n), features=feats,
                t2v_iv2=r.standard_normal((n, n)).astype(np.float32),
                v2t_iv2=r.standard_normal((n, n)).astype(np.float32))
            evaluation(engine, inputs, tokenizer, "MSRVTT", topk=topk,
                       cpn=True, has_tvg=True, verbose=False)
    finally:
        engine._vtg_packed_step = orig_v
        engine._vtg_prior_packed_step = orig_p
        engine._tvg_packed_step = orig_t

    combos = engine.packed_combo_sets()
    assert seen["vtg"] <= combos["vtg"], seen["vtg"] - combos["vtg"]
    assert seen["vtg_prior"] <= combos["vtg_prior"], (
        seen["vtg_prior"] - combos["vtg_prior"])
    assert seen["tvg"] <= combos["tvg"] | combos["tvg_prior"], (
        seen["tvg"] - combos["tvg"] - combos["tvg_prior"])
    engine.close()
