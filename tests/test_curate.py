"""curate() — the composed annotate/filter/scrub/decontaminate/dedupe/
split/pack funnel (lieu_spark/curate.py).

Plants one case per funnel stage and asserts each is handled, then
checks checkpoint resume recomputes nothing and packing respects the
split wall."""

import pytest
from pyspark.sql import functions as F

from lieu_spark.checkpoint import StageStore
from lieu_spark.curate import CurateConfig, curate

GOOD = (
    "the quick brown fox jumps over the lazy dog while the calm river "
    "flows through the green valley and the birds sing in the morning light"
)


def _docs(spark):
    rows = [
        # 0-9: clean unique docs (vary content so they don't near-dup)
        *[
            (i, GOOD + f" chapter {i} tells the story of day {i} in the town")
            for i in range(10)
        ],
        # 100: near-dup of doc 0 (same text + small suffix)
        (100, GOOD + " chapter 0 tells the story of day 0 in the town indeed"),
        # 101: exact dup of doc 1
        (101, GOOD + " chapter 1 tells the story of day 1 in the town"),
        # 200: junk (repetition: one bigram looped)
        (200, "buy now " * 40),
        # 201: junk (too short)
        (201, "ok"),
        # 300: PII-bearing but otherwise fine
        (300, GOOD + " contact me at alice@example.com for the details please"),
        # 400: contaminated (contains the holdout doc verbatim)
        (400, GOOD + " the secret benchmark question asks what is the capital of france and why"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _holdout(spark):
    return spark.createDataFrame(
        [(0, "the secret benchmark question asks what is the capital of france and why")],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def result(spark):
    return curate(
        spark, _docs(spark), CurateConfig(pack_capacity=64, pack_nshards=2),
        holdout=_holdout(spark), eager=True,
    )


def test_funnel_filters_junk(result):
    kept_ids = {r.doc_id for r in result.kept.select("doc_id").collect()}
    assert 200 not in kept_ids, "looped-bigram doc must be filtered"
    assert 201 not in kept_ids, "too-short doc must be filtered"


def test_decontamination_removes_holdout_hit(result):
    kept_ids = {r.doc_id for r in result.kept.select("doc_id").collect()}
    assert 400 not in kept_ids


def test_dedupe_keeps_one_rep_per_cluster(result):
    kept_ids = {r.doc_id for r in result.kept.select("doc_id").collect()}
    # exactly one of {1, 101} (exact dups) and one of {0, 100} (near dups)
    assert len(kept_ids & {1, 101}) == 1
    assert len(kept_ids & {0, 100}) == 1
    # clean docs all survive
    assert set(range(2, 10)) <= kept_ids


def test_pii_scrubbed_in_kept(result):
    texts = [r.text for r in result.kept.filter(F.col("doc_id") == 300).collect()]
    assert len(texts) == 1
    assert "alice@example.com" not in texts[0]
    assert "<EMAIL>" in texts[0]


def test_split_is_cluster_level(result):
    sp = {r.doc_id: (r.cluster_id, r.split) for r in result.splits.collect()}
    assert sp[0][0] == sp[100][0] and sp[0][1] == sp[100][1]
    assert sp[1][0] == sp[101][0] and sp[1][1] == sp[101][1]


def test_packed_respects_split_and_capacity(result):
    packed = result.packed.collect()
    kept_ids = {r.doc_id for r in result.kept.select("doc_id").collect()}
    assert {r.doc_id for r in packed} == kept_ids
    splits = {r.doc_id: r.split for r in result.splits.collect()}
    fills: dict[tuple, int] = {}
    ndocs: dict[tuple, int] = {}
    for r in packed:
        assert r.split == splits[r.doc_id]
        key = (r.split, r.shard, r.seq)
        fills[key] = fills.get(key, 0) + r.n_tokens
        ndocs[key] = ndocs.get(key, 0) + 1
    for key, fill in fills.items():
        assert fill <= 64 or ndocs[key] == 1, (key, fill)


def test_funnel_counts_recorded(result):
    assert result.funnel is not None
    assert result.funnel["annotated"] == 16
    assert result.funnel["filtered"] == 14  # junk pair dropped
    assert result.funnel["decontaminated"] == 13  # holdout hit dropped
    assert result.funnel["kept"] == 11  # two dup clusters collapsed


def test_checkpoint_resume_recomputes_nothing(spark, tmp_path):
    store = StageStore(str(tmp_path / "curate_store"))
    cfg = CurateConfig(pack_capacity=64, pack_nshards=2)
    r1 = curate(spark, _docs(spark), cfg, holdout=_holdout(spark), store=store)
    first = sorted(map(tuple, r1.packed.collect()))
    r2 = curate(spark, _docs(spark), cfg, holdout=_holdout(spark), store=store)
    # every curate-level stage was a store hit on the second run
    for name in ("annotated", "filtered", "decontaminated", "splits", "kept", "packed"):
        assert r2.stage_wall[name] == 0.0, name
    assert sorted(map(tuple, r2.packed.collect())) == first


def test_store_resume_with_changed_inmemory_holdout_recomputes(spark, tmp_path):
    """In-memory holdouts are CONTENT-fingerprinted when a store is in
    play: resuming with a different eval set must recompute
    decontamination, never serve the stale stage (contaminated docs
    passing into training)."""
    store = StageStore(str(tmp_path / "curate_store2"))
    cfg = CurateConfig(pack_capacity=64, pack_nshards=2)
    r1 = curate(spark, _docs(spark), cfg, holdout=_holdout(spark), store=store)
    kept1 = {r.doc_id for r in r1.kept.select("doc_id").collect()}
    assert 5 in kept1
    # new eval set containing doc 5's text verbatim -> 5 must now drop
    target_text = {r.doc_id: r.text for r in _docs(spark).collect()}[5]
    ho2 = spark.createDataFrame([(1, target_text)], "doc_id long, text string")
    r2 = curate(spark, _docs(spark), cfg, holdout=ho2, store=store)
    kept2 = {r.doc_id for r in r2.kept.select("doc_id").collect()}
    assert 5 not in kept2, "stale decontaminated stage served from store"
    # same in-memory content remains a store hit (resume still works)
    r3 = curate(spark, _docs(spark), cfg, holdout=ho2, store=store)
    assert r3.stage_wall["decontaminated"] == 0.0


def test_mixture_stage_downsamples_kept(spark):
    docs = _docs(spark)
    cfg = CurateConfig(
        pack_capacity=64, pack_nshards=2,
        mixture_rates={"en": 0.5}, mixture_default_rate=1.0,
    )
    full = curate(spark, docs, CurateConfig(pack_capacity=64, pack_nshards=2))
    mixed = curate(spark, docs, cfg)
    full_ids = {r.doc_id for r in full.kept.select("doc_id").collect()}
    mixed_ids = {r.doc_id for r in mixed.kept.select("doc_id").collect()}
    # mixing only removes rows, and removes some (en docs at rate 0.5)
    assert mixed_ids < full_ids
    # packed output follows the mixed kept set
    assert {r.doc_id for r in mixed.packed.collect()} == mixed_ids


def test_decontamination_is_per_eval_doc(spark):
    # a train doc sharing 2 shingles with EACH of two different holdout
    # docs (below min_shared=3 per doc) must be KEPT — grouping that
    # merges counts across eval docs would wrongly remove it
    e1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    e2 = "kilo lima mike november oscar papa quebec romeo sierra tango"
    t = GOOD + " alpha bravo charlie delta echo foxtrot kilo lima mike november oscar papa"
    docs = spark.createDataFrame(
        [(0, GOOD + " chapter zero tells another story entirely today"), (500, t)],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(0, e1), (1, e2)], "doc_id long, text string"
    )
    res = curate(
        spark, docs, CurateConfig(pack_capacity=64, pack_nshards=2), holdout=holdout
    )
    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert 500 in kept_ids


def test_decontamination_matches_across_pii_scrub(spark):
    # verbatim contamination whose span contains PII must still be
    # caught: the holdout side is scrubbed with the same redaction
    phrase = "please contact alice@example.com to get the secret answer key now"
    docs = spark.createDataFrame(
        [(0, GOOD + " chapter zero tells another story entirely today"),
         (501, GOOD + " " + phrase)],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame([(0, phrase)], "doc_id long, text string")
    res = curate(
        spark, docs, CurateConfig(pack_capacity=64, pack_nshards=2), holdout=holdout
    )
    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert 501 not in kept_ids


def test_ordered_stage_shuffles_sequences(spark):
    # default: no order columns
    base = curate(spark, _docs(spark), CurateConfig(pack_capacity=64, pack_nshards=2))
    assert "order_shard" not in base.packed.columns

    cfg = CurateConfig(
        pack_capacity=64, pack_nshards=2, shuffle_salt="ord", shuffle_nshards=4
    )
    res = curate(spark, _docs(spark), cfg)
    rows = res.packed.collect()
    assert rows and {"order_shard", "order_pos"} <= set(rows[0].asDict())
    # every doc of the same packed sequence lands at the same position
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r.split, r.shard, r.seq), set()).add(
            (r.order_shard, r.order_pos)
        )
    assert all(len(v) == 1 for v in by_seq.values())
    # distinct sequences get distinct positions, contiguous per order shard
    placements = sorted(next(iter(v)) for v in by_seq.values())
    assert len(placements) == len(set(placements))
    per = {}
    for s, p in placements:
        per.setdefault(s, []).append(p)
    for ps in per.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # reproducible: same salt replays the identical order
    again = curate(spark, _docs(spark), cfg)
    same = {
        (r.split, r.shard, r.seq): (r.order_shard, r.order_pos)
        for r in again.packed.collect()
    }
    assert same == {k: next(iter(v)) for k, v in by_seq.items()}


def test_lm_gate_and_group_cap_stages(spark):
    """Optional stages: the bigram-LM gate drops the doc whose mean
    bigram log-likelihood is lowest (garbled word salad that passes the
    heuristic gates), and the per-group cap bounds kept docs per lang;
    both default to OFF (fingerprint-identical funnel otherwise)."""
    import hashlib

    from lieu_spark.functions.analysis import bigram_lm_scores

    # word salad: stopwords keep the heuristic quality gate happy, but
    # every bigram is unique in the corpus -> lowest LM score
    salad = (
        "the zephyr of quartz and vortex with plinth from gasket "
        "under bezel through flange beside grommet along trivet"
    )
    docs = _docs(spark).union(
        spark.createDataFrame([(500, salad)], "doc_id long, text string")
    )
    base_cfg = CurateConfig(pack_capacity=64, pack_nshards=2)
    res0 = curate(spark, docs, base_cfg, eager=True)
    kept0 = {r.doc_id for r in res0.kept.select("doc_id").collect()}
    assert 500 in kept0, "salad must survive the heuristic gates"
    scores = {
        r.doc_id: r.lm_score6
        for r in bigram_lm_scores(res0.filtered).collect()
    }
    others = [v for k, v in scores.items() if k != 500]
    assert scores[500] < min(others), "salad must have the lowest LM score"
    thr = scores[500] + 1

    gated_cfg = CurateConfig(
        pack_capacity=64, pack_nshards=2, min_lm_score6=thr
    )
    res1 = curate(spark, docs, gated_cfg, eager=True)
    f1 = {r.doc_id for r in res1.filtered.select("doc_id").collect()}
    assert 500 not in f1
    assert f1 == {k for k, v in scores.items() if v >= thr}
    assert res1.funnel["lm_gate"] == len(f1)

    capped_cfg = CurateConfig(
        pack_capacity=64, pack_nshards=2, min_lm_score6=thr, group_cap=3
    )
    res2 = curate(spark, docs, capped_cfg, eager=True)
    kept2 = [(r.doc_id, r.lang) for r in res2.kept.select("doc_id", "lang").collect()]
    from collections import Counter, defaultdict

    assert max(Counter(g for _, g in kept2).values()) <= 3
    # python replay of the cap over the pre-cap rep set (= res1.kept)
    pre = [(r.doc_id, r.lang) for r in res1.kept.select("doc_id", "lang").collect()]
    by = defaultdict(list)
    for i, g in pre:
        h = int(hashlib.md5(("cap" + str(i)).encode()).hexdigest()[:15], 16) % 1_000_000
        by[g].append((h, i))
    expect = {i for g, m in by.items() for _, i in sorted(m)[:3]}
    assert {i for i, _ in kept2} == expect
    assert res2.funnel["capped"] == len(expect)


def test_line_dedup_stage(spark):
    """Optional C4 line-dedup stage: a footer line shared by two multi-
    line docs survives only in the lower-id doc; the other doc's text is
    rebuilt without it, n_tokens shrinks to match the shipped text, and
    a doc that was ONLY the footer drops out entirely. Off by default."""
    footer = "subscribe to the daily newsletter for more updates and news"
    body_a = GOOD + " chapter alpha tells the story of the harbor lights"
    body_b = GOOD + " chapter beta follows the trail across the high ridge"
    docs = spark.createDataFrame(
        [
            (1, body_a + "\n" + footer),
            (2, body_b + "\n" + footer),
            (3, footer),
        ],
        "doc_id long, text string",
    )
    cfg = CurateConfig(pack_capacity=64, pack_nshards=2, line_dedup=True)
    res = curate(spark, docs, cfg, eager=True)
    f = {r.doc_id: r for r in res.filtered.collect()}
    assert f[1].text == body_a + "\n" + footer, "first occurrence keeps its footer"
    assert f[2].text == body_b, "later occurrence loses the shared footer"
    assert 3 not in f, "footer-only doc fully dedupes away"
    assert f[2].n_tokens == len(body_b.split()), "token count follows the shipped text"
    assert res.funnel["line_deduped"] == 2

    # off by default: the stage never runs and texts pass through intact
    res0 = curate(
        spark, docs, CurateConfig(pack_capacity=64, pack_nshards=2), eager=True
    )
    assert "line_deduped" not in res0.funnel
    texts0 = {r.doc_id: r.text for r in res0.filtered.collect()}
    assert texts0[2] == body_b + "\n" + footer


def test_dsir_selection_stage(spark):
    """Optional DSIR stage: top-k most target-like survivors kept; an
    off-distribution word-salad doc (passes the heuristic gates, shares
    only stopwords with the target) ranks last and is cut; the stage
    requires a target corpus; default stays OFF."""
    salad = (
        "the zephyr of quartz and vortex with plinth from gasket "
        "under bezel through flange beside grommet along trivet"
    )
    docs = _docs(spark).union(
        spark.createDataFrame([(600, salad)], "doc_id long, text string")
    )
    # the target must carry real probability mass for the shared
    # vocabulary (DSIR's operating regime — with a toy target the
    # Laplace smoothing term dominates every ratio): 20 in-domain docs
    target = spark.createDataFrame(
        [
            (i, GOOD + f" chapter {i} tells the story of day {i} in the town")
            for i in range(50, 70)
        ],
        "doc_id long, text string",
    )
    base = CurateConfig(pack_capacity=64, pack_nshards=2)
    res0 = curate(spark, docs, base, eager=True)
    n_surv = res0.filtered.count()
    assert {r.doc_id for r in res0.filtered.select("doc_id").collect()} >= {600}

    cfg = CurateConfig(pack_capacity=64, pack_nshards=2, dsir_top_k=n_surv - 1)
    res1 = curate(spark, docs, cfg, dsir_target=target, eager=True)
    f1 = {r.doc_id for r in res1.filtered.select("doc_id").collect()}
    assert len(f1) == n_surv - 1
    assert res1.funnel["dsir_selected"] == n_surv - 1
    assert 600 not in f1, "the off-distribution doc must be the one cut"

    with pytest.raises(ValueError, match="dsir_target"):
        curate(spark, docs, cfg, eager=True)


def test_verbatim_ngram_decon_stage(spark):
    # a LONG holdout doc (40 tokens -> 36 shingles at k=5) quoted for
    # exactly 13 tokens: containment is 9/36 = 0.25 < 0.5 so the
    # shingle rule never fires — only the GPT-3-style verbatim rule
    # catches the quote; a 12-token quote stays under it.
    ho_words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu amber birch cedar dune "
        "ember fjord grove heath inlet jetty knoll larch mesa nook"
    ).split()
    assert len(ho_words) == 40
    quote13 = " ".join(ho_words[10:23])
    quote12 = " ".join(ho_words[20:32])
    holdout = spark.createDataFrame(
        [(0, " ".join(ho_words))], "doc_id long, text string"
    )
    docs = _docs(spark).union(
        spark.createDataFrame(
            [
                (
                    500,
                    "the annual climate report for the northern district "
                    "opens with a long discussion of rainfall totals and "
                    "then the report quotes " + quote13 + " before moving "
                    "on to harvest yields and road conditions in the valley",
                ),
                (
                    501,
                    "a separate survey of the southern district mentions "
                    "only a shorter fragment saying " + quote12 + " and "
                    "then returns to its own subject matter for the rest",
                ),
            ],
            "doc_id long, text string",
        )
    )
    base = CurateConfig(pack_capacity=64, pack_nshards=2)
    res0 = curate(spark, docs, base, holdout=holdout, eager=True)
    d0 = {r.doc_id for r in res0.decon.select("doc_id").collect()}
    assert {500, 501} <= d0, "containment alone must not remove the quotes"

    cfg = CurateConfig(
        pack_capacity=64, pack_nshards=2, decon_verbatim_ngram=13
    )
    res1 = curate(spark, docs, cfg, holdout=holdout, eager=True)
    d1 = {r.doc_id for r in res1.decon.select("doc_id").collect()}
    assert 500 not in d1, "a shared exact 13-gram must remove the doc"
    assert 501 in d1, "a 12-token quote stays under the verbatim rule"
    # the two rules compose: everything the containment rule removed
    # is still removed (doc 400 contains a holdout... different holdout
    # here, so just check the verbatim cfg removed exactly one more)
    assert d0 - d1 == {500}

    # Bloom prefilter (operators/bloom.py) screens the training gram
    # stream map-side before the exact join: no false negatives, so
    # the decon output is IDENTICAL to the unscreened verbatim run.
    bcfg = CurateConfig(
        pack_capacity=64,
        pack_nshards=2,
        decon_verbatim_ngram=13,
        decon_bloom_m=1 << 12,
    )
    res2 = curate(spark, docs, bcfg, holdout=holdout, eager=True)
    d2 = {r.doc_id for r in res2.decon.select("doc_id").collect()}
    assert d2 == d1


def test_maximal_config_funnel_all_stages(spark):
    """Every optional stage enabled at once — the composition that
    exploded before curate's stage() truncated lineage per stage
    (persist-only plans double per stage because stages reference
    their predecessor 2-3x; with lm_gate + dsir both on, Catalyst
    ANALYSIS exhausted an 8g driver heap before any data moved).
    Asserts the full 13-stage funnel builds, runs eager, and emits a
    monotone funnel with every stage key present."""
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") < 5)
    cfg = CurateConfig(
        pack_capacity=64,
        pack_nshards=2,
        line_dedup=True,
        min_lm_score6=-100_000_000_000,  # gate on, rejects nothing
        dsir_top_k=1000,  # selection on, larger than the corpus
        decon_verbatim_ngram=13,
        group_cap=1000,
        group_cap_col="lang",
        mixture_rates={"en": 1.0},
        chunk_max_tokens=8,
        chunk_overlap=2,
        shuffle_salt="stress",
    )
    res = curate(
        spark, docs, cfg, holdout=_holdout(spark), eager=True,
        dsir_target=target,
    )
    expected = [
        "annotated", "filtered", "line_deduped", "lm_gate",
        "dsir_selected", "decontaminated", "splits", "kept",
        "capped", "mixed", "chunked", "packed", "ordered",
    ]
    assert [k for k in res.funnel if k in expected] == expected
    assert res.funnel["annotated"] == docs.count()
    # permissive thresholds: nothing drops between the optional gates
    assert res.funnel["lm_gate"] == res.funnel["line_deduped"]
    assert res.funnel["dsir_selected"] == res.funnel["lm_gate"]
    assert res.funnel["capped"] == res.funnel["kept"]
    assert res.funnel["packed"] >= 1
    # the shuffle stage is sequence-atomic: ordered == packed
    assert res.funnel["ordered"] == res.funnel["packed"]
    cols = set(res.packed.columns)
    assert {"order_shard", "order_pos"} <= cols


def test_chunk_stage_bounds_packed_units(spark):
    """cfg.chunk_max_tokens: kept docs are sliding-window chunked
    before packing, so every packed unit fits the model context, every
    chunk inherits its doc's cluster-level split (leakage wall holds at
    chunk granularity), and no bin overflows capacity (the whole point:
    without chunking an oversize doc gets its own overflowing bin)."""
    docs = _docs(spark)
    cfg = CurateConfig(
        pack_capacity=16, pack_nshards=2, chunk_max_tokens=8, chunk_overlap=2
    )
    res = curate(spark, docs, cfg, holdout=_holdout(spark), eager=True)
    assert res.chunked is not None
    chunks = res.chunked.collect()
    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert {c.doc_id for c in chunks} == kept_ids
    assert all(1 <= c.n_chunk_tokens <= 8 for c in chunks)
    # multi-window docs exist (the fixture docs run ~12 tokens)
    assert len(chunks) > len(kept_ids)
    packed = res.packed.collect()
    assert "chunk_idx" in res.packed.columns
    assert {(r.doc_id, r.chunk_idx) for r in packed} == {
        (c.doc_id, c.chunk_idx) for c in chunks
    }
    splits = {r.doc_id: r.split for r in res.splits.collect()}
    fills: dict[tuple, int] = {}
    for r in packed:
        assert r.split == splits[r.doc_id]
        assert r.n_tokens <= 8
        key = (r.split, r.shard, r.seq)
        fills[key] = fills.get(key, 0) + r.n_tokens
    # chunking bounds every unit, so NO bin exceeds capacity, ever
    assert all(fill <= 16 for fill in fills.values())
    assert res.funnel["chunked"] == len(chunks)
    assert res.funnel["packed"] == len(chunks)
