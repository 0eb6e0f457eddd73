"""Golden end-to-end test — the BASELINE.md correctness gate.

Runs the full pipeline on the deterministic planted corpus and checks:
  - dup-pair recall >= 0.99 vs the brute-force pure-python oracle at the
    same shingle/signature config (BASELINE.json metric),
  - Jaccard values bit-identical on shared pairs,
  - cluster assignments identical to the union-find oracle,
  - per-turn text equality under stable turn ordering (input_hint
    invariant),
  - copied-span stage reports the planted spans.
"""

import itertools

import pytest

from lieu_spark import corpus, oracle
from lieu_spark.config import DedupeConfig
from lieu_spark.pipeline import run_pipeline

CFG = DedupeConfig()
SEED, N = 42, 300


@pytest.fixture(scope="module")
def result(spark):
    tdf = corpus.generate_df(spark, SEED, N)
    res = run_pipeline(spark, tdf, CFG)
    pairs = {
        (r.id_a, r.id_b): (r.jaccard, r.status) for r in res.verified.collect()
    }
    clusters = {r.conv_id: r.cluster_id for r in res.clusters.collect()}
    spans = [(r.id_a, r.id_b, r.start_a, r.start_b, r.length) for r in res.spans.collect()]
    convs = {r.conv_id: r.doc for r in res.conversations.select("conv_id", "doc").collect()}
    return pairs, clusters, spans, convs


@pytest.fixture(scope="module")
def oracle_state():
    rows = corpus.generate_rows(SEED, N)
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    docs = {
        cid: "\n".join(r.text for r in sorted(rs, key=lambda r: r.turn_idx))
        for cid, rs in by_conv.items()
    }
    shingle_sets = {cid: set(oracle.shingle_hashes(d, CFG.shingle_k)) for cid, d in docs.items()}
    dupes, review = set(), set()
    for a, b in itertools.combinations(sorted(docs), 2):
        j = oracle.jaccard(shingle_sets[a], shingle_sets[b])
        if j >= CFG.threshold_likely or docs[a] == docs[b]:
            dupes.add((a, b))
        elif j >= CFG.threshold_review:
            review.add((a, b))
    return docs, shingle_sets, dupes, review


def test_per_turn_assembly_invariant(result, oracle_state):
    """input_hint: per-turn text equality under stable turn ordering —
    scrambled ingestion order must not change the assembled doc."""
    _, _, _, convs = result
    docs, *_ = oracle_state
    assert convs == docs


def test_dup_pair_recall(result, oracle_state):
    """Recall is measured on CLUSTER-IMPLIED pairs: similarity blocking
    runs on one representative per identical-text group (pipeline.py),
    so (copyA, copyB-near-neighbor) pairs are represented by their rep
    edge + the exact star and closed by connected components. Every
    brute-force oracle dupe pair must be implied by the clusters."""
    pairs, clusters, _, _ = result
    _, _, dupes, _ = oracle_state
    assert len(dupes) > 20, "corpus must plant enough duplicates"
    implied = {
        (a, b)
        for a, b in dupes
        if clusters.get(a) is not None and clusters.get(a) == clusters.get(b)
    }
    missing = dupes - implied
    recall = 1 - len(missing) / len(dupes)
    assert recall >= 0.99, f"recall {recall}: missing {sorted(missing)[:5]}"
    # precision on the explicit verified table: every emitted dupe pair
    # must be a true oracle dupe pair (verification is exact Jaccard)
    got = {p for p, (j, s) in pairs.items() if s in ("exact_duplicate", "likely_duplicate")}
    assert got <= dupes, sorted(got - dupes)[:5]


def test_jaccard_bit_equality(result, oracle_state):
    pairs, *_ = result
    _, ss, _, _ = oracle_state
    for (a, b), (j, _) in pairs.items():
        assert j == oracle.jaccard(ss[a], ss[b])


def test_cluster_assignments_match_oracle(result, oracle_state):
    _, clusters, _, _ = result
    docs, _, dupes, _ = oracle_state
    comp = oracle.cluster_pairs(sorted(dupes))
    want = {cid: comp.get(cid, cid) for cid in docs}
    assert clusters == want


def test_review_band_pairs_surface(result, oracle_state):
    """Pairs in [0.7, 0.9) that LSH surfaces must be classified review —
    two-tier verdict parity (lieu thresholds api.py:61-64). Blocking is
    rep-per-text_sha, so the comparison set is oracle review pairs whose
    BOTH sides are group representatives."""
    pairs, *_ = result
    docs, _, _, review = oracle_state
    rep = {}
    by_text: dict = {}
    for cid, d in sorted(docs.items()):
        rep[cid] = by_text.setdefault(d, cid)
    rep_review = {(a, b) for a, b in review if rep[a] == a and rep[b] == b}
    got_review = {p for p, (j, s) in pairs.items() if s == "needs_review"}
    assert got_review <= review  # never misclassified
    # LSH at J~0.7-0.9 with b=32,r=4 has >0.999 collision prob per pair
    assert len(got_review & rep_review) >= 0.9 * len(rep_review)


def test_reconcile_keeps_stronger_verdict(spark):
    """Cross-method verdict merge (phone-revision analog,
    lib/lieu/dedupe.py:356-372): the stronger status wins, methods
    accumulate."""
    from lieu_spark.operators.verify import reconcile

    mh = spark.createDataFrame(
        [
            ("a", "b", 0.95, False, "likely_duplicate", "minhash_lsh"),
            ("a", "c", 0.75, False, "needs_review", "minhash_lsh"),
        ],
        "id_a string, id_b string, jaccard double, is_exact boolean, status string, method string",
    )
    sh = spark.createDataFrame(
        [
            ("a", "b", 1.0, True, "exact_duplicate", "simhash"),
            ("a", "c", 0.6, False, "non_duplicate", "simhash"),
        ],
        "id_a string, id_b string, jaccard double, is_exact boolean, status string, method string",
    )
    got = {r.id_a + r.id_b: (r.status, r.method, list(r.methods)) for r in reconcile(mh, sh).collect()}
    assert got["ab"][0] == "exact_duplicate" and got["ab"][1] == "simhash"
    assert got["ac"][0] == "needs_review" and got["ac"][1] == "minhash_lsh"
    assert got["ab"][2] == ["minhash_lsh", "simhash"]


def test_planted_spans_found(result):
    pairs, _, spans, _ = result
    truth = corpus.truth_pairs(SEED, N)
    span_truth = {(a, b) for a, b, k in truth if k == "span"}
    found = {(a, b) for a, b, *_ in spans}
    hit = span_truth & found
    assert len(hit) >= 0.95 * len(span_truth), (
        f"span recall {len(hit)}/{len(span_truth)}"
    )
    # offsets must be consistent: reported length >= configured minimum
    assert all(ln >= CFG.span_min_len for *_, ln in spans)


def test_signature_verify_mode_end_to_end(spark):
    """verify_mode='signatures' — the 100 TB shuffle-volume knob: the
    estimator must equal the oracle's signature-agreement fraction
    bit-for-bit on every verified pair, exact-sha pairs must stay
    exact regardless of estimator noise, and planted exact copies must
    still cluster with their source."""
    cfg = DedupeConfig(verify_mode="signatures")
    n = 120
    tdf = corpus.generate_df(spark, SEED, n)
    res = run_pipeline(spark, tdf, cfg, with_spans=False)

    docs = {r.conv_id: r.doc for r in res.conversations.select("conv_id", "doc").collect()}
    sigs = {
        cid: oracle.minhash_signature(oracle.shingle_hashes(d, cfg.shingle_k), cfg)
        for cid, d in docs.items()
    }
    verified = res.verified.collect()
    assert verified
    for r in verified:
        want = oracle.signature_agreement(sigs[r.id_a], sigs[r.id_b])
        assert abs(r.jaccard - want) < 1e-12, (r.id_a, r.id_b)
        if r.is_exact:
            assert r.status == "exact_duplicate"

    clusters = {r.conv_id: r.cluster_id for r in res.clusters.collect()}
    for i in range(n):
        if i % 10 == 7:  # planted exact copy of i-7
            a, b = corpus.conv_id_str(i - 7), corpus.conv_id_str(i)
            assert clusters[a] == clusters[b], (a, b)
