"""Sequence packing (operators/packing.py) and leakage-safe splits.

Packing: capacity invariant (no bin over capacity unless it holds a
single oversize doc), completeness (every doc exactly once), contiguous
bin ids per shard, partition-layout invariance, kernel parity against a
sequential pure-python next-fit. Splits: every near-dup cluster lands in
one split."""

import numpy as np
from pyspark.sql import functions as F

from lieu_spark.operators.packing import _pack_next_fit, pack_sequences, packing_stats


def _seq_next_fit(n_tok, cap):
    """Sequential reference: the textbook next-fit loop."""
    bins, fill, b = [], 0, 0
    first = True
    for n in n_tok:
        if not first and fill + n > cap:
            b += 1
            fill = 0
        bins.append(b)
        fill += n
        first = False
    return bins


def test_kernel_matches_sequential_reference():
    rng = np.random.default_rng(3)
    for trial in range(50):
        n = rng.integers(1, 60)
        toks = rng.integers(0, 120, size=n).astype(np.int64)
        cap = int(rng.integers(50, 300))
        got = _pack_next_fit(toks, cap).tolist()
        assert got == _seq_next_fit(toks.tolist(), cap), (trial, toks.tolist(), cap)


def test_kernel_oversize_own_bin():
    got = _pack_next_fit(np.array([10, 500, 10], dtype=np.int64), 100).tolist()
    assert got == [0, 1, 2]
    # oversize first
    got = _pack_next_fit(np.array([500, 10], dtype=np.int64), 100).tolist()
    assert got == [0, 1]


def _docs(spark, n=300, seed=11):
    rng = np.random.default_rng(seed)
    rows = [(i, int(t)) for i, t in enumerate(rng.integers(1, 120, size=n))]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_capacity_and_completeness(spark):
    d = _docs(spark)
    packed = pack_sequences(d, capacity=256, nshards=8)
    rows = packed.collect()
    assert len(rows) == 300
    assert {r.doc_id for r in rows} == set(range(300))
    stats = packing_stats(packed, 256).collect()
    for s in stats:
        assert s.fill <= 256 or s.n_docs == 1, s
    # bins contiguous from 0 per shard
    by_shard = {}
    for s in stats:
        by_shard.setdefault(s.shard, []).append(s.seq)
    for shard, seqs in by_shard.items():
        assert sorted(seqs) == list(range(len(seqs))), shard


def test_partition_layout_invariance(spark):
    d = _docs(spark)
    a = sorted(map(tuple, pack_sequences(d, capacity=256, nshards=8).collect()))
    b = sorted(
        map(tuple, pack_sequences(d.repartition(13), capacity=256, nshards=8).collect())
    )
    assert a == b


def test_single_shuffle_plan(spark):
    d = _docs(spark)
    plan = (
        pack_sequences(d, capacity=256, nshards=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # hashpartition on shard (+AQE read)
    assert "CartesianProduct" not in plan


def test_leakage_safe_splits_no_cross_split_dup(spark):
    from lieu_spark.queries import q_dedupe_clusters, q_leakage_safe_splits

    out = q_leakage_safe_splits(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_docs for r in out) == q_dedupe_clusters(
        spark, "/root/testdata/sf0.001"
    ).count()
    for r in out:
        assert r.leaked_pairs == 0, r


def test_pack_sequences_duplicate_ids_layout_independent(spark):
    # duplicate doc_ids with differing token counts: the in-shard sort
    # must break the id tie on n_tokens, or mergesort stability would
    # resolve it by arrival order and seq assignment would depend on
    # partition layout
    rows = [(i % 7, 10 + (i * 13) % 50) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = sorted(
        map(tuple, pack_sequences(d, capacity=64, nshards=4).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(d.repartition(17), capacity=64, nshards=4).collect(),
        )
    )
    assert a == b
