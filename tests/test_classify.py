"""NB quality classifier (functions/classify.py): seed fit, unlabeled
generalization, zero-token prior fallback, and exact-integer
determinism under repartitioning.
"""

from pyspark.sql import functions as F

from lieu_spark.functions.classify import nb_quality_scores

GOOD = "the report of the valley and the harvest is clear and it is sound"
BAD = "zzz qqq xxx vvv kkk jjj www ppp mmm nnn"


def _docs(spark):
    rows = []
    for i in range(10):
        rows.append((i, GOOD + f" extra{i}", 1))
    for i in range(10, 20):
        rows.append((i, BAD + f" junk{i}", 0))
    # unlabeled docs sharing vocabulary with exactly one class
    rows.append((100, GOOD, None))
    rows.append((101, BAD, None))
    rows.append((102, "", None))  # zero-token
    return spark.createDataFrame(rows, "doc_id long, text string, lbl int")


def test_nb_generalizes_to_unlabeled(spark):
    out = {
        r.doc_id: r
        for r in nb_quality_scores(_docs(spark), F.col("lbl"), m=512).collect()
    }
    assert len(out) == 23
    # seeds classified consistently with their own labels
    assert all(out[i].pred == 1 for i in range(10))
    assert all(out[i].pred == 0 for i in range(10, 20))
    # unlabeled docs follow the class whose vocabulary they share
    assert out[100].seed_label is None and out[100].pred == 1
    assert out[101].seed_label is None and out[101].pred == 0


def test_nb_zero_token_doc_scores_prior(spark):
    out = {
        r.doc_id: r
        for r in nb_quality_scores(_docs(spark), F.col("lbl"), m=512).collect()
    }
    r = out[102]
    assert r.n_feats == 0
    # balanced seeds (10 vs 10) -> prior6 = round(ln(11/11)*1e6) = 0
    assert r.score6 == 0


def test_nb_partitioning_invariant(spark):
    docs = _docs(spark)
    a = sorted(
        tuple(r)
        for r in nb_quality_scores(docs, F.col("lbl"), m=512).collect()
    )
    b = sorted(
        tuple(r)
        for r in nb_quality_scores(
            docs.repartition(7), F.col("lbl"), m=512
        ).collect()
    )
    assert a == b
