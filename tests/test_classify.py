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


# ---------------------------------------------------------------------------
# nearest-centroid (Rocchio) classifier
# ---------------------------------------------------------------------------


def _fitpred(spark, train_rows, test_rows):
    from lieu_spark.functions.classify import centroid_fit, centroid_predict

    tr = spark.createDataFrame(train_rows, "label int, v6 array<long>")
    te = spark.createDataFrame(test_rows, "vec_id long, v6 array<long>")
    return centroid_predict(te, centroid_fit(tr)).collect()


def test_centroid_exact_member_distance_zero(spark):
    rows = _fitpred(
        spark,
        [(0, [10, 20]), (0, [10, 20]), (1, [90, -40]), (1, [90, -40])],
        [(1, [10, 20]), (2, [90, -40])],
    )
    by_id = {r["vec_id"]: r for r in rows}
    assert by_id[1]["pred_label"] == 0 and by_id[1]["d2"] == 0
    assert by_id[2]["pred_label"] == 1 and by_id[2]["d2"] == 0


def test_centroid_tie_breaks_to_smaller_label(spark):
    # centroids at [0] and [4]; the test vector [2] is equidistant
    rows = _fitpred(spark, [(3, [0]), (7, [4])], [(1, [2])])
    assert rows[0]["pred_label"] == 3 and rows[0]["d2"] == 4


def test_centroid_mean_rounds_half_away_from_zero(spark):
    # label 0: mean -1.5 -> -2; label 1: mean 1.5 -> 2
    rows = _fitpred(
        spark,
        [(0, [-1]), (0, [-2]), (1, [1]), (1, [2])],
        [(1, [-2]), (2, [2])],
    )
    by_id = {r["vec_id"]: r for r in rows}
    assert by_id[1]["pred_label"] == 0 and by_id[1]["d2"] == 0
    assert by_id[2]["pred_label"] == 1 and by_id[2]["d2"] == 0


def test_centroid_partitioning_invariant(spark):
    import random

    rng = random.Random(7)
    train = [
        (i % 3, [rng.randrange(-1000, 1000) for _ in range(8)])
        for i in range(60)
    ]
    test = [(i, [rng.randrange(-1000, 1000) for _ in range(8)]) for i in range(20)]
    a = sorted(map(tuple, _fitpred(spark, train, test)))

    from lieu_spark.functions.classify import centroid_fit, centroid_predict

    tr = spark.createDataFrame(train, "label int, v6 array<long>").repartition(13)
    te = spark.createDataFrame(test, "vec_id long, v6 array<long>").repartition(5)
    b = sorted(map(tuple, centroid_predict(te, centroid_fit(tr)).collect()))
    assert a == b
