"""Media near-dup: fingerprint-set Jaccard (operators/mediadedup.py)
over real video frame hashes (functions/video.py + imagehash) and real
audio window fingerprints (functions/audio.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lieu_spark.functions.audio import (
    audio_fingerprint_table,
    encode_wav,
    synthetic_track_payloads,
)
from lieu_spark.functions.video import (
    synthetic_clip_payloads,
    video_frame_hashes,
)
from lieu_spark.operators.mediadedup import fingerprint_jaccard_pairs


def _mkfps(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, fp long")


def test_jaccard_pairs_string_ids_pass_through(spark):
    # ids keep their native type: a conv-style string id must work
    # (the old cast("long") threw CAST_INVALID_INPUT under ANSI)
    rows = [("conv_a", f) for f in (1, 2, 3, 4)]
    rows += [("conv_b", f) for f in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "doc_id string, fp long")
    got = fingerprint_jaccard_pairs(df, min_jaccard6=300000).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b, r.jaccard6) == ("conv_a", "conv_b", 333333)


def test_jaccard_pairs_exact_values(spark):
    # A={1,2,3,4}, B={3,4,5,6} -> shared 2, union 6 -> 333333
    # A vs C={1,2,3,4} -> 1e6 ; B vs C -> 333333
    rows = [(1, f) for f in (1, 2, 3, 4)]
    rows += [(2, f) for f in (3, 4, 5, 6)]
    rows += [(3, f) for f in (1, 2, 3, 4)]
    got = {
        (r.id_a, r.id_b): (r.shared_fp, r.fp_xor, r.jaccard6)
        for r in fingerprint_jaccard_pairs(
            _mkfps(spark, rows), min_jaccard6=300000
        ).collect()
    }
    assert got == {
        (1, 2): (2, 3 ^ 4, 333333),
        (1, 3): (4, 1 ^ 2 ^ 3 ^ 4, 1000000),
        (2, 3): (2, 3 ^ 4, 333333),
    }


def test_jaccard_threshold_excludes(spark):
    rows = [(1, f) for f in (1, 2, 3, 4)] + [(2, f) for f in (4, 5, 6, 7)]
    # shared 1 / union 7 -> 142857 < 300000
    assert (
        fingerprint_jaccard_pairs(_mkfps(spark, rows), min_jaccard6=300000).count()
        == 0
    )


def test_duplicate_fp_rows_collapse(spark):
    # (id, fp) multiplicity must not inflate shared counts or sizes
    rows = [(1, 7), (1, 7), (1, 8), (2, 7), (2, 7), (2, 9)]
    [r] = fingerprint_jaccard_pairs(_mkfps(spark, rows), min_jaccard6=1).collect()
    assert (r.id_a, r.id_b, r.shared_fp, r.jaccard6) == (1, 2, 1, 333333)


def test_stop_fingerprint_cap(spark):
    # fp 99 appears in 3 ids (> cap 2): excluded ENTIRELY — sizes and
    # intersection both computed over the surviving universe, so the
    # reported jaccard is the exact jaccard of the reduced sets (full-
    # set sizes with a reduced intersection biased hot-fp pairs down);
    # the pair whose ONLY overlap was fp 99 disappears.
    rows = [(1, 99), (1, 5), (2, 99), (2, 5), (3, 99), (3, 6)]
    got = {
        (r.id_a, r.id_b): (r.shared_fp, r.jaccard6)
        for r in fingerprint_jaccard_pairs(
            _mkfps(spark, rows), min_jaccard6=1, max_fp_df=2
        ).collect()
    }
    # reduced sets: 1->{5}, 2->{5}, 3->{6} -> (1,2) is an exact match
    assert got == {(1, 2): (1, 1000000)}


def test_stop_cap_does_not_bias_mixed_pairs(spark):
    # a pair sharing hot AND cold fps: under the old full-size /
    # reduced-intersection mix its jaccard was deflated below a
    # threshold the true reduced-set jaccard clears
    rows = (
        [(1, 99), (2, 99), (3, 99)]        # hot fp (df 3 > cap 2)
        + [(1, 5), (2, 5), (1, 6), (2, 7)]  # cold fps
    )
    got = {
        (r.id_a, r.id_b): r.jaccard6
        for r in fingerprint_jaccard_pairs(
            _mkfps(spark, rows), min_jaccard6=300000, max_fp_df=2
        ).collect()
    }
    # reduced: 1->{5,6}, 2->{5,7} -> jaccard 1/3 = 333333 (the old mix
    # reported 1/(3+3-1)=200000 and dropped the pair)
    assert got == {(1, 2): 333333}


def test_null_fps_excluded_from_set_sizes(spark):
    rows = [(1, 5), (2, 5)]
    df = _mkfps(spark, rows).unionByName(
        spark.createDataFrame([(1, None)], "doc_id long, fp long")
    )
    got = {
        (r.id_a, r.id_b): r.jaccard6
        for r in fingerprint_jaccard_pairs(df, min_jaccard6=1).collect()
    }
    # the null fp must not inflate id 1's set size: {5} vs {5} -> 1e6
    assert got == {(1, 2): 1000000}


def test_video_clip_overlap_structure(spark):
    ids = spark.range(0, 48).select(F.col("id").alias("doc_id"))
    fps = video_frame_hashes(synthetic_clip_payloads(ids))
    # every clip has exactly 4 distinct frame hashes
    sizes = {r.doc_id: r.n for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(sizes.values()) == {4}
    pairs = {
        (r.id_a, r.id_b): (r.shared_fp, r.jaccard6)
        for r in fingerprint_jaccard_pairs(fps, min_jaccard6=1).collect()
    }
    # same base (0, 16): full overlap; offset 1 (0, 1): 3 shared; offset
    # 3 (0, 3): 1 shared; offset 4 (0, 4): no pair at all
    assert pairs[(0, 16)] == (4, 1000000)
    assert pairs[(0, 1)] == (3, 600000)
    assert pairs[(0, 3)] == (1, 142857)
    assert (0, 4) not in pairs
    # offsets wrap cyclically: bases 15 and 0 are adjacent
    assert pairs[(0, 15)] == (3, 600000)


def test_audio_fingerprint_kernel_exact(spark):
    # handcrafted track: one full window of a known ramp + a partial
    # window that must be DROPPED
    win = 256
    t = np.arange(win, dtype=np.int64)
    vals = ((5 * 31 + t * 17) % 65536 - 32768).astype("<i2")[:, None]
    partial = np.zeros((100, 1), dtype="<i2")
    payload = encode_wav(np.concatenate([vals, partial]), 16000)
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
    rows = audio_fingerprint_table(df, win=win).collect()
    assert len(rows) == 1  # partial window dropped
    expected = 0
    for tt in range(win):
        u = (5 * 31 + tt * 17 + 32768) % 65536
        expected ^= u << (16 * (tt % 3))
    assert rows[0].fp == expected


def test_audio_group_fingerprints_injective(spark):
    # 12 distinct content groups -> 12 distinct fingerprints
    ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    fps = audio_fingerprint_table(synthetic_track_payloads(ids))
    assert fps.select("fp").distinct().count() == 12


def test_audio_track_overlap_structure(spark):
    ids = spark.range(0, 36).select(F.col("id").alias("doc_id"))
    fps = audio_fingerprint_table(synthetic_track_payloads(ids))
    pairs = {
        (r.id_a, r.id_b): (r.shared_fp, r.jaccard6)
        for r in fingerprint_jaccard_pairs(fps, min_jaccard6=1).collect()
    }
    assert pairs[(0, 12)] == (4, 1000000)  # same base mod 12
    assert pairs[(0, 1)] == (3, 600000)
    assert pairs[(0, 2)] == (2, 333333)
    assert (0, 4) not in pairs


def test_jaccard_plan_single_join_no_cartesian(spark):
    # sizes ride the rows via the id-window, so the whole operator is
    # ONE self-join on the fingerprint key — not 1 pair join + 2 size
    # joins re-deriving the distinct frame per consumer
    import re

    fps = spark.range(0, 100).select(
        (F.col("id") % 7).alias("doc_id"), (F.col("id") % 5).alias("fp")
    )
    q = fingerprint_jaccard_pairs(fps, min_jaccard6=1)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    joins = re.findall(
        r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", plan
    )
    assert len(joins) == 1
