"""Snapshot CDC (operators/diff.py): status taxonomy, move detection by
content-hash set membership (unambiguous under duplicated content), and
the tier report's invariants (operators/tiers.py).
"""

from pyspark.sql import functions as F

from lieu_spark.operators.diff import snapshot_diff
from lieu_spark.operators.tiers import tier_report


def _diff(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    return {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}


def test_diff_statuses(spark):
    st = _diff(
        spark,
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
        [(1, "a"), (2, "B"), (5, "d"), (6, "e")],
    )
    assert st == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "moved_out",
        5: "moved_in",
        6: "added",
    }


def test_diff_duplicate_content_moves_are_set_semantics(spark):
    # two removed rows share content with ONE added row: both are
    # moved_out (hash-set membership, no pairing ambiguity)
    st = _diff(spark, [(1, "x"), (2, "x")], [(9, "x")])
    assert st == {1: "moved_out", 2: "moved_out", 9: "moved_in"}


def test_diff_empty_delta_is_all_unchanged(spark):
    st = _diff(spark, [(1, "a"), (2, "b")], [(1, "a"), (2, "b")])
    assert set(st.values()) == {"unchanged"}


def test_tier_report_monotone_and_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, ["alpha beta", "", "footer"]),
            (2, ["alpha beta", "", "footer"]),  # exact dup of 1
            (3, ["ALPHA BETA", "", "FOOTER"]),  # normalized dup of 1
            (4, ["gamma delta", "", "footer"]),  # shares the footer line
        ],
        "doc_id long, lines array<string>",
    )
    rows = {r["tier"]: r for r in tier_report(docs).collect()}
    assert rows["1_raw"]["n_units"] == 4 and rows["1_raw"]["n_tokens"] == 12
    # exact collapses 1/2; normalized also collapses 3
    assert rows["2_exact"]["n_units"] == 3
    assert rows["3_normalized"]["n_units"] == 2
    # line tier: 'alpha beta'/'footer' survive once each (doc 1), the
    # byte-distinct upper-case lines of doc 3 survive, doc 4's body
    # survives; blanks are exempt and carry no tokens
    assert rows["4_line"]["n_tokens"] == (2 + 1) + (2 + 1) + 2
    assert rows["1_raw"]["tokens_pct6"] == 1_000_000
    for r in rows.values():
        assert 0 <= r["tokens_pct6"] <= 1_000_000


def test_tier_report_zero_token_corpus(spark):
    # every line tokenizes to [] -> raw n_tokens = 0; percentages must
    # come back NULL instead of the ANSI integer div throwing
    docs = spark.createDataFrame(
        [(1, ["..."]), (2, ["!!!"])], "doc_id long, lines array<string>"
    )
    rows = {r["tier"]: r for r in tier_report(docs).collect()}
    assert rows["1_raw"].n_tokens == 0
    assert all(r.tokens_pct6 is None for r in rows.values())


def test_snapshot_diff_null_text_one_row_per_id(spark):
    # presence is tracked with side markers, not hash nullness: an id
    # present in both with NULL text on one side is 'changed' (NULL
    # hashes as ''), and an old-only NULL-text row must emit exactly
    # ONE status row (it used to satisfy both delta filters)
    from lieu_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "z"), (5, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (4, None)], "doc_id long, text string"
    )
    rows = snapshot_diff(old, new).collect()
    assert len(rows) == 5  # one row per id, no duplicates
    st = {r.doc_id: r.status for r in rows}
    assert st[1] == "changed"      # 'x' vs NULL('')
    assert st[2] == "unchanged"    # NULL == NULL
    assert st[3] == "removed"      # 'z' not among added contents
    # 5 (old-only, '') and 4 (new-only, '') are a content-level rename
    assert st[5] == "moved_out"
    assert st[4] == "moved_in"
