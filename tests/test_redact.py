"""PII detection/redaction unit tests (functions/redact.py) on crafted
strings — the cross-engine value check lives in test_queries_oracle.py
(pii_scrub); here we pin the SEMANTICS: what matches, what doesn't, and
that redaction order prevents placeholder re-matching."""

from pyspark.sql import functions as F

from lieu_spark.functions import redact as R


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    c = R.pii_counts(F.col("text"))
    row = df.select(
        c["email"].alias("e"),
        c["phone"].alias("p"),
        c["ip"].alias("i"),
        c["ssn"].alias("s"),
        R.redact_pii(F.col("text")).alias("red"),
    ).first()
    return row


def test_each_type_detected_and_redacted(spark):
    row = _one(
        spark,
        "mail a.b+c@sub.example.org call 555-867-5309 host 10.0.0.1 ssn 123-45-6789",
    )
    assert (row.e, row.p, row.i, row.s) == (1, 1, 1, 1)
    assert row.red == "mail <EMAIL> call <PHONE> host <IP> ssn <SSN>"


def test_no_false_positives_on_plain_text(spark):
    row = _one(spark, "the meeting at 10 am moved to room 555 on floor 3")
    assert (row.e, row.p, row.i, row.s) == (0, 0, 0, 0)
    assert row.red == "the meeting at 10 am moved to room 555 on floor 3"


def test_ssn_not_double_counted_as_phone(spark):
    # 3-2-4 grouping is ssn only; 3-3-4 is phone only
    row = _one(spark, "123-45-6789 and 123-456-7890")
    assert (row.s, row.p) == (1, 1)
    assert row.red == "<SSN> and <PHONE>"


def test_dotted_phone_is_not_an_ip(spark):
    # 4-digit final group disqualifies the ip pattern's 1-3 digit octet
    row = _one(spark, "fax 555.867.5309 gateway 192.168.1.254")
    assert (row.p, row.i) == (1, 1)
    assert row.red == "fax <PHONE> gateway <IP>"


def test_multiple_matches_replace_all(spark):
    row = _one(spark, "a@b.co x a@b.co y a@b.co")
    assert row.e == 3
    assert row.red == "<EMAIL> x <EMAIL> y <EMAIL>"


def test_null_text_yields_zero_counts_and_empty_redaction(spark):
    df = spark.createDataFrame([(None,)], "text string")
    c = R.pii_counts(F.col("text"))
    row = df.select(
        c["email"].alias("e"), R.redact_pii(F.col("text")).alias("red")
    ).first()
    assert row.e == 0
    assert row.red == ""


def test_redaction_idempotent(spark):
    """redact(redact(x)) == redact(x): placeholders contain nothing any
    pattern can re-match, so a second scrub pass is a no-op (safe to run
    the scrub at multiple pipeline stages)."""
    texts = [
        "mail a.b+c@sub.example.org call 555-867-5309 host 10.0.0.1 ssn 123-45-6789",
        "a@b.co a@b.co 192.168.0.1 123-45-6789 555.867.5309",
        "no pii here at all",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = R.redact_pii(F.col("text"))
    rows = df.select(once.alias("r1"), R.redact_pii(once).alias("r2")).collect()
    for r in rows:
        assert r.r1 == r.r2
