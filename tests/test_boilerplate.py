"""operators/boilerplate.py — boilerplate-turn removal semantics.

Planted fixture: a greeting turn shared by many conversations must be
dropped everywhere; unique content turns survive untouched with their
original turn_idx; empty turns are formatting and never count as
boilerplate. Removal is a pure function of the input set — invariant
under repartitioning — and the physical plan is the contract: one
counting aggregation plus a BROADCAST anti join, never a sort-merge
join or corpus-wide window.
"""

import pytest
from pyspark.sql import functions as F

from lieu_spark.operators.boilerplate import (
    boilerplate_turns,
    remove_boilerplate_turns,
)

GREET = "hello how can i help you today"
LEGAL = "this call may be recorded for training purposes"


@pytest.fixture(scope="module")
def turns_df(spark):
    rows = []
    for c in range(20):
        rows.append((c, 0, GREET))
        if c % 2 == 0:
            rows.append((c, 1, LEGAL))
        rows.append((c, 2, f"unique content for conversation {c}"))
        rows.append((c, 3, ""))
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx int, turn_text string"
    )


def test_boilerplate_set_and_removal(spark, turns_df):
    boiler = {r.turn_text for r in boilerplate_turns(turns_df, min_df=2).collect()}
    assert boiler == {GREET, LEGAL}
    kept = remove_boilerplate_turns(turns_df, min_df=2).collect()
    texts = [r.turn_text for r in kept]
    assert GREET not in texts and LEGAL not in texts
    # unique content survives with its original index; empty turns stay
    assert sum(1 for t in texts if t.startswith("unique content")) == 20
    assert sum(1 for t in texts if t == "") == 20
    assert all(r.turn_idx in (2, 3) for r in kept)


def test_min_df_threshold_and_validation(spark, turns_df):
    # raising min_df above LEGAL's df (10) keeps it, still drops GREET (20)
    boiler = {r.turn_text for r in boilerplate_turns(turns_df, min_df=11).collect()}
    assert boiler == {GREET}
    with pytest.raises(ValueError):
        boilerplate_turns(turns_df, min_df=1)


def test_partition_invariant(spark, turns_df):
    a = sorted(
        (r.conv_id, r.turn_idx, r.turn_text)
        for r in remove_boilerplate_turns(turns_df, min_df=2).collect()
    )
    b = sorted(
        (r.conv_id, r.turn_idx, r.turn_text)
        for r in remove_boilerplate_turns(
            turns_df.repartition(13), min_df=2
        ).collect()
    )
    assert a == b


def test_plan_broadcast_anti_no_window(spark, turns_df):
    # no forced broadcast hint (a data-dependent set must not bypass
    # autoBroadcastJoinThreshold); AQE converts the anti-join to
    # broadcast AT RUNTIME when the set is small — assert on the final
    # adaptive plan after execution, and that the join key is the
    # fixed-width hash, not the full turn text
    out = remove_boilerplate_turns(turns_df, min_df=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "xxhash64" in plan
