"""Checkpoint/resume: resumed runs are byte-identical and skip compute;
config changes invalidate stale stages (SURVEY.md §7.3 hard part e)."""

import pytest

from lieu_spark import corpus
from lieu_spark.checkpoint import StageStore
from lieu_spark.config import DedupeConfig
from lieu_spark.metrics import read_metrics
from lieu_spark.pipeline import run_pipeline

CFG = DedupeConfig()


@pytest.fixture()
def tdf(spark):
    return corpus.generate_df(spark, 42, 80)


def _snapshot(res):
    return (
        {(r.id_a, r.id_b, r.jaccard, r.status) for r in res.verified.collect()},
        {(r.conv_id, r.cluster_id) for r in res.clusters.collect()},
    )


def test_resume_identical_and_skipped(spark, tdf, tmp_path):
    store = StageStore(str(tmp_path / "stages"))
    mdir = str(tmp_path / "metrics")
    cold = run_pipeline(spark, tdf, CFG, store=store, metrics_dir=mdir, run_id="cold")
    cold_snap = _snapshot(cold)
    assert all(w > 0 for w in cold.stage_wall.values())

    warm = run_pipeline(spark, tdf, CFG, store=store, metrics_dir=mdir, run_id="warm")
    assert _snapshot(warm) == cold_snap
    # every stage was loaded from checkpoint, not recomputed
    assert all(w == 0.0 for w in warm.stage_wall.values())

    m = read_metrics(spark, mdir)
    stages = {r.stage for r in m.select("stage").distinct().collect()}
    assert {"conversations", "features", "candidates", "verified", "clusters"} <= stages
    assert m.filter("rows < 0").count() == 0


def test_partial_resume(spark, tdf, tmp_path):
    """Kill mid-run (simulated by invalidating downstream stages): early
    stages load, later stages recompute, output identical to cold run."""
    store = StageStore(str(tmp_path / "stages"))
    cold = run_pipeline(spark, tdf, CFG, store=store)
    cold_snap = _snapshot(cold)
    for stage in ("verified", "clusters", "spans"):
        store.invalidate(stage)
    resumed = run_pipeline(spark, tdf, CFG, store=store)
    assert _snapshot(resumed) == cold_snap
    assert resumed.stage_wall["conversations"] == 0.0  # loaded
    assert resumed.stage_wall["verified"] > 0  # recomputed


def test_config_change_invalidates(spark, tdf, tmp_path):
    store = StageStore(str(tmp_path / "stages"))
    run_pipeline(spark, tdf, CFG, store=store)
    cfg2 = DedupeConfig(shingle_k=3)
    res2 = run_pipeline(spark, tdf, cfg2, store=store)
    # different fingerprint => stages recomputed, not reused
    assert res2.stage_wall["features"] > 0


def test_checkpoint_invalidates_on_input_change(spark, tmp_path):
    """Resuming the same checkpoint dir against a DIFFERENT input must
    recompute, not serve the old corpus's stages: the stage fingerprint
    carries the hashed input-file list (checkpoint.input_signature), so
    file-backed inputs are input-addressed. (In-memory frames have no
    files and keep config-only addressing — the other tests here.)"""
    p1, p2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    corpus.generate_df(spark, 42, 30).write.parquet(p1)
    corpus.generate_df(spark, 42, 50).write.parquet(p2)
    store = StageStore(str(tmp_path / "stages"))
    r1 = run_pipeline(
        spark, spark.read.parquet(p1), CFG, store=store, with_spans=False
    )
    n1 = r1.conversations.count()
    r2 = run_pipeline(
        spark, spark.read.parquet(p2), CFG, store=store, with_spans=False
    )
    n2 = r2.conversations.count()
    assert n1 == 30 and n2 == 50, (n1, n2)  # stale reuse would return 30


def test_marker_commit_is_atomic_overwrite(spark, tmp_path):
    """fs_rename_overwrite replaces an existing marker in one step: the
    destination always holds either the old or the new contents, never
    neither (the delete-then-rename window a concurrent reader could
    observe as 'no marker')."""
    from lieu_spark.fsutil import fs_read_text, fs_rename_overwrite, fs_write_text

    dst = str(tmp_path / "m._meta.json")
    tmp = dst + ".tmp"
    fs_write_text(spark, dst, "old")
    fs_write_text(spark, tmp, "new")
    fs_rename_overwrite(spark, tmp, dst)
    assert fs_read_text(spark, dst) == "new"
    assert not (tmp_path / "m._meta.json.tmp").exists()


def test_corrupt_marker_recomputes_but_strict_gate_raises(spark, tmp_path):
    """An unreadable stage marker means 'recompute' on the resume path
    (has() False / meta() None) but must RAISE through the strict gate
    (meta(strict=True)) — refresh_pipeline's config check would
    otherwise silently skip itself on a transient store error."""
    from lieu_spark.operators.refresh import refresh_pipeline

    t1 = corpus.generate_df(spark, 7, 30)
    store = StageStore(str(tmp_path / "stages"))
    run_pipeline(spark, t1, CFG, store=store, with_spans=False)
    fp = CFG.fingerprint()
    marker = tmp_path / "stages" / "features._meta.json"
    assert marker.exists()
    marker.write_text("{not json")

    assert store.has("features", fp, spark) is False
    assert store.meta("features", spark) is None
    with pytest.raises(ValueError):
        store.meta("features", spark, strict=True)
    with pytest.raises(ValueError):
        refresh_pipeline(spark, store, t1, CFG)
