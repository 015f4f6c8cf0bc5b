"""foreachBatch lake-sink golden: streamed partial aggregates rolled
up on read must equal the batch aggregate, and re-running a batch
(idempotent partition overwrite) must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.session import read_events
from etl_sh_design_spark.streaming.sinks import read_lake_totals, stream_user_totals_to_lake
from tests.conftest import SF_SMOKE


def test_lake_sink_rollup_equals_batch(spark, tmp_path):
    out = str(tmp_path / "lake")
    stream_user_totals_to_lake(spark, SF_SMOKE, out)

    got = {
        r["user_id"]: (round(r["sum_value"], 6), r["n_events"])
        for r in read_lake_totals(spark, out).collect()
    }
    want = {
        r["user_id"]: (round(r["sum_value"], 6), r["n_events"])
        for r in read_events(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_lake_sink_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "lake2")
    stream_user_totals_to_lake(spark, SF_SMOKE, out)
    before = {tuple(r) for r in read_lake_totals(spark, out).collect()}
    # replaying the whole stream re-writes the same batch_id partitions
    stream_user_totals_to_lake(spark, SF_SMOKE, out)
    after = {tuple(r) for r in read_lake_totals(spark, out).collect()}
    assert before == after


def _snapshot(spark, out):
    return {
        r["user_id"]: (round(r["sum_value"], 6), r["n_events"])
        for r in read_lake_totals(spark, out).collect()
    }


def test_compaction_preserves_rollup_and_bounds_reads(spark, tmp_path):
    """compact_lake_totals folds base+partials into one snapshot,
    committed by atomic manifest replace: the rollup is identical
    before/after, later-arriving partials merge on top, gc leaves
    only the live base, and a re-compaction with nothing new is a
    no-op returning the same manifest."""
    import glob
    import os

    from etl_sh_design_spark.streaming.sinks import compact_lake_totals

    out = str(tmp_path / "lake3")
    stream_user_totals_to_lake(spark, SF_SMOKE, out)
    before = _snapshot(spark, out)

    m1 = compact_lake_totals(spark, out)
    assert _snapshot(spark, out) == before
    assert m1["version"] == 1 and m1["consumed_max_batch"] >= 0

    # a post-compaction arrival (monotonic batch id, as a checkpointed
    # stream guarantees): one more partial partition on top
    extra_uid = sorted(before)[0]
    spark.createDataFrame(
        [(extra_uid, 5.0, 2)], "user_id long, psum double, pcnt bigint"
    ).withColumn("batch_id", F.lit(m1["consumed_max_batch"] + 1)).write.mode(
        "append"
    ).partitionBy("batch_id").parquet(out)
    merged = _snapshot(spark, out)
    assert merged[extra_uid] == (
        round(before[extra_uid][0] + 5.0, 6),
        before[extra_uid][1] + 2,
    )
    assert {k: v for k, v in merged.items() if k != extra_uid} == {
        k: v for k, v in before.items() if k != extra_uid
    }

    # second compaction consumes it; gc drops consumed partials + old base
    m2 = compact_lake_totals(spark, out, gc=True)
    assert m2["version"] == 2
    assert _snapshot(spark, out) == merged
    assert glob.glob(os.path.join(out, "batch_id=*")) == []
    bases = glob.glob(os.path.join(out, "_compacted", "base_v*"))
    assert [os.path.basename(b) for b in bases] == ["base_v2"]

    # idempotent: nothing new -> same manifest, same view
    assert compact_lake_totals(spark, out, gc=True) == m2
    assert _snapshot(spark, out) == merged


def test_compaction_crash_before_commit_leaves_old_view(spark, tmp_path):
    """The commit point is the manifest replace: an orphaned base_v
    directory written without a manifest update (simulated crash) must
    not change what readers see."""
    import os
    import shutil

    from etl_sh_design_spark.streaming.sinks import compact_lake_totals

    out = str(tmp_path / "lake4")
    stream_user_totals_to_lake(spark, SF_SMOKE, out)
    m1 = compact_lake_totals(spark, out)
    before = _snapshot(spark, out)
    # simulate a crashed compaction: a stray snapshot dir, no commit
    shutil.copytree(
        os.path.join(out, "_compacted", m1["base"]),
        os.path.join(out, "_compacted", "base_v99"),
    )
    assert _snapshot(spark, out) == before
