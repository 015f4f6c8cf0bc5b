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
