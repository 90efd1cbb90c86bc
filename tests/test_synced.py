"""W7 synced detection + K8 syncpoints."""

from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig


def test_synced_and_syncpoints(spark, tmp_table_path):
    spec = BinlogSpec(n_events=3_000, n_convs=80)
    cf = Changefeed(
        spark, gen_binlog(spark, spec), gen_resolved_log(spark, spec), None,
        LakeTable(spark, tmp_table_path), ChangefeedConfig(changefeed_id="sy"),
    )
    cf.ensure_target()
    assert not cf.is_synced()
    cf.run(max_merges=1)
    assert not cf.is_synced()
    cf.run()
    assert cf.is_synced()
    sp = cf.syncpoints()
    assert [s["primary_ts"] for s in sp] == [2000, 3000, 4000]
