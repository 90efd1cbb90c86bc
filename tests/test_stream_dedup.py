"""Streaming exact-dedup twin == batch-incremental composition.

The stream (applyInPandasWithState keyed by content hash) must classify
every document exactly as iterating textops.delta_exact_dedup batch by
batch does — same statuses, same kept representative.
"""

from pyspark.sql import functions as F

from ticdc_spark.functions.textops import delta_exact_dedup
from ticdc_spark.streaming.dedup import dedup_stream, read_dedup

DOCS = [
    # batch 0: d0 unique; d1 dups d0 in-batch; d2 unique
    (0, "alpha text"), (1, "alpha text"), (2, "beta text"),
    # batch 1: d3 dups batch-0 content; d4/d5 in-batch dup pair; d6 unique
    (3, "beta text"), (4, "gamma text"), (5, "gamma text"), (6, "delta text"),
    # batch 2: everything already seen
    (7, "alpha text"), (8, "gamma text"), (9, "delta text"),
]
BATCHES = [DOCS[:3], DOCS[3:7], DOCS[7:]]


def _run_stream_in_batches(spark, in_dir, out_dir, ckpt):
    """Deterministic batch boundaries (the sessionize-test pattern): write
    one batch dir, then drain the stream with availableNow before the
    next — each run sees exactly the new file."""
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{in_dir}/b{i}")
        dedup_stream(spark, f"{in_dir}/b*", out_dir, ckpt)


def _iterated_batch_truth(spark):
    """Ground truth: delta_exact_dedup applied batch by batch with base =
    union of prior batches (empty base -> all statuses from the in-delta
    rules)."""
    out = {}
    seen = []
    for rows in BATCHES:
        delta = spark.createDataFrame(rows, "doc_id long, text string")
        if seen:
            base = spark.createDataFrame(seen, "doc_id long, text string")
            got = delta_exact_dedup(base, delta).collect()
        else:
            # empty base: emulate with a base that matches nothing
            base = spark.createDataFrame([(-1, "\x00never")], "doc_id long, text string")
            got = delta_exact_dedup(base, delta).collect()
        for r in got:
            out[r["doc_id"]] = (r["status"], r["dup_of"])
        seen.extend(rows)
    return out


def test_stream_dedup_equals_batch_composition(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream_in_batches(spark, in_dir, out_dir, ckpt)
    got = {r["doc_id"]: (r["status"], r["dup_of"])
           for r in read_dedup(spark, out_dir).collect()}
    assert len(got) == len(DOCS)
    want = _iterated_batch_truth(spark)
    assert got == want
    # the representative is stable: every dup points at the first-arrived
    # doc of its content, which never changes once set
    assert got[1] == ("dup_in_delta", 0) and got[7] == ("dup_of_base", 0)
    assert got[3] == ("dup_of_base", 2)
    assert got[5] == ("dup_in_delta", 4) and got[8] == ("dup_of_base", 4)


def test_stream_dedup_restart_is_exactly_once(spark, tmp_path):
    """Restarting the query over the same checkpoint reprocesses nothing:
    the output stays one row per document."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream_in_batches(spark, in_dir, out_dir, ckpt)
    dedup_stream(spark, f"{in_dir}/b*", out_dir, ckpt)  # no new files -> no output
    rows = read_dedup(spark, out_dir).groupBy("doc_id").count()
    assert rows.filter(F.col("count") > 1).count() == 0
    assert rows.count() == len(DOCS)
