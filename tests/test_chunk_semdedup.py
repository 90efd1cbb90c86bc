"""Sliding-window chunking and SemDeDup unit semantics."""

import pytest
from pyspark.sql import functions as F

from ticdc_spark.functions.simsearch import semdedup
from ticdc_spark.functions.textops import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c")]), chunk_tokens=4, stride=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"]) == (0, 3, "a b c")


def test_chunk_overlap_and_tail_rule(spark):
    # 7 tokens, chunk 4, stride 2: offsets 0,2,4,6 — the chunk at 4 covers
    # tokens 5..7 (reaches the end), so offset 6 is suppressed
    text = "t1 t2 t3 t4 t5 t6 t7"
    out = sorted(
        chunk_documents(_docs(spark, [(1, text)]), chunk_tokens=4, stride=2)
        .collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["chunk_idx"], r["chunk_text"]) for r in out] == [
        (0, "t1 t2 t3 t4"),
        (1, "t3 t4 t5 t6"),
        (2, "t5 t6 t7"),
    ]
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 3]


def test_chunk_exact_boundary_no_empty_tail(spark):
    # 4 tokens, chunk 4, stride 2: the offset-2 chunk would be a pure
    # suffix of chunk 0's coverage — suppressed
    out = chunk_documents(
        _docs(spark, [(1, "a b c d")]), chunk_tokens=4, stride=2
    ).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "a b c d"


def test_chunk_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=2, stride=4)


def _embs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_collapses_near_identical(spark):
    # centroids: x-axis and y-axis; vectors 1,2 nearly identical near x,
    # vector 3 also x-cluster but far, vector 4 alone in y-cluster
    cents = [[1.0, 0.0], [0.0, 1.0]]
    e = _embs(spark, [
        (1, [1.0, 0.01]),
        (2, [1.0, 0.012]),
        (3, [0.6, 0.45]),
        (4, [0.1, 1.0]),
    ])
    out = {r["vec_id"]: r for r in semdedup(e, tau=0.999, centroids=cents).collect()}
    assert out[1]["canonical_id"] == 1 and out[1]["is_kept"]
    assert out[2]["canonical_id"] == 1 and not out[2]["is_kept"]
    assert out[3]["canonical_id"] == 3 and out[3]["is_kept"]
    assert out[4]["canonical_id"] == 4 and out[4]["is_kept"]
    # cluster boundary respected: 4 sits in the y-centroid cluster
    assert out[4]["centroid_id"] != out[1]["centroid_id"]


def test_semdedup_cross_cluster_pairs_never_compared(spark):
    # identical vectors land in DIFFERENT clusters only if assignment says
    # so; here both go to the x-cluster, but a y-cluster twin of vector 1
    # must NOT collapse with it (SemDeDup compares within clusters only)
    cents = [[1.0, 0.0], [0.0, 1.0]]
    e = _embs(spark, [
        (1, [1.0, 0.9]),   # x-cluster (cos to x ≈ .74 > cos to y ≈ .67)
        (2, [0.9, 1.0]),   # y-cluster — nearly identical direction to 1
    ])
    out = {r["vec_id"]: r for r in semdedup(e, tau=0.9, centroids=cents).collect()}
    assert out[1]["centroid_id"] != out[2]["centroid_id"]
    assert out[1]["is_kept"] and out[2]["is_kept"]


def test_semdedup_max_cluster_cap(spark):
    # an over-full cluster is dropped from pairing: nothing collapses
    cents = [[1.0, 0.0], [0.0, 1.0]]
    e = _embs(spark, [(i, [1.0, 0.001 * i]) for i in range(1, 5)])
    out = semdedup(e, tau=0.99, centroids=cents, max_cluster=3).collect()
    assert all(r["is_kept"] for r in out)


def test_neardup_clusters_paths_agree(spark):
    """The driver-side union-find fast path and the distributed Pregel loop
    must produce identical component labels."""
    from ticdc_spark.functions.textops import neardup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
        "doc_id_a long, doc_id_b long",
    )
    fast = {(r["doc_id"], r["cluster"])
            for r in neardup_clusters(pairs).collect()}
    dist = {(r["doc_id"], r["cluster"])
            for r in neardup_clusters(pairs, small_graph_edges=0).collect()}
    assert fast == dist
    assert fast == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5),
                    (8, 8), (9, 8), (10, 8)}
