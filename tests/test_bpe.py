"""BPE tokenizer: training determinism, apply semantics, encode accounting."""

from ticdc_spark.functions.bpe import (
    TRAINED_MERGES,
    bpe_apply,
    bpe_encode,
    bpe_train,
)


def test_toy_training_classic_example(spark):
    d = spark.createDataFrame(
        [(1, "low low low lower lower lowest")], ["doc_id", "text"]
    )
    merges = bpe_train(d, n_merges=10)
    # lo/ow tie at 6 -> lex smallest ('l','o') first; chain follows counts;
    # ('lowe','s') occurs once so training stops at 4 merges
    assert merges == [("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")]


def test_apply_rank_priority_and_reconstruction(spark):
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("low", "e"): 2, ("lowe", "r"): 3}
    assert bpe_apply("lower", ranks) == ["lower"]
    assert bpe_apply("lowest", ranks) == ["lowe", "s", "t"]
    assert bpe_apply("slow", ranks) == ["s", "low"]
    for w in ("lowlow", "owl", "xyz", "l"):
        assert "".join(bpe_apply(w, ranks)) == w  # tokens tile the word


def test_apply_leftmost_on_rank_tie(spark):
    # 'abab': pair (a,b) at positions 0 and 2 — leftmost merges first,
    # then the remaining occurrence; never the overlapping (b,a)
    ranks = {("a", "b"): 0, ("ab", "ab"): 1}
    assert bpe_apply("abab", ranks) == ["abab"]


def test_training_is_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert bpe_train(docs, n_merges=12) == bpe_train(docs, n_merges=12)


def test_frozen_merges_match_corpus(spark):
    """TRAINED_MERGES must stay in sync with what training on sf0.001
    produces — guards literal drift."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert bpe_train(docs, n_merges=30) == TRAINED_MERGES


def test_encode_counts(spark):
    d = spark.createDataFrame(
        [(1, "low lower"), (2, "lowest lowest low"), (3, "???")],
        ["doc_id", "text"],
    )
    merges = [("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")]
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_encode(d, merges).collect()}
    # low=1 token, lower=1, lowest=3; doc 3 has no words at all
    assert got == {1: (2, 2), 2: (3, 7)}
