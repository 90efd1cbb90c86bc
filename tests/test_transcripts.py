"""Transcript-prep operators (SFT assembly) + PII scrub / URL curation /
incremental dedup semantics on hand-built frames."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ticdc_spark.functions.textops import (
    delta_exact_dedup,
    pii_scrub,
    url_domains,
)
from ticdc_spark.functions.transcripts import (
    conversation_stats,
    flatten_conversations,
)


def _tr(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=i, role=r, text=t, tool=tl) for c, i, r, t, tl in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )


def test_flatten_restores_turn_order(spark):
    # rows arrive shuffled; the flattened doc must be in turn_idx order
    tr = _tr(spark, [
        ("c1", 3, "user", "third", None),
        ("c1", 1, "system", "first", None),
        ("c1", 2, "assistant", "second", None),
    ])
    out = flatten_conversations(tr).collect()[0]
    assert out["n_turns"] == 3
    assert out["doc"] == "system: first\nassistant: second\nuser: third"
    assert out["doc_chars"] == len(out["doc"])


def test_flatten_is_partitioning_independent(spark):
    tr = _tr(spark, [(f"c{i % 7}", i // 7 + 1, "user", f"t{i}", None) for i in range(70)])
    a = {r["conv_id"]: r["doc"] for r in flatten_conversations(tr).collect()}
    b = {r["conv_id"]: r["doc"] for r in flatten_conversations(tr.repartition(13)).collect()}
    assert a == b


def test_conversation_stats_gate(spark):
    tr = _tr(spark, [
        ("ok", 1, "user", "aa", None),
        ("ok", 2, "assistant", "bbb", "search"),
        ("ok", 3, "user", "c", None),
        ("ok", 4, "assistant", "dd", None),
        ("short", 1, "user", "x", None),
        ("short", 2, "assistant", "y", None),
        ("nouser", 1, "system", "s", None),
        ("nouser", 2, "assistant", "a", None),
        ("nouser", 3, "assistant", "b", None),
        ("nouser", 4, "assistant", "c", None),
    ])
    got = {r["conv_id"]: r for r in conversation_stats(tr).collect()}
    ok = got["ok"]
    assert (ok["n_turns"], ok["n_user"], ok["n_assistant"], ok["n_tool_calls"]) == (4, 2, 2, 1)
    assert ok["total_chars"] == 8
    assert ok["user_share_bp"] == 5000
    assert ok["sft_eligible"]
    assert not got["short"]["sft_eligible"]  # < 4 turns
    assert not got["nouser"]["sft_eligible"]  # no user turn


def _doc(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_counts_and_redacts(spark):
    d = _doc(spark, [
        (1, "mail a@b.com and c.d@e-f.org here"),
        (2, "server 10.1.2.3 and 192.168.0.1 up"),
        (3, "call +141512345678 now"),
        (4, "clean text"),
    ])
    got = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_ips"] == 0
    assert got[2]["n_ips"] == 2
    assert got[3]["n_phones"] == 1
    assert got[4]["n_emails"] == got[4]["n_ips"] == got[4]["n_phones"] == 0
    # redaction replaces, never leaks the original
    scrub1 = d.filter("doc_id = 1")
    joined = pii_scrub(scrub1).collect()[0]
    assert joined["scrubbed_chars"] == len("mail <EMAIL> and <EMAIL> here")


def test_url_domains_aggregates(spark):
    d = _doc(spark, [
        (1, "x https://a.example.org/p/1 y http://b.example.net/q"),
        (2, "z https://a.example.org/other"),
        (3, "no urls"),
    ])
    got = {r["domain"]: r for r in url_domains(d).collect()}
    assert got["a.example.org"]["n_urls"] == 2
    assert got["a.example.org"]["n_docs"] == 2
    assert got["b.example.net"]["n_urls"] == 1
    assert "no" not in got


def test_delta_exact_dedup_statuses(spark):
    base = _doc(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    delta = _doc(spark, [
        (10, "alpha"),   # dup_of_base -> representative 1 (min base id)
        (11, "gamma"),   # unique (first of its hash in delta)
        (12, "gamma"),   # dup_in_delta -> 11
        (13, "delta-only"),
    ])
    got = {r["doc_id"]: (r["status"], r["dup_of"]) for r in
           delta_exact_dedup(base, delta).collect()}
    assert got[10] == ("dup_of_base", 1)
    assert got[11] == ("unique", None)
    assert got[12] == ("dup_in_delta", 11)
    assert got[13] == ("unique", None)


def test_delta_dedup_batch_composition_matches_full_rescan(spark):
    """Incremental classification agrees with what a full exact_dedup over
    base+delta would conclude: every non-unique delta doc maps to the
    global min-doc_id representative of its hash."""
    from ticdc_spark.functions.textops import exact_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    base = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    delta = docs.filter("doc_id % 2 = 1").select("doc_id", "text").unionByName(
        base.limit(5).select((F.col("doc_id") + 500).alias("doc_id"), "text")
    )
    inc = delta_exact_dedup(base, delta)
    full = exact_dedup(base.unionByName(delta))
    reps = {r["keep_doc_id"] for r in full.filter("n_copies >= 2").collect()}
    for r in inc.filter("status = 'dup_of_base'").collect():
        assert r["dup_of"] in reps


def test_sft_pipeline_invariants(spark):
    """Capstone invariants: only eligible conversations are packed, token
    totals are conserved pack-by-pack, and utilization is exact integer
    basis points of the 512 budget."""
    from ticdc_spark.queries import q_sft_prep_pipeline, transcripts_from_events
    from ticdc_spark.functions.transcripts import conversation_stats

    sf = "/root/testdata/sf0.001"
    out = q_sft_prep_pipeline(spark, sf).collect()
    assert out
    eligible = {
        r["conv_id"]
        for r in conversation_stats(transcripts_from_events(spark, sf))
        .filter("sft_eligible").collect()
    }
    # doc_id = user*5+slot is bijective with conv_id 'conv-<user:06d>-<slot>'
    packed_ids = {r["doc_id"] for r in out}
    eligible_ids = {int(c[5:11]) * 5 + int(c[12:]) for c in eligible}
    assert packed_ids == eligible_ids
    by_pack = {}
    for r in out:
        by_pack.setdefault((r["shard"], r["pack_seq"]), []).append(r)
    for (_, _), rows in by_pack.items():
        tot = sum(r["n_tokens"] for r in rows)
        assert tot == rows[0]["pack_tokens"]
        assert rows[0]["util_bp"] == tot * 10000 // 512
        assert rows[0]["n_docs"] == len(rows)


def test_delta_neardup_sides_and_band_agreement(spark):
    """Near-dup candidates classify by partner side: an exact copy of a
    base doc hits side='base' with all 4 bands; a within-batch copy pairs
    side='delta' against the smaller delta doc_id; an unrelated doc
    produces no pair."""
    from ticdc_spark.functions.textops import delta_neardup_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    base = docs.filter("doc_id < 20").select("doc_id", "text")
    # delta: copy of base doc 3, plus two copies of an unseen tail doc
    copy_of_base = base.filter("doc_id = 3").select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    tail = docs.filter("doc_id IN (25, 26)").select("doc_id", "text")
    tail_dup = docs.filter("doc_id = 25").select(
        (F.col("doc_id") + 200).alias("doc_id"), "text"
    )
    delta = copy_of_base.unionByName(tail).unionByName(tail_dup)
    got = {(r["doc_id"], r["dup_doc_id"]): r for r in
           delta_neardup_pairs(base, delta, min_bands=3).collect()}
    assert got[(103, 3)]["side"] == "base"
    assert got[(103, 3)]["n_bands"] == 4
    assert got[(225, 25)]["side"] == "delta"
    # the unrelated tail doc 26 pairs with nothing
    assert not [k for k in got if k[0] == 26 or k[1] == 26]


def test_delta_neardup_agrees_with_full_neardup(spark):
    """The incremental pass finds exactly the full-corpus LSH pairs that
    involve at least one delta doc (modulo pair orientation)."""
    from ticdc_spark.functions.textops import delta_neardup_pairs, neardup_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    base = docs.filter("doc_id % 3 != 0").select("doc_id", "text")
    delta = docs.filter("doc_id % 3 = 0").select("doc_id", "text").unionByName(
        base.filter("doc_id < 10").select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    inc = {(min(r["doc_id"], r["dup_doc_id"]), max(r["doc_id"], r["dup_doc_id"]))
           for r in delta_neardup_pairs(base, delta, min_bands=3).collect()}
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    full = neardup_pairs(base.unionByName(delta), min_bands=3)
    expected = {(r["doc_id_a"], r["doc_id_b"]) for r in full.collect()
                if r["doc_id_a"] in delta_ids or r["doc_id_b"] in delta_ids}
    assert inc == expected


def test_line_dedup_removes_corpus_repeated_lines(spark):
    from ticdc_spark.functions.textops import line_dedup

    d = _doc(spark, [
        (1, "unique one\nBOILER\nunique two"),
        (2, "BOILER\nother text"),
        (3, "all original\nhere"),
        (4, "BOILER"),  # nothing survives
    ])
    got = {r["doc_id"]: r for r in line_dedup(d, min_docs=2).collect()}
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 2)
    assert got[1]["cleaned_chars"] == len("unique one\nunique two")
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (2, 1)
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (2, 2)
    assert (got[4]["n_lines"], got[4]["n_kept"]) == (1, 0)
    assert got[4]["cleaned_chars"] == 0


def test_line_dedup_repeat_within_one_doc_survives(spark):
    """min_docs counts DISTINCT documents: a line repeated only inside a
    single document is not boilerplate and must survive."""
    from ticdc_spark.functions.textops import line_dedup

    d = _doc(spark, [(1, "same\nsame\nend"), (2, "different")])
    got = {r["doc_id"]: r for r in line_dedup(d, min_docs=2).collect()}
    assert got[1]["n_kept"] == 3


def test_preference_pairs_chosen_rejected(spark):
    from ticdc_spark.functions.transcripts import preference_pairs

    rows = [
        # prompt P drew three replies across conversations; longest wins
        ("c1", 1, "user", "P", None),
        ("c1", 2, "assistant", "one two three four", None),
        ("c2", 1, "user", "P", None),
        ("c2", 2, "assistant", "one", None),
        ("c3", 1, "user", "P", None),
        ("c3", 2, "assistant", "one two", None),
        # prompt Q drew the SAME reply twice -> no pair (n_replies < 2)
        ("c4", 1, "user", "Q", None),
        ("c4", 2, "assistant", "same", None),
        ("c5", 1, "user", "Q", None),
        ("c5", 2, "assistant", "same", None),
        # prompt R appears once -> no pair
        ("c6", 1, "user", "R", None),
        ("c6", 2, "assistant", "solo", None),
    ]
    out = {r["prompt"]: r for r in preference_pairs(_tr(spark, rows)).collect()}
    assert set(out) == {"P"}
    p = out["P"]
    assert p["n_candidates"] == 3 and p["n_replies"] == 3
    assert p["chosen_reply"] == "one two three four" and p["chosen_score"] == 4
    assert p["rejected_reply"] == "one" and p["rejected_score"] == 1
    assert p["chosen_conv"] == "c1" and p["rejected_conv"] == "c2"


def test_preference_pairs_tie_breaks_deterministically(spark):
    from ticdc_spark.functions.transcripts import preference_pairs

    rows = [
        ("c1", 1, "user", "P", None),
        ("c1", 2, "assistant", "b b", None),
        ("c2", 1, "user", "P", None),
        ("c2", 2, "assistant", "a a", None),
    ]
    out = preference_pairs(_tr(spark, rows)).collect()[0]
    # equal score -> lexicographic reply breaks the tie, same on any engine
    assert out["chosen_reply"] == "b b" and out["rejected_reply"] == "a a"


def test_context_fit_keeps_suffix_within_budget(spark):
    from ticdc_spark.functions.transcripts import context_fit

    rows = [
        ("c1", 1, "user", "a b c d e", None),       # 5 tokens
        ("c1", 2, "assistant", "f g h", None),      # 3
        ("c1", 3, "user", "i j", None),             # 2
        ("c1", 4, "assistant", "k", None),          # 1
        ("c2", 1, "user", " ".join(["w"] * 20), None),  # alone over budget
    ]
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in context_fit(_tr(spark, rows), budget_tokens=6).collect()}
    # suffix sums from the end: turn4=1, turn3=3, turn2=6, turn1=11
    assert [out[("c1", i)]["cum_from_end"] for i in (4, 3, 2, 1)] == [1, 3, 6, 11]
    assert [out[("c1", i)]["kept"] for i in (4, 3, 2, 1)] == [True, True, True, False]
    # a single turn larger than the budget is dropped (nothing fits)
    assert out[("c2", 1)]["kept"] is False


def test_tool_call_audit_counts_defects(spark):
    from pyspark.sql import Row

    from ticdc_spark.functions.transcripts import tool_call_audit

    rows = [
        Row(conv_id="c1", turn_idx=1, role="tool", text="t", tool="search",
            tool_args='{"q":"alpha beta"}'),
        Row(conv_id="c1", turn_idx=2, role="tool", text="t", tool="search",
            tool_args='{"q":"gamma"'),          # malformed
        Row(conv_id="c2", turn_idx=1, role="tool", text="t", tool="search",
            tool_args='{"nope":1}'),            # missing required arg
        Row(conv_id="c2", turn_idx=2, role="tool", text="t", tool="calc",
            tool_args='{"q":"1 + 1"}'),
        Row(conv_id="c3", turn_idx=1, role="user", text="t", tool=None,
            tool_args=None),                    # not a tool turn
    ]
    out = {r["tool"]: r for r in tool_call_audit(spark.createDataFrame(rows)).collect()}
    s = out["search"]
    assert (s["n_calls"], s["n_valid"], s["n_convs"]) == (3, 1, 2)
    assert s["valid_bp"] == 3333
    assert s["q_tokens"] == 2  # "alpha beta"
    c = out["calc"]
    assert (c["n_calls"], c["n_valid"], c["valid_bp"], c["q_tokens"]) == (1, 1, 10000, 3)


def test_loss_mask_spans_offsets_and_masks(spark):
    from ticdc_spark.functions.transcripts import loss_mask_spans

    rows = [
        ("c1", 1, "user", "hello there", None),     # line = 1 + 2 = 3 tokens
        ("c1", 2, "assistant", "hi", None),         # 1 + 1 = 2
        ("c1", 3, "user", "a b c", None),           # 1 + 3 = 4
        ("c1", 4, "assistant", "d e", None),        # 1 + 2 = 3
    ]
    out = {r["turn_idx"]: r for r in loss_mask_spans(_tr(spark, rows)).collect()}
    spans = [(out[i]["tok_start"], out[i]["tok_end"]) for i in (1, 2, 3, 4)]
    assert spans == [(0, 3), (3, 5), (5, 9), (9, 12)]
    assert [out[i]["train_mask"] for i in (1, 2, 3, 4)] == [False, True, False, True]
    # spans tile the flattened document exactly: end(i) == start(i+1)
    for i in (1, 2, 3):
        assert out[i]["tok_end"] == out[i + 1]["tok_start"]


def test_rlhf_prep_decontaminates_against_train_split(spark):
    """The composed RLHF capstone: its output is exactly the preference
    pairs whose prompt no train-split SFT conversation uttered."""
    from ticdc_spark.functions.transcripts import conversation_stats, preference_pairs
    from ticdc_spark.queries import q_rlhf_prep_pipeline, transcripts_from_events

    sf = "/root/testdata/sf0.001"
    out = q_rlhf_prep_pipeline(spark, sf).collect()
    assert len(out) > 0
    tr = transcripts_from_events(spark, sf)
    train = {
        r["conv_id"]
        for r in conversation_stats(tr).filter("sft_eligible").collect()
        if int(r["conv_id"][12]) < 1
    }
    train_prompts = {
        r["text"]
        for r in tr.filter(F.col("role") == "user").collect()
        if r["conv_id"] in train
    }
    all_pairs = {r["prompt"] for r in preference_pairs(tr).collect()}
    got = {r["prompt"] for r in out}
    assert got == {p for p in all_pairs if p not in train_prompts}


def test_turn_dedup_drops_corpus_repeated_assistant_turns(spark):
    from ticdc_spark.functions.transcripts import turn_dedup

    # "Sure,  I can help" normalizes to the same text in 3 conversations →
    # boilerplate; the unique assistant reply and ALL user turns survive.
    rows = [
        ("c1", 1, "user", "q one", None),
        ("c1", 2, "assistant", "Sure,  I can help", None),
        ("c1", 3, "assistant", "unique analysis", None),
        ("c2", 1, "user", "q two", None),
        ("c2", 2, "assistant", "sure, i can  help", None),
        ("c3", 1, "user", "q three", None),
        ("c3", 2, "assistant", "Sure, I can help", None),
    ]
    out = {r["conv_id"]: r for r in turn_dedup(_tr(spark, rows), min_convs=3).collect()}
    assert (out["c1"]["n_kept"], out["c1"]["n_dropped"]) == (2, 1)
    assert out["c1"]["doc"] == "user: q one\nassistant: unique analysis"
    assert (out["c2"]["n_kept"], out["c2"]["n_dropped"]) == (1, 1)
    assert (out["c3"]["n_kept"], out["c3"]["n_dropped"]) == (1, 1)


def test_turn_dedup_never_drops_user_turns(spark):
    from ticdc_spark.functions.transcripts import turn_dedup

    # the same user text repeats in 3 convs but user turns are prompt-side
    rows = [
        (f"c{i}", 1, "user", "same question", None) for i in range(3)
    ] + [(f"c{i}", 2, "assistant", f"answer {i}", None) for i in range(3)]
    out = turn_dedup(_tr(spark, rows), min_convs=3).collect()
    assert all(r["n_dropped"] == 0 and r["n_kept"] == 2 for r in out)


def test_turn_dedup_threshold_counts_distinct_conversations(spark):
    from ticdc_spark.functions.transcripts import turn_dedup

    # the repeated reply appears twice in ONE conversation — one distinct
    # conv, below min_convs=2, so nothing is boilerplate
    rows = [
        ("c1", 1, "assistant", "retry", None),
        ("c1", 2, "assistant", "retry", None),
        ("c1", 3, "user", "ok", None),
    ]
    out = turn_dedup(_tr(spark, rows), min_convs=2).collect()
    assert out[0]["n_dropped"] == 0 and out[0]["n_kept"] == 3
