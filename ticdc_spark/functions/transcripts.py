"""Conversation-transcript prep operators for training-data pipelines.

The engine's payload is multi-turn conversation / agent transcripts
(conv_id, turn_idx, role, text, tool, ts). After CDC ingest lands the
transcript table (see ``streaming/pipeline.py``), an SFT/pretraining
pipeline needs conversation-level operators: flatten a conversation into
one role-tagged training document, and compute per-conversation stats
that gate training eligibility (role balance, tool usage, length).

All operators are pure Column expressions (JVM-side, whole-stage
codegen). The only shuffle is the per-conversation hash aggregate —
conversations are bounded (thousands of turns at most), so there is no
skew hazard and no need for salting: at 100 TB this is one map-side
combining groupBy keyed on conv_id, the same key the CDC sink already
clusters by, so a bucketed transcript table makes the aggregate
exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_conversations(tr: DataFrame, sep: str = "\n") -> DataFrame:
    """Flatten each conversation into ONE training document:
    turn lines ``role: text`` joined in turn_idx order.

    collect_list is unordered under parallel aggregation; total order is
    restored by array_sort over struct(turn_idx, line) — turn_idx is
    unique within a conversation, so the sort is deterministic. This is
    the scale-honest layout: no window function, no global sort, one
    combining aggregate.
    """
    line = F.concat(F.col("role"), F.lit(": "), F.col("text"))
    grouped = tr.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("turn_idx").alias("i"), line.alias("l")))
        ).alias("_turns"),
        F.count(F.lit(1)).cast("long").alias("n_turns"),
    )
    doc = F.array_join(F.transform("_turns", lambda x: x["l"]), sep)
    return grouped.select(
        "conv_id",
        "n_turns",
        F.length(doc).cast("long").alias("doc_chars"),
        doc.alias("doc"),
    )


def conversation_stats(tr: DataFrame) -> DataFrame:
    """Per-conversation training-eligibility stats: role mix, tool-call
    count, total text volume, user-turn share (integer basis points —
    exact arithmetic, hash-stable across engines), and the SFT gate
    (>=4 turns with both user and assistant present).
    """

    def role_n(r):
        return F.count(F.when(F.col("role") == r, 1)).cast("long")

    return tr.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        role_n("user").alias("n_user"),
        role_n("assistant").alias("n_assistant"),
        role_n("system").alias("n_system"),
        F.count(F.when(F.col("tool").isNotNull(), 1)).cast("long").alias("n_tool_calls"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    ).select(
        "*",
        F.expr("(n_user * 10000) div n_turns").alias("user_share_bp"),
        (
            (F.col("n_turns") >= 4) & (F.col("n_user") > 0) & (F.col("n_assistant") > 0)
        ).alias("sft_eligible"),
    )


def preference_pairs(tr: DataFrame) -> DataFrame:
    """Preference-pair construction for DPO/RLHF post-training: adjacent
    (user prompt -> assistant reply) turns are candidate responses; every
    prompt that drew >= 2 DISTINCT replies across the corpus emits ONE
    (chosen, rejected) pair — chosen is the lexicographic MAX of
    struct(score, reply, conv_id), rejected the MIN, where score is the
    reply's whitespace-token count (the integer quality proxy; any scorer
    column drops in). Max/min of a struct is order-deterministic and
    hash-stable on any engine, and one-pair-per-prompt keeps output
    linear in prompt groups — never the quadratic all-pairs blowup.

    Scale shape: the prompt->reply adjacency is ONE lead() window per
    conversation — turn_idx is unique within a conversation (the CDC
    ingest assigns it by row_number), so "the assistant turn at
    turn_idx+1" is exactly "the next turn in order, when it is an
    assistant turn at turn_idx+1"; the guard keeps the semantics
    identical to the (conv_id, turn_idx+1) equi-join it replaces while
    evaluating the transcript subtree ONCE and sharing its conv_id
    partitioning (no join, no second scan). The pair reduction is ONE
    combining hash aggregate keyed by prompt text (production would key
    by a prompt fingerprint; oracle scale keys the raw text so an
    external engine reproduces it exactly). Prompt groups are bounded by
    how often a prompt repeats — the natural cap a dedup-ed corpus
    already enforces."""
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    nxt = tr.select(
        "conv_id", "turn_idx", "role", "text",
        F.lead("turn_idx").over(w).alias("_nidx"),
        F.lead("role").over(w).alias("_nrole"),
        F.lead("text").over(w).alias("_ntext"),
    )
    cand = nxt.filter(
        (F.col("role") == "user")
        & (F.col("_nrole") == "assistant")
        & (F.col("_nidx") == F.col("turn_idx") + 1)
    ).select(
        F.col("text").alias("prompt"),
        F.col("_ntext").alias("reply"),
        "conv_id",
        F.size(F.split(F.trim(F.col("_ntext")), r"\s+")).cast("long").alias("score"),
    )
    g = cand.groupBy("prompt").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.size(F.collect_set("reply")).cast("long").alias("n_replies"),
        F.max(F.struct("score", "reply", "conv_id")).alias("_ch"),
        F.min(F.struct("score", "reply", "conv_id")).alias("_rj"),
    )
    return g.filter(F.col("n_replies") >= 2).select(
        "prompt", "n_candidates", "n_replies",
        F.col("_ch.score").alias("chosen_score"),
        F.col("_ch.reply").alias("chosen_reply"),
        F.col("_ch.conv_id").alias("chosen_conv"),
        F.col("_rj.score").alias("rejected_score"),
        F.col("_rj.reply").alias("rejected_reply"),
        F.col("_rj.conv_id").alias("rejected_conv"),
    )


def context_fit(tr: DataFrame, budget_tokens: int = 64) -> DataFrame:
    """Context-window fitting for SFT assembly: keep the SUFFIX of each
    conversation that fits a token budget, cutting only at turn
    boundaries (training on the most recent turns is the standard trade
    when a conversation exceeds the model's context). Per turn: its
    whitespace-token count, the cumulative tokens from the conversation
    END down to this turn, and the keep flag ``cum_from_end <= budget``.
    Integer arithmetic only — hash-stable on any engine.

    Scale shape: ONE window (partition by conv_id, order by turn_idx
    desc, running sum) — a single hash exchange on the same conv_id key
    the CDC sink clusters by; no global sort, no join. Conversations are
    bounded (thousands of turns, not billions), so per-partition sort
    cost is flat."""
    from pyspark.sql import Window as W

    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (
        W.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return tr.select(
        "conv_id", "turn_idx", "role",
        toks.alias("n_tokens"),
    ).withColumn("cum_from_end", F.sum("n_tokens").over(w)).withColumn(
        "kept", F.col("cum_from_end") <= budget_tokens
    )


def tool_call_audit(tr: DataFrame) -> DataFrame:
    """Tool-call curation for agentic training data: audit every tool
    turn's arguments payload (a JSON string column ``tool_args``) — how
    many calls parse, how many carry the required argument, and the
    argument-validity share per tool in integer basis points. Malformed
    tool calls are the single most common defect in agent transcripts;
    this is the gate that drops them before SFT.

    Extraction is ``get_json_object`` (NULL on malformed input — the
    codegen'd JVM path, no Python) and the reduction is ONE combining
    hash aggregate keyed by tool name (tools are a tiny domain, so the
    exchange carries one row per tool per task)."""
    calls = tr.filter(F.col("tool").isNotNull()).select(
        "conv_id", "tool",
        F.get_json_object(F.col("tool_args"), "$.q").alias("_q"),
    )
    return calls.groupBy("tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        F.count("_q").cast("long").alias("n_valid"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.sum(F.when(F.col("_q").isNotNull(),
                     F.size(F.split(F.trim(F.col("_q")), r"\s+")))
              .otherwise(0)).cast("long").alias("q_tokens"),
    ).select(
        "tool", "n_calls", "n_valid", "n_convs", "q_tokens",
        F.expr("(n_valid * 10000) div n_calls").cast("long").alias("valid_bp"),
    )


def loss_mask_spans(tr: DataFrame) -> DataFrame:
    """Loss-mask span computation for SFT: after
    :func:`flatten_conversations` renders a conversation as ``role: text``
    lines, training loss is taken only on assistant turns. Emit each
    turn's token span ``[tok_start, tok_end)`` in the flattened document's
    whitespace-token space — a line contributes 1 token for the
    ``role:`` tag plus the text's token count — and the ``train_mask``
    flag the dataloader applies. Integer arithmetic only.

    Scale shape: ONE conv_id window (running sum in turn order) — the
    same single-exchange shape as context_fit, on the key the CDC sink
    already clusters by."""
    from pyspark.sql import Window as W

    line_toks = (
        F.lit(1) + F.size(F.split(F.trim(F.col("text")), r"\s+"))
    ).cast("long")
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = tr.select(
        "conv_id", "turn_idx", "role", line_toks.alias("n_line_tokens")
    ).withColumn("tok_end", F.sum("n_line_tokens").over(w).cast("long"))
    return out.select(
        "conv_id", "turn_idx", "role", "n_line_tokens",
        (F.col("tok_end") - F.col("n_line_tokens")).cast("long").alias("tok_start"),
        "tok_end",
        (F.col("role") == "assistant").alias("train_mask"),
    )


def turn_dedup(tr: DataFrame, min_convs: int = 3) -> DataFrame:
    """Corpus-wide boilerplate-TURN removal — the transcript analog of
    C4's line-level dedup (:func:`ticdc_spark.functions.textops.line_dedup`):
    an assistant turn whose normalized text (lowercased, whitespace
    collapsed) appears in >= ``min_convs`` DISTINCT conversations is
    canned boilerplate ("how can I help", templated refusals, retry
    apologies) and is dropped from EVERY conversation before SFT
    assembly; user/system/tool turns are never dropped (they are the
    prompt side). Each conversation is re-emitted as one row with kept /
    dropped counts and the reassembled kept-only document.

    Scale shape: the boilerplate-frequency aggregate is keyed on the
    normalized text with map-side combine (repeated turns collapse per
    task before the exchange); the surviving boilerplate set is tiny
    relative to the corpus, so the removal join broadcasts at cluster
    scale (left_anti on the normalized key); reassembly is ONE combining
    aggregate on conv_id — the key the CDC sink already clusters by —
    with array_sort restoring turn order (no window, no global sort)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    turns = tr.select("conv_id", "turn_idx", "role", "text",
                      norm.alias("_ntext"))
    boiler = (
        turns.filter(F.col("role") == "assistant")
        .groupBy("_ntext")
        .agg(F.countDistinct("conv_id").alias("_nc"))
        .filter(F.col("_nc") >= min_convs)
        .select("_ntext")
    )
    # ONE broadcast join + ONE conditional aggregate produce kept count,
    # dropped count and the reassembled document together — the
    # kept/dropped split-and-rejoin form evaluated the upstream
    # transcript derivation four times (boiler twice, kept, dropped).
    # collect_list skips the null structs of dropped turns; a
    # conversation whose every turn is boilerplate (impossible while
    # user/system turns are never dropped, but kept as an explicit gate)
    # is filtered exactly as the kept-side groupBy implied.
    joined = turns.join(
        F.broadcast(boiler.withColumn("_boiler", F.lit(True))),
        "_ntext", "left",
    )
    keep = (F.col("role") != "assistant") | F.col("_boiler").isNull()
    return (
        joined.groupBy("conv_id")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(~keep, 1).otherwise(0)).cast("long").alias("n_dropped"),
            F.array_sort(
                F.collect_list(F.when(keep, F.struct(
                    F.col("turn_idx").alias("i"),
                    F.concat_ws(": ", "role", "text").alias("l"),
                )))
            ).alias("_ls"),
        )
        .filter(F.col("n_kept") > 0)
        .select(
            "conv_id", "n_kept", "n_dropped",
            F.array_join(F.transform("_ls", lambda x: x["l"]), "\n").alias("doc"),
        )
    )
