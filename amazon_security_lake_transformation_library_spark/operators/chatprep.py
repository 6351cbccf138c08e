"""Training-example assembly over multi-turn transcripts.

The reference library stops at schema normalization
(``transformation_function/app.py`` emits OCSF rows — SURVEY.md §2.A);
these are the passes an LLM training pipeline runs NEXT on the
normalized transcript table to turn conversations into model inputs:

- :func:`render_conversations` — chat-template rendering: one training
  document per conversation, turns concatenated in ``turn_idx`` order
  with ``<|role|>`` headers (byte-deterministic, so the per-row
  invariant "per-turn text byte-equality under stable ordering"
  extends to the rendered document).
- :func:`loss_mask_spans` — per-turn character spans in that rendered
  document plus the loss mask (train only on the loss role's text, the
  standard SFT masking rule). Pure window cumsum — no render needed.
- :func:`conv_prefix_fingerprint` — conversation-prefix dedup: system
  prompts / few-shot preambles repeat across conversations; fingerprint
  the first ``k`` turns and mark every non-canonical holder.
- :func:`validate_turns` — structural QA per conversation: contiguous
  ``turn_idx`` from 0, user/assistant alternation (tool turns pass
  through), non-decreasing timestamps.
- :func:`context_budget` — context-window budgeting: cumulative token
  estimate from the conversation TAIL, keeping the most recent turns
  that fit — the truncation rule chat fine-tuning uses.

Every operator is a single-Exchange DataFrame program (one hash agg or
one window over ``conv_id``) built from JVM expressions only — no
Python in any per-row path — and each carries an exact DuckDB oracle in
``__spark_entry__.oracle_sql`` over the same parquet fixture.

Scale notes (10^12 turns): every shape here keys by ``conv_id``, so on
the conv_id-bucketed lakehouse layout (plans/bucketed.py) the Exchange
disappears entirely — these are the same zero-shuffle reads as the
flagship. :func:`render_conversations` materializes one row per
conversation; a pathological hot conversation (operators/salted.py
territory) should be length-capped or routed out BEFORE rendering —
the ``max_turns`` guard here is that cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------ turn segments


def _segment(role: str = "role", tool: str = "tool", text: str = "text") -> Column:
    """One turn's rendered segment: ``<|role|>`` or ``<|role:tool|>``
    header, newline, the turn text, newline. Pure string concat —
    byte-deterministic in any engine."""
    header = F.concat(
        F.lit("<|"),
        F.col(role),
        F.when(F.col(tool).isNotNull(), F.concat(F.lit(":"), F.col(tool))).otherwise(
            F.lit("")
        ),
        F.lit("|>\n"),
    )
    return F.concat(header, F.col(text), F.lit("\n"))


def _header_len(role: str = "role", tool: str = "tool") -> Column:
    # len("<|") + role + optional ":" + tool + len("|>\n")
    return (
        F.lit(2)
        + F.length(role)
        + F.coalesce(F.length(tool) + F.lit(1), F.lit(0))
        + F.lit(3)
    ).cast("long")


# ------------------------------------------------------- rendered documents


def render_conversations(t: DataFrame, max_turns: int | None = None) -> DataFrame:
    """One training document per conversation: segments concatenated in
    ``turn_idx`` order. Returns ``(conv_id, n_turns, rendered,
    rendered_len)``.

    Shape: one hash aggregate on ``conv_id`` (collect_list of
    (turn_idx, segment) structs — the one Exchange; zero on the
    bucketed layout), ``sort_array`` for deterministic order regardless
    of scan order, ``array_join`` back to a string. The ``transform``
    lambda touches only its own argument (never a computed outer array
    — the O(n^2) HOF re-evaluation trap recorded in BASELINE.md §7.6).

    ``max_turns`` caps how many leading turns render (the hot-entity
    guard): rows with ``turn_idx >= max_turns`` are filtered BEFORE the
    aggregate, so the cap also bounds per-group state at scale.
    """
    x = t if max_turns is None else t.filter(F.col("turn_idx") < F.lit(max_turns))
    segs = x.select(
        "conv_id",
        F.struct(F.col("turn_idx"), _segment().alias("seg")).alias("s"),
    )
    agg = segs.groupBy("conv_id").agg(
        F.sort_array(F.collect_list("s")).alias("ss")
    )
    rendered = F.array_join(F.transform("ss", lambda s: s["seg"]), "")
    return agg.select(
        "conv_id",
        F.size("ss").cast("long").alias("n_turns"),
        rendered.alias("rendered"),
        F.length(rendered).cast("long").alias("rendered_len"),
    )


# ---------------------------------------------------------- loss-mask spans


def loss_mask_spans(t: DataFrame, loss_role: str = "assistant") -> DataFrame:
    """Per-turn character spans inside :func:`render_conversations`'s
    document, computed WITHOUT rendering it: ``seg_start`` is the
    running sum of prior segment lengths (one window, ROWS frame),
    ``text_start``/``text_end`` bracket the turn's text plus its
    trailing newline, and ``loss`` marks the spans the training loss
    reads (the ``loss_role``'s text only — headers and other roles are
    masked, the standard SFT rule).

    Shape: ONE window (Exchange + Sort on ``conv_id``; zero Exchange on
    the bucketed layout) — the span arithmetic is in-row after the
    cumsum. Equality with the rendered document is pinned by
    tests (spans sliced out of ``rendered`` reproduce each turn's
    text byte-for-byte).
    """
    seg_len = (_header_len() + F.length("text") + F.lit(1)).cast("long")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg_start = F.coalesce(F.sum(seg_len).over(w), F.lit(0).cast("long"))
    text_start = seg_start + _header_len()
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        seg_start.alias("seg_start"),
        text_start.alias("text_start"),
        (text_start + F.length("text") + F.lit(1)).cast("long").alias("text_end"),
        (F.col("role") == F.lit(loss_role)).alias("loss"),
    )


# ------------------------------------------------------------- prefix dedup


def _prefix_fp_table(t: DataFrame, k: int) -> DataFrame:
    """``(conv_id, n_prefix_turns, prefix_fp)`` — md5 over the first
    ``k`` turns' ``role US text`` pieces (0x1f / 0x1e separators —
    unambiguous against any natural text). Prefix filter (k rows per
    conversation — the aggregate state is O(k), never
    conversation-length) -> one hash agg on ``conv_id``."""
    piece = F.concat(F.col("role"), F.lit("\x1f"), F.col("text"))
    return (
        t.filter(F.col("turn_idx") < F.lit(k))
        .select("conv_id", F.struct("turn_idx", piece.alias("p")).alias("s"))
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
        .select(
            "conv_id",
            F.size("ss").cast("long").alias("n_prefix_turns"),
            F.md5(
                F.array_join(F.transform("ss", lambda s: s["p"]), "\x1e")
            ).alias("prefix_fp"),
        )
    )


def conv_prefix_fingerprint(t: DataFrame, k: int = 4) -> DataFrame:
    """Conversation-prefix dedup: fingerprint the first ``k`` turns
    (:func:`_prefix_fp_table`), canonical holder = min ``conv_id`` per
    fingerprint. Returns ``(conv_id, n_prefix_turns, prefix_fp,
    canonical_conv, is_dup)``.

    Shape: one hash agg on ``conv_id`` -> one window on the
    fingerprint. The fingerprint table is |convs|-sized, not
    |turns|-sized, so the second Exchange is tiny.
    """
    pref = _prefix_fp_table(t, k)
    wfp = Window.partitionBy("prefix_fp")
    return pref.select(
        "*",
        F.min("conv_id").over(wfp).alias("canonical_conv"),
    ).withColumn("is_dup", F.col("conv_id") != F.col("canonical_conv"))


# -------------------------------------------------------- structural checks


def validate_turns(t: DataFrame) -> DataFrame:
    """Per-conversation structural QA: ``(conv_id, n_turns,
    idx_contiguous, roles_alternate, ts_monotone, ok)``.

    * ``idx_contiguous`` — turn_idx is exactly 0..n-1 (min 0, max n-1,
      distinct count n).
    * ``roles_alternate`` — among non-tool turns, no two consecutive
      share a role (tool turns are transparent, as in agent traces).
    * ``ts_monotone`` — ts never decreases in turn order (ties allowed).

    Shape: one window pass for the lag comparisons + one hash agg of
    bool_and/min/max — both keyed on ``conv_id`` (zero Exchange on the
    bucketed layout).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wr = Window.partitionBy("conv_id", F.col("role") != F.lit("tool")).orderBy(
        "turn_idx"
    )
    x = t.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        (F.col("ts") >= F.coalesce(F.lag("ts").over(w), F.col("ts"))).alias("_ts_ok"),
        F.when(
            F.col("role") == F.lit("tool"), F.lit(True)
        ).otherwise(
            F.col("role") != F.coalesce(F.lag("role").over(wr), F.lit(""))
        ).alias("_alt_ok"),
    )
    return x.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (
            (F.min("turn_idx") == F.lit(0))
            & (F.max("turn_idx") == F.count(F.lit(1)) - F.lit(1))
            & (F.count_distinct("turn_idx") == F.count(F.lit(1)))
        ).alias("idx_contiguous"),
        F.bool_and("_alt_ok").alias("roles_alternate"),
        F.bool_and("_ts_ok").alias("ts_monotone"),
    ).withColumn(
        "ok",
        F.col("idx_contiguous") & F.col("roles_alternate") & F.col("ts_monotone"),
    )


# --------------------------------------------------------- boilerplate turns


def boilerplate_turns(
    t: DataFrame, role: str = "assistant", min_convs: int = 3
) -> DataFrame:
    """Templated-response detection: the same ``role`` text occurring in
    ``min_convs``+ distinct conversations is boilerplate (canned
    greetings, refusal templates, tool preambles) — the transcript
    analogue of corpus-level exact dedup, at turn granularity. Returns
    one row per boilerplate text: ``(text_fp, n_convs, n_occurrences,
    text)``.

    Shape: role filter -> ONE hash aggregate keyed by md5(text) (the
    128-bit key shuffles, never the text bodies twice — min(text)
    carries one copy per group for auditability; count_distinct plans
    as the standard two-phase partial-distinct agg). Output is
    |distinct templated texts|, a vanishing fraction of the corpus.
    """
    return (
        t.filter(F.col("role") == F.lit(role))
        .groupBy(F.md5("text").alias("text_fp"))
        .agg(
            F.count_distinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("text").alias("text"),
        )
        .filter(F.col("n_convs") >= F.lit(min_convs))
    )


# --------------------------------------------------------- conversation profile


def conv_profile(t: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Conversation-level profile table — the per-entity summary a
    curation pass filters and stratifies on: ``(conv_id, n_turns,
    n_sessions, n_tool_calls, n_assistant_turns, assistant_char_frac,
    duration_s, mean_gap_s)``.

    Shape: one lag window for inter-turn gaps + one conv_id hash agg —
    the same single Exchange+Sort as the flagship's feature block
    (zero Exchange on the bucketed layout). ``n_sessions`` counts gap >
    ``gap_seconds`` breaks exactly like the flagship's sessionizer, so
    the two agree by construction.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    ).cast("double") / F.lit(1e6)
    x = t.select(
        "conv_id",
        "role",
        "tool",
        F.length("text").cast("long").alias("_chars"),
        "ts",
        gap.alias("_gap"),
    )
    total_chars = F.sum("_chars")
    asst_chars = F.sum(F.when(F.col("role") == "assistant", F.col("_chars")).otherwise(F.lit(0)))
    return x.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (
            F.lit(1)
            + F.sum(F.when(F.col("_gap") > gap_seconds, 1).otherwise(0))
        ).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).cast("long").alias("n_tool_calls"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).cast("long").alias("n_assistant_turns"),
        (asst_chars.cast("double") / total_chars.cast("double")).alias("assistant_char_frac"),
        (
            (F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))).cast("double")
            / F.lit(1e6)
        ).alias("duration_s"),
        F.avg("_gap").alias("mean_gap_s"),
    )


# ------------------------------------------------------ context-window budget


def context_budget(
    t: DataFrame, budget_tokens: int, chars_per_token: int = 4, overhead: int = 4
) -> DataFrame:
    """Context-window truncation from the tail: estimate each turn's
    token count (``ceil(len(text)/chars_per_token) + overhead`` for the
    header), cumulate from the LAST turn backwards, and keep the suffix
    that fits ``budget_tokens`` — chat fine-tuning's "most recent turns
    win" rule. Returns ``(conv_id, turn_idx, est_tokens,
    cum_from_end, keep)``; a turn is kept iff the whole suffix starting
    at it fits.

    Shape: one window (Exchange + Sort on ``conv_id``, descending
    turn_idx; zero Exchange bucketed) — the same single-frame cumsum as
    the flagship's features, just reversed.
    """
    est = (
        F.ceil(F.length("text") / F.lit(float(chars_per_token))) + F.lit(overhead)
    ).cast("long")
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(est).over(w)
    return t.select(
        "conv_id",
        "turn_idx",
        est.alias("est_tokens"),
        cum.alias("cum_from_end"),
        (cum <= F.lit(budget_tokens)).alias("keep"),
    )


# --------------------------------------------------------------- SFT pairs


def sft_pairs(
    t: DataFrame,
    response_role: str = "assistant",
    max_prompt_turns: int | None = None,
) -> DataFrame:
    """Supervised fine-tuning pair extraction: one training example per
    ``response_role`` turn — the rendered context that precedes it as
    the prompt, the turn's own text as the response. Returns
    ``(conv_id, turn_idx, n_prompt_turns, prompt, response)``; turns
    with an empty context (``turn_idx == 0``) are dropped (no prompt to
    condition on).

    The prompt is the same byte-deterministic segment stream
    :func:`render_conversations` emits, so a pair's prompt is exactly a
    prefix slice of the conversation's rendered document (pinned by
    test). ``max_prompt_turns`` bounds the context to the most recent
    N turns — at 10^12 turns the UNBOUNDED form materializes
    O(sum n_i^2) prompt bytes (every turn re-carries its prefix), so
    production pairs cap the context exactly like
    :func:`context_budget` caps the fine-tuning window.

    Shape: ONE window over ``conv_id`` (Exchange + Sort; zero Exchange
    on the conv_id-bucketed layout) with a trailing ROWS frame —
    ``collect_list`` over the frame preserves frame order, so no
    re-sort of the collected segments is needed. The response filter
    prunes AFTER the window (every turn is some prompt's suffix, so the
    window must see all rows), but Catalyst still prunes unread columns
    from the scan.
    """
    lo = Window.unboundedPreceding if max_prompt_turns is None else -int(max_prompt_turns)
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(lo, -1)
    )
    prompt_arr = F.collect_list(_segment()).over(w)
    return (
        t.select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("text").alias("response"),
            prompt_arr.alias("_p"),
        )
        .filter((F.col("role") == F.lit(response_role)) & (F.col("turn_idx") > 0))
        .select(
            "conv_id",
            "turn_idx",
            F.size("_p").cast("long").alias("n_prompt_turns"),
            F.array_join("_p", "").alias("prompt"),
            "response",
        )
    )


# --------------------------------------------------------------- tool chains


def tool_chains(t: DataFrame, min_convs: int = 1) -> DataFrame:
    """Tool-call sequence mining: the ordered sequence of tool
    invocations per conversation, aggregated across the corpus — the
    agent-transcript analogue of n-gram mining (which tool pipelines do
    agents actually run?). Returns one row per distinct chain:
    ``(chain, n_calls, n_convs)``, tool names joined with ``>``.
    Conversations that never call a tool don't emit a chain.

    ``n_calls`` is a property of the chain string itself (same sequence
    => same length), so the second aggregate carries it with ``first``
    — no reconciliation join.

    Shape: tool-turn filter (pushed to the scan) -> one conv_id hash
    agg (sort_array(collect_list) for scan-order independence; zero
    Exchange on the bucketed layout) -> one chain hash agg over the
    |convs|-sized intermediate. Per-group state is the conversation's
    tool-call count, bounded by the same hot-entity caps as rendering.
    """
    per_conv = (
        t.filter(F.col("tool").isNotNull())
        .select(
            "conv_id",
            F.struct(F.col("turn_idx"), F.col("tool")).alias("s"),
        )
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
        .select(
            "conv_id",
            F.array_join(F.transform("ss", lambda s: s["tool"]), ">").alias("chain"),
            F.size("ss").cast("long").alias("n_calls"),
        )
    )
    return (
        per_conv.groupBy("chain")
        .agg(
            F.first("n_calls").alias("n_calls"),
            F.count_distinct("conv_id").alias("n_convs"),
        )
        .filter(F.col("n_convs") >= F.lit(min_convs))
    )


# -------------------------------------------------- conversation-level near-dup


def conv_near_dup_pairs(
    t: DataFrame,
    max_turns: int | None = None,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Conversation-level near-duplicate candidates: MinHash+LSH over the
    RENDERED conversation — re-running a shared system prompt + largely
    identical dialogue produces near-identical rendered documents, which
    per-turn exact dedup (:func:`boilerplate_turns`) and prefix dedup
    (:func:`conv_prefix_fingerprint`) both miss when any single turn
    diverges. Returns ``(doc_a, doc_b, n_shared_bands)`` with conv_ids
    as the doc keys.

    Pure composition — :func:`render_conversations` feeds
    ``operators.dedup.minhash_candidate_pairs`` unchanged, so the LSH
    scale properties (banded bucket join, never all-pairs) carry over,
    and the corpus-side cost is ONE conv_id aggregate + the signature
    scan over |convs| rendered rows (not |turns|). ``max_turns`` is the
    hot-entity cap rendering already enforces.
    """
    from .dedup import minhash_candidate_pairs

    docs = render_conversations(t, max_turns=max_turns).select(
        F.col("conv_id").alias("doc_id"), F.col("rendered").alias("text")
    )
    return minhash_candidate_pairs(
        docs, "text", "doc_id", n_hashes=n_hashes, band_size=band_size
    )


# -------------------------------------------------------- preference pairs


def preference_pairs(
    t: DataFrame,
    k_prefix: int = 2,
    score: Column | None = None,
) -> DataFrame:
    """DPO/RLHF preference-pair mining: conversations that share an
    IDENTICAL ``k_prefix``-turn prompt prefix are alternative
    continuations of the same prompt; within each such group, pair the
    best-scoring first response against the worst as
    ``(chosen, rejected)``.

    The response is the first assistant turn at ``turn_idx >=
    k_prefix``; ``score`` ranks it (default: response length — a
    documented deterministic proxy; pass a rating/reward Column when
    the table carries one; evaluated against the response row). Groups
    need >= 2 candidate conversations AND a strict score gap —
    all-tied groups emit nothing (a pair with no preference signal is
    noise). Within the winners, ties break on ``conv_id`` via a
    lexicographic ``(score, conv_id)`` max/min, so output is
    deterministic under any partitioning.

    Returns one row per qualifying prefix group: ``(prefix_fp,
    n_candidates, chosen_conv, chosen_response, chosen_score,
    rejected_conv, rejected_response, rejected_score)``.

    Shape: two conv_id-keyed hash aggs (prefix fingerprint over
    ``turn_idx < k`` rows; response pick = one ``min(struct)`` over
    assistant rows) -> conv_id equi-join of two |convs|-sized tables ->
    one hash agg on ``prefix_fp`` (|convs| input rows). On the
    conv_id-bucketed layout the first three steps are Exchange-free;
    the final agg shuffles |convs| skinny rows, never turns. No
    self-join: the group agg with max_by/min_by replaces the quadratic
    candidate-pairing a naive implementation would do.
    """
    fps = _prefix_fp_table(t, k_prefix).select("conv_id", "prefix_fp")
    resp = (
        t.filter(
            (F.col("role") == F.lit("assistant"))
            & (F.col("turn_idx") >= F.lit(k_prefix))
        )
        .groupBy("conv_id")
        .agg(F.min(F.struct("turn_idx", "text")).alias("r"))
        .select("conv_id", F.col("r.text").alias("response"))
    )
    cand = fps.join(resp, "conv_id")
    s = (score if score is not None else F.length("response")).cast("double")
    cand = cand.select("conv_id", "prefix_fp", "response", s.alias("score"))

    pick = F.struct("conv_id", "response", "score")
    ordkey = F.struct("score", "conv_id")
    g = cand.groupBy("prefix_fp").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max_by(pick, ordkey).alias("ch"),
        F.min_by(pick, ordkey).alias("rj"),
        F.max("score").alias("_smax"),
        F.min("score").alias("_smin"),
    )
    return (
        g.filter((F.col("n_candidates") >= 2) & (F.col("_smax") > F.col("_smin")))
        .select(
            "prefix_fp",
            "n_candidates",
            F.col("ch.conv_id").alias("chosen_conv"),
            F.col("ch.response").alias("chosen_response"),
            F.col("ch.score").alias("chosen_score"),
            F.col("rj.conv_id").alias("rejected_conv"),
            F.col("rj.response").alias("rejected_response"),
            F.col("rj.score").alias("rejected_score"),
        )
    )


# ---------------------------------------------------------- turn repair


def repair_turns(t: DataFrame) -> DataFrame:
    """Structural auto-repair — the cleaning pass that makes real-world
    transcripts satisfy :func:`validate_turns`'s index contract:

    1. duplicate ``(conv_id, turn_idx)`` rows collapse to ONE —
       the row with the lexicographically-largest
       ``(ts, md5(role|tool|text))`` wins (latest write wins; the md5
       over ALL payload columns breaks exact-ts ties deterministically
       under any partitioning);
    2. surviving rows are REINDEXED to contiguous ``turn_idx`` 0..n-1
       in ``(turn_idx, ts, md5(text))`` order, healing gaps from
       dropped/filtered turns.

    Timestamps are never modified — repairing ``ts_monotone`` would
    fabricate data; rows keep their original ts and the caller decides
    whether a non-monotone conversation is usable
    (:func:`validate_turns` still reports it). Idempotent by
    construction: on already-clean input both steps are the identity
    (pinned by test).

    Returns the input columns with ``turn_idx`` rewritten, plus
    ``orig_turn_idx`` and ``was_dup`` (true when the row displaced at
    least one duplicate) for lineage.

    Shape: ONE Exchange on ``conv_id`` (zero on the bucketed layout)
    carrying two same-partition windows — the dedup rank orders by
    ``(turn_idx, ts desc, md5 desc)``, the reindex by ``(turn_idx, ts,
    md5)``; Catalyst plans them as stacked Window nodes over one sort
    family, and every other step is in-row.
    """
    # the tie-break fingerprint covers EVERY payload column, not just
    # text — two replays differing only in role/tool must still collapse
    # deterministically under any partitioning (and identically in the
    # DuckDB oracle, which builds the same separator-joined hash)
    fp = F.md5(
        F.concat_ws(
            "\x1f",
            F.coalesce(F.col("role"), F.lit("")),
            F.coalesce(F.col("tool"), F.lit("")),
            F.coalesce(F.col("text"), F.lit("")),
        )
    )
    wd = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").desc(), fp.desc()
    )
    wn = Window.partitionBy("conv_id", "turn_idx")
    ranked = t.select(
        "*",
        F.row_number().over(wd).alias("__keep_rank"),
        (F.count(F.lit(1)).over(wn) > 1).alias("was_dup"),
    ).filter(F.col("__keep_rank") == 1)

    wr = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx"), F.col("ts"), fp
    )
    out_cols = [c for c in t.columns if c != "turn_idx"]
    return ranked.select(
        *out_cols,
        F.col("turn_idx").alias("orig_turn_idx"),
        (F.row_number().over(wr) - F.lit(1)).alias("turn_idx"),
        "was_dup",
    )


def response_latency_profile(t: DataFrame) -> DataFrame:
    """Per-conversation assistant responsiveness: over the user->assistant
    turn transitions, ``(conv_id, n_responses, mean_latency_us,
    p50_latency_us, p95_latency_us, max_latency_us)`` — latency is the
    gap from a user turn to the immediately following assistant turn.
    The agent-quality feature a curation pass thresholds on (slow tool
    loops, stalled conversations) and a serving dashboard trends.

    Latencies stay INTEGER MICROSECONDS through the aggregates (the
    engine's duration_us convention): dividing micros by 1e6 first puts
    every value's 5th decimal on an exact ..50 tie, where Spark
    (shortest-decimal HALF_UP) and a binary-faithful engine round(x, 4)
    disagree — integer-domain aggregates only hit such ties on
    measure-zero inputs.

    Shape: ONE conv_id window (lag of ts and role — the flagship's
    Exchange+Sort, zero Exchange on the bucketed layout) then one conv_id
    hash aggregate on the same key. Exact percentiles buffer only each
    conversation's response gaps on the reducer (bounded by max turns per
    conversation). Conversations with no user->assistant transition are
    absent from the output (no latency is defined there).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    x = t.select(
        "conv_id",
        "role",
        F.lag("role").over(w).alias("_prev_role"),
        lat.alias("_lat"),
    ).where((F.col("role") == "assistant") & (F.col("_prev_role") == "user"))
    return x.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_responses"),
        (F.round(F.avg("_lat"), 4) + F.lit(0.0)).alias("mean_latency_us"),
        (F.round(F.expr("percentile(_lat, 0.5)"), 4) + F.lit(0.0)).alias(
            "p50_latency_us"
        ),
        (F.round(F.expr("percentile(_lat, 0.95)"), 4) + F.lit(0.0)).alias(
            "p95_latency_us"
        ),
        F.max("_lat").alias("max_latency_us"),
    )
