"""Behavioral / corpus analytics operators: funnels, retention
cohorts, TF-IDF, k-NN label voting, deterministic training shuffle,
span-level contamination.

Beyond-reference additions (the reference is a batch ETL gem with no
event analytics — SURVEY §1.1); these are the OLAP and training-data
operators a 100 TB pipeline runs daily. All pure DataFrame
compositions — no UDFs, every shuffle keyed and commented.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from voter_gateway_spark.operators.dedup_ops import shingle_hash60, word_shingles
from voter_gateway_spark.session import ckpt_lazy


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: a user reaches stage i when an event of type
    stages[i] occurs AT OR AFTER their first stage i-1 event. Output is
    one row per stage: (stage_idx, stage, n_users, conversion) with
    conversion = n_users / stage-1 users, rounded to 6.

    Plan shape: one pass per stage, each a filter + per-user min — the
    per-user frame stays (user_id, ts) so N stages cost N small keyed
    shuffles, not an N-way self-join of the raw events. At 100 TB the
    events scan happens once per stage with the type filter pushed
    down; per-user state is one timestamp."""
    reached: DataFrame | None = None
    counts = []
    for i, stage in enumerate(stages):
        ev = events.where(F.col(type_col) == stage).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if reached is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_first"))
        else:
            cur = (
                ev.join(reached, "_u")
                .where(F.col("_ts") >= F.col("_first"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_first"))
            )
        # each stage count embeds the whole prefix chain; without the
        # shared materialization the N-branch union re-runs stage 1's
        # scan up to N times (same hazard as tfidf's tf reuse)
        reached = cur.transform(ckpt_lazy)
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w = Window.orderBy("stage_idx")
    return out.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            F.col("n_users") / F.lag("n_users", 1, None).over(w), 6
        ).alias("conversion"),
    )


def retention_cohorts(
    events: DataFrame,
    max_offset_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily retention triangle: cohort = a user's first active day;
    for each day offset 0..max, how many of the cohort were active.
    Output: (cohort_date, day_offset, n_users).

    Two keyed shuffles: per-user first-day (groupBy user), then the
    distinct (user, day) activity set joins the cohort map and
    aggregates — activity rows carry only (user, date). Cohort date
    formats as yyyy-MM-dd text for engine-portable hashing."""
    day = F.to_date(F.col(ts_col))
    first = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(day).alias("_cohort")
    )
    active = events.select(
        F.col(user_col).alias("_u"), day.alias("_day")
    ).distinct()
    return (
        active.join(first, "_u")
        .select(
            "_u",
            "_cohort",
            F.datediff(F.col("_day"), F.col("_cohort")).alias("day_offset"),
        )
        .where(F.col("day_offset").between(0, max_offset_days))
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_date"),
            "day_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
    min_len: int = 3,
) -> DataFrame:
    """Per-document top-k TF-IDF terms over lowercase whitespace
    tokens of length >= min_len. tfidf = tf * ln(N / df), rounded to 6;
    ties break on ascending term. Output: (doc_id, term, tf, tfidf,
    rank).

    Plan shape: one explode → two aggregations. tf = count per
    (doc, term); df = distinct-doc count per term derived from the tf
    frame (no second pass over text); N is a broadcast scalar via a
    cross-joined 1-row aggregate, not a collect. The window top-k uses
    WindowGroupLimit, so per-doc candidate lists rank partially before
    the final shuffle."""
    from voter_gateway_spark.operators.text import normalized

    # the ONE canonical normalize pass (text.normalized) — an inline
    # copy of the formula here could silently drift from every other
    # operator and from the DuckDB oracle
    toks = F.filter(
        F.split(F.lower(normalized(text_col)), " "),
        lambda t: F.length(t) >= min_len,
    )
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # both tf and df derive from this frame; without the checkpoint
        # Catalyst re-runs the explode+aggregate subtree once per branch
        # (two full text scans at 100 TB). Lazy local checkpoint: the
        # first action materializes the (much smaller) aggregated frame
        # once and both branches share it.
        .transform(ckpt_lazy)
    )
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("_df")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "term", "tf", "tfidf", F.col("rank").cast("int"))
    )


def knn_label_vote(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    broadcast_labels: bool = False,
) -> DataFrame:
    """k-NN classification: each query's label predicted by majority
    vote among its k nearest corpus vectors (cosine; self excluded).
    Ties break on ascending label. Output: (vec_id, predicted_label,
    votes).

    Composes brute_force_topk (the exact baseline — swap in ivf_topk /
    lsh_bucketed_topk for the blocked scale path, same output contract)
    with a label join and a per-query vote window. The label frame is
    O(corpus), so the join strategy is left to the planner by default —
    AQE broadcasts it when statistics say it fits, and falls back to a
    shuffle join when a 100 TB corpus would OOM the driver under a
    forced hint. `broadcast_labels=True` opts into the hint for callers
    that KNOW the label table is small."""
    from voter_gateway_spark.operators.similarity import brute_force_topk

    nn = brute_force_topk(queries, corpus, k=k, id_col=id_col, vec_col=vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("_lbl")
    )
    votes = (
        nn.join(F.broadcast(labels) if broadcast_labels else labels, "neighbor_id")
        # unlabeled corpus rows occupy top-k slots but cast NO vote —
        # without this, Spark's asc (nulls FIRST) would let NULL win
        # vote ties and be emitted as predicted_label, and diverge
        # from engines that sort nulls last (a query whose every
        # neighbor is unlabeled is absent from the output)
        .where(F.col("_lbl").isNotNull())
        .groupBy(F.col("query_id").alias(id_col), "_lbl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("votes"), F.asc("_lbl"))
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("_lbl").alias("predicted_label"), "votes")
    )


def training_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training-data serving: every
    row gets a (shard, pos) address that is a pure function of its key
    — reproducible across runs, engines, and cluster layouts, and
    statistically order-destroying (md5 ordering decorrelates from any
    crawl/source order). Output: original columns + (shard, pos).

    Plan shape — two-phase numbering, the prefix_sum pattern: range-
    partition by (shard, md5) into `partitions` tasks, count rows per
    (shard, range-partition), cumsum those counts per shard on the
    driver (O(partitions × shards) rows), broadcast the base offsets
    back, and number locally within each (shard, partition) slice.
    pos = base + local row_number. No window ever spans more than one
    range partition, so there is NO single-task-per-shard reducer: the
    old partitionBy(shard) window put ~1/n_shards of ALL rows through
    one task (12.5 TB at 100 TB with the default 8 shards). At 100 TB,
    write with .repartition("shard").sortWithinPartitions("pos") for
    sequential-read training shards; no global sort ever happens.

    `id_col` must be unique: rows sort on (md5(id), id) so duplicate
    ids hash identically and their relative pos would be range-boundary
    dependent (same caveat as relational.prefix_sum's order_col)."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    # shard derives from the same 60-bit prefix as md5_hash60; the full
    # hex string also orders rows within the shard, so it stays a column
    ranged = (
        df.withColumn("_h", h)
        .withColumn(
            "shard",
            (F.conv(F.substring("_h", 1, 15), 16, 10).cast("bigint") % n_shards)
            .cast("int"),
        )
        # range order = (shard, hash) order, so each partition holds one
        # contiguous slice of exactly one-or-more shard runs; lazy local
        # checkpoint lets the counts collect and the final plan share one
        # materialization of the range shuffle
        .repartitionByRange(n, F.col("shard"), F.col("_h"))
        .withColumn("_pid", F.spark_partition_id())
        .transform(ckpt_lazy)
    )
    counts = (
        ranged.groupBy("shard", "_pid")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy("shard", "_pid")
        .collect()
    )
    base, acc = [], {}
    for r in counts:
        base.append((r["shard"], r["_pid"], acc.get(r["shard"], 0)))
        acc[r["shard"]] = acc.get(r["shard"], 0) + r["_c"]
    bases = df.sparkSession.createDataFrame(
        base or [(0, 0, 0)], "shard int, _pid int, _base bigint"
    )
    # every window group is one (shard, partition) slice — bounded by
    # the range partition size, never a whole shard. Secondary sort on
    # the key string makes in-slice ordering deterministic.
    w = Window.partitionBy("shard", "_pid").orderBy(
        "_h", F.col(id_col).cast("string")
    )
    return (
        ranged.join(F.broadcast(bases), ["shard", "_pid"], "left")
        .withColumn(
            "pos",
            (F.coalesce("_base", F.lit(0)) + F.row_number().over(w)).cast("bigint"),
        )
        .drop("_h", "_pid", "_base")
    )


def contamination_spans(
    eval_df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_matched: int = 5,
    collapse_train: bool = True,
) -> DataFrame:
    """Span-level train/eval contamination: for each (eval, train)
    document pair, how many of the eval doc's shingle POSITIONS match
    shingles present in that train doc, and the longest consecutive
    run of matched positions (the verbatim-copy length signal that
    doc-level overlap ratios blur out). Output: (eval_id, train_id,
    n_matched, max_run) for pairs with n_matched >= min_matched.

    Plan shape: eval shingles ride positionally (posexplode, hash per
    position); the train side is a DISTINCT (doc, hash) index. The
    equi-join on the 60-bit hash shuffles only (ids, pos, hash); runs
    are gaps-and-islands (pos - row_number) — two keyed aggregations,
    no self-join. At 100 TB the train index dominates; it partitions
    by hash and streams, and min_matched prunes the pair fanout before
    the island window.

    `collapse_train` (DEFAULT ON) is the crawl-duplication lever
    (measured: the 10× key-offset stress makes every train doc 10-way
    duplicated and pair output grows ~d² — 2.2s → 16.5s): train docs
    with IDENTICAL distinct-shingle sets collapse to their min-id
    representative before pairing, so `train_id` reports the rep and
    pair work returns to corpus-unique cost. Duplicate copies match
    identically by construction, so no contamination evidence is lost
    — only repeated. On crawl corpora the all-pairs form is the first
    query to die at 100×, so it is opt-in (`collapse_train=False`)
    for callers that need every duplicate train_id enumerated; the
    oracle-checked catalog query pins the collapsed form.

    `id_col` must be unique per eval_df ROW (the same precondition as
    training_shuffle's id_col and prefix_sum's order_col): the matched
    frame's uniqueness on (eval, train, pos) — which lets the island
    window run without a defensive distinct — is derived from one
    posexplode row per (eval_id, pos). Duplicate eval rows under one
    id would interleave positions and corrupt run lengths."""
    ev = eval_df.select(
        F.col(id_col).alias("_eid"),
        F.posexplode(word_shingles(text_col, k=k, distinct=False)).alias(
            "_pos", "_sh"
        ),
    ).select("_eid", "_pos", shingle_hash60(F.col("_sh")).alias("_h"))
    tr_sets = train_df.select(
        F.col(id_col).alias("_tid"),
        F.array_sort(
            F.transform(
                word_shingles(text_col, k=k, distinct=True),
                lambda s: shingle_hash60(s),
            )
        ).alias("_hh"),
    )
    if collapse_train:
        fp = F.md5(
            F.concat_ws(",", F.transform("_hh", lambda h: h.cast("string"))).cast("binary")
        )
        tr_sets = (
            tr_sets.select("_tid", "_hh", fp.alias("_fp"))
            .groupBy("_fp")
            .agg(F.min("_tid").alias("_tid"), F.first("_hh").alias("_hh"))
            .drop("_fp")
        )
    tr = tr_sets.select("_tid", F.explode("_hh").alias("_h")).distinct()
    # (eid, tid, pos) is already unique here: ev carries one row per
    # (eid, pos) and tr is distinct on (tid, h), so the equi-join can't
    # duplicate — a distinct() at this point is a full extra shuffle +
    # hash-aggregate of the largest intermediate for nothing (removing
    # it measured 59s -> 24s on the 100x replica)
    matched = ev.join(tr, "_h").select("_eid", "_tid", "_pos")
    w = Window.partitionBy("_eid", "_tid").orderBy("_pos")
    islands = matched.withColumn(
        "_grp", F.col("_pos") - F.row_number().over(w)
    )
    runs = islands.groupBy("_eid", "_tid", "_grp").agg(
        F.count(F.lit(1)).alias("_run")
    )
    return (
        runs.groupBy("_eid", "_tid")
        .agg(F.sum("_run").alias("n_matched"), F.max("_run").alias("max_run"))
        .where(F.col("n_matched") >= min_matched)
        .select(
            F.col("_eid").alias("eval_id"),
            F.col("_tid").alias("train_id"),
            F.col("n_matched").cast("bigint"),
            F.col("max_run").cast("bigint"),
        )
    )


def session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    max_len: int = 8,
) -> DataFrame:
    """Session path mining: gap-sessionize per user (the SESSION_SQL
    lag/sum form — identical boundaries to the session_window operator),
    render each session as its ordered event-type sequence capped at
    `max_len` steps ('a>b>c>+' marks truncation), and aggregate per
    path. The behavioral-sequence feature prep a funnel/recommender
    pipeline runs: which journeys exist and how heavy each is.

    Plan: one key shuffle for the two stacked user-windows (lag + the
    running session counter share partitioning and ordering — one Sort);
    the per-session rank window and the (user, sid) aggregation reuse
    the same hash distribution (HashPartitioning(user) satisfies
    clustering on (user, sid) — no second exchange). The collected
    array is BOUNDED at max_len+1 structs per session BEFORE the
    collect (collect_list over a rank-gated when(): a bot user with a
    million-event session contributes max_len+1 rows of window state,
    never the whole session), while the true event count rides in the
    same aggregation. collect_list is order-nondeterministic across
    retries, so the struct array is array_sort-ed on (time, id) — the
    deterministic render both engines agree on."""
    us = F.unix_micros(F.col(time_col))
    e = events.select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_e"),
        F.col(type_col).alias("_t"),
        us.alias("_us"),
    )
    w = Window.partitionBy("_u").orderBy("_us", "_e")
    lag_us = F.lag("_us").over(w)
    m = e.withColumn(
        "_new",
        F.when(
            lag_us.isNull()
            | ((F.col("_us") - lag_us) >= gap_seconds * 1_000_000),
            1,
        ).otherwise(0),
    )
    g = m.withColumn(
        "_sid",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # rank order includes the type as the final key: rows tying on
    # (time, id) — duplicate event ids in a feed — would otherwise make
    # the rank gate retry-nondeterministic at the max_len+1 boundary
    # (r7 code review); array_sort below sorts by the same triple
    ws = Window.partitionBy("_u", "_sid").orderBy("_us", "_e", "_t")
    ranked = g.withColumn("_rn", F.row_number().over(ws))
    sess = ranked.groupBy("_u", "_sid").agg(
        F.array_sort(
            F.collect_list(
                # collect_list drops NULLs, so the rank gate bounds the
                # array at max_len+1 structs (enough to detect overflow)
                F.when(
                    F.col("_rn") <= max_len + 1,
                    F.struct(F.col("_us"), F.col("_e"), F.col("_t")),
                )
            )
        ).alias("_evs"),
        F.count(F.lit(1)).alias("_ne"),
    )
    return render_session_paths(sess, max_len)


def render_session_paths(sess: DataFrame, max_len: int = 8) -> DataFrame:
    """Path render + rollup over per-session rows of (_evs: sorted
    array<struct<_us,_e,_t>>, _ne: true event count): first max_len
    types joined with '>', '>+' marking truncation, aggregated per
    path. Shared by the batch window form (session_paths) and the
    streaming session_window form (streaming.events.
    stream_session_collect) so stream-vs-batch parity is a property of
    ONE renderer, not two copies."""
    head = F.transform(F.slice("_evs", 1, max_len), lambda s: s["_t"])
    path = F.when(
        F.col("_ne") > max_len,
        F.concat(F.concat_ws(">", head), F.lit(">+")),
    ).otherwise(F.concat_ws(">", head))
    return (
        sess.select(path.alias("path"), "_ne")
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("_ne").cast("bigint").alias("n_events"),
        )
    )
