"""Fellegi–Sunter probabilistic record linkage.

The reference's matching surface is an ordered exact cascade
(lib/voter_file/csv_driver/record_matcher.rb) plus trigram fuzzy top-1
(lib/voter_file/csv_driver/fuzzy_merger.rb:48-68). This module adds the
standard PROBABILISTIC rung of the same job — the Fellegi & Sunter
(1969) model used by modern voter-roll / census linkage (and by Splink,
the public large-scale implementation): blocked candidate pairs →
per-field agreement vector γ → log₂ likelihood-ratio match weight
Σᵢ [γᵢ·log₂(mᵢ/uᵢ) + (1−γᵢ)·log₂((1−mᵢ)/(1−uᵢ))] → optional EM
estimation of the (m, u, λ) parameters from the unlabeled pairs.

Spark-first shape, sized for ~10⁹ candidate pairs:

- **Blocking is a union of equi-joins** (Splink's blocking-rule list):
  each rule is a conjunction of (source_expr = target_expr) equalities,
  so every rule is a plain shuffled/broadcast hash join Catalyst can
  plan; the union is de-duplicated on the pair key. At least one rule
  should be high-cardinality (name/key-derived) so pair counts stay
  near-linear; low-cardinality recall rules are additive and their
  block sizes are the disclosed quadratic term.
- **Scoring is whole-stage-codegen arithmetic** — the field weights are
  Python-computed double literals folded into the projection, so the
  score pass is a zero-shuffle scan over the pairs.
- **EM never iterates over the pairs.** The agreement vector is binary
  per field, so pairs compress losslessly into ≤2^k pattern counts —
  ONE exact integer aggregation over the pair table. Every EM iteration
  is then driver-side arithmetic over those ≤2^k rows (the same
  size-gate-to-driver shape as bpe.bpe_train_local): at 10⁹ pairs the
  whole EM costs one groupBy, not `iters` distributed passes.
  Parameters are rounded to `param_digits` each M-step so the
  trajectory is bit-reproducible cross-engine.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldWeights:
    """Per-field (m, u) probabilities: m = P(agree | match),
    u = P(agree | non-match)."""

    m: float
    u: float

    def agree_weight(self) -> float:
        return math.log2(self.m / self.u)

    def disagree_weight(self) -> float:
        return math.log2((1.0 - self.m) / (1.0 - self.u))


@dataclass(frozen=True)
class GradedWeights:
    """Multi-level comparison weights (Splink's comparison levels):
    m[l] = P(level l | match), u[l] = P(level l | non-match), level 0
    = most different, level len−1 = exact. Each distribution should
    sum to 1 over its levels."""

    m: tuple
    u: tuple

    def __post_init__(self):
        if len(self.m) != len(self.u) or len(self.m) < 2:
            raise ValueError("GradedWeights needs equal-length m/u, >= 2 levels")

    def level_weight(self, level: int) -> float:
        return math.log2(self.m[level] / self.u[level])


def blocked_pairs(
    source: DataFrame,
    target: DataFrame,
    rules: list[list[tuple[str, str]]],
    source_id: str,
    target_pk: str,
    project: list[Column] | None = None,
) -> DataFrame:
    """Candidate pairs as a UNION of blocking rules.

    Each rule is a list of (source_expr, target_expr) SQL-expression
    pairs conjoined into one equi-join condition; the union is
    de-duplicated on (source_id, target_pk). Source and target column
    names must be disjoint (rename upstream).

    `project` (optional) is applied to EACH rule's join output before
    the union. Pass the comparison-vector projection here: the
    de-duplicating shuffle then carries (pair key + small gamma ints)
    instead of the full joined rows, and — because the projected row is
    a pure function of the pair — the dedup compiles to a plain
    codegen'd distinct instead of a first()-per-column SortAggregate.
    """
    if not rules:
        raise ValueError("blocked_pairs needs at least one blocking rule")
    outs: list[DataFrame] = []
    for rule in rules:
        cond = None
        for s_expr, t_expr in rule:
            eq = F.expr(s_expr).eqNullSafe(F.expr(t_expr))
            cond = eq if cond is None else cond & eq
        joined = source.join(target, cond, "inner")
        outs.append(joined.select(*project) if project is not None else joined)
    pairs = outs[0]
    for extra in outs[1:]:
        pairs = pairs.unionByName(extra)
    if project is not None:
        return pairs.distinct()
    return pairs.dropDuplicates([source_id, target_pk])


def gamma(source_expr: str, target_expr: str) -> Column:
    """Binary agreement indicator for one comparison field."""
    return (
        F.expr(source_expr).eqNullSafe(F.expr(target_expr)).cast("int")
    )


def fs_score(
    pairs: DataFrame,
    fields: dict[str, FieldWeights],
    score_col: str = "match_weight",
) -> DataFrame:
    """Add the Fellegi–Sunter log₂ likelihood-ratio match weight.

    `fields` maps gamma column name → FieldWeights. The agree/disagree
    weights are computed HERE (driver-side, plain Python floats) and
    folded into the projection as double literals, so both the Spark
    plan and any SQL mirror sum the exact same IEEE constants — the
    score is bit-deterministic cross-engine.
    """
    total: Column | None = None
    for col, w in fields.items():
        if isinstance(w, GradedWeights):
            # descending CASE over levels; level 0 is the ELSE branch
            term = None
            for lvl in range(len(w.m) - 1, 0, -1):
                branch = (F.col(col) == lvl, F.lit(w.level_weight(lvl)))
                term = F.when(*branch) if term is None else term.when(*branch)
            term = term.otherwise(F.lit(w.level_weight(0)))
        else:
            term = F.when(F.col(col) == 1, F.lit(w.agree_weight())).otherwise(
                F.lit(w.disagree_weight())
            )
        total = term if total is None else total + term
    return pairs.withColumn(score_col, total)


def fs_top1(
    scored: DataFrame,
    source_id: str,
    target_pk: str,
    threshold: float,
    score_col: str = "match_weight",
) -> DataFrame:
    """Per-source best target at or above `threshold`; deterministic
    tie-break by ascending target pk (the documented deviation from the
    reference's arbitrary Postgres pick, plans/matching.py docstring)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(source_id)
        .orderBy(F.col(score_col).desc(), F.col(target_pk).asc())
    )
    return (
        scored.where(F.col(score_col) >= threshold)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def blocking_audit(
    source: DataFrame,
    target: DataFrame,
    rules: list[list[tuple[str, str]]],
) -> DataFrame:
    """Per-rule blocking diagnostics WITHOUT materializing pairs — the
    record-linkage reduction-ratio audit one reads before trusting a
    blocking scheme at scale.

    For each rule, sources and targets are grouped by the rule's key
    expressions (two aggregations, output ∝ distinct keys) and joined
    key-to-key: a block's pair count is the product of its side counts.
    Emits per rule: distinct co-occurring blocks, total candidate
    pairs, the largest block's pair count (the skew/straggler signal),
    and the reduction ratio 1 − pairs/(|S|·|T|) rounded to 6. Audit
    cost is two groupBys per rule — at 10⁹×10⁹ candidates the audit
    still never expands a single pair."""
    if not rules:
        raise ValueError("blocking_audit needs at least one blocking rule")
    n_src = source.count()
    n_tgt = target.count()
    outs: list[DataFrame] = []
    for idx, rule in enumerate(rules, start=1):
        s_keys = [F.expr(s).alias(f"_k{i}") for i, (s, _) in enumerate(rule)]
        t_keys = [F.expr(t).alias(f"_k{i}") for i, (_, t) in enumerate(rule)]
        ks = [f"_k{i}" for i in range(len(rule))]
        s_cnt = source.groupBy(*s_keys).agg(F.count(F.lit(1)).alias("_cs"))
        t_cnt = (
            target.groupBy(*t_keys)
            .agg(F.count(F.lit(1)).alias("_ct"))
            .select(
                *[F.col(k).alias(f"_t{k}") for k in ks], "_ct"
            )
        )
        # null-safe key join so the audit counts exactly the pairs
        # blocked_pairs (eqNullSafe joins) would generate — a plain
        # name-join would silently drop NULL-key blocks the generator
        # keeps (r14 ADVICE)
        cond = None
        for k in ks:
            eq = F.col(k).eqNullSafe(F.col(f"_t{k}"))
            cond = eq if cond is None else cond & eq
        blocks = s_cnt.join(t_cnt, cond, "inner").select(
            (F.col("_cs") * F.col("_ct")).alias("_bp")
        )
        outs.append(
            blocks.agg(
                F.lit(idx).alias("rule"),
                F.lit(" AND ".join(f"{s} = {t}" for s, t in rule)).alias(
                    "rule_keys"
                ),
                F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                F.coalesce(F.sum("_bp"), F.lit(0)).cast("bigint").alias("n_pairs"),
                F.coalesce(F.max("_bp"), F.lit(0)).cast("bigint").alias(
                    "max_block_pairs"
                ),
                F.round(
                    1.0
                    - F.coalesce(F.sum("_bp"), F.lit(0))
                    / F.lit(float(n_src) * float(n_tgt)),
                    6,
                ).alias("reduction_ratio"),
            )
        )
    out = outs[0]
    for extra in outs[1:]:
        out = out.unionByName(extra)
    return out


def em_graded_init(levels: list[int]) -> tuple[list[list[float]], list[list[float]]]:
    """Deterministic init for multi-level EM: for a field with L
    levels, m ramps UP toward agreement (m_l = (l+1)/Σ1..L) and u
    ramps DOWN (u_l = (L−l)/Σ1..L) — the 'matches agree more' prior,
    exact small-integer ratios so both engines inline identical
    literals."""
    m, u = [], []
    for L in levels:
        tot = L * (L + 1) // 2
        m.append([(l + 1) / tot for l in range(L)])
        u.append([(L - l) / tot for l in range(L)])
    return m, u


def fs_em_graded(
    patterns: list[tuple[tuple[int, ...], int]],
    levels: list[int],
    iters: int = 3,
    init_lambda: float = 0.5,
    param_digits: int = 10,
) -> list[dict]:
    """Multi-level EM over pre-aggregated gamma-pattern counts — the
    per-comparison-level (m, u) estimation Splink trains (fs_em is the
    binary special case). Pattern compression still applies: ∏ᵢ Lᵢ
    patterns (12 for a 3×2×2 scheme), so every iteration stays driver
    math over that table. Same rounding contract as fs_em.

    Returns per iteration {"iter", "lambda", "m": [[per level]...],
    "u": [[...]]}."""
    k = len(levels)
    m, u = em_graded_init(levels)
    lam = init_lambda
    total = sum(n for _, n in patterns)
    history: list[dict] = []
    for it in range(1, iters + 1):
        post: list[tuple[tuple[int, ...], int, float]] = []
        for g, n in patterns:
            a = lam
            b = 1.0 - lam
            for i in range(k):
                a *= m[i][g[i]]
                b *= u[i][g[i]]
            post.append((g, n, a / (a + b)))
        sum_p = sum(n * p for _, n, p in post)
        sum_q = sum(n * (1.0 - p) for _, n, p in post)
        m = [
            [
                round(
                    sum(n * p for g, n, p in post if g[i] == lvl) / sum_p,
                    param_digits,
                )
                for lvl in range(levels[i])
            ]
            for i in range(k)
        ]
        u = [
            [
                round(
                    sum(n * (1.0 - p) for g, n, p in post if g[i] == lvl)
                    / sum_q,
                    param_digits,
                )
                for lvl in range(levels[i])
            ]
            for i in range(k)
        ]
        lam = round(sum_p / total, param_digits)
        history.append(
            {"iter": it, "lambda": lam, "m": [list(x) for x in m],
             "u": [list(x) for x in u]}
        )
    return history


def fs_matches(
    source: DataFrame,
    target: DataFrame,
    *,
    source_pk: str,
    target_pk: str,
    prepare_source,
    prepare_target,
    rules: list[list[tuple[str, str]]],
    gammas: dict[str, tuple[str, str]],
    weights: dict[str, FieldWeights],
    threshold: float,
    source_key: str = "_fs_src_id",
) -> DataFrame:
    """FS linkage in MatchPlan.matches() shape (source cols +
    _source_id/_target_id/_match_rule), so the probabilistic matcher
    drops into every consumer of the exact cascade — MergePlan.execute,
    the A6 audit queries, and the streaming upsert sink's per-batch
    body.

    `prepare_source(df)` / `prepare_target(df)` project the comparison
    views: the prepared source MUST emit `source_key` carrying the
    source's `source_pk` value, the prepared target MUST keep
    `target_pk`, and their column names must be disjoint. `rules` /
    `gammas` / `weights` reference the prepared column names.
    _match_rule is 1 for FS-matched rows, NULL for unmatched (the
    cascade's A6 audit convention)."""
    from voter_gateway_spark.plans.matching import (
        MATCH_RULE,
        SOURCE_ID,
        TARGET_ID,
    )

    proj = [F.col(source_key), F.col(target_pk)] + [
        gamma(s_expr, t_expr).alias(name)
        for name, (s_expr, t_expr) in gammas.items()
    ]
    pairs = blocked_pairs(
        prepare_source(source),
        prepare_target(target),
        rules,
        source_key,
        target_pk,
        project=proj,
    )
    top = fs_top1(fs_score(pairs, weights), source_key, target_pk, threshold)
    link = top.select(source_key, F.col(target_pk).alias("__fs_tid"))
    return (
        source.withColumn(SOURCE_ID, F.col(source_pk))
        .join(link, F.col(SOURCE_ID) == F.col(source_key), "left")
        .drop(source_key)
        .withColumn(TARGET_ID, F.col("__fs_tid"))
        .drop("__fs_tid")
        .withColumn(
            MATCH_RULE,
            F.when(F.col(TARGET_ID).isNotNull(), F.lit(1)).otherwise(
                F.lit(None).cast("int")
            ),
        )
    )


def gamma_pattern_counts(pairs: DataFrame, gamma_cols: list[str]) -> list[tuple[tuple[int, ...], int]]:
    """Compress the pair table into exact per-pattern counts — the ONE
    distributed pass EM needs. Returned sorted by pattern so downstream
    driver arithmetic is order-canonical."""
    rows = (
        pairs.groupBy(*gamma_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out = [(tuple(int(r[c]) for c in gamma_cols), int(r["n"])) for r in rows]
    return sorted(out)


def gamma_pattern_counts_blocked(
    source: DataFrame,
    target: DataFrame,
    rules: list[list[tuple[str, str]]],
    gammas: dict[str, tuple[str, str]],
) -> list[tuple[tuple[int, ...], int]]:
    """Pattern counts over the DEDUPED union of blocking rules without
    materializing or shuffling a single pair.

    gamma_pattern_counts needs the union of rule joins de-duplicated on
    the pair key first — at 10⁹ candidate pairs that distinct is a
    pair-sized shuffle (measured 4.5 GB / 130 s at the x100 linkage
    replica). But the deduped per-pattern count obeys inclusion–
    exclusion over rule subsets:

        |∪ᵢ Aᵢ| per pattern = Σ_{∅≠S} (−1)^{|S|+1} |∩_{i∈S} Aᵢ|

    and each intersection is ONE equi-join (the conjunction of the
    subset's equalities) whose rows flow straight into a ≤2^k-group
    map-side-combined aggregation — the only exchange anywhere is the
    ≤2^k·(2^r−1)-row union of the signed term aggregates. Results are
    exact integers, identical to gamma_pattern_counts on the deduped
    pairs (parity-tested). Requires source/target rows to be unique
    (each rule join has set semantics); 2^r − 1 terms for r rules —
    meant for the small hand-written rule lists linkage uses."""
    from itertools import combinations

    if not rules:
        raise ValueError("gamma_pattern_counts_blocked needs >= 1 rule")
    names = list(gammas)
    # a gamma spec is either (source_expr, target_expr) — binary
    # agreement — or a ready Column computing a multi-level gamma
    gamma_cols = [
        (spec if isinstance(spec, Column) else gamma(*spec)).alias(name)
        for name, spec in gammas.items()
    ]
    terms: list[DataFrame] = []
    for r in range(1, len(rules) + 1):
        sign = 1 if r % 2 == 1 else -1
        for subset in combinations(range(len(rules)), r):
            cond = None
            for i in subset:
                for s_expr, t_expr in rules[i]:
                    eq = F.expr(s_expr).eqNullSafe(F.expr(t_expr))
                    cond = eq if cond is None else cond & eq
            joined = source.join(target, cond, "inner")
            terms.append(
                joined.select(*gamma_cols)
                .groupBy(*names)
                .agg((F.count(F.lit(1)) * F.lit(sign)).alias("_n"))
            )
    unioned = terms[0]
    for t in terms[1:]:
        unioned = unioned.unionByName(t)
    rows = (
        unioned.groupBy(*names)
        .agg(F.sum("_n").alias("n"))
        .where(F.col("n") > 0)
        .collect()
    )
    return sorted(
        (tuple(int(r[c]) for c in names), int(r["n"])) for r in rows
    )


def fs_em(
    patterns: list[tuple[tuple[int, ...], int]],
    n_fields: int,
    iters: int = 3,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.5,
    param_digits: int = 10,
) -> list[dict]:
    """EM over pre-aggregated gamma-pattern counts (pure driver math).

    Returns one dict per iteration: {"iter", "lambda", "m": [...],
    "u": [...]} with every parameter rounded to `param_digits` at the
    M-step — the rounding is part of the contract so a SQL mirror that
    unrolls the same iterations lands on identical doubles.
    """
    m = [init_m] * n_fields
    u = [init_u] * n_fields
    lam = init_lambda
    total = sum(n for _, n in patterns)
    history: list[dict] = []
    for it in range(1, iters + 1):
        # E-step: posterior match probability per pattern.
        post: list[tuple[tuple[int, ...], int, float]] = []
        for g, n in patterns:
            a = lam
            b = 1.0 - lam
            for i in range(n_fields):
                a *= m[i] if g[i] else (1.0 - m[i])
                b *= u[i] if g[i] else (1.0 - u[i])
            post.append((g, n, a / (a + b)))
        # M-step: weighted agreement rates (ordered sums over the
        # sorted pattern list — canonical).
        sum_p = sum(n * p for _, n, p in post)
        sum_q = sum(n * (1.0 - p) for _, n, p in post)
        m = [
            round(sum(n * p for g, n, p in post if g[i]) / sum_p, param_digits)
            for i in range(n_fields)
        ]
        u = [
            round(
                sum(n * (1.0 - p) for g, n, p in post if g[i]) / sum_q,
                param_digits,
            )
            for i in range(n_fields)
        ]
        lam = round(sum_p / total, param_digits)
        history.append({"iter": it, "lambda": lam, "m": list(m), "u": list(u)})
    return history
