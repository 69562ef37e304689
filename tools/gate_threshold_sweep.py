"""Quality-gate threshold calibration sweep.

Emits per-threshold attrition curves for the three tunable knobs of
pipeline_quality_gate (voter_gateway_spark/queries.py:6302):

  lm_floor    QUALITY_GATE_LOGPROB_FLOOR — the CCNet-style perplexity
              gate on text_trigram_logprob's mean_logprob
  min_words   the Gopher word-count floor (QUALITY_GATE_MIN_WORDS)
  near        QUALITY_GATE_NEAR_THRESHOLD — the n-gram Jaccard
              near-dup prune threshold

For every grid value the sweep reports, per source, the three funnel
checkpoints a calibration review reads: docs/tokens surviving the
signal gates (after_gates), after exact dedup (after_exact), and
after the near-dup prune (after_near).

Scale shape — the whole point of the design: a naive sweep re-runs
the funnel once per grid value (|grid| x the most expensive composite
in the repo). This tool instead exploits that every knob is MONOTONE
per row: a doc passes the LM gate iff mean_logprob >= theta, passes
the word floor iff n_words >= w, and a pair survives iff
jaccard >= t. So each axis needs ONE signals scan + ONE pair
generation, and per-threshold membership collapses to an integer
bitmask over the grid:

  pass bit i      <=> pmax >= grid[i]            (pmax = knob value,
                                                  NULL if a fixed
                                                  gate already fails)
  exact-dedup bit <=> pass AND no smaller-id doc of the same
                      fingerprint passes: precede-max m via ONE
                      window; bit i set iff pmax >= grid[i] > m
  near-prune bit  <=> bit_or over the doc's pairs of
                      (mask_s4(a) & mask_s4(b)) — pairs generated
                      ONCE on the loosest survivor superset, each
                      pair active exactly where both endpoints
                      survive exact dedup

The per-threshold counts then come from a (source, mask) contingency
aggregate of a few hundred rows, expanded driver-side — total cost
~1 funnel regardless of grid size, and nothing all-pairs or
per-threshold touches the corpus.

Self-check: at the default thresholds the sweep's three checkpoints
must reproduce pipeline_quality_gate's own stage rows (encoding /
exact_dedup / near_dedup) per source — asserted on every run, so a
drift between this tool and the gate cannot go unnoticed.

Usage:
  python tools/gate_threshold_sweep.py [sf_dir] [--json out.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from voter_gateway_spark.operators import dedup_ops, text
from voter_gateway_spark.session import ckpt
from voter_gateway_spark.queries import (
    QUALITY_GATE_LOGPROB_FLOOR,
    QUALITY_GATE_MIN_STOP_WORDS,
    QUALITY_GATE_MIN_WORDS,
    QUALITY_GATE_NEAR_THRESHOLD,
    pipeline_quality_gate,
    text_trigram_logprob,
)
from voter_gateway_spark.session import build_spark

LM_GRID = [-4.4, -4.2, -4.0, QUALITY_GATE_LOGPROB_FLOOR, -3.6, -3.4, -3.2]
MIN_WORDS_GRID = [5, 10, QUALITY_GATE_MIN_WORDS, 30, 50, 80]
NEAR_GRID = [0.08, 0.10, QUALITY_GATE_NEAR_THRESHOLD, 0.20, 0.30, 0.50]
DEFAULTS = {
    "lm_floor": QUALITY_GATE_LOGPROB_FLOOR,
    "min_words": QUALITY_GATE_MIN_WORDS,
    "near": QUALITY_GATE_NEAR_THRESHOLD,
}


def _signals(spark, sf_dir: str) -> DataFrame:
    """Per-doc gate signals, mirroring _quality_gate_stages' base frame
    (queries.py:6311-6325) plus every gate's raw signal: n_words and
    the non-word-count Gopher rules, mean_logprob, encoding ok, and
    the content fingerprint. One scan + the LM count-table joins."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        "doc_id",
        "source",
        "text",
        text.normalized("text").alias("_norm"),
    ).select(
        "doc_id",
        "source",
        "text",
        F.size(text.tokens("text", lower=True, norm_col=F.col("_norm")))
        .cast("bigint")
        .alias("n_tokens"),
        text.content_fingerprint("text", norm_col=F.col("_norm")).alias("_fp"),
    )
    gop = text.gopher_rules(
        docs,
        min_words=QUALITY_GATE_MIN_WORDS,
        min_stop_words=QUALITY_GATE_MIN_STOP_WORDS,
    ).select(
        "doc_id",
        "n_words",
        "pass_gopher",
        # the word-count rule factored out so the min_words axis can
        # re-threshold it; Gopher's max_words cap stays fixed
        (
            F.col("ok_mean_word_len")
            & F.col("ok_symbol_ratio")
            & F.col("ok_bullet_lines")
            & F.col("ok_ellipsis_lines")
            & F.col("ok_alpha_words")
            & F.col("ok_stop_words")
            & (F.col("n_words") <= 100_000)
        ).alias("gopher_others_ok"),
    )
    lm = text_trigram_logprob(spark, sf_dir).select("doc_id", "mean_logprob")
    enc = text.encoding_anomaly(docs).select(
        "doc_id", (~F.col("is_suspect")).alias("enc_ok")
    )
    return (
        base.join(gop, "doc_id")
        .join(lm, "doc_id", "left")
        .join(enc, "doc_id")
        .transform(ckpt)
    )


def _mask(cond_bits) -> F.Column:
    """Integer bitmask column: bit i set where cond_bits[i] holds."""
    out = F.lit(0)
    for i, c in enumerate(cond_bits):
        out = out + F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def _expand(rows, grid, mask_cols) -> list[dict]:
    """Driver-side expansion of the (source, masks...) contingency
    into per-threshold per-source stage counts."""
    out = []
    for i, theta in enumerate(grid):
        per: dict[tuple[str, str], list[int]] = {}
        for r in rows:
            for stage, mcol in mask_cols.items():
                if int(r[mcol]) & (1 << i):
                    key = (stage, r["source"])
                    cur = per.setdefault(key, [0, 0])
                    cur[0] += int(r["n_docs"])
                    cur[1] += int(r["n_tokens"])
        for (stage, source), (nd, nt) in sorted(per.items()):
            out.append(
                {
                    "threshold": theta,
                    "stage": stage,
                    "source": source,
                    "n_docs": nd,
                    "n_tokens": nt,
                }
            )
    return out


def _doc_axis_sweep(sig: DataFrame, grid, pmax_col: F.Column) -> list[dict]:
    """Shared machinery for the two doc-monotone axes (lm_floor,
    min_words). pmax_col: the knob value when every FIXED gate passes,
    else NULL — a doc passes the signal gates at theta iff
    pmax >= theta."""
    s = sig.withColumn("_pmax", pmax_col)
    prev = Window.partitionBy("_fp").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    s = s.withColumn("_m", F.max("_pmax").over(prev))
    pass_bits = [F.col("_pmax") >= F.lit(g) for g in grid]
    s4_bits = [
        (F.col("_pmax") >= F.lit(g))
        & (F.col("_m").isNull() | (F.col("_m") < F.lit(g)))
        for g in grid
    ]
    s = s.withColumn("_mask_pass", _mask(pass_bits)).withColumn(
        "_mask_s4", _mask(s4_bits)
    ).transform(ckpt)

    # pairs ONCE on the loosest possible survivor superset; a pair is
    # active at theta exactly where BOTH endpoints survive exact dedup
    superset = s.where(F.col("_pmax") >= F.lit(min(grid)))
    pairs = dedup_ops.ngram_jaccard_pairs(
        superset.select("doc_id", "text"),
        "doc_id",
        "text",
        k=3,
        threshold=QUALITY_GATE_NEAR_THRESHOLD,
    )
    masks = s.select("doc_id", "_mask_s4")
    loser = (
        pairs.join(
            masks.select(
                F.col("doc_id").alias("id_a"), F.col("_mask_s4").alias("_ma")
            ),
            "id_a",
        )
        .join(
            masks.select(
                F.col("doc_id").alias("id_b"), F.col("_mask_s4").alias("_mb")
            ),
            "id_b",
        )
        .groupBy(F.col("id_b").alias("doc_id"))
        .agg(F.bit_or(F.col("_ma").bitwiseAND(F.col("_mb"))).alias("_lmask"))
    )
    full = (1 << len(grid)) - 1
    s5 = (
        s.join(loser, "doc_id", "left")
        .withColumn(
            "_mask_s5",
            F.col("_mask_s4").bitwiseAND(
                F.coalesce(F.col("_lmask"), F.lit(0)).bitwiseXOR(F.lit(full))
            ),
        )
    )
    rows = (
        s5.groupBy("source", "_mask_pass", "_mask_s4", "_mask_s5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .collect()
    )
    return _expand(
        rows,
        grid,
        {
            "after_gates": "_mask_pass",
            "after_exact": "_mask_s4",
            "after_near": "_mask_s5",
        },
    )


def sweep_lm_floor(sig: DataFrame, grid=tuple(LM_GRID)) -> list[dict]:
    pmax = F.when(
        F.col("pass_gopher") & F.col("enc_ok"), F.col("mean_logprob")
    )
    return _doc_axis_sweep(sig, list(grid), pmax)


def sweep_min_words(sig: DataFrame, grid=tuple(MIN_WORDS_GRID)) -> list[dict]:
    pmax = F.when(
        F.col("gopher_others_ok")
        & F.col("enc_ok")
        & (F.col("mean_logprob") >= F.lit(QUALITY_GATE_LOGPROB_FLOOR)),
        F.col("n_words").cast("double"),
    )
    return _doc_axis_sweep(sig, list(grid), pmax)


def sweep_near(sig: DataFrame, grid=tuple(NEAR_GRID)) -> list[dict]:
    """Near-threshold axis: the signal gates and exact dedup are fixed
    at the defaults, so only the prune varies. Pairs are generated
    ONCE at the loosest grid value (pair sets at higher thresholds are
    subsets — jaccard is monotone) and re-thresholded per bit."""
    grid = list(grid)
    s4_ok = (
        F.col("pass_gopher")
        & F.col("enc_ok")
        & (F.col("mean_logprob") >= F.lit(QUALITY_GATE_LOGPROB_FLOOR))
    )
    s = sig.withColumn("_pmax", F.when(s4_ok, F.lit(0.0)))
    prev = Window.partitionBy("_fp").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    s = s.withColumn("_m", F.max("_pmax").over(prev))
    s4 = s.where(
        F.col("_pmax").isNotNull() & F.col("_m").isNull()
    ).transform(ckpt)
    full = (1 << len(grid)) - 1
    pairs = dedup_ops.ngram_jaccard_pairs(
        s4.select("doc_id", "text"), "doc_id", "text", k=3, threshold=min(grid)
    )
    loser = (
        pairs.withColumn(
            "_pm", _mask([F.col("jaccard") >= F.lit(g) for g in grid])
        )
        .groupBy(F.col("id_b").alias("doc_id"))
        .agg(F.bit_or("_pm").alias("_lmask"))
    )
    rows = (
        s4.join(loser, "doc_id", "left")
        .withColumn("_mask_s4", F.lit(full))
        .withColumn(
            "_mask_s5",
            F.lit(full).bitwiseAND(
                F.coalesce(F.col("_lmask"), F.lit(0)).bitwiseXOR(F.lit(full))
            ),
        )
        .groupBy("source", "_mask_s4", "_mask_s5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .collect()
    )
    return _expand(
        rows,
        grid,
        {"after_exact": "_mask_s4", "after_near": "_mask_s5"},
    )


def _self_check(spark, sf_dir: str, curves: dict[str, list[dict]]) -> None:
    """The sweep at the DEFAULT thresholds must reproduce
    pipeline_quality_gate's own per-source stage rows."""
    gate = {
        (r["stage"], r["source"]): (int(r["n_docs"]), int(r["n_tokens"]))
        for r in pipeline_quality_gate(spark, sf_dir).collect()
    }
    stage_map = {
        "after_gates": "encoding",
        "after_exact": "exact_dedup",
        "after_near": "near_dedup",
    }
    for axis, rows in curves.items():
        for r in rows:
            if r["threshold"] != DEFAULTS[axis]:
                continue
            want = gate.get((stage_map[r["stage"]], r["source"]))
            got = (r["n_docs"], r["n_tokens"])
            assert want == got, (
                f"sweep/gate drift: axis={axis} stage={r['stage']} "
                f"source={r['source']} gate={want} sweep={got}"
            )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    spark = build_spark(app_name="vgs-gate-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sig = _signals(spark, sf_dir)
    curves = {
        "lm_floor": sweep_lm_floor(sig),
        "min_words": sweep_min_words(sig),
        "near": sweep_near(sig),
    }
    _self_check(spark, sf_dir, curves)
    result = {"sf_dir": sf_dir, "defaults": DEFAULTS, "curves": curves}
    for axis, rows in curves.items():
        print(f"\n== {axis} (default {DEFAULTS[axis]}) ==")
        totals: dict[tuple[float, str], list[int]] = {}
        for r in rows:
            key = (r["threshold"], r["stage"])
            cur = totals.setdefault(key, [0, 0])
            cur[0] += r["n_docs"]
            cur[1] += r["n_tokens"]
        for (theta, stage), (nd, nt) in sorted(totals.items()):
            mark = "  <-- default" if theta == DEFAULTS[axis] else ""
            print(f"  {theta:>8} {stage:<12} docs={nd:<8} tokens={nt}{mark}")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"\nwrote {json_out}")
    print("\nself-check vs pipeline_quality_gate: OK")
    spark.stop()


if __name__ == "__main__":
    main()
