"""Fellegi–Sunter probabilistic linkage (plans/linkage.py).

The load-bearing invariant is pattern-compressed EM == naive per-pair
EM: fs_em runs its iterations over ≤2^k gamma-pattern counts (one
distributed aggregation, then driver math), and must be bit-identical
to the textbook formulation that iterates over every pair row.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from voter_gateway_spark.plans import linkage
from voter_gateway_spark.plans.linkage import FieldWeights


@pytest.fixture(scope="module")
def toy(spark):
    src = spark.createDataFrame(
        [
            (1, "alice", 10, "A"),
            (2, "bob", 10, "B"),
            (3, "carol", 20, "A"),
            (4, "dave", 20, "B"),
        ],
        "src_id int, src_name string, src_block int, src_tag string",
    )
    tgt = spark.createDataFrame(
        [
            (101, "alice", 10, "A"),
            (102, "bob", 10, "A"),
            (103, "carol", 20, "B"),
            (104, "erin", 20, "B"),
            (105, "alice", 30, "A"),
        ],
        "t_id int, t_name string, t_block int, t_tag string",
    )
    return src, tgt


_RULES = [
    [("src_name", "t_name"), ("src_block", "t_block")],
    [("src_block", "t_block")],
]


def _pairs(src, tgt, project=True):
    proj = [
        F.col("src_id"),
        F.col("t_id"),
        linkage.gamma("src_name", "t_name").alias("g_name"),
        linkage.gamma("src_tag", "t_tag").alias("g_tag"),
    ]
    if project:
        return linkage.blocked_pairs(
            src, tgt, rules=_RULES, source_id="src_id", target_pk="t_id",
            project=proj,
        )
    pairs = linkage.blocked_pairs(
        src, tgt, rules=_RULES, source_id="src_id", target_pk="t_id"
    )
    return pairs.select(*proj)


def test_blocked_pairs_union_dedups_overlapping_rules(toy):
    src, tgt = toy
    got = _pairs(src, tgt)
    rows = {(r.src_id, r.t_id) for r in got.collect()}
    # rule 2 (same block) yields the full block cross product; rule 1's
    # pairs are a subset of it — the union must not double-count.
    assert got.count() == len(rows)
    # block 10: sources 1,2 × targets 101,102; block 20: 3,4 × 103,104.
    assert rows == {
        (1, 101), (1, 102), (2, 101), (2, 102),
        (3, 103), (3, 104), (4, 103), (4, 104),
    }
    # (1, 105) agrees on name but sits in another block: blocked out.
    assert (1, 105) not in rows
    # the projected (distinct) and unprojected (dropDuplicates-on-key)
    # paths emit the same pair rows.
    unproj = {tuple(r) for r in _pairs(src, tgt, project=False).collect()}
    assert {tuple(r) for r in got.collect()} == unproj


def test_fs_score_matches_hand_arithmetic(toy):
    src, tgt = toy
    weights = {
        "g_name": FieldWeights(m=0.9, u=0.1),
        "g_tag": FieldWeights(m=0.8, u=0.5),
    }
    scored = {
        (r.src_id, r.t_id): r.match_weight
        for r in linkage.fs_score(_pairs(src, tgt), weights).collect()
    }
    wa_n, wd_n = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)
    wa_t, wd_t = math.log2(0.8 / 0.5), math.log2(0.2 / 0.5)
    # (1, 101) alice/A vs alice/A: both agree; (2, 101) bob/B vs
    # alice/A: both disagree; (3, 103) carol/A vs carol/B: name only;
    # (4, 104) dave/B vs erin/B: tag only.
    assert scored[(1, 101)] == pytest.approx(wa_n + wa_t, abs=1e-12)
    assert scored[(2, 101)] == pytest.approx(wd_n + wd_t, abs=1e-12)
    assert scored[(3, 103)] == pytest.approx(wa_n + wd_t, abs=1e-12)
    assert scored[(4, 104)] == pytest.approx(wd_n + wa_t, abs=1e-12)


def test_fs_top1_threshold_and_tiebreak(toy):
    src, tgt = toy
    weights = {
        "g_name": FieldWeights(m=0.9, u=0.1),
        "g_tag": FieldWeights(m=0.8, u=0.5),
    }
    scored = linkage.fs_score(_pairs(src, tgt), weights)
    top = {
        r.src_id: (r.t_id, r.match_weight)
        for r in linkage.fs_top1(scored, "src_id", "t_id", -10.0).collect()
    }
    # src 1 -> 101 (full agreement beats partial).
    assert top[1][0] == 101
    # src 2: name agreement with 102 dominates (wa_n + wd_t > wd_n + wd_t).
    assert top[2][0] == 102
    # src 4 ('dave', tag B): 103 and 104 both disagree on name and
    # agree on tag — equal weights, tie-break by ascending target pk.
    assert top[4][0] == 103
    # threshold filters: with a high threshold only full agreements stay
    high = linkage.fs_top1(scored, "src_id", "t_id", 3.0)
    assert {r.src_id for r in high.collect()} == {1}


def test_graded_weights_score_matches_hand_arithmetic(spark):
    from voter_gateway_spark.plans.linkage import GradedWeights

    gw = GradedWeights(m=(0.05, 0.15, 0.8), u=(0.9, 0.08, 0.02))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 0)], "pid int, g_lvl int"
    )
    scored = {
        r.pid: r.w
        for r in linkage.fs_score(pairs, {"g_lvl": gw}, score_col="w").collect()
    }
    assert scored[1] == pytest.approx(math.log2(0.8 / 0.02), abs=1e-12)
    assert scored[2] == pytest.approx(math.log2(0.15 / 0.08), abs=1e-12)
    assert scored[3] == pytest.approx(math.log2(0.05 / 0.9), abs=1e-12)
    with pytest.raises(ValueError):
        GradedWeights(m=(0.5,), u=(0.5,))
    with pytest.raises(ValueError):
        GradedWeights(m=(0.5, 0.5), u=(0.5, 0.4, 0.1))


def test_graded_catalog_levels_all_live(spark, sf_dir):
    """The graded roll's damage tiers must populate every comparison
    level — a dead level means the fixture stopped exercising the CASE
    chain (the r14 lesson: TPC-H shared-prefix names put EVERY pair
    over a 0.3 trigram threshold, leaving level 0 empty)."""
    from voter_gateway_spark.queries import QUERIES

    got = {
        r.g_name_lvl: r.n
        for r in QUERIES["match_fs_graded"](spark, sf_dir)
        .groupBy("g_name_lvl")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == {0, 1, 2}, got


def test_fs_entities_pair_structure(spark, sf_dir):
    """Entity resolution over the messy fixture: a weight >= 4 edge
    requires name agreement, names are unique per entity, so every
    multi-member entity is exactly {base k, re-registration k + off}
    where off is the derived synthetic-id band (r15: data-derived, not
    a fixed 1e6 — see _fs_synth_offset); name-destroyed
    re-registrations (custkey % 7 == 0) stay singleton — the disclosed
    recall loss."""
    from voter_gateway_spark.queries import QUERIES, _fs_synth_offset
    from voter_gateway_spark.queries import _t

    off = _fs_synth_offset(_t(spark, sf_dir, "customer"))
    rows = QUERIES["dedup_fs_entities"](spark, sf_dir).collect()
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r.entity_id, []).append(r.record_id)
    multi = {e: sorted(m) for e, m in by_entity.items() if len(m) > 1}
    assert multi, "expected some resolved entities"
    for e, members in multi.items():
        assert len(members) == 2
        assert members[1] == members[0] + off
        assert e == members[0]          # min-id representative
        assert members[0] % 7 != 0      # destroyed names stay singleton
    # and every destroyed-name re-registration IS singleton
    singles = {m[0] for m in by_entity.values() if len(m) == 1}
    destroyed = [r.record_id for r in rows
                 if r.record_id >= off and (r.record_id - off) % 7 == 0]
    assert destroyed and all(d in singles for d in destroyed)


def test_tf_adjustment_varies_by_matched_value(spark, sf_dir):
    """The TF-adjusted weight must actually vary with the matched
    segment's frequency — a constant adjustment means the fixture's
    value distribution stopped exercising it (the unique-names lesson:
    every name frequency is 1, so only segment variation is live)."""
    from voter_gateway_spark.queries import QUERIES

    rows = (
        QUERIES["match_fs_tf_score"](spark, sf_dir)
        .where("g_name = 1 AND g_seg = 1 AND g_bucket = 1")
        .select("match_weight")
        .distinct()
        .collect()
    )
    assert len(rows) > 1, rows


def _naive_em(pair_gammas, n_fields, iters, init_m=0.9, init_u=0.1, init_lambda=0.5):
    """Textbook per-pair EM — the uncompressed reference."""
    m = [init_m] * n_fields
    u = [init_u] * n_fields
    lam = init_lambda
    out = []
    for it in range(1, iters + 1):
        ps = []
        for g in pair_gammas:
            a, b = lam, 1.0 - lam
            for i in range(n_fields):
                a *= m[i] if g[i] else (1.0 - m[i])
                b *= u[i] if g[i] else (1.0 - u[i])
            ps.append((g, a / (a + b)))
        sum_p = sum(p for _, p in ps)
        sum_q = sum(1.0 - p for _, p in ps)
        m = [round(sum(p for g, p in ps if g[i]) / sum_p, 10) for i in range(n_fields)]
        u = [round(sum(1.0 - p for g, p in ps if g[i]) / sum_q, 10) for i in range(n_fields)]
        lam = round(sum_p / len(pair_gammas), 10)
        out.append({"iter": it, "lambda": lam, "m": list(m), "u": list(u)})
    return out


def test_pattern_compressed_em_matches_naive_per_pair_em(toy):
    src, tgt = toy
    pairs = _pairs(src, tgt)
    pats = linkage.gamma_pattern_counts(pairs, ["g_name", "g_tag"])
    assert sum(n for _, n in pats) == pairs.count()
    compressed = linkage.fs_em(pats, n_fields=2, iters=4)

    # expand patterns back to per-pair gamma rows, SORTED so the naive
    # reference sums in the same canonical order fs_em does.
    expanded = []
    for g, n in pats:
        expanded.extend([g] * n)
    naive = _naive_em(sorted(expanded), n_fields=2, iters=4)

    for c, nv in zip(compressed, naive):
        assert c["lambda"] == pytest.approx(nv["lambda"], abs=1e-9)
        for a, b in zip(c["m"], nv["m"]):
            assert a == pytest.approx(b, abs=1e-9)
        for a, b in zip(c["u"], nv["u"]):
            assert a == pytest.approx(b, abs=1e-9)


def test_graded_em_matches_naive_per_pattern_reference():
    """fs_em_graded vs a straightforward per-pair reference with the
    same init ramp — identical params at every iteration."""
    import itertools

    # synthetic 3-level x 2-level gamma rows
    rows = []
    for i in range(200):
        name_lvl = 2 if i % 4 == 0 else (1 if i % 4 == 1 else 0)
        tag = 1 if i % 3 == 0 else 0
        rows.append((name_lvl, tag))
    pats = [(g, len(list(grp))) for g, grp in itertools.groupby(sorted(rows))]
    levels = [3, 2]
    hist = linkage.fs_em_graded(pats, levels, iters=4)

    m, u = linkage.em_graded_init(levels)
    assert m[0] == [1 / 6, 2 / 6, 3 / 6] and u[0] == [3 / 6, 2 / 6, 1 / 6]
    lam = 0.5
    expanded = sorted(g for g, n in pats for _ in range(n))
    for h in hist:
        post = []
        for g in expanded:
            a, b = lam, 1.0 - lam
            for i in range(2):
                a *= m[i][g[i]]
                b *= u[i][g[i]]
            post.append((g, a / (a + b)))
        sum_p = sum(p for _, p in post)
        sum_q = sum(1.0 - p for _, p in post)
        m = [
            [round(sum(p for g, p in post if g[i] == lvl) / sum_p, 10)
             for lvl in range(levels[i])]
            for i in range(2)
        ]
        u = [
            [round(sum(1.0 - p for g, p in post if g[i] == lvl) / sum_q, 10)
             for lvl in range(levels[i])]
            for i in range(2)
        ]
        lam = round(sum_p / len(expanded), 10)
        assert h["lambda"] == pytest.approx(lam, abs=1e-9)
        for i in range(2):
            for lvl in range(levels[i]):
                assert h["m"][i][lvl] == pytest.approx(m[i][lvl], abs=1e-9)
                assert h["u"][i][lvl] == pytest.approx(u[i][lvl], abs=1e-9)
        # each field's level distributions stay normalized
        for i in range(2):
            assert sum(h["m"][i]) == pytest.approx(1.0, abs=1e-8)
            assert sum(h["u"][i]) == pytest.approx(1.0, abs=1e-8)


def test_em_separates_match_and_nonmatch_populations(spark):
    """On a generated population with a clear match/non-match mixture,
    EM drives m above u on every field and lambda toward the true
    match share."""
    import itertools

    rows = []
    # 50 "matches": agree on both fields 90% / 80% of the time,
    # deterministically interleaved; 450 "non-matches": agree 10% / 30%.
    for i in range(50):
        rows.append((1 if i % 10 else 0, 1 if i % 5 else 0))
    for i in range(450):
        rows.append((1 if i % 10 == 0 else 0, 1 if i % 10 < 3 else 0))
    pats = [
        (g, len(list(grp)))
        for g, grp in itertools.groupby(sorted(rows))
    ]
    hist = linkage.fs_em(pats, n_fields=2, iters=10)
    last = hist[-1]
    assert last["m"][0] > last["u"][0]
    assert last["m"][1] > last["u"][1]
    assert 0.02 < last["lambda"] < 0.4


def test_pattern_counts_blocked_matches_distinct(toy):
    """Inclusion–exclusion over rule subsets must equal counting on the
    deduped pair union — same patterns, same exact integers."""
    src, tgt = toy
    via_pairs = linkage.gamma_pattern_counts(
        _pairs(src, tgt), ["g_name", "g_tag"]
    )
    via_ie = linkage.gamma_pattern_counts_blocked(
        src,
        tgt,
        rules=_RULES,
        gammas={"g_name": ("src_name", "t_name"), "g_tag": ("src_tag", "t_tag")},
    )
    assert via_ie == via_pairs


def test_fs_top1_threshold_folds_into_blocking_joins(spark, sf_dir):
    """The production-assignment query stays near-linear at scale
    because Catalyst folds the weight threshold into the blocking JOIN
    conditions (recomputed from raw columns), so recall-rule-only
    pairs die before the pair-dedup aggregate — measured 14 MB vs
    4.5 GB shuffle at the x100 linkage replica. Pin the shape."""
    from voter_gateway_spark.queries import QUERIES

    plan = (
        QUERIES["match_fs_top1"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_lines = [ln for ln in plan.split("\n") if "Join" in ln]
    assert sum(">= 4.0" in ln for ln in join_lines) >= 2, plan


def test_blocking_audit_hand_counts(toy):
    src, tgt = toy
    audit = {
        r.rule: r
        for r in linkage.blocking_audit(src, tgt, _RULES).collect()
    }
    # rule 1 keys (name, block): co-occurring blocks alice/10, bob/10,
    # carol/20 — one source x one target each.
    assert audit[1].n_blocks == 3
    assert audit[1].n_pairs == 3
    assert audit[1].max_block_pairs == 1
    assert audit[1].reduction_ratio == round(1.0 - 3 / 20.0, 6)
    # rule 2 key (block): blocks 10 and 20 co-occur with 2x2 pairs each;
    # target block 30 has no source side.
    assert audit[2].n_blocks == 2
    assert audit[2].n_pairs == 8
    assert audit[2].max_block_pairs == 4
    assert audit[2].reduction_ratio == round(1.0 - 8 / 20.0, 6)
    assert "src_block = t_block" in audit[2].rule_keys


def test_fs_score_plan_is_scan_side(spark, toy):
    """Scoring adds NO shuffle beyond the blocking joins: the weight
    projection must not introduce an exchange over the pair table."""
    src, tgt = toy
    weights = {
        "g_name": FieldWeights(m=0.9, u=0.1),
        "g_tag": FieldWeights(m=0.8, u=0.5),
    }
    pairs = _pairs(src, tgt)
    base = pairs._jdf.queryExecution().executedPlan().toString().count("Exchange")
    scored = linkage.fs_score(pairs, weights)
    after = scored._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert after == base


def test_scaled_top1_trade_is_small_and_prefix_shaped(spark):
    """The population-scaled blocking's recall trade must be LIVE and
    SMALL on the graded fixture: the typo model damages exactly the
    final character, so prefix blocks keep every typo'd assignment;
    the only divergences allowed are level-1 (trigram-similar)
    matches whose names differ earlier than the last character —
    pairs only the fixed (nation, segment, bucket) block can admit.
    A zero-divergence result would mean the trade stopped being
    exercised; a large one would mean the prefix bet broke."""
    from voter_gateway_spark.queries import QUERIES

    # sf0.01: the divergence class needs a same-block trigram-similar
    # name pair, which the 1,500-customer sf0.001 fixture is too small
    # to produce (verified empty there)
    sf_dir = "/root/testdata/sf0.01"
    fixed = {r.src_id: r for r in QUERIES["match_fs_graded_top1"](spark, sf_dir).collect()}
    scaled = {r.src_id: r for r in QUERIES["match_fs_scaled_top1"](spark, sf_dir).collect()}
    assert len(fixed) == len(scaled)
    diverged = {
        s for s in fixed
        if (fixed[s].matched_custkey, fixed[s].match_weight)
        != (scaled[s].matched_custkey, scaled[s].match_weight)
    }
    assert diverged, "trade not exercised — fixture stopped producing it"
    assert len(diverged) <= max(2, len(fixed) // 50), (len(diverged), len(fixed))
    for s in diverged:
        # the fixed-scheme pick had to come through a similarity level,
        # never an exact-name agreement (those share the prefix block)
        assert fixed[s].g_name_lvl == 1, fixed[s]


def test_em_scaled_training_signal_is_live(spark, sf_dir):
    """EM under the population-scaled blocking must train on a
    genuinely different pair population than the fixed-block EM — if
    every parameter coincides, the scaled rules stopped changing the
    candidate mix and the query is a dead mirror."""
    from voter_gateway_spark.queries import QUERIES

    a = {(r.em_iter, r.field, r.level): (r.m, r.u, r.lam)
         for r in QUERIES["match_fs_em_graded"](spark, sf_dir).collect()}
    b = {(r.em_iter, r.field, r.level): (r.m, r.u, r.lam)
         for r in QUERIES["match_fs_em_graded_scaled"](spark, sf_dir).collect()}
    assert set(a) == set(b) and len(a) == 21
    assert any(a[k] != b[k] for k in a)


def test_fs_synth_offset_bands_disjoint(spark):
    """_fs_synth_offset must produce an offset strictly above the max
    key and at least 1e7, so the fabricated-id bands [k*off, k*off+max]
    can never collide with real keys or each other at ANY replica
    scale (the r14 collision class: fixed +1e6 vs x100 keys ~1.5M)."""
    from voter_gateway_spark.queries import _fs_synth_offset

    for max_key in [1, 14_999, 999_999, 1_499_999, 9_999_999, 14_999_000]:
        df = spark.createDataFrame([(max_key,)], "c_custkey bigint")
        off = _fs_synth_offset(df)
        assert off > max_key
        assert off >= 10_000_000
        assert off == 10 ** len(str(off)) // 10  # a power of 10
        # three admission bands stay disjoint from base keys and each other
        bands = [(k * off, k * off + max_key) for k in range(4)]
        for (alo, ahi), (blo, bhi) in zip(bands, bands[1:]):
            assert ahi < blo


def test_phonetic_key_misspelling_invariances(spark):
    """phonetic_key must be invariant under the misspelling classes it
    exists to absorb (doubled consonant, vowel swap/rotation, inserted
    H) and immune to numeric characters fabricating codes; genuinely
    different sounds must key apart."""
    from voter_gateway_spark.functions.registry import phonetic_key

    rows = spark.createDataFrame(
        [
            ("dafegi",), ("daffegi",), ("defigo",), ("dahfegi",),
            ("Robert",), ("Rupert",), ("Ashcraft",), ("Ashcroft",),
            ("zz123",), ("zzdafegi",), ("maneru",), ("",),
        ],
        "name string",
    )
    keys = {
        r.name: r.k
        for r in rows.select("name", phonetic_key("name").alias("k")).collect()
    }
    base = keys["dafegi"]
    assert keys["daffegi"] == base      # doubled consonant
    assert keys["defigo"] == base       # vowel rotation (the roll's model)
    assert keys["dahfegi"] == base      # inserted H
    assert keys["Robert"] == keys["Rupert"] == "R163"   # classic Soundex pair
    assert keys["Ashcraft"] == keys["Ashcroft"]
    assert keys["zz123"] == keys["zzdafegi"][:1] + keys["zz123"][1:]  # same first letter
    assert keys["zz123"] == "Z200"      # digits contribute NO codes
    assert keys["maneru"] != base       # different sound keys apart
    assert keys[""] == "000"


def test_phonetic_catalog_levels_all_live(spark, sf_dir):
    """Every phonetic comparison level must be populated on the scored
    pairs (level 0 only survives scoring, not top-1 — its weight sits
    below threshold — so liveness is asserted on the pair stage), and
    the vowel-rotated re-registrations must link to their own entity
    at level 1 in the top-1 output."""
    from voter_gateway_spark.queries import (
        QUERIES, _PHON_RULES, _phon_gamma_lvl, _phon_sides,
    )

    roll, tgt = _phon_sides(spark, sf_dir)
    pairs = linkage.blocked_pairs(
        roll, tgt, rules=_PHON_RULES, source_id="src_id", target_pk="c_custkey",
        project=[
            F.col("src_id"), F.col("c_custkey"),
            _phon_gamma_lvl().alias("g_name_lvl"),
        ],
    )
    lvls = {
        r.g_name_lvl: r.n
        for r in pairs.groupBy("g_name_lvl").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(lvls) == {0, 1, 2}, lvls

    top = QUERIES["match_phonetic_top1"](spark, sf_dir).collect()
    rotated = [
        r for r in top
        if r.src_id % 7 == 0 and r.src_id % 13 != 0
    ]
    assert rotated, "no vowel-rotated rolls in the fixture slice"
    assert all(r.g_name_lvl == 1 for r in rotated), rotated[:5]
    assert all(r.matched_custkey == r.src_id for r in rotated), rotated[:5]


def test_phonetic_em_training_signal_is_live(spark, sf_dir):
    """Phonetic EM must (a) train on a different pair population than
    the FS graded EM (different fixture, different blocks) and (b)
    separate the sounds-alike level from exact and different in the
    final iteration's match-class distribution — a collapsed level
    means the vowel-rotation damage stopped reaching the pattern
    counts."""
    from voter_gateway_spark.queries import QUERIES

    a = {(r.em_iter, r.field, r.level): (r.m, r.u, r.lam)
         for r in QUERIES["match_fs_em_graded"](spark, sf_dir).collect()}
    p = {(r.em_iter, r.field, r.level): (r.m, r.u, r.lam)
         for r in QUERIES["match_phonetic_em"](spark, sf_dir).collect()}
    assert set(a) == set(p) and len(p) == 21
    assert any(a[k] != p[k] for k in a)
    final_m = {lvl: p[(3, "name", lvl)][0] for lvl in range(3)}
    assert len(set(final_m.values())) == 3, final_m
    # exact agreement dominates the match class; sounds-alike carries
    # real (non-vanishing) match mass
    assert final_m[2] > final_m[1] > 0.0, final_m


def test_phonetic_top1_threshold_folds_into_blocking_joins(spark, sf_dir):
    """The phonetic assignment inherits the fold: its gammas are plain
    expressions over staged columns, so Catalyst recomputes the graded
    weight inside each blocking join and the recall rule's
    quadratic-by-contract mass dies join-side — measured 76 MB shuffle
    at the x100 replica where a listed pair mass pays gigabytes. Pin
    the shape."""
    from voter_gateway_spark.queries import QUERIES

    plan = (
        QUERIES["match_phonetic_top1"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_lines = [ln for ln in plan.split("\n") if "Join" in ln]
    assert sum(">= 4.0" in ln for ln in join_lines) >= 2, plan
