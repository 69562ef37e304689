"""Focused tests for the r15 windowed `_collapse_exact` rewrite and
`ckpt_parallel` (optimization round: the collapse's groupBy+join-back
rep derivation became one window pass; member/spanning/expand frames
now derive in-row from rep rows carrying ascending member arrays).

These pin the INTERNAL contract the equivalence proofs rely on —
rep = group-min id, `_mem` ascending and complete, expand/spanning
multisets equal to the brute-force definition — on a fixture with
multi-way duplicate groups, a singleton, and an empty-token row.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from voter_gateway_spark.operators import dedup_ops
from voter_gateway_spark.session import ckpt_parallel


ROWS = [
    (3, "alpha beta gamma delta"),
    (1, "alpha beta gamma delta"),   # dup group {1, 3, 7} — min id 1
    (7, "alpha beta gamma delta"),
    (2, "epsilon zeta eta theta"),   # dup group {2, 5} — min id 2
    (5, "epsilon zeta eta theta"),
    (4, "iota kappa lambda mu"),     # singleton
    (6, ""),                         # empty token list: never pairs
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string")


def _grouped(spark):
    full = (
        _df(spark)
        .select(
            F.col("doc_id").alias("_id"),
            dedup_ops.word_shingles("text", 2).alias("_sh"),
        )
        .select(
            "_id",
            F.array_distinct(
                F.transform("_sh", dedup_ops.shingle_hash60)
            ).alias("_hh"),
        )
    )
    return dedup_ops._collapse_exact(full, True, "jaccard", 1.0)


def test_rep_is_group_min_and_mem_ascending(spark):
    _, _, _, _, grouped = _grouped(spark)
    rows = {r["_id"]: list(r["_mem"]) for r in grouped.collect()}
    # one rep per group, rep = min id, _mem = ascending full group
    assert rows[1] == [1, 3, 7]
    assert rows[2] == [2, 5]
    assert rows[4] == [4]
    for rep, mem in rows.items():
        assert rep == mem[0] == min(mem)
        assert mem == sorted(mem)


def test_spanning_and_expand_match_bruteforce(spark):
    members, reps, expand, spanning, grouped = _grouped(spark)
    # rep-level pair between the two non-singleton groups' reps
    rep_pairs = spark.createDataFrame(
        [(1, 2, 0.5)], "id_a bigint, id_b bigint, jaccard double"
    )
    got_span = {
        (r.id_a, r.id_b, r.jaccard) for r in spanning(rep_pairs).collect()
    }
    want_span = {(1, 2, 0.5)} | {(1, 3, 1.0), (1, 7, 1.0), (2, 5, 1.0)}
    assert got_span == want_span

    got_exp = sorted(
        (r.id_a, r.id_b, r.jaccard) for r in expand(rep_pairs).collect()
    )
    cross = sorted(
        (min(a, b), max(a, b), 0.5) for a in (1, 3, 7) for b in (2, 5)
    )
    intra = sorted(
        (a, b, 1.0)
        for grp in ([1, 3, 7], [2, 5])
        for a, b in combinations(grp, 2)
    )
    assert got_exp == sorted(cross + intra)


def test_members_enumerate_every_row(spark):
    members, _, _, _, _ = _grouped(spark)
    ids = sorted(r["_id"] for r in members.collect())
    assert ids == [1, 2, 3, 4, 5, 6, 7]


def test_ckpt_parallel_identity(spark):
    a = spark.range(0, 100).withColumn("x", F.col("id") * 2)
    b = spark.range(0, 50).withColumn("y", F.col("id") + 1)
    ca, cb = ckpt_parallel([a, b])
    assert ca.count() == 100 and cb.count() == 50
    assert [r.x for r in ca.orderBy("id").collect()] == [
        2 * i for i in range(100)
    ]
    assert [r.y for r in cb.orderBy("id").collect()] == [
        i + 1 for i in range(50)
    ]
