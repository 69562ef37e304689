"""Property-based tests (hypothesis) for the engine's core invariants:
cascade priority, dedup safety gates, merge idempotence (SURVEY §5
strategy item 4)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from voter_gateway_spark.plans import DedupPlan, MatchPlan, MergePlan

KEYS = st.sampled_from(["a", "b", "c", "d"])


@st.composite
def match_data(draw):
    n_src = draw(st.integers(1, 8))
    n_tgt = draw(st.integers(1, 8))
    src = [(i, draw(KEYS), draw(KEYS)) for i in range(n_src)]
    tgt = [(i + 100, draw(KEYS), draw(KEYS)) for i in range(n_tgt)]
    return src, tgt


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(match_data())
def test_cascade_first_match_wins(spark_prop, data):
    spark = spark_prop
    src_rows, tgt_rows = data
    src = spark.createDataFrame(src_rows, "sid int, k1 string, k2 string")
    tgt = spark.createDataFrame(tgt_rows, "id int, k1 string, k2 string")
    mp = MatchPlan(src, tgt, target_pk="id", source_id="sid")
    mp.find_exact_matches(["k1"])
    mp.find_exact_matches(["k2"])
    got = {r.sid: (r._target_id, r._match_rule) for r in mp.matches().collect()}

    t1 = {}
    for sid, k1, k2 in src_rows:
        c1 = sorted(t for t, tk1, _ in tgt_rows if tk1 == k1)
        c2 = sorted(t for t, _, tk2 in tgt_rows if tk2 == k2)
        if c1:
            t1[sid] = (c1[0], 1)
        elif c2:
            t1[sid] = (c2[0], 2)
        else:
            t1[sid] = (None, None)
    assert got == t1


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(KEYS, min_size=1, max_size=10))
def test_dedup_one_survivor_per_group(spark_prop, keys):
    spark = spark_prop
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id int, k string"
    )
    plan = DedupPlan(df, pk="id")
    plan.find_duplicates(["k"])
    out = plan.execute().collect()
    # exactly one survivor per key, and it is the minimum id
    expect = {}
    for i, k in enumerate(keys):
        expect.setdefault(k, i)
    assert sorted((r.k, r.id) for r in out) == sorted(expect.items())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=8))
def test_merge_idempotent_reimport(spark_prop, rows):
    """Re-importing the same source into the merged target changes
    nothing when merge expressions are plain column replacement."""
    spark = spark_prop
    src = spark.createDataFrame(
        [(k, v) for k, v in {k: v for k, v in rows}.items()], "id int, v int"
    )
    tgt = spark.createDataFrame([(99, -1)], "id int, v int")

    def merge_once(target):
        mp = MatchPlan(src, target, target_pk="id", source_id="id")
        mp.find_exact_matches(["id"])
        return MergePlan(target_pk="id").execute(mp.matches(), target).target

    once = merge_once(tgt).cache()
    twice = merge_once(once)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=3, max_size=8), min_size=2, max_size=8
    ),
    st.integers(1, 4),
)
def test_ngram_pairs_match_naive_all_pairs(spark_prop, texts, dup_factor):
    """Blocked + collapsed + (maybe) prefix-filtered pair finding must
    equal the naive O(n²) definition, including injected exact
    duplicates (the collapse path) and shared-shingle near-dups."""
    from voter_gateway_spark.operators import dedup_ops

    docs = [" ".join(t) for t in texts for _ in range(dup_factor)]
    df = spark_prop.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup_ops.ngram_jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=0.3
        ).collect()
    }

    def shingles(d):
        w = d.split()
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    exp = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = shingles(docs[a]), shingles(docs[b])
            j = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
            if j >= 0.3:
                exp[(a, b)] = round(j, 6)
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-6, (k, got[k], exp[k])
