"""Behavioral tests for the analytics operator family (funnel,
retention, tf-idf, knn vote, training shuffle, span contamination)
and the WKT/WKB geometry export."""

import datetime
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from voter_gateway_spark.functions import location_point, point_wkb, point_wkt
from voter_gateway_spark.operators.analytics import (
    contamination_spans,
    funnel_stages,
    knn_label_vote,
    retention_cohorts,
    tfidf_top_terms,
    training_shuffle,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_type=t, ts=_ts(ts)) for u, t, ts in rows],
        "user_id int, event_type string, ts timestamp",
    )


def test_funnel_requires_stage_order(spark):
    ev = _events(spark, [
        (1, "view", "2024-01-01T10:00"), (1, "click", "2024-01-01T11:00"),
        (1, "purchase", "2024-01-01T12:00"),
        # user 2: click BEFORE any view — reaches stage 1 only via the
        # later view, click never recurs, so stage 2 not reached
        (2, "click", "2024-01-01T09:00"), (2, "view", "2024-01-01T10:00"),
        # user 3: view only
        (3, "view", "2024-01-01T08:00"),
        # user 4: purchase with no view — reaches nothing
        (4, "purchase", "2024-01-01T08:00"),
    ])
    got = {r.stage: (r.n_users, r.conversion) for r in
           funnel_stages(ev, ["view", "click", "purchase"]).collect()}
    assert got["view"][0] == 3
    assert got["click"][0] == 1
    assert got["purchase"][0] == 1
    assert got["view"][1] is None          # no prior stage
    assert abs(got["click"][1] - 1 / 3) < 1e-6
    assert got["purchase"][1] == 1.0


def test_funnel_same_timestamp_counts(spark):
    """'At or after' is inclusive: same-instant stage events count."""
    ev = _events(spark, [
        (1, "view", "2024-01-01T10:00"), (1, "click", "2024-01-01T10:00"),
    ])
    got = {r.stage: r.n_users for r in
           funnel_stages(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_retention_cohorts(spark):
    ev = _events(spark, [
        (1, "view", "2024-01-01T10:00"),   # cohort day 0
        (1, "view", "2024-01-02T10:00"),   # day 1
        (1, "view", "2024-01-02T18:00"),   # same day — counted once
        (2, "view", "2024-01-01T11:00"),   # cohort day 0 only
        (3, "view", "2024-01-02T09:00"),   # second cohort
        (3, "view", "2024-01-12T09:00"),   # offset 10 > max — dropped
    ])
    got = {(r.cohort_date, r.day_offset): r.n_users
           for r in retention_cohorts(ev, max_offset_days=7).collect()}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-02", 0): 1,
    }


def test_tfidf_ranks_and_ties(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple apple banana"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="dates dates dates"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_top_terms(docs, top_k=2)
    rows = {(r.doc_id, r.rank): (r.term, r.tf) for r in out.collect()}
    # doc 1: apple tf=2 idf=ln(3) beats banana tf=1 idf=ln(1.5)
    assert rows[(1, 1)][0] == "apple" and rows[(1, 1)][1] == 2
    assert rows[(1, 2)][0] == "banana"
    # doc 3: single distinct term
    assert rows[(3, 1)][0] == "dates"
    assert (3, 2) not in rows


def test_knn_label_vote_majority_and_tiebreak(spark):
    def vec(x, y):
        return [float(x), float(y)]

    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=vec(1, 0), label=7),
            Row(vec_id=2, embedding=vec(0.99, 0.1), label=7),
            Row(vec_id=3, embedding=vec(0.98, 0.2), label=3),
            Row(vec_id=4, embedding=vec(0, 1), label=9),
        ],
        "vec_id bigint, embedding array<double>, label int",
    )
    q = corpus.where(F.col("vec_id") == 1)
    got = knn_label_vote(q, corpus, k=3).collect()
    assert len(got) == 1
    # neighbors of 1 (self excluded): 2 (7), 3 (3), 4 (9) → 7 wins 1-1-1?
    # no: votes 7:1, 3:1, 9:1 — tie on votes, lowest label wins → 3
    assert got[0].predicted_label == 3 and got[0].votes == 1

    got2 = knn_label_vote(q, corpus, k=2).collect()
    # neighbors 2 (7) and 3 (3): tie → lowest label 3
    assert got2[0].predicted_label == 3


def test_training_shuffle_deterministic_and_dense(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 101)], "doc_id bigint")
    a = training_shuffle(df, "doc_id", n_shards=4).collect()
    b = training_shuffle(df, "doc_id", n_shards=4).collect()
    assert sorted((r.doc_id, r.shard, r.pos) for r in a) == sorted(
        (r.doc_id, r.shard, r.pos) for r in b
    )
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # order decorrelated from key order: positions aren't just doc_id order
    shard0 = [r.doc_id for r in sorted(a, key=lambda r: (r.shard, r.pos)) if r.shard == 0]
    assert shard0 != sorted(shard0)


def test_contamination_spans_max_run(spark):
    # eval doc copies words 4..9 of the train doc verbatim (6 words →
    # 4 consecutive 3-shingles), plus an isolated match later
    train = spark.createDataFrame(
        [Row(doc_id=1, text="w1 w2 w3 a b c d e f w4 w5 w6 x y z")],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [Row(doc_id=14, text="a b c d e f q1 q2 q3 q4 x y z")],
        "doc_id bigint, text string",
    )
    got = contamination_spans(ev, train, "doc_id", "text", k=3, min_matched=2).collect()
    assert len(got) == 1
    r = got[0]
    assert r.eval_id == 14 and r.train_id == 1
    # positions 0..3 ('a b c'..'d e f') match consecutively; 'x y z' at
    # the end matches in isolation
    assert r.max_run == 4
    assert r.n_matched == 5


def test_contamination_spans_threshold_filters(spark):
    train = spark.createDataFrame(
        [Row(doc_id=1, text="a b c unrelated words here")],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [Row(doc_id=14, text="a b c different tail")], "doc_id bigint, text string"
    )
    assert (
        contamination_spans(ev, train, "doc_id", "text", min_matched=5).count() == 0
    )


def test_point_wkt_format_and_nulls(spark):
    df = spark.createDataFrame(
        [Row(id=1, lng=1.5, lat=-2.25), Row(id=2, lng=None, lat=3.0)],
        "id int, lng double, lat double",
    )
    got = {
        r.id: r.wkt
        for r in df.select(
            "id", point_wkt(location_point("lng", "lat")).alias("wkt")
        ).collect()
    }
    assert got[1] == "POINT(1.500000 -2.250000)"
    assert got[2] is None


def test_point_wkb_roundtrip(spark):
    df = spark.createDataFrame(
        [Row(id=1, lng=1.5, lat=-2.25), Row(id=2, lng=None, lat=3.0)],
        "id int, lng double, lat double",
    )
    got = {
        r.id: r.wkb
        for r in df.select(
            "id", point_wkb(location_point("lng", "lat")).alias("wkb")
        ).collect()
    }
    assert got[2] is None
    byte_order, geom_type, x, y = struct.unpack("<BIdd", got[1])
    assert byte_order == 1 and geom_type == 1
    assert x == 1.5 and y == -2.25


def test_session_paths_truncation_gap_and_tie_order(spark):
    from datetime import datetime

    from voter_gateway_spark.operators.analytics import session_paths

    base = datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, secs, typ, uid=1):
        from datetime import timedelta

        return (eid, base + timedelta(seconds=secs), uid, typ)

    rows = (
        # session 1: nine rapid events -> capped at 8 with '>+'
        [ev(i, i, "view") for i in range(9)]
        # session 2 (gap > 1800s): tie timestamps -> event_id order
        + [ev(100, 4000, "click"), ev(99, 4000, "view")]
        # second user, single event
        + [ev(200, 0, "purchase", uid=2)]
    )
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        r.path: (r.n_sessions, r.n_events)
        for r in session_paths(df).collect()
    }
    assert got == {
        ">".join(["view"] * 8) + ">+": (1, 9),
        "view>click": (1, 2),  # event_id 99 (view) precedes 100 (click)
        "purchase": (1, 1),
    }


def _py_session_paths(rows, gap_s=1800, max_len=8):
    """Pure-Python reference for session_paths: rows = (event_id, ts
    epoch-seconds, user_id, event_type)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, secs, uid, typ in rows:
        by_user[uid].append((secs, eid, typ))
    agg = defaultdict(lambda: [0, 0])
    for uid, evs in by_user.items():
        evs.sort()
        sessions = []
        for e in evs:
            if sessions and e[0] - sessions[-1][-1][0] < gap_s:
                sessions[-1].append(e)
            else:
                sessions.append([e])
        for s in sessions:
            types = [t for _, _, t in s]
            path = ">".join(types[:max_len]) + (">+" if len(types) > max_len else "")
            agg[path][0] += 1
            agg[path][1] += len(types)
    return {p: tuple(v) for p, v in agg.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9999),   # seconds offset
            st.integers(min_value=1, max_value=3),      # user
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_session_paths_matches_python_reference(spark_prop, events):
    from datetime import datetime, timedelta

    from voter_gateway_spark.operators.analytics import session_paths

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=secs), uid, typ)
        for i, (secs, uid, typ) in enumerate(events)
    ]
    df = spark_prop.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        r.path: (r.n_sessions, r.n_events)
        for r in session_paths(df, max_len=3).collect()
    }
    ref = _py_session_paths(
        [(i, secs, uid, typ) for i, (secs, uid, typ) in enumerate(events)],
        max_len=3,
    )
    assert got == ref


def test_bigram_logprob_matches_python_reference(spark):
    """Independent pure-Python Stupid Backoff (Brants et al. 2007)
    recomputation over the sf0.001 fixture: counts trained on even
    doc_ids, S(c|p) = cb/cp if seen else 0.4*coalesce(cc,1)/N. Also
    pins that the held-out split actually EXERCISES the backoff branch
    (a model trained on the scored corpus itself never would)."""
    import math
    import re
    from collections import Counter

    import pandas as pd

    from voter_gateway_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: (r.n_bigrams, r.mean_logprob, r.backoff_rate)
        for r in QUERIES["text_bigram_logprob"](spark, sf).collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]]
    toks = {
        int(r.doc_id): [
            t
            for t in re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
            if t
        ]
        for r in docs.itertuples()
    }
    uni: Counter = Counter()
    big: Counter = Counter()
    for d, ts in toks.items():
        if d % 2 == 0:
            uni.update(ts)
            big.update(zip(ts, ts[1:]))
    n = float(sum(uni.values()))
    exp = {}
    for d, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        scores = [
            math.log(big[pr] / uni[pr[0]])
            if pr in big
            else math.log(0.4 * (uni.get(pr[1]) or 1) / n)
            for pr in pairs
        ]
        backoff = sum(1 for pr in pairs if pr not in big) / len(pairs)
        exp[d] = (
            len(pairs),
            round(sum(scores) / len(scores), 6),
            round(backoff, 6),
        )
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0], d
        assert abs(got[d][1] - exp[d][1]) < 2e-6, (d, got[d], exp[d])
        assert abs(got[d][2] - exp[d][2]) < 2e-6, (d, got[d], exp[d])
    # the backoff branch is live: odd (held-out) docs contain bigrams
    # the even-doc model never saw
    assert any(v[2] > 0 for v in exp.values())


def test_dsir_importance_matches_python_reference(spark):
    """Independent pure-Python DSIR (Xie et al. 2023) recomputation
    over the sf0.001 fixture: hashed-bigram (60-bit md5 % 4096) bucket
    counts, add-one smoothed target (lang='en') vs raw models, per-doc
    log-weight = sum of per-position log ratios. Also pins the method's
    point: English docs must score higher on average than non-English
    ones (the target model was built from them)."""
    import hashlib
    import math
    import re
    from collections import Counter

    import pandas as pd

    from voter_gateway_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: (r.n_feats, r.log_weight, r.mean_logratio)
        for r in QUERIES["text_dsir_importance"](spark, sf).collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text", "lang"]]
    B = 4096

    def buckets(text):
        ts = [t for t in re.sub(r"\s+", " ", text).strip().lower().split(" ") if t]
        return [
            int(hashlib.md5(f"{p}|{c}".encode()).hexdigest()[:15], 16) % B
            for p, c in zip(ts, ts[1:])
        ]

    doc_b = {int(r.doc_id): buckets(r.text) for r in docs.itertuples()}
    is_en = {int(r.doc_id): r.lang == "en" for r in docs.itertuples()}
    raw: Counter = Counter()
    tgt: Counter = Counter()
    for d, bs in doc_b.items():
        raw.update(bs)
        if is_en[d]:
            tgt.update(bs)
    nr, nt = float(sum(raw.values())), float(sum(tgt.values()))
    score = {
        b: math.log((tgt.get(b, 0) + 1) / (nt + B))
        - math.log((raw[b] + 1) / (nr + B))
        for b in raw
    }
    exp = {
        d: (
            len(bs),
            round(sum(score[b] for b in bs), 6),
            round(sum(score[b] for b in bs) / len(bs), 6),
        )
        for d, bs in doc_b.items()
        if bs
    }
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0], d
        assert abs(got[d][1] - exp[d][1]) < 2e-5, (d, got[d], exp[d])
        assert abs(got[d][2] - exp[d][2]) < 2e-6, (d, got[d], exp[d])
    # the importance signal is live: target-language docs score higher
    # on the length-normalized ratio than non-target docs on average
    en = [exp[d][2] for d in exp if is_en[d]]
    other = [exp[d][2] for d in exp if not is_en[d]]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_token_budget_matches_python_reference(spark):
    """Independent pure-Python recomputation of the UniMax-style
    token-budget selection over sf0.001: sqrt-of-mass integer budgets,
    md5-hash order within source, whole-doc-fits admission. Also pins
    the two semantic invariants: per-source selected tokens never
    exceed the source budget, and no source is over-admitted relative
    to the flattened share."""
    import hashlib
    import math
    import re

    import pandas as pd

    from voter_gateway_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_id, r.source, r.n_tokens)
        for r in QUERIES["sample_token_budget"](spark, sf).collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text", "source"]]
    rows = [
        (
            int(r.doc_id),
            r.source,
            len([t for t in re.sub(r"\s+", " ", r.text).strip().lower().split(" ") if t]),
            hashlib.md5(str(int(r.doc_id)).encode()).hexdigest(),
        )
        for r in docs.itertuples()
    ]
    tot = {}
    for _, s, n, _h in rows:
        tot[s] = tot.get(s, 0) + n
    w = {s: int(math.floor(math.sqrt(t))) for s, t in tot.items()}
    t_half = sum(tot.values()) // 2
    w_sum = sum(w.values())
    budget = {s: t_half * w[s] // w_sum for s in tot}
    # prefix-cut semantics (what the query computes): the cumulative
    # sum runs over ALL docs in hash order, so the selected set is the
    # maximal prefix of each source's stream where every doc still
    # fits — NOT greedy-with-skip (a non-fitting doc ends the source's
    # admission; later smaller docs are not back-filled)
    exp = set()
    cum = {s: 0 for s in tot}
    for d, s, n, _h in sorted(rows, key=lambda r: (r[1], r[3], f"{r[0]:020d}")):
        if cum[s] + n <= budget[s]:
            exp.add((d, s, n))
        cum[s] += n
    assert got == exp
    # invariants: budgets respected, and the sqrt flattening admitted a
    # HIGHER fraction of small sources than of the largest source
    sel_tok = {}
    for _, s, n in got:
        sel_tok[s] = sel_tok.get(s, 0) + n
    assert all(sel_tok.get(s, 0) <= budget[s] for s in tot)
    big = max(tot, key=tot.get)
    small = min(tot, key=tot.get)
    assert budget[small] / tot[small] >= budget[big] / tot[big]


def test_encoding_anomaly_sensitivity_and_specificity(spark):
    """The oracle run on the clean fixture only proves specificity
    (all-zero counts); this pins SENSITIVITY on injected damage, per
    detector, plus exact counts — and that clean multilingual text
    with legitimate non-ASCII does NOT trip the mojibake detector."""
    from voter_gateway_spark.operators.text import encoding_anomaly

    rows = [
        (1, "perfectly clean ascii text."),
        (2, "café naïve résumé straße"),  # real accents: clean
        (3, "bad\ufffdbyte and another \ufffd"),  # 2 replacement chars
        (4, "ctrl\x01chars\x02here\x1f and \x85"),  # 4 control chars
        # mangled smart quotes: 'â€œ' ... 'â€\x9d' — two 'â€' signatures,
        # and the trailing U+009D is ALSO a stray C1 control char
        (5, "smart quote gone wrong: \u00e2\u20ac\u0153hello\u00e2\u20ac\u009d"),
        (6, "double encoded: caf\u00c3\u00a9 and se\u00c3\u00b1or"),  # Ã© Ã±
        (7, "A-circumflex smear: \u00c2\u00a0nbsp\u00c2\u00bfq"),  # Â+nbsp, Â¿
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in encoding_anomaly(df).collect()}
    assert got[1] == {"doc_id": 1, "n_replacement": 0, "n_control": 0,
                      "n_mojibake": 0, "is_suspect": False}
    # legitimate Latin-1 accents must NOT flag (specificity on real text)
    assert got[2]["n_mojibake"] == 0 and not got[2]["is_suspect"]
    assert got[3]["n_replacement"] == 2 and got[3]["is_suspect"]
    assert got[4]["n_control"] == 4 and got[4]["is_suspect"]
    assert got[5]["n_mojibake"] == 2 and got[5]["is_suspect"]
    assert got[5]["n_control"] == 1  # the stray U+009D
    # 'Ã©' and 'Ã±' both match Ã + U+0080..U+00BF
    assert got[6]["n_mojibake"] == 2 and got[6]["is_suspect"]
    # 'Â '(nbsp) and 'Â¿' both match Â + U+0080..U+00BF
    assert got[7]["n_mojibake"] == 2 and got[7]["is_suspect"]


def test_source_overlap_matches_python_reference(spark):
    """Independent recomputation of the exact-pair side from raw
    fingerprints (true all-pairs over each duplicate group, which the
    engine deliberately avoids via count products) and of the near-pair
    side from the catalog's own verified ngram pair query — plus matrix
    invariants (canonical source order, no all-zero rows)."""
    import hashlib
    import re
    from collections import Counter
    from itertools import combinations

    from voter_gateway_spark.queries import QUERIES, _t

    sf = "/root/testdata/sf0.001"
    got = {
        (r.source_a, r.source_b): (r.n_exact_pairs, r.n_near_pairs)
        for r in QUERIES["corpus_source_overlap"](spark, sf).collect()
    }
    assert all(a <= b for a, b in got)
    assert all(e + n > 0 for e, n in got.values())

    docs = _t(spark, sf, "documents").select("doc_id", "source", "text").collect()
    src = {r.doc_id: r.source for r in docs}
    fp_groups: dict[str, list[int]] = {}
    for r in docs:
        norm = re.sub(r"\s+", " ", r.text).strip().lower()
        f = hashlib.md5(norm.encode()).hexdigest()
        fp_groups.setdefault(f, []).append(r.doc_id)
    exp_exact: Counter = Counter()
    for ids in fp_groups.values():
        for x, y in combinations(sorted(ids), 2):
            sa, sb = sorted((src[x], src[y]))
            exp_exact[(sa, sb)] += 1
    fp_of = {i: f for f, ids in fp_groups.items() for i in ids}
    exp_near: Counter = Counter()
    for r in QUERIES["dedup_ngram_jaccard"](spark, sf).collect():
        # near is STRICTLY near: exact-fingerprint pairs count only on
        # the exact side (disjoint columns, r8 advice fix)
        if fp_of[r.id_a] == fp_of[r.id_b]:
            continue
        sa, sb = sorted((src[r.id_a], src[r.id_b]))
        exp_near[(sa, sb)] += 1
    exp = {
        k: (exp_exact.get(k, 0), exp_near.get(k, 0))
        for k in set(exp_exact) | set(exp_near)
    }
    assert got == exp
    # the fixture actually exercises the cross-source case
    assert any(a != b for a, b in got)


def test_quality_by_source_matches_python_reference(spark):
    """Per-source mean/stddev/share-low/z recomputed in pure Python
    from the catalog's own per-doc quality query."""
    import math

    from voter_gateway_spark.queries import QUERIES, _t

    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents").select("doc_id", "source").collect()
    src = {r.doc_id: r.source for r in docs}
    q = {r.doc_id: r.quality for r in QUERIES["text_quality"](spark, sf).collect()}
    by_src: dict[str, list[float]] = {}
    for d, s in src.items():
        by_src.setdefault(s, []).append(q[d])
    allq = list(q.values())
    gm = sum(allq) / len(allq)
    gsd = math.sqrt(sum((x - gm) ** 2 for x in allq) / len(allq))
    got = {
        r.source: r
        for r in QUERIES["text_quality_by_source"](spark, sf).collect()
    }
    assert set(got) == set(by_src)
    for s, vals in by_src.items():
        m = sum(vals) / len(vals)
        sd = math.sqrt(sum((x - m) ** 2 for x in vals) / len(vals))
        lo = sum(1 for x in vals if x < 0.45) / len(vals)
        r = got[s]
        assert r.n_docs == len(vals)
        assert abs(r.mean_quality - m) < 2e-6, s
        assert abs(r.stddev_quality - sd) < 2e-6, s
        assert abs(r.share_low_quality - lo) < 2e-6, s
        assert abs(r.z_mean - (m - gm) / gsd) < 2e-6, s


def test_gopher_rules_per_rule_sensitivity(spark):
    """One injected violation per rule, each failing EXACTLY its own
    rule (plus pass_gopher), with a control doc that passes all seven —
    so a threshold or detector regression is attributed to the rule
    that broke. The empty doc pins the explicit degenerate-denominator
    convention (all word-denominated rules false, never NULL)."""
    from voter_gateway_spark.operators.text import gopher_rules

    good = ("the cat and the dog went to the market of the town that "
            "have been with them for many good years " * 2 +
            "extra words fill this document nicely with plain prose "
            "about the weather and the harvest that people have with")
    rows = [
        (1, good),                                     # control: passes
        (2, "the cat and that have with to of"),       # word_count (8 words)
        (3, " ".join(["a"] * 30 + ["the", "be", "to", "of", "and",
                                   "that", "have", "with"] * 3)),  # mean len < 3
        (4, good + " " + "dealing... " * 8 + "end"),   # symbol ratio > 0.1
        (5, "\n".join(["- the documents and the weather market harvest"]
                      * 10)),                          # all lines bulleted
        (6, "\n".join([good[:100] + "..."] * 10)),     # all lines ellipsis
        (7, good + " " + " ".join(str(i) for i in range(100, 500))),  # alpha<0.8
        (8, " ".join(["zebra lion tiger puma"] * 20)),  # no stop words
        (9, ""),                                        # degenerate empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in gopher_rules(df).collect()}
    rule_cols = ["ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
                 "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
                 "ok_stop_words"]
    assert all(got[1][c] for c in rule_cols) and got[1]["pass_gopher"]
    expected_broken = {
        2: "ok_word_count", 3: "ok_mean_word_len", 4: "ok_symbol_ratio",
        5: "ok_bullet_lines", 6: "ok_ellipsis_lines", 7: "ok_alpha_words",
        8: "ok_stop_words",
    }
    for doc, broken in expected_broken.items():
        assert not got[doc][broken], (doc, broken, got[doc])
        assert not got[doc]["pass_gopher"]
        for c in rule_cols:
            if c != broken:
                assert got[doc][c], (doc, c, got[doc])
    # empty doc: every word-denominated rule is EXPLICITLY false (the
    # line rules see one empty line -> 0 shares -> pass; stop words 0)
    e = got[9]
    for c in ["ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
              "ok_alpha_words", "ok_stop_words"]:
        assert e[c] is False, (c, e)
    assert e["ok_bullet_lines"] and e["ok_ellipsis_lines"]
    assert e["pass_gopher"] is False


def test_trigram_logprob_matches_python_reference(spark):
    """Pure-Python chained Stupid Backoff recomputation on the sf0.001
    fixture — trains on the even-doc_id half exactly like the engine,
    checks every doc's mean log-score, backoff rates, and that BOTH
    backoff branches are actually live on the scored half."""
    import math
    import re
    from collections import Counter

    from voter_gateway_spark.queries import QUERIES, _t

    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents").select("doc_id", "text").collect()
    toks = {
        r.doc_id: [w for w in re.sub(r"\s+", " ", r.text).strip().lower().split(" ") if w]
        for r in docs
    }
    uni: Counter = Counter()
    big: Counter = Counter()
    tri: Counter = Counter()
    for d, t in toks.items():
        if d % 2 == 0:
            uni.update(t)
            big.update(zip(t, t[1:]))
            tri.update(zip(t, t[1:], t[2:]))
    n = float(sum(uni.values()))
    exp = {}
    n_bi_backoff = n_uni_backoff = 0
    for d, t in toks.items():
        pos = list(zip(t, t[1:], t[2:]))
        if not pos:
            continue
        scores, nback, nuback = [], 0, 0
        for p1, p2, c in pos:
            if (p1, p2, c) in tri:
                scores.append(math.log(tri[(p1, p2, c)] / big[(p1, p2)]))
            elif (p2, c) in big:
                scores.append(math.log(0.4 * big[(p2, c)] / uni[p2]))
                nback += 1
            else:
                scores.append(math.log(0.16 * uni.get(c, 1) / n))
                nback += 1
                nuback += 1
        n_bi_backoff += nback - nuback
        n_uni_backoff += nuback
        exp[d] = (
            len(pos),
            round(sum(scores) / len(pos), 6),
            round(nback / len(pos), 6),
            round(nuback / len(pos), 6),
        )
    # the split must exercise both backoff branches or the test is vacuous
    assert n_bi_backoff > 0 and n_uni_backoff > 0
    got = {
        r.doc_id: (r.n_trigrams, r.mean_logprob, r.backoff_rate,
                   r.unigram_backoff_rate)
        for r in QUERIES["text_trigram_logprob"](spark, sf).collect()
    }
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0]
        for i in (1, 2, 3):
            assert abs(got[d][i] - exp[d][i]) < 1e-9, (d, got[d], exp[d])


def test_nb_quality_score_separates_heldout_classes(spark, sf_dir):
    """The hashed-unigram naive-Bayes scorer must generalize its
    bootstrap labels: on the ODD-id half (unseen by the even-id
    trainer), gopher-pass docs must average a strictly higher
    log-odds score than gopher-fail docs, and the admit flag must be
    exactly score >= 0. Also pins the held-out discipline: training
    on the even half means an odd doc's score is pure vocabulary
    evidence, not memorized labels."""
    from voter_gateway_spark.operators.text import gopher_rules
    from voter_gateway_spark.queries import (
        QUALITY_GATE_MIN_STOP_WORDS,
        QUALITY_GATE_MIN_WORDS,
        text_nb_quality_score,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lab = {
        r["doc_id"]: r["pass_gopher"]
        for r in gopher_rules(
            docs,
            min_words=QUALITY_GATE_MIN_WORDS,
            min_stop_words=QUALITY_GATE_MIN_STOP_WORDS,
        ).collect()
    }
    rows = text_nb_quality_score(spark, sf_dir).collect()
    assert all((r["nb_score"] >= 0) == r["admit"] for r in rows)
    heldout = [r for r in rows if r["doc_id"] % 2 == 1]
    pos = [r["nb_score"] for r in heldout if lab[r["doc_id"]]]
    neg = [r["nb_score"] for r in heldout if not lab[r["doc_id"]]]
    assert pos and neg
    assert sum(pos) / len(pos) > sum(neg) / len(neg)


def test_nb_calibration_cells_are_consistent(spark, sf_dir):
    """The held-out confusion table must be internally consistent:
    at most 4 cells, shares summing to 1, cell counts summing to the
    held-out scored-doc count, admit cells on the correct side of the
    0 log-odds threshold, and the diagonal carrying the majority of
    the mass (the classifier must beat label-shuffling on its own
    bootstrap labels)."""
    from voter_gateway_spark.queries import (
        text_nb_calibration,
        text_nb_quality_score,
    )

    cells = text_nb_calibration(spark, sf_dir).collect()
    assert 1 <= len(cells) <= 4
    assert abs(sum(c["share"] for c in cells) - 1.0) < 1e-4
    heldout_n = (
        text_nb_quality_score(spark, sf_dir)
        .where("doc_id % 2 = 1")
        .count()
    )
    assert sum(c["n_docs"] for c in cells) == heldout_n
    for c in cells:
        if c["admit"]:
            assert c["avg_nb_score"] >= 0
        else:
            assert c["avg_nb_score"] < 0
    diag = sum(c["n_docs"] for c in cells if c["admit"] == c["pass_gopher"])
    assert diag > heldout_n / 2


def test_nb_score_rerun_deterministic_across_fold_orders(spark, sf_dir):
    """nb_score must not depend on shuffle/fold order: weights lie on
    the 1e-9 grid, so a float avg can land exactly on a .5e-6 rounding
    boundary where partial-sum order decides the side (the documented
    rounded-mean boundary-flake class — its tell is a FAIL-then-PASS
    rerun). score_from_buckets computes an exact bigint sum instead;
    two runs at different shuffle-partition counts (different fold
    shapes) must agree bit-for-bit."""
    from voter_gateway_spark.queries import text_nb_quality_score

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(tuple, text_nb_quality_score(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "31")
        b = sorted(map(tuple, text_nb_quality_score(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_nb_score_from_buckets_rejects_bucket_mismatch(spark):
    """A token_buckets frame hashed with a different bucket count than
    the reference must be rejected loudly (silently scoring against
    the wrong buckets is a wrong answer with no symptom)."""
    import pytest

    from voter_gateway_spark.operators import nbq

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 5),
         (2, "zzz qqq xxx " * 10)],
        "doc_id long, text string",
    )
    ref = nbq.build_reference(docs, min_words=5, min_stop_words=1)
    frame = nbq.token_buckets(docs, buckets=ref.buckets // 2)
    with pytest.raises(AssertionError, match="buckets"):
        nbq.score_from_buckets(frame, ref, buckets=ref.buckets // 2)
