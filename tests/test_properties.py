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
    """Expanded emission (expand_pairs=True) must equal the naive
    O(n²) definition, including injected exact duplicates (the
    collapse path) and shared-shingle near-dups; the default collapsed
    emission must be a SUBSET carrying the same connectivity (same
    components) and the same keep-min-id survivor set."""
    from voter_gateway_spark.operators import dedup_ops

    docs = [" ".join(t) for t in texts for _ in range(dup_factor)]
    df = spark_prop.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup_ops.ngram_jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=0.3, expand_pairs=True
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

    collapsed = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup_ops.ngram_jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=0.3
        ).collect()
    }
    # subset with inherited values
    for k, v in collapsed.items():
        assert k in exp and abs(v - exp[k]) < 1e-6, (k, v)

    # same components (union-find over each edge set)
    def components(pair_keys, n):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pair_keys:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return tuple(find(i) for i in range(n))

    assert components(collapsed.keys(), len(docs)) == components(
        exp.keys(), len(docs)
    )
    # same keep-min-id survivor set ("losers = distinct id_b")
    assert {b for _, b in collapsed} == {b for _, b in exp}


@st.composite
def timeline_data(draw):
    n_l = draw(st.integers(1, 10))
    n_r = draw(st.integers(0, 10))
    ks = st.integers(1, 3)
    ts = st.integers(0, 50)
    left = [(i, draw(ks), draw(ts)) for i in range(n_l)]
    # right unique per (k, t): dedupe draws
    seen = set()
    right = []
    for i in range(n_r):
        k, t = draw(ks), draw(ts)
        if (k, t) not in seen:
            seen.add((k, t))
            right.append((k, t, i * 10))
    return left, right


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(timeline_data())
def test_as_of_join_matches_naive(spark_prop, data):
    """as_of_join (union-marker window plan) == the naive per-row
    argmax over right_time <= left_time."""
    from voter_gateway_spark.operators.relational import as_of_join

    spark = spark_prop
    left_rows, right_rows = data
    left = spark.createDataFrame(left_rows, "lid int, k int, t int")
    right = spark.createDataFrame(right_rows or [(99, -1, -1)], "k int, rt int, px int")
    if not right_rows:
        right = right.where("k < -100")  # empty frame with schema
    got = {r.lid: r.px for r in as_of_join(left, right, "k", "t", "rt").collect()}
    naive = {}
    for lid, k, t in left_rows:
        cands = [(rt, px) for (rk, rt, px) in right_rows if rk == k and rt <= t]
        naive[lid] = max(cands)[1] if cands else None
    assert got == naive


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(timeline_data())
def test_interval_join_matches_naive(spark_prop, data):
    """Banded interval_join == the naive theta join, for every bucket
    width (width must not change results, only the plan)."""
    from voter_gateway_spark.operators.relational import interval_join

    spark = spark_prop
    point_rows, iv_rows = data
    points = spark.createDataFrame(point_rows, "pid int, k int, t int")
    ivs = [(k, t, t + (px % 17), i) for i, (k, t, px) in enumerate(iv_rows)]
    intervals = spark.createDataFrame(ivs or [(0, 0, 0, 0)], "k int, s int, e int, ivid int")
    if not ivs:
        intervals = intervals.where("k < -100")
    naive = sorted(
        (pid, ivid)
        for (pid, k, t) in point_rows
        for (ik, s, e, ivid) in ivs
        if ik == k and s <= t <= e
    )
    for width in (1, 7, 100):
        out = interval_join(
            points, intervals, "k", "t", "s", "e",
            bucket_width=width, time_unit_expr=lambda c: c,
        )
        got = sorted((r.pid, r.ivid) for r in out.collect())
        assert got == naive, f"width={width}"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=6),
    st.integers(2, 8),
    st.integers(0, 3),
)
def test_chunking_covers_every_token_in_order(spark_prop, doc_lens, chunk_tokens, overlap):
    """Every token of every document appears in some chunk, and
    re-concatenating chunks (dropping the overlap prefix of each
    non-first chunk) reconstructs the document exactly."""
    from voter_gateway_spark.operators.text import chunk_text

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    spark = spark_prop
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(n))) for i, n in enumerate(doc_lens)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_text(df, chunk_tokens=chunk_tokens, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk
    for i, n in enumerate(doc_lens):
        chunks = [by_doc[i][k] for k in sorted(by_doc[i])]
        rebuilt = []
        for ci, ch in enumerate(chunks):
            toks = ch.split() if ch else []
            rebuilt.extend(toks if ci == 0 else toks[overlap:])
        assert rebuilt == [f"t{i}x{j}" for j in range(n)], (i, n, chunks)


@st.composite
def scrub_corpus(draw):
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    n_docs = draw(st.integers(1, 6))
    texts = [
        " ".join(
            draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=12))
        )
        for _ in range(n_docs)
    ]
    dup_factor = draw(st.integers(1, 3))
    return texts, dup_factor


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(scrub_corpus())
def test_substring_span_scrub_matches_naive(spark_prop, corpus):
    """substring_span_scrub must equal the naive per-doc definition:
    a position is duplicated iff its k-shingle occurs in any smaller-id
    doc; runs >= min_run cut tokens [start, start+run+k-2] (union
    mask); first occurrences keep their text."""
    from voter_gateway_spark.operators import dedup_ops

    texts, dup_factor = corpus
    docs = [(i, t) for i, t in enumerate(t for t in texts for _ in range(dup_factor))]
    k, min_run = 3, 2
    df = spark_prop.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens_removed, r.n_spans)
        for r in dedup_ops.substring_span_scrub(
            df, "doc_id", "text", k=k, min_run=min_run
        ).collect()
    }

    def words(t):
        return [w for w in t.lower().split() if w]

    def shingles(ws):
        m = max(len(ws) - (k - 1), 1)
        return [" ".join(ws[p : p + k]) for p in range(m)]

    first = {}
    for i, t in docs:
        for s in shingles(words(t)):
            first.setdefault(s, i)
    exp = {}
    for i, t in docs:
        ws = words(t)
        dup_pos = [p for p, s in enumerate(shingles(ws)) if first[s] < i]
        runs, cur = [], []
        for p in dup_pos:
            if cur and p == cur[-1] + 1:
                cur.append(p)
            else:
                if len(cur) >= min_run:
                    runs.append(cur)
                cur = [p]
        if len(cur) >= min_run:
            runs.append(cur)
        mask = set()
        for r in runs:
            mask.update(range(r[0], r[-1] + k))
        kept = [w for j, w in enumerate(ws) if j not in mask]
        exp[i] = (" ".join(kept), len(ws) - len(kept), len(runs))
    assert got == exp


# -- WAV codec vs the stdlib `wave` reference ---------------------------------


def _wav_reference_stats(payload: bytes) -> list[float]:
    """Independent decode via the stdlib `wave` module (the reference
    implementation the PNG codec's analytic oracle plays for images):
    parse with wave, compute the same 8 integer-exact statistics."""
    import io
    import wave as wave_mod

    import numpy as np

    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    n = s.size
    zc = int(np.count_nonzero(s[:-1] * s[1:] < 0))
    return [
        float(n), float(rate), float(s.sum()) / n,
        float(s.max()), float(s.min()), float(zc),
        float(np.abs(s).sum()) / n, float((s * s).sum()) / n,
    ]


def _inject_odd_chunk(payload: bytes, chunk_body: bytes) -> bytes:
    """Insert an auxiliary chunk (odd-length bodies exercise the RIFF
    word-alignment path: a pad byte follows, honored by both the
    engine decoder and stdlib wave/chunk) between fmt and data, fixing
    up the declared RIFF size."""
    import struct

    ln = len(chunk_body)
    aux = b"junk" + struct.pack("<I", ln) + chunk_body + (b"\x00" if ln & 1 else b"")
    data_at = payload.index(b"data", 12)
    out = payload[:data_at] + aux + payload[data_at:]
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=2, max_size=400
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
    odd_aux=st.one_of(
        st.none(), st.binary(min_size=1, max_size=9).filter(lambda b: len(b) & 1)
    ),
)
def test_wav_decode_matches_stdlib_wave_reference(samples, rate, odd_aux):
    """VERDICT r6 ask #8: the WAV codec's 8 statistics must agree
    bit-for-bit with an independent stdlib-`wave` decode over
    randomized PCM buffers, including payloads carrying an odd-length
    auxiliary chunk (the word-alignment path both parsers must honor
    identically)."""
    import numpy as np

    from voter_gateway_spark.operators.multimodal import make_wav, wav_decode

    payload = make_wav(rate, np.array(samples, dtype=np.int64))
    if odd_aux is not None:
        payload = _inject_odd_chunk(payload, odd_aux)
    assert wav_decode(payload) == _wav_reference_stats(payload)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["slow", "merge", "fast", "Join", "SLOW", "x"]),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=12,
    )
)
def test_blocklist_counts_match_python_reference(spark_prop, docs):
    """blocklist_counts must equal a naive lowercased exact-token count
    for arbitrary token sequences, including case variants (matching
    is case-insensitive on BOTH sides) and empty docs."""
    from voter_gateway_spark.operators import text as text_ops

    terms = ["slow", "merge", "zzzabsent"]
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark_prop.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id",
            text_ops.blocklist_counts("text", terms).alias("n"),
        ).collect()
    }
    lowered = {t.lower() for t in terms}
    for i, toks in enumerate(docs):
        expect = sum(1 for t in toks if t.lower() in lowered)
        assert got[i] == expect, (i, toks)


def test_graph_search_is_rerun_deterministic(spark, sf_dir):
    """Two constructions of the same beam search over the same graph
    must return IDENTICAL rows — the md5-seed/round-6/id-tie-break
    determinism contract the oracle depends on."""
    from voter_gateway_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") % 20 == 0)
    g = similarity.knn_graph(emb, k=4, rounds=1, iters=0)
    a = {
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in similarity.knn_graph_search(
            qs, emb, g, k=3, beam=6, hops=2, check_degree=False
        ).collect()
    }
    b = {
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in similarity.knn_graph_search(
            qs, emb, g, k=3, beam=6, hops=2, check_degree=False
        ).collect()
    }
    assert a == b and len(a) > 0
