"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting.

All are pure built-in Column expressions — JVM-side, whole-stage
codegen, no Python in the hot path. Every formula is deliberately
expressible in portable ANSI SQL so the DuckDB oracle can replicate it
exactly (the md5-based fingerprints are engine-independent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- token counting -----------------------------------------------------------

def normalized(col: Column | str) -> Column:
    """Whitespace-collapsed, trimmed text."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def token_count(col: Column | str, norm_col: Column | None = None) -> Column:
    """Whitespace token count. `norm_col` optionally supplies an
    already-projected `normalized()` column: composite plans that score
    quality + language + fingerprint in one filter must stage the
    normalize pass once, or each consumer inlines the regexp subtree
    and the fused whole-stage method outgrows janino's limits (observed:
    codegen falls back to interpreted on pipeline_corpus_prep)."""
    n = norm_col if norm_col is not None else normalized(col)
    return F.when(n == "", F.lit(0)).otherwise(F.size(F.split(n, " ")))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish proxy: count of word/number/punctuation units
    (`\\w+` runs or single non-space symbols), the standard pre-tokenizer
    regex family. Portable: implemented as length arithmetic."""
    # number of matches of [A-Za-z0-9]+ plus count of other non-space chars
    s = _c(col)
    words = F.size(F.filter(F.split(F.regexp_replace(s, r"[^A-Za-z0-9]+", " "), " "), lambda x: x != ""))
    symbols = F.length(F.regexp_replace(s, r"[A-Za-z0-9\s]", ""))
    return words + symbols


# -- quality scoring ----------------------------------------------------------

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def occurrence_count(col: Column | str, needle: str) -> Column:
    """Non-overlapping occurrence count via length arithmetic —
    identical semantics in Spark and ANSI SQL (portable oracle)."""
    s = _c(col)
    return (F.length(s) - F.length(F.replace(s, F.lit(needle), F.lit("")))) / len(needle)


def tokens(col: Column | str, lower: bool = False, norm_col: Column | None = None) -> Column:
    """Whitespace tokens of normalized text (array<string>, empties
    dropped). `norm_col` optionally supplies a projected `normalized()`
    column — see token_count."""
    n = norm_col if norm_col is not None else normalized(col)
    s = F.lower(n) if lower else n
    return F.filter(F.split(s, " "), lambda w: w != "")


def token_set_count(words: Column, needles: list[str]) -> Column:
    """Count of tokens that belong to `needles`.

    This is the marker-counting primitive for stopword and language
    scoring. It is deliberately a higher-order filter over a token
    array, NOT a padded-string replace loop: each needle's
    length-minus-replace pass scans the full text and duplicates its
    input subtree twice, so a composite score inlined into a pushed
    filter predicate generated > 64 KB per method and knocked the whole
    stage out of codegen (janino hard limit; observed on
    pipeline_corpus_prep). One split + one array filter generates
    constant-size code no matter how many needles, and scans the text
    once. DuckDB mirror:
    len(list_filter(string_split(norm, ' '), x -> x IN (...)))."""
    return F.size(F.filter(words, lambda w: w.isin(*needles))).cast("int")


def stopword_count(
    col: Column | str,
    stopwords: list[str] | None = None,
    norm_col: Column | None = None,
    words_col: Column | None = None,
) -> Column:
    """Count of tokens equal to a stopword (case-sensitive, like the
    rest of the engine's normalized-text vocabulary)."""
    ws = words_col if words_col is not None else tokens(col, norm_col=norm_col)
    return token_set_count(ws, list(stopwords or STOPWORDS))


def punct_ratio(col: Column | str) -> Column:
    s = _c(col)
    punct = F.length(F.regexp_replace(s, r"[A-Za-z0-9\s]", ""))
    return F.round(punct / F.greatest(F.length(s), F.lit(1)), 6)


def quality_score(
    col: Column | str,
    norm_col: Column | None = None,
    words_col: Column | None = None,
) -> Column:
    """Composite heuristic quality in [0,1]: length factor, stopword
    presence, low punctuation — the classic cheap pre-filter trio.
    `norm_col`/`words_col`: see token_count / stopword_count."""
    s = _c(col)
    toks = token_count(s, norm_col=norm_col)
    length_factor = F.least(toks / F.lit(100.0), F.lit(1.0))
    stop_ratio = F.least(
        stopword_count(s, norm_col=norm_col, words_col=words_col)
        / F.greatest(toks, F.lit(1)),
        F.lit(1.0),
    )
    return F.round(
        0.4 * length_factor + 0.4 * stop_ratio + 0.2 * (1.0 - punct_ratio(s)), 6
    )


# -- language ID --------------------------------------------------------------

# marker-word profiles (n-gram heuristic): deterministic scoring, not
# linguistic truth. Tie-break = alphabetical language code.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "die", "nicht"],
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "que", "los"],
    "fr": ["le", "la", "et", "les"],
    "zh": ["的", "是", "了"],
}


def lower_tokens(col: Column | str) -> Column:
    """Lowercase whitespace tokens — project this ONCE (withColumn)
    when several scores reference it, so the split runs once per row
    (CollapseProject keeps a non-cheap multi-referenced alias staged)."""
    return tokens(col, lower=True)


def lang_scores(
    col: Column | str, words_col: Column | None = None
) -> dict[str, Column]:
    """Per-language marker-token counts over lowercase tokens.
    `words_col` optionally supplies a projected `lower_tokens()`
    column. Token counting, not padded-replace: see token_set_count
    for why (codegen size + single text scan)."""
    ws = words_col if words_col is not None else lower_tokens(col)
    return {lang: token_set_count(ws, words) for lang, words in LANG_MARKERS.items()}


def lang_id(col: Column | str, words_col: Column | None = None) -> Column:
    """argmax language with deterministic alphabetical tie-break;
    'und' (undetermined) when all scores are 0."""
    scores = lang_scores(col, words_col=words_col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reverse-alphabetical chain so earlier (alphabetical) wins last
    for lang in sorted(scores, reverse=True):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(expr)
    return expr


# -- fingerprinting -----------------------------------------------------------

def content_fingerprint(col: Column | str, norm_col: Column | None = None) -> Column:
    """Exact-content fingerprint: md5 of lowercase normalized text.
    md5 hex strings are engine-portable (same in DuckDB).
    `norm_col`: see token_count."""
    n = norm_col if norm_col is not None else normalized(col)
    return F.md5(F.lower(n).cast("binary"))


def lower_words(col: Column | str) -> Column:
    """split(lower(normalized), ' ') — project once before shingling."""
    return F.split(F.lower(normalized(col)), " ")


def shingle_fingerprint(col: Column | str, k: int = 3, words_col: Column | None = None) -> Column:
    """Document fingerprint robust to local edits: the minimum md5 over
    word k-shingles (a 1-permutation minhash). Portable to SQL.

    The word list is bound as a lambda variable (transform over a
    one-element array) so the split subtree evaluates once per row,
    not once per shingle (see dedup_ops.word_shingles). `words_col`
    optionally supplies an already-projected word list."""

    def build(words: Column) -> Column:
        n = F.size(words)
        idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
        shingles = F.transform(
            idx,
            # try_element_at, not element_at: short docs (< k words)
            # index past the array and ANSI mode throws; NULL is
            # skipped by concat_ws, matching DuckDB's wl[i+j] → NULL.
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(words, (i + j).cast("int")) for j in range(k)]
            ),
        )
        return F.array_min(F.transform(shingles, lambda s: F.md5(s.cast("binary"))))

    words = words_col if words_col is not None else lower_words(col)
    return F.element_at(F.transform(F.array(words), build), 1)


# -- repetition / boilerplate -------------------------------------------------

def repetition_stats(col: Column | str, k: int = 3) -> dict[str, Column]:
    """Intra-document repetition signals from word k-shingles:
    n_shingles (with multiplicity), n_distinct, and repetition =
    1 - distinct/total — the cheap boilerplate/degenerate-text filter
    (repeated headers, keyword stuffing, decoding loops score high).

    Pure column expressions over one shingle pass — no explode, no
    shuffle; composes into a scan-stage filter like quality_score."""
    from voter_gateway_spark.operators.dedup_ops import word_shingles

    sh = word_shingles(col, k, distinct=False)
    total = F.size(sh)
    distinct = F.size(F.array_distinct(sh))
    return {
        "n_shingles": total.cast("bigint"),
        "n_distinct": distinct.cast("bigint"),
        "repetition": F.round(1.0 - distinct / total, 6),
    }


# -- PII scrubbing -------------------------------------------------------------

# deliberately simple, engine-portable patterns (Java regex and RE2
# agree on this subset): the point is the scrub PLAN (count + redact in
# one scan-stage projection), not regex sophistication
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (on the ORIGINAL text — counts are
    independent of redaction order)."""
    s = _c(col)
    return {
        f"n_{name}": F.regexp_count(s, F.lit(pat)).cast("bigint")
        for name, (pat, _) in PII_PATTERNS.items()
    }


def pii_scrub(col: Column | str) -> Column:
    """Text with all PII categories redacted to typed placeholders.
    Applied in PII_PATTERNS order (email before the digit patterns so
    an address's digits can't be half-eaten by the phone rule)."""
    s = _c(col)
    for pat, repl in PII_PATTERNS.values():
        s = F.regexp_replace(s, pat, repl)
    return s


# -- character entropy ---------------------------------------------------------

def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_chars: int = 2048,
    round_to: int = 4,
) -> DataFrame:
    """Shannon entropy (bits/char) of the character distribution over
    each document's first `prefix_chars` characters — the cheap
    gibberish / encoding-noise / base64-blob detector (natural text
    sits ~3.5–4.5 bits; random base64 ≳ 5.7; 'aaaa…' → 0).

    The prefix cap is what makes this scale: entropy stabilizes within
    a couple of KB, and capping bounds the per-doc explode at
    `prefix_chars` rows, so the (id, char) shuffle is O(docs × cap),
    not O(corpus bytes). One explode + two aggregations (map-side
    combine on (id, char)); H = log2(N) − (Σ c·log2 c)/N avoids
    computing probabilities per row. Empty docs report entropy 0.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.substring(F.col(text_col), 1, prefix_chars), "")).alias("_ch"),
    ).where(F.col("_ch") != "")
    counts = chars.groupBy(id_col, "_ch").agg(F.count(F.lit(1)).alias("_c"))
    log2 = float(__import__("math").log(2.0))
    stats = (
        counts.groupBy(id_col)
        .agg(
            F.sum("_c").alias("_n"),
            F.sum(F.col("_c") * F.log("_c")).alias("_clogc"),
        )
        .select(
            id_col,
            F.col("_n").cast("bigint").alias("n_chars_sampled"),
            F.round(
                F.log("_n") / F.lit(log2) - F.col("_clogc") / (F.col("_n") * F.lit(log2)),
                round_to,
            ).alias("entropy_bits"),
        )
    )
    # empty docs drop at the explode; join them back at entropy 0
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chars_sampled", F.lit(0)).cast("bigint").alias("n_chars_sampled"),
            F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
        )
    )


# -- chunking -----------------------------------------------------------------

def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token windows — the
    context-window packing step of an LLM data pipeline.

    Output: (id, chunk_idx, chunk, n_chunk_tokens), chunk_idx 0-based;
    consecutive chunks share `overlap` tokens. Pure column expressions:
    the word list is projected ONCE, chunk indices come from `sequence`,
    and each chunk is a `slice` + `concat_ws` — one explode, no Python,
    no shuffle at all (narrow transformation; chunks stay co-partitioned
    with their documents, which is exactly what a downstream
    per-document aggregation wants).

    Empty/short docs yield one (possibly short or empty) chunk, so no
    document silently disappears.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    words = F.filter(
        F.split(F.lower(normalized(text_col)), " "), lambda w: w != ""
    )
    # NULL text → NULL word list → NULL sizes downstream (the chunk row
    # would carry n_chunk_tokens = NULL instead of 0); normalize to an
    # empty list so NULL-text docs behave exactly like empty docs
    words = F.coalesce(words, F.array().cast("array<string>"))
    base = df.select(F.col(id_col), words.alias("_words"))
    n = F.size("_words")
    n_chunks = F.greatest(F.ceil((n - overlap) / F.lit(step)), F.lit(1)).cast("int")
    chunks = base.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        "_words",
    )
    piece = F.slice(F.col("_words"), F.col("chunk_idx") * step + 1, chunk_tokens)
    return chunks.select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", piece).alias("chunk"),
        F.size(piece).alias("n_chunk_tokens"),
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 3,
    min_docs: int = 4,
) -> DataFrame:
    """Corpus-frequency boilerplate removal — the CCNet/RefinedWeb
    per-line dedup step, generalized to fixed `seg_words`-word segments
    for corpora whose documents carry no line structure: a segment that
    appears verbatim in ≥ `min_docs` DISTINCT documents (headers,
    navigation, license blurbs — crawl boilerplate) is dropped from
    EVERY document; the survivors reassemble in their original order.

    Output: (id, clean_text, n_segments, n_removed) — one row per
    input document, including documents whose every segment was
    removed (clean_text = '') and empty documents (0 segments).

    Scale shape: segment rows shuffle ONCE keyed by the segment string
    to count distinct docs (map-side partial first); the boilerplate
    set — typically a vanishing fraction — comes back via a left-anti
    join on the same key (AQE broadcasts it when small); reassembly is
    one per-document aggregation with the ordinal riding a
    struct(array_sort(collect_list)) — no window, no per-doc sort
    shuffle beyond the doc-keyed exchange. No step is quadratic in
    corpus size or duplication factor.

    Reference shape: csv_driver.rb's remove_expression strips per-ROW
    noise at ingest; this is its corpus-frequency generalization (the
    noise definition is learned from the data, not configured).
    """
    words = F.filter(
        F.split(F.lower(normalized(text_col)), " "), lambda w: w != ""
    )
    base = df.select(F.col(id_col), words.alias("_words")).select(
        id_col,
        "_words",
        F.ceil(F.size("_words") / F.lit(seg_words)).cast("int").alias("_nseg"),
    )
    # sequence(0, -1) would generate a DESCENDING [0, -1] — guard empty
    segs = base.select(
        id_col,
        "_nseg",
        F.explode(
            F.when(
                F.col("_nseg") > 0, F.sequence(F.lit(0), F.col("_nseg") - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("_idx"),
        "_words",
    ).select(
        id_col,
        "_nseg",
        "_idx",
        F.concat_ws(
            " ", F.slice(F.col("_words"), F.col("_idx") * seg_words + 1, seg_words)
        ).alias("_seg"),
    )
    boilerplate = (
        segs.groupBy("_seg")
        .agg(F.countDistinct(id_col).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("_seg", F.lit(True).alias("_bp"))
    )
    # flag-and-aggregate instead of anti-join + rejoin-to-base: every
    # doc with ≥1 segment keeps its rows (fully-boilerplate docs
    # aggregate to clean_text ''), so no second doc-keyed join is
    # needed — and the plan is not count()-eliminable, which keeps
    # bench timings honest (a LEFT join back to a unique-key aggregate
    # is dropped whole by Catalyst when only the row count is asked)
    flagged = segs.join(boilerplate, "_seg", "left")
    rebuilt = flagged.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_bp").isNull(), F.struct("_idx", "_seg"))
                    )
                ),
                lambda s: s["_seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.count("_bp").cast("bigint").alias("n_removed"),
    )
    # NULL text gives _nseg = NULL (size(NULL) is NULL), which passes
    # NEITHER the explode guard nor an == 0 test — without the isNull
    # arm such documents would vanish, breaking the one-row-per-input
    # contract; they report as empty documents instead
    empty = base.where(
        (F.col("_nseg") == 0) | F.col("_nseg").isNull()
    ).select(
        id_col,
        F.lit("").alias("clean_text"),
        F.lit(0).cast("bigint").alias("n_segments"),
        F.lit(0).cast("bigint").alias("n_removed"),
    )
    return rebuilt.unionByName(empty)


# -- vocabulary ---------------------------------------------------------------

def token_frequencies(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    doc_freq: bool = True,
    id_col: str | None = None,
) -> DataFrame:
    """Corpus vocabulary: (token, count[, doc_count]) over lowercase
    whitespace tokens — the BPE-training / stopword-mining precursor.

    One explode + one aggregation; `doc_count` (documents containing
    the token) rides the same shuffle as a count(distinct doc marker)
    replaced by a pre-distinct per doc, so no second pass over text.

    Pass `id_col` when the table has a row identity. Otherwise an id is
    synthesized in a projection BELOW the explode — putting
    monotonically_increasing_id in the same select as the generator
    evaluates it per generated row (every token gets its own "doc"),
    which silently turns doc_count into count.
    """
    if id_col is None:
        base = df.select(
            F.monotonically_increasing_id().alias("_doc"), F.col(text_col)
        )
    else:
        base = df.select(F.col(id_col).alias("_doc"), F.col(text_col))
    toks = base.select(
        "_doc",
        F.explode(
            F.filter(F.split(F.lower(normalized(text_col)), " "), lambda w: w != "")
        ).alias("token"),
    )
    if doc_freq:
        # distinct (doc, token) first: the doc-frequency aggregate then
        # needs no count(distinct) (two-phase shuffle) downstream
        per_doc = toks.groupBy("_doc", "token").agg(
            F.count(F.lit(1)).alias("_n")
        )
        out = per_doc.groupBy("token").agg(
            F.sum("_n").alias("count"), F.count(F.lit(1)).alias("doc_count")
        )
    else:
        out = toks.groupBy("token").agg(F.count(F.lit(1)).alias("count"))
    return out.where(F.col("count") >= min_count)


# -- encoding-anomaly detection ------------------------------------------------

# Mojibake / encoding-damage signatures (public knowledge):
#  - U+FFFD REPLACEMENT CHARACTER: a decoder already gave up.
#  - C0/C1 control chars (minus \t\n\r): binary junk or charset smear.
#  - UTF-8-read-as-Latin-1 artifacts: lead byte 0xC3/0xC2 mis-decoded
#    becomes 'Ã'/'Â' + a char in U+0080..U+00BF; 'â€' is the mangled
#    smart-quote family (U+2018..U+201D).
REPLACEMENT_RE = "\ufffd"
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"
MOJIBAKE_RE = "(\u00e2\u20ac|\u00c3[\u0080-\u00bf]|\u00c2[\u0080-\u00bf])"


def encoding_anomaly(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     extra_cols: list[str] | None = None) -> DataFrame:
    """Per-row encoding-damage counts + the is_suspect curation flag.
    Three scan-stage regexp_count exprs — no UDF, no shuffle. The
    reference guards its ingest against this damage class at the CSV
    boundary (csv_driver.rb Latin-1 handling, malformed-row filters);
    this runs the same check on already-ingested text.

    `extra_cols` passes input columns through to the output — the
    streaming admission path (streaming/quality.py) filters on
    is_suspect in-stream and must keep the payload without a
    stream-to-stream self-join."""
    t = _c(text_col)
    return df.select(
        id_col,
        *(extra_cols or []),
        F.regexp_count(t, F.lit(REPLACEMENT_RE)).cast("bigint").alias("n_replacement"),
        F.regexp_count(t, F.lit(CONTROL_RE)).cast("bigint").alias("n_control"),
        F.regexp_count(t, F.lit(MOJIBAKE_RE)).cast("bigint").alias("n_mojibake"),
        (
            F.regexp_count(
                t, F.lit(f"({REPLACEMENT_RE}|{CONTROL_RE}|{MOJIBAKE_RE})")
            )
            > 0
        ).alias("is_suspect"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_SYMBOL_RE = r"(#|\.\.\.|…)"
GOPHER_BULLET_RE = r"^[•\-\*]"
GOPHER_ELLIPSIS_END_RE = r"(\.\.\.|…)$"


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_words: int = 2,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021 §A1.1, public;
    the same composite RedPajama/Dolma reuse): per-document booleans
    for each rule plus the conjunctive pass flag. Rules, with the
    paper's thresholds:

      ok_word_count     50 <= n_words <= 100,000
      ok_mean_word_len  mean word length in [3, 10]
      ok_symbol_ratio   (# + ellipsis occurrences) / n_words <= 0.1
      ok_bullet_lines   <= 90% of lines start with a bullet (•/-/*)
      ok_ellipsis_lines <= 30% of lines end with an ellipsis
      ok_alpha_words    >= 80% of words contain an ASCII letter
      ok_stop_words     >= `min_stop_words` DISTINCT Gopher stop
                        words present (paper default 2; relax for
                        corpora with sparse stop-word inventories)

    Scope: mean word length counts UTF-16 code units (Spark
    F.length), matching the DuckDB oracle only for BMP text — the
    same BMP-only scope as bpe.py documents; for non-BMP scripts the
    two engines can disagree on word length, so the engine-stable
    boolean claim below is scoped to BMP input (the alpha rule
    already restricts the filter to ASCII-lowercase corpora).

    Degenerate docs are decided explicitly, identically cross-engine:
    zero words fails every word-denominated rule via CASE (never a
    NULL/inf divide — Spark's non-ANSI 0-divide and DuckDB's IEEE one
    disagree); the line denominator is never 0 (split yields ['']).
    All ratio thresholds compare doubles computed from the same exact
    integers on both engines, so the booleans are engine-stable. One
    scan-stage projection — zero UDFs, zero shuffles, zero joins; the
    alpha test is ASCII-[a-z] by design (Gopher is an English-corpus
    filter; tokens arrive lowercased)."""
    zero = F.lit(False)
    staged = df.select(
        id_col,
        *(extra_cols or []),
        _c(text_col).alias("_t"),
        tokens(text_col, lower=True).alias("_w"),
        F.split(_c(text_col), "\n").alias("_l"),
    )
    nw = F.size("_w")
    sumlen = F.aggregate(
        "_w", F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    mwl = sumlen / nw
    nsym = F.regexp_count(F.col("_t"), F.lit(GOPHER_SYMBOL_RE))
    nl = F.size("_l")
    n_bullet = F.size(
        F.filter("_l", lambda l: F.ltrim(l).rlike(GOPHER_BULLET_RE))
    )
    n_ell = F.size(
        F.filter("_l", lambda l: F.rtrim(l).rlike(GOPHER_ELLIPSIS_END_RE))
    )
    n_alpha = F.size(F.filter("_w", lambda w: w.rlike("[a-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct("_w"),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    ok = {
        "ok_word_count": (nw >= min_words) & (nw <= max_words),
        "ok_mean_word_len": F.when(nw == 0, zero).otherwise(
            (mwl >= 3) & (mwl <= 10)
        ),
        "ok_symbol_ratio": F.when(nw == 0, zero).otherwise(
            nsym / nw <= 0.1
        ),
        "ok_bullet_lines": n_bullet / nl <= 0.9,
        "ok_ellipsis_lines": n_ell / nl <= 0.3,
        "ok_alpha_words": F.when(nw == 0, zero).otherwise(
            n_alpha / nw >= 0.8
        ),
        "ok_stop_words": n_stop >= min_stop_words,
    }
    passed = None
    for c in ok.values():
        passed = c if passed is None else (passed & c)
    return staged.select(
        id_col,
        *(extra_cols or []),
        nw.cast("bigint").alias("n_words"),
        *[c.alias(n) for n, c in ok.items()],
        passed.alias("pass_gopher"),
    )


# -- DataFrame-level convenience ---------------------------------------------

def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile of a documents table.

    Stages `normalized()` and `lower_tokens()` ONCE and threads them
    through every scorer via the norm_col/words_col parameters — this
    composite (quality + language + fingerprint in one projection) is
    exactly the shape that, with the subtrees inlined per consumer,
    outgrew janino's 64 KB method limit and fell out of whole-stage
    codegen (see token_count's docstring)."""
    staged = df.withColumn("_norm", normalized(text_col)).withColumn(
        "_lwords", lower_tokens(text_col)
    )
    n, w = F.col("_norm"), F.col("_lwords")
    return staged.select(
        *df.columns,
        token_count(text_col, norm_col=n).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        punct_ratio(text_col).alias("punct_ratio"),
        quality_score(text_col, norm_col=n, words_col=w).alias("quality"),
        lang_id(text_col, words_col=w).alias("lang_guess"),
        content_fingerprint(text_col, norm_col=n).alias("fingerprint"),
    )


def hashed_embedding(
    col: Column | str, dim: int = 16, norm_col: Column | None = None
) -> Column:
    """Deterministic hashing-trick text embedding (array<double>, one
    integer-valued component per dimension): every lowercased
    whitespace token contributes ±1 to each dimension, the sign drawn
    from one hex digit of the token's md5 (digit ≥ 8 → +1). The
    classic feature-hashing projection (Weinberger et al., ICML 2009
    — signed random projections from a hash), with md5 standing in
    for the hash family so BOTH engines draw identical signs: sums
    are exact integers, so the embedding is bit-reproducible
    cross-engine with no rounding contract at all.

    This is the bridge from the text family to the vector family: it
    gives `documents` an embedding column computable anywhere, which
    the ANN/dedup/cluster operators consume unchanged — repeated or
    templated texts land at identical vectors, near-duplicate token
    multisets at nearby ones (cosine ≈ token-overlap correlation).
    dim ≤ 32 (one md5 hex digit per dimension). Not a semantic
    model: a deterministic, dependency-free featurizer for plumbing,
    dedup blocking, and tests; swap in real model vectors for
    semantic similarity.

    Empty/whitespace-only text embeds as the zero vector (aggregate
    over an empty token array) — consumers doing cosine must filter
    zero-norm rows, as docs_ann_topk does.

    Shape matters for cost: the first cut ran one F.aggregate per
    dimension over `transform(toks, md5)` — Catalyst does NOT
    common-subexpression the transform across sibling aggregate
    expressions, so md5 ran dim× per token (measured 8 s to featurize
    5 000 docs at dim=16). Now each token's md5 is bound ONCE (the
    transform-over-1-element-array binding, the int8_quantize idiom)
    and expanded to a ±1 sign vector, and ONE aggregate zip_with-sums
    the sign vectors. ±1 integer adds are exact and associative in
    doubles, so the result is bit-identical to the per-dimension
    folds."""
    if not 1 <= dim <= 32:
        raise ValueError(f"dim must be in [1, 32], got {dim}")
    toks = tokens(col, lower=True, norm_col=norm_col)

    def _tok_signs(t: Column) -> Column:
        # bind the md5 hex ONCE per token; 16 substrings then read it
        return F.element_at(
            F.transform(
                F.array(F.md5(t)),
                lambda h: F.array(
                    *[
                        F.when(
                            F.conv(F.substring(h, j + 1, 1), 16, 10).cast("int")
                            >= 8,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                        for j in range(dim)
                    ]
                ),
            ),
            1,
        )

    return F.aggregate(
        F.transform(toks, _tok_signs),
        F.array(*[F.lit(0.0) for _ in range(dim)]),
        lambda acc, s: F.zip_with(acc, s, lambda a, b: a + b),
    )


def blocklist_counts(
    col: Column | str, terms: list[str], norm_col: Column | None = None
) -> Column:
    """Count of lowercased whitespace tokens EXACTLY matching any
    blocklist term — the C4/CCNet badword-filter primitive (C4 dropped
    any page containing a listed word; CCNet variants threshold on the
    count). Exact token match, not substring: substring matching is
    the documented false-positive trap of the original C4 list (the
    classic "Scunthorpe" class), and a pipeline wanting stem/substring
    semantics should normalize upstream instead.

    Scan-stage only (tokenize + in-row filter over a literal term
    list, no shuffle, no UDF) — the standard shape for the ≤~10³-term
    lists these filters use; route a genuinely large list through a
    broadcast semi-join on exploded tokens instead."""
    if not terms:
        raise ValueError("blocklist_counts needs at least one term")
    lowered = [t.lower() for t in terms]
    return token_set_count(tokens(col, lower=True, norm_col=norm_col), lowered)
