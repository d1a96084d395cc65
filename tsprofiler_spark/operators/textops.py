"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side expressions (regex + array ops) so
they run identically as DuckDB oracle SQL and survive 100 TB scans without
Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsprofiler_spark.functions.hashing import h32
from tsprofiler_spark.functions.shingles import word_shingles

# tiny deterministic stopword lists for the n-gram language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "es", "un", "para"],
}


def _tokens(text_col):
    return F.split(F.lower(text_col), " ")


def _stop_hits(tokens, words: list[str]):
    return F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in words])))


def token_counts(documents: DataFrame) -> DataFrame:
    """Single-space tokens + BPE-ish sub-word pieces (split on ' ' only —
    punctuation/newlines stay attached to their token, matching the
    corpus's space-joined synthetic text; ceil(len/4) pieces per token
    approximates byte-pair granularity; the driver oracle pins this exact
    tokenization)."""
    tokens = _tokens(F.col("text"))
    word_tokens = F.size(tokens)
    distinct_tokens = F.size(F.array_distinct(tokens))
    # BPE-ish: ceil(len(token)/4) pieces per token, summed
    bpe_pieces = F.aggregate(
        tokens,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("bigint"),
    )
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        word_tokens.alias("n_tokens"),
        distinct_tokens.alias("n_distinct_tokens"),
        bpe_pieces.alias("n_bpe_pieces"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality features: length, mean token length, stopword
    ratio, alpha ratio, repetition ratio; score = weighted combination."""
    tokens = _tokens(F.col("text"))
    n_tokens = F.size(tokens)
    n_chars = F.length("text")
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    stop_ratio = _stop_hits(tokens, STOPWORDS["en"]) / F.greatest(n_tokens, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(tokens)) / F.greatest(n_tokens, F.lit(1))
    mean_tok_len = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    score = (
        F.lit(0.3) * F.least(n_tokens / F.lit(64.0), F.lit(1.0))
        + F.lit(0.2) * (alpha_chars / F.greatest(n_chars, F.lit(1)))
        + F.lit(0.2) * distinct_ratio
        + F.lit(0.15) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.15) * F.least(mean_tok_len / F.lit(8.0), F.lit(1.0))
    )
    u = lambda c: F.floor(c * 1000000 + F.lit(0.5)).cast("long")
    return documents.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        u(alpha_chars / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio_u"),
        u(stop_ratio).alias("stop_ratio_u"),
        u(distinct_ratio).alias("distinct_ratio_u"),
        u(score).alias("quality_u"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-hit argmax over {en, de, fr, es}; 'unk' when no hits.
    Ties break in fixed language order."""
    tokens = _tokens(F.col("text"))
    hits = {lang: _stop_hits(tokens, words) for lang, words in STOPWORDS.items()}
    best = F.lit("unk")
    best_hits = F.lit(0)
    for lang in ["en", "de", "fr", "es"]:  # fixed priority on ties
        cond = hits[lang] > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    return documents.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
        best.alias("lang_pred"),
    )


def doc_fingerprints(documents: DataFrame, window: int = 5) -> DataFrame:
    """Winnowing-style fingerprint: min/max h32 over word 5-gram shingles
    (rolling-hash document signature)."""
    shingles = word_shingles(
        F.col("text"), window, short_fallback=F.array(F.lower(F.col("text")))
    )
    hashes = F.transform(shingles, lambda s: h32(s))
    return documents.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size(hashes).alias("n_shingles"),
    )


def repetition_scores(documents: DataFrame, n: int = 3) -> DataFrame:
    """Duplicate n-gram statistics — the standard web-scrape repetition
    signal (boilerplate, keyword stuffing, decoding loops repeat shingles).

    Per doc over NON-distinct word n-gram shingles (short texts fall back
    to one whole-text shingle, same convention as doc_fingerprints):
    total shingles, distinct shingles, the top shingle's multiplicity, and
    ``dup_ngram_ratio = 1 - distinct/total`` in integer micro-units.

    Pure array expressions per row — no explode, no shuffle: the shingle
    multiset never leaves its row (aggregate over the sorted shingle array
    counts the max run length). Scan-shaped at 100 TB.
    """
    shingles = word_shingles(
        F.col("text"), n, short_fallback=F.array(F.lower(F.col("text")))
    )
    srt = F.array_sort(shingles)
    total = F.size(srt)
    distinct = F.size(F.array_distinct(srt))
    # max multiplicity via one fold over the sorted array: track (prev, run, best)
    run_state = F.aggregate(
        srt,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, s: F.struct(
            s.alias("prev"),
            F.when(s == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best, F.when(s == acc.prev, acc.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
    )
    return documents.select(
        "doc_id",
        total.cast("int").alias("n_shingles"),
        distinct.cast("int").alias("n_distinct_shingles"),
        run_state.best.cast("int").alias("top_shingle_count"),
        F.floor(
            (F.lit(1.0) - distinct / F.greatest(total, F.lit(1))) * 1000000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("dup_ngram_ratio_u"),
    )


def text_chunks(
    documents: DataFrame, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Sliding-window token chunking — the canonical training-data prep op:
    split each document into ~``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap`` so adjacent chunks share ``overlap`` tokens.

    Pure JVM generator projection: one split, one sequence-explode, one
    slice per chunk — no shuffle at all (chunking is embarrassingly
    row-parallel), no Python. Output rows: (doc_id, chunk_idx, start_token,
    chunk_n_tokens, chunk_text). The final (possibly short) window is kept;
    a document shorter than one window yields exactly one chunk. Windows
    stop as soon as the tail is covered: no chunk is ever fully contained
    in its predecessor (a start past ``n - chunk_tokens`` would re-emit a
    pure subset of the previous window — duplicate training data).
    """
    assert 0 < overlap < chunk_tokens
    step = chunk_tokens - overlap
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    # window starts: 0, step, ..., up to the first start whose window
    # reaches the end: k_max = ceil((n - chunk_tokens) / step), floored at 0
    k_max = F.greatest(
        F.lit(0),
        F.floor((n - F.lit(chunk_tokens) + F.lit(step - 1)) / F.lit(step)),
    ).cast("int")
    with_toks = documents.select("doc_id", toks.alias("toks"), n.alias("n"), k_max.alias("k_max"))
    exploded = with_toks.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("k_max"))).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * F.lit(step)
    piece = F.slice(F.col("toks"), start + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_token"),
        F.size(piece).cast("int").alias("chunk_n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


# Redaction patterns shared verbatim by the Spark (Java regex) and DuckDB
# (RE2) engines — kept to the common dialect subset (no lookarounds).
REDACT_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^ ]+",
    "longnum": r"[0-9]{6,}",
}


def text_redact(documents: DataFrame) -> DataFrame:
    """PII-style masking for training corpora: emails, URLs, and long digit
    runs are replaced by typed placeholders, with per-document match counts
    so filtering policy ("drop docs with >k contacts") stays queryable.

    All JVM-side: regexp_count + chained regexp_replace, no shuffle, no
    Python. Masking order is fixed (email -> url -> longnum) so the output
    is deterministic; counts are measured on the ORIGINAL text.
    """
    red = F.col("text")
    counts = []
    for name, pat in REDACT_PATTERNS.items():
        counts.append(
            F.regexp_count(F.col("text"), F.lit(pat)).cast("int").alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return documents.select(
        "doc_id",
        *counts,
        F.length(red).cast("int").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


def pack_sequences(
    documents: DataFrame, budget_tokens: int = 2048, n_shards: int = 256
) -> DataFrame:
    """Concatenate-and-cut sequence packing (GPT-style pretraining prep):
    documents are laid end-to-end in deterministic (shard, doc_id) order and
    the token stream is cut every ``budget_tokens`` — each doc is assigned
    to the pack where it STARTS (boundary docs straddle the cut, exactly
    like block-packing a tokenized corpus; this is the streaming variant,
    not NP-hard bin packing, and it is what makes the operator a pure
    window expression instead of a sequential fold).

    Scale shape: one window per shard (``doc_id % n_shards`` — uniform by
    construction), so work per task is bounded and the operator adds ONE
    exchange on shard. Emits (doc_id, shard, n_tokens, start_offset,
    pack_id, offset_in_pack); downstream writers group by (shard, pack_id)
    to materialize training rows.
    """
    from pyspark.sql import Window

    # engine-agnostic whitespace token count (same SQL text runs on Spark
    # and DuckDB — split()/string_split() edge semantics differ across
    # engine versions on empty strings; counting spaces does not — the same
    # trick as ingest.METRIC_EXPRS n_words)
    n_tokens = F.expr(
        "CASE WHEN length(coalesce(text, '')) = 0 THEN 0 "
        "ELSE length(text) - length(replace(text, ' ', '')) + 1 END"
    )
    d = documents.select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    # pack assignment in pure integer arithmetic (div/%, never a double
    # division) so the cross-engine value check has zero float ops
    return d.select(
        "doc_id", "shard", "n_tokens", start.alias("start_offset")
    ).select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {budget_tokens}").cast("long").alias("pack_id"),
        (F.col("start_offset") % F.lit(budget_tokens))
        .cast("long")
        .alias("offset_in_pack"),
    )
