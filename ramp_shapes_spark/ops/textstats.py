"""Text analysis operators: token stats, quality scoring, language
heuristics, document fingerprinting.  All built-in-function column
expressions — no Python in the scan path."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for"]

LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "die", "und"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
}


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len_x10k, stopword_x10k)."""
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    avg_len = F.when(
        n_tokens > 0,
        (n_chars - (n_tokens - 1)).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.floor(avg_len * 10000 + F.lit(0.5)).cast("long")
        .alias("avg_token_len_x10k"),
        F.floor(
            F.when(n_tokens > 0, n_stop.cast("double") / n_tokens)
            .otherwise(F.lit(0.0)) * 10000 + F.lit(0.5)
        ).cast("long").alias("stopword_x10k"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality in [0,1]: length band + stopword presence +
    alphabetic ratio (C4/Gopher-style filters, deterministic).
    Returns (doc_id, quality_x10k)."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    alpha_ratio = F.when(
        F.length(text) > 0, alpha_chars.cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    has_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) > 0
    length_ok = (n_tokens >= 10) & (n_tokens <= 100000)
    score = (
        F.when(length_ok, 0.4).otherwise(0.0)
        + F.when(has_stop, 0.2).otherwise(0.0)
        + alpha_ratio * 0.4
    )
    return docs.select(
        F.col(id_col),
        F.floor(score * 10000 + F.lit(0.5)).cast("long").alias("quality_x10k"),
    )


def lang_guess(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Marker-word language vote; falls back to 'und'.
    Returns (doc_id, lang_guess)."""
    toks = tokens_col(F.col(text_col))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(marr, t))))
        )
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, n in scores:
        better = n > best_n
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_n = F.when(better, n).otherwise(best_n)
    return docs.select(F.col(id_col), best.alias("lang_guess"))


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: minimum token-window hash —
    (doc_id, fingerprint).  Engine-portable md5 rolling scheme."""
    toks = tokens_col(F.col(text_col))
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return docs.select(
        F.col(id_col), F.array_min(windows).alias("fingerprint")
    )


# GPT-2-style pre-tokenizer segments WITHOUT lookahead/apostrophe
# classes: letter runs, digit runs, non-alphanumeric runs.  Restricted
# to constructs RE2 also supports so the exact same pattern runs in
# the DuckDB oracle (Java regex and RE2 agree on this subset).
BPE_SEGMENT_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


def subword_stats(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token counting: (doc_id, n_subwords, n_ws_tokens).

    ``n_subwords`` counts pre-tokenizer segments (the unit a BPE/
    byte-level tokenizer would split further — the standard corpus
    "token count" estimate); ``n_ws_tokens`` is the whitespace count
    for the compression-ratio denominator.  Pure column expressions —
    one codegen'd projection at any scale."""
    from .dedup import tokens_col

    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_SEGMENT_RE))
        .cast("long").alias("n_subwords"),
        F.size(tokens_col(F.col(text_col))).cast("long")
        .alias("n_ws_tokens"),
    )


# PII patterns restricted to the Java-regex ∩ RE2 subset (no
# lookaround, no backrefs), so the EXACT same patterns run in the
# DuckDB oracle: email local@domain.tld and dotted-quad IPv4
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Pattern-based PII scrubbing, the standard pre-training hygiene
    pass: emails → ``[EMAIL]``, then IPv4 addresses → ``[IP]``
    (ordered, so an address inside an already-redacted email is not
    double-counted).  Returns (doc_id, n_emails, n_ips, clean_len,
    clean_hash) — the hash pins the exact redacted text for
    cross-engine verification without shipping the full column.

    Scale shape: pure codegen'd column expressions (regexp_extract_all
    + regexp_replace), zero Python, zero shuffle — the same projection
    cost at 100 TB as any scan."""
    t = F.col(text_col)
    n_email = F.size(
        F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0)))
    after_email = F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]")
    n_ip = F.size(
        F.regexp_extract_all(after_email, F.lit(PII_IPV4_RE), F.lit(0)))
    clean = F.regexp_replace(after_email, PII_IPV4_RE, "[IP]")
    return docs.select(
        F.col(id_col),
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_hash"),
    )


def vocab_topk(docs: DataFrame, k: int = 100, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Global vocabulary heavy hitters: the ``k`` most frequent tokens
    corpus-wide.  Returns ``(token, n_docs, n_occurrences, vocab_rank)``
    with a fully deterministic order (occurrences desc, token asc —
    ties cannot reorder between runs or engines).

    Scale shape: one explode → one groupBy(token) where the raw count
    is a map-side partial combine and the document frequency is a
    two-phase distinct aggregate; the top-k itself is a TakeOrdered
    (per-partition heap + driver merge of k rows), NOT a global sort
    shuffle — the driver never sees more than k rows per partition.
    The rank column is a window over the k-row result (single tiny
    partition, after the limit)."""
    from pyspark.sql import Window

    ex = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("token"),
        F.col(id_col),
    )
    counts = ex.groupBy("token").agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return top.withColumn(
        "vocab_rank", F.row_number().over(w).cast("long"))


def inverted_index(docs: DataFrame, max_postings: int = 20,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Capped inverted index: per token, document frequency, total
    occurrences, and the top ``max_postings`` postings rendered as a
    deterministic ``doc|tf`` string (tf desc, doc asc).

    Scale shape: explode → (token, doc) partial-combined tf count →
    a per-token row_number window CAPS the postings BEFORE any
    collect, so a stopword appearing in every document of a 100 TB
    corpus contributes ``max_postings`` rows to the assembly stage,
    never its full posting list; df/total_tf come from the uncapped
    count aggregate (map-side combinable), joined 1:1 on token."""
    from pyspark.sql import Window

    ex = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("token"),
        F.col(id_col).alias("doc"))
    tf = ex.groupBy("token", "doc").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"))
    w = Window.partitionBy("token").orderBy(
        F.desc("tf"), F.asc("doc"))
    capped = tf.withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") <= max_postings)
    postings = capped.groupBy("token").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("__rn").alias("r"),
                    F.concat_ws("|", F.col("doc").cast("string"),
                                F.col("tf").cast("string")).alias("s")))),
                lambda e: e["s"]),
            ",").alias("postings"))
    return stats.join(postings, "token").select(
        "token", "df", "total_tf", "postings")


def tfidf_top_terms(docs: DataFrame, k: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` characteristic terms per document by an exact
    integer-scaled tf-idf: ``score = tf * (N*1_000_000 div df)`` with
    integer division, so two engines agree bit-for-bit (no ``ln``,
    whose last-ulp behavior is libm-specific).

    Scale shape: the same explode → (token, doc) tf aggregate as the
    inverted index; df joins back on token (near-uniform key), N is a
    one-row broadcast (no driver collect), and the per-doc top-k is a
    row_number window over (doc) — bounded output, deterministic
    tie-break (score desc, token asc)."""
    from pyspark.sql import Window

    ex = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("token"),
        F.col(id_col).alias("doc"))
    tf = ex.groupBy("token", "doc").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    df_ = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg((F.count(F.lit(1)) * 1_000_000)
                 .cast("long").alias("__n_scaled"))
    scored = tf.join(df_, "token").crossJoin(F.broadcast(n)).select(
        "doc", "token", "tf", "df",
        (F.col("tf") * F.expr("__n_scaled div df")).cast("long")
        .alias("score"))
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("token"))
    return scored.withColumn(
        "term_rank", F.row_number().over(w).cast("long")) \
        .filter(F.col("term_rank") <= k) \
        .select(F.col("doc").alias(id_col), "token", "tf", "df",
                "score", "term_rank")
