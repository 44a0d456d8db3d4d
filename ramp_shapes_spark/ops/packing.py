"""Training-batch assembly operators: sequence packing, mixture quotas
and URL/domain hygiene.

Three more passes a 100 TB pre-training pipeline runs between "clean
corpus" and "token stream", none of which the reference library (a
per-process shape engine) has an analog for:

* :func:`pack_sequences` — GPT-style concat-and-chunk packing: the
  corpus token stream is cut into fixed ``budget``-token training
  sequences, emitting one span row per (document, sequence) overlap.
  Packing order is deterministic (group = ``doc_id % n_groups``, docs
  ordered by id within a group), and each group packs independently —
  the window sort never sees more than one group.
* :func:`quota_sample` — mixture control: keep at most ``quota``
  documents per group (e.g. per source/domain), selected by a
  deterministic md5 ranking so reruns and incremental runs agree.
* :func:`url_domain_stats` — URL extraction + domain blocklist join,
  the standard crawl-hygiene pass.

All selectors are pure functions of row keys (no RNG), and every
expression stays in the Java-regex/RE2-common + ANSI-window subset so
the DuckDB oracles run the exact same logic.

Scale notes: ``pack_sequences``'s only shuffle is the per-group window
sort (group count is a parameter — thousands of groups at corpus
scale keeps every sort partition-sized); ``quota_sample`` is one
per-group top-k window (rank-then-filter, the classic distributed
quota); ``url_domain_stats`` is a codegen'd projection plus one
broadcast join against the (tiny) blocklist.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col


def pack_sequences(docs: DataFrame, budget: int = 512,
                   n_groups: int = 16, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Cut the per-group concatenated token stream into ``budget``-token
    training sequences (concat-and-chunk packing: no padding waste, a
    document crossing a boundary is split across sequences).

    Returns one row per (document, sequence) overlap:
    ``(doc_id, grp, seq, tok_start, n_toks, seq_pos)`` where ``seq`` is
    the group-local sequence index, ``tok_start`` the span's offset
    inside the document's token array (0-based), ``n_toks`` the span
    length, ``seq_pos`` the span's offset inside the packed sequence.
    Zero-token documents emit no rows.

    Deterministic: group = ``doc_id % n_groups``; within a group the
    stream order is ascending ``doc_id``.  Stable under repartitioning
    and incremental append-at-the-tail.  The window sort is per group,
    so parallelism and sort size are controlled by ``n_groups``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n = F.size(tokens_col(F.col(text_col)))
    base = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_groups).cast("long").alias("grp"),
        n.cast("long").alias("__n"),
    ).filter(F.col("__n") > 0)
    w = Window.partitionBy("grp").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = base.withColumn("__cum_before",
                          F.sum("__n").over(w) - F.col("__n"))
    first_seq = F.floor(F.col("__cum_before") / budget)
    last_seq = F.floor((F.col("__cum_before") + F.col("__n") - 1) / budget)
    spans = cum.select(
        id_col, "grp", "__n", "__cum_before",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq"),
    )
    seq_start = F.col("seq") * budget  # stream offset where seq begins
    tok_start = F.greatest(seq_start - F.col("__cum_before"), F.lit(0))
    tok_end = F.least(seq_start + budget - F.col("__cum_before"),
                      F.col("__n"))
    return spans.select(
        id_col, "grp", F.col("seq").cast("long").alias("seq"),
        tok_start.cast("long").alias("tok_start"),
        (tok_end - tok_start).cast("long").alias("n_toks"),
        F.greatest(F.col("__cum_before") - seq_start, F.lit(0))
        .cast("long").alias("seq_pos"),
    )


def quota_sample(docs: DataFrame, quota: int, group_col: str = "source",
                 id_col: str = "doc_id") -> DataFrame:
    """Keep at most ``quota`` documents per group, chosen by ascending
    ``md5(id)`` (a deterministic uniform ranking: the kept subset is a
    reproducible pseudo-random sample, stable across reruns and
    engines).  Returns the kept rows plus their ``__rank``.

    This is the mixture-control primitive: cap an over-represented
    source/domain at a fixed document budget while leaving small groups
    untouched."""
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    rk = F.row_number().over(
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col))
    return (
        docs.withColumn("__rank", rk.cast("long"))
        .filter(F.col("__rank") <= quota)
    )


# Java-regex ∩ RE2 subset (no lookaround/backrefs) so the DuckDB
# oracle runs the same pattern; host chars per RFC-ish pragmatics
URL_RE = r"https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^ ]*)?"
URL_HOST_RE = r"https?://([A-Za-z0-9.-]+)"


def url_domain_stats(docs: DataFrame, blocklist: Optional[DataFrame] = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document URL hygiene: count URLs, extract each URL's host's
    registrable-ish domain (last two dot labels), and flag documents
    whose ANY domain appears in ``blocklist`` (a one-column ``domain``
    DataFrame — small by nature, broadcast).

    Returns ``(doc_id, n_urls, domains, blocked)`` with ``domains`` the
    sorted distinct domain list (a deterministic, order-free encoding).

    Scale: regex extraction is a codegen'd projection; the blocklist
    join is explode → broadcast semi-join → groupBy doc — one shuffle
    keyed by doc id, no skew (a hot domain only widens the broadcast
    probe, never a shuffle bucket)."""
    t = F.col(text_col)
    urls = F.regexp_extract_all(t, F.lit(URL_RE), F.lit(0))
    host = lambda u: F.regexp_extract(u, URL_HOST_RE, 1)  # noqa: E731
    # registrable-ish domain: last two dot-separated labels of the host
    dom = lambda u: F.array_join(  # noqa: E731
        F.slice(F.split(host(u), r"\."),
                F.greatest(F.size(F.split(host(u), r"\.")) - 1, F.lit(1)),
                2), ".")
    base = docs.select(
        F.col(id_col),
        F.size(urls).cast("long").alias("n_urls"),
        F.array_sort(F.array_distinct(
            F.transform(urls, dom))).alias("domains"),
    )
    if blocklist is None:
        return base.withColumn("blocked", F.lit(False))
    hits = (
        base.select(id_col, F.explode("domains").alias("__d"))
        .join(F.broadcast(blocklist.select(
            F.col("domain").alias("__d")).distinct()), "__d")
        .select(id_col).distinct()
        .withColumn("__blocked", F.lit(True))
    )
    return (
        base.join(hits, id_col, "left")
        .select(id_col, "n_urls", "domains",
                F.coalesce(F.col("__blocked"), F.lit(False)).alias("blocked"))
    )
