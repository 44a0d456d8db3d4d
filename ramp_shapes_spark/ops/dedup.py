"""Deduplication operators over document corpora.

All hashing is md5-based (not xxhash/murmur) so results are
reproducible across engines — important both for the DuckDB oracle
checks and for incremental dedup runs that must agree across cluster
versions.

Scale notes:
* exact dedup is a hash groupBy — map-side combine, no skew concern;
* minhash signatures are computed per document (narrow, no shuffle);
  the LSH band join groups by band value, whose cardinality is
  controlled by band width — hot bands (boilerplate documents) are the
  skew risk, handled by AQE skew-join plus the candidate-pair cap;
* simhash is a per-document fold over token hash bits (narrow).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = " "


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(text, TOKEN_SPLIT), lambda t: t != "")


def spread(df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster's cores when it arrives
    in fewer partitions (a corpus written as one small parquet file
    scans as ONE partition, serializing every per-row expression —
    gram building, salted hashing — onto a single core).  No-op for
    inputs that already have enough partitions, so a well-partitioned
    100 TB corpus never pays an extra shuffle."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def exact_dedup_groups(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_docs, keep_id): one row per distinct text; keep_id
    is the smallest doc id (the canonical survivor)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), id_col)
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min(id_col).alias("keep_id"))
    )


def minhash_signature(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 4) -> DataFrame:
    """k-permutation minhash over the token set, one salted md5 min per
    permutation: (doc_id, sig_0..sig_{k-1}).

    Tokenization happens ONCE per document (a pre-projected column, not
    re-split per permutation) and duplicates collapse with
    ``array_distinct`` before hashing — the min over the token SET is
    identical, and every duplicate token drops k salted md5s."""
    base = spread(docs).select(
        F.col(id_col),
        F.array_distinct(tokens_col(F.col(text_col))).alias("__toks"),
    )
    cols = [F.col(id_col)]
    for j in range(k):
        cols.append(
            F.array_min(
                F.transform(F.col("__toks"),
                            lambda t: F.md5(F.concat(t, F.lit(f"#s{j}"))))
            ).alias(f"sig_{j}")
        )
    return base.select(*cols)


def minhash_dup_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 4) -> DataFrame:
    """Candidate near-duplicate pairs: documents with identical full
    minhash signature (AND-composition of k hashes — high precision
    bucket join). Returns (doc_a, doc_b), doc_a < doc_b.

    No distinct pass: every document has exactly ONE full-signature
    bucket, so the bucket self-join already emits each qualifying pair
    exactly once — the old trailing ``distinct()`` re-shuffled ~3M
    output rows at sf0.1 to remove duplicates that cannot exist."""
    sig = minhash_signature(docs, text_col, id_col, k)
    bucket = F.concat_ws("|", *[F.col(f"sig_{j}") for j in range(k)])
    b = sig.select(F.col(id_col).alias("doc"), bucket.alias("bucket"))
    a = b.withColumnRenamed("doc", "doc_a")
    c = b.withColumnRenamed("doc", "doc_b")
    return (
        a.join(c, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )


def minhash_banded_pairs(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", bands: int = 4,
                         rows: int = 2,
                         max_bucket_width: int | None = 100_000,
                         max_pairs: int | None = 100_000_000) -> DataFrame:
    """Banded MinHash LSH candidate pairs (the standard OR-of-ANDs
    construction): ``bands`` bands of ``rows`` hashes each over a
    ``bands*rows``-permutation signature; a pair is a candidate when it
    agrees on EVERY hash of AT LEAST ONE band.  With b=4, r=2 the
    probability of surfacing a pair at Jaccard s is 1-(1-s^2)^4 —
    ~50% at s≈0.4, ~98% at s≈0.8 — versus the AND-only variant
    (:func:`minhash_dup_pairs`) which needs near-exact token sets.

    Scale: one narrow signature pass, then one explode to (band,
    bucket) rows and a single self-equi-join on the bucket key — no
    all-pairs comparison.  Hot buckets (boilerplate) are the skew risk:
    AQE skew-join splitting handles the join side, and the per-band
    bucket keys spread load b ways.  Returns (doc_a, doc_b) distinct,
    doc_a < doc_b.

    Guards (pair listing is quadratic in bucket width *by definition of
    its output*, so both fail LOUDLY rather than silently truncate):
    ``max_bucket_width`` caps the width of any (band, bucket) — one
    boilerplate bucket of width w emits w·(w-1)/2 pairs, an all-pairs
    join at corpus scale; ``max_pairs`` caps the total CANDIDATE volume
    Σ w·(w-1)/2 (an upper bound on the distinct output — cross-band
    repeats of a pair count once per band, so a dup-heavy corpus can
    legitimately sit 100-200× above its distinct pair count; the
    default cap is sized for that).  Both checks share one
    cheap aggregation over the exploded (band, bucket) rows and run
    BEFORE the quadratic join is ever executed.  Pass ``None`` for both
    to skip the guard action.  For cluster-level dedup at scale prefer
    :func:`neardup_clusters`, whose bucket-star edges are O(docs×bands).
    """
    k = bands * rows
    # one materialization: the signature table feeds the guard
    # aggregation, the signature-group gather and (via the group table)
    # both join sides; eager checkpoint (not persist) keeps repeated
    # invocations honest
    sig = minhash_signature(docs, text_col, id_col, k) \
        .localCheckpoint(eager=True)
    band_entries = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.concat_ws("|", *[F.col(f"sig_{j * rows + r}")
                               for r in range(rows)]).alias("bucket"),
        )
        for j in range(bands)
    ])
    if max_bucket_width is not None or max_pairs is not None:
        exploded = sig.select(
            F.col(id_col).alias("doc"), F.explode(band_entries).alias("e")
        ).select("doc", F.col("e.band").alias("band"),
                 F.col("e.bucket").alias("bucket"))
        g = (
            exploded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__w"))
            .agg(F.max("__w").alias("__mx"),
                 F.sum((F.col("__w") * (F.col("__w") - 1) / 2)
                       .cast("long")).alias("__cand"))
            .collect()[0]
        )
        if (max_bucket_width is not None and g["__mx"] is not None
                and g["__mx"] > max_bucket_width):
            raise RuntimeError(
                f"minhash_banded_pairs: a band bucket holds {g['__mx']} "
                f"documents (> max_bucket_width={max_bucket_width}); "
                f"the within-bucket pair join would be quadratic — use "
                f"neardup_clusters (bucket-star edges) or raise the cap")
        if (max_pairs is not None and g["__cand"] is not None
                and g["__cand"] > max_pairs):
            raise RuntimeError(
                f"minhash_banded_pairs: candidate volume {g['__cand']} "
                f"exceeds max_pairs={max_pairs}; raise the cap or use "
                f"neardup_clusters (refusing to silently truncate)")
    # SIGNATURE-GROUP join: documents with identical full signatures
    # are interchangeable for every band bucket, so the bucket self-
    # join runs over one row per DISTINCT signature and member lists
    # expand afterwards — each qualifying doc pair is emitted exactly
    # once (same-group pairs share every band and come from the
    # within-group branch; cross-group pairs from the one unordered
    # group pair), so the quadratic join output never pays the full-
    # width distinct the doc-level join needed (a dup-heavy corpus
    # emitted each pair up to ``bands`` times: ~25M joined rows
    # deduped to 9.8M at sf0.1).  Member arrays are bounded by the
    # bucket-width guard above (a clique is never wider than its band
    # bucket).
    grp = (
        sig.groupBy(*[F.col(f"sig_{j}") for j in range(k)])
        .agg(F.min(F.col(id_col)).alias("__gid"),
             F.collect_list(F.col(id_col)).alias("__m"))
        .localCheckpoint(eager=True)
    )
    gx = grp.select(
        "__gid", F.explode(band_entries).alias("e")
    ).select("__gid", F.col("e.band").alias("band"),
             F.col("e.bucket").alias("bucket"))
    gpairs = (
        gx.select(F.col("__gid").alias("__ga"), "band", "bucket")
        .join(gx.select(F.col("__gid").alias("__gb"), "band", "bucket"),
              ["band", "bucket"])
        .filter(F.col("__ga") < F.col("__gb"))
        .select("__ga", "__gb")
        .distinct()
    )
    members = grp.select("__gid", "__m")
    cross = (
        gpairs.join(members.selectExpr("__gid AS __ga", "__m AS __ma"),
                    "__ga")
        .join(members.selectExpr("__gid AS __gb", "__m AS __mb"), "__gb")
        .select(F.explode("__ma").alias("__a"), "__mb")
        .select("__a", F.explode("__mb").alias("__b"))
        .select(F.least("__a", "__b").alias("doc_a"),
                F.greatest("__a", "__b").alias("doc_b"))
    )
    within = (
        grp.filter(F.size("__m") >= 2)
        .select(F.explode("__m").alias("doc_a"), "__m")
        .select("doc_a", F.explode("__m").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    return cross.unionAll(within)


# hex digit -> low-bit parity of its ascii code ('1'→1, 'a'(97)→1, …):
# precomputed so the whole per-token hash work is ONE md5 + ONE
# translate instead of nbits substring/ascii probes over re-hashed md5s
_HEX_PARITY = ("0123456789abcdef", "0101010101101010")


def _simhash_word(toks: Column, salt: str, nbits: int) -> Column:
    """Majority-vote simhash word over hex digits 1..nbits of
    ``md5(token || salt)``.

    The md5 is computed ONCE per token (the naive per-bit formulation
    re-hashes every token nbits times — a 16-64× constant on the hot
    path); ``translate`` maps the digest to its per-digit parity string
    up front, one fold accumulates all nbits vote counters, and a
    second (driver-side constant-size) fold packs the majority bits.
    Vote semantics are identical to the per-bit form: parity 1 → +1,
    parity 0 → −1, bit set iff votes > 0."""
    # NULL text -> fingerprint 0 (the pre-rewrite per-bit form summed
    # WHEN conditions over a NULL array to 0; aggregate() would instead
    # propagate NULL and silently re-bucket such rows downstream)
    parities = F.transform(
        F.coalesce(toks, F.array().cast("array<string>")),
        lambda t: F.translate(F.md5(F.concat(t, F.lit(salt))),
                              *_HEX_PARITY),
    )
    votes = F.aggregate(
        parities,
        F.array_repeat(F.lit(0), nbits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(F.sequence(F.lit(1), F.lit(nbits)),
                        lambda i: h.substr(i, F.lit(1)).cast("int")),
            lambda a, bit: a + bit * 2 - 1,
        ),
    )
    return F.aggregate(
        votes,
        F.struct(F.lit(0).cast("long").alias("w"),
                 F.lit(1).cast("long").alias("p")),
        lambda acc, v: F.struct(
            (acc["w"] + F.when(v > 0, acc["p"]).otherwise(F.lit(0)))
            .alias("w"),
            (acc["p"] * F.lit(2)).alias("p"),
        ),
        lambda acc: acc["w"],
    )


def simhash16(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """16-bit simhash over the token multiset.

    Bit i of the fingerprint is the majority vote of bit parities drawn
    from each token's md5 (hex digit i's low bit) — engine-portable
    (md5 + ascii only).  Returns (doc_id, simhash int).
    """
    toks = tokens_col(F.col(text_col))
    return docs.select(
        F.col(id_col),
        _simhash_word(toks, "", 16).cast("int").alias("simhash"),
    )


def simhash64(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash emitted as two 32-bit halves.

    Bits 0-31 (``simhash_lo``) vote on the low bits of the 32 hex
    digits of ``md5(token)``; bits 32-63 (``simhash_hi``) on
    ``md5(token || '#h')``.  Two signed 32-bit INTs instead of one
    64-bit value keep every intermediate inside exact integer range
    for any SQL engine (bit 63 of a signed BIGINT flips the sign).
    Returns (doc_id, simhash_hi, simhash_lo).
    """
    toks = tokens_col(F.col(text_col))
    return docs.select(
        F.col(id_col),
        _simhash_word(toks, "#h", 32).alias("simhash_hi"),
        _simhash_word(toks, "", 32).alias("simhash_lo"),
    )


def hamming64(hi_a: Column, lo_a: Column, hi_b: Column,
              lo_b: Column) -> Column:
    """Hamming distance between two (hi, lo) simhash64 fingerprints."""
    return F.bit_count(hi_a.bitwiseXOR(hi_b)) + \
        F.bit_count(lo_a.bitwiseXOR(lo_b))


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3,
                        max_pairs: int | None = 100_000_000) -> DataFrame:
    """Exact token-n-gram Jaccard pairs at ``jaccard >= threshold``,
    found via PREFIX FILTERING (AllPairs/PPJoin family: Bayardo et al.,
    WWW'07; Vernica et al., SIGMOD'10), thresholded and exact.

    Candidate generation indexes each document only on its
    ``|g| − ⌈t·|g|⌉ + 1`` globally RAREST n-grams (grams totally
    ordered by document frequency): two documents with Jaccard ≥ t
    cannot disagree on both prefixes, so the candidate set provably
    contains every qualifying pair, while a boilerplate gram shared by
    millions of documents lands in (almost) nobody's prefix — the
    inverted-index buckets stay narrow at corpus scale, unlike the
    naive share-any-gram join whose hottest bucket is quadratic.
    Candidates are then verified EXACTLY against the full gram sets
    (``array_intersect``), so results are identical to the naive join.

    Returns (doc_a, doc_b, jacc_x10k).  When ``max_pairs`` is set, the
    prefix-index CANDIDATE volume Σ w·(w-1)/2 over prefix-gram buckets
    (an upper bound on the verified join's row count — a pair sharing
    several prefix grams counts once per gram) above the cap raises
    ``RuntimeError`` BEFORE the join runs (a hard error — never a
    silently truncated subset).  Pass ``max_pairs=None`` to skip the
    guard (and its counting action).
    """
    from pyspark.sql import Window

    toks = tokens_col(F.col(text_col))
    # deliberate sub-n behavior: a document SHORTER than n tokens
    # contributes its whole token sequence as one truncated "gram" so
    # short near-identical docs can still pair (decontam.word_ngrams
    # instead emits NO grams for sub-n docs — the right call there,
    # since a truncated gram must not match a benchmark n-gram)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    # one materialization of the tokenized gram relation: it feeds FOUR
    # independent subtrees (document frequency, the prefix index, and
    # both verify sides) and re-tokenizing the corpus four times would
    # dominate the wall clock; an eager local checkpoint (not persist)
    # keeps repeated invocations honest — no cross-call plan-cache hits
    g = spread(docs).select(F.col(id_col).alias("doc"), grams.alias("grams"),
                            F.size(grams).alias("n_grams")) \
        .localCheckpoint(eager=True)
    inv = g.select("doc", "n_grams", F.explode("grams").alias("gram"))
    # global gram document frequency = the total order for prefixes
    # (rarest first; gram string breaks ties so the order is total)
    dfreq = inv.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc").orderBy("__df", "gram")
    # epsilon guards float over-rounding (0.3*10 → 3.0000000000000004 →
    # ceil 4 would SHORTEN the prefix and miss pairs); erring low only
    # lengthens prefixes — more candidates, never a false negative
    plen = F.col("n_grams") \
        - F.ceil(F.lit(threshold) * F.col("n_grams") - F.lit(1e-9)) \
        .cast("int") + 1
    prefix = (
        inv.join(dfreq, "gram")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= plen)
        .select("doc", "n_grams", "gram", "__rk")
    )
    if max_pairs is not None:
        vol = (
            prefix.groupBy("gram").agg(F.count(F.lit(1)).alias("__w"))
            .agg(F.sum((F.col("__w") * (F.col("__w") - 1) / 2)
                       .cast("long")).alias("__cand"))
            .collect()[0]["__cand"]
        )
        if vol is not None and vol > max_pairs:
            raise RuntimeError(
                f"ngram_jaccard_pairs: prefix-candidate volume {vol} "
                f"exceeds max_pairs={max_pairs}; raise the cap or "
                f"tighten the threshold (refusing to run a quadratic "
                f"join)")
    # PPJoin POSITIONAL filter (Xiao et al., WWW'08): for the globally
    # rarest shared prefix gram g, every other shared gram sorts after
    # g in the df-total-order, so the true intersection is bounded by
    # 1 + min(na - rank_a(g), nb - rank_b(g)).  Per-doc prefix ranks
    # are monotone in the global order, so min(ra) and min(rb) over a
    # pair's shared prefix grams BOTH belong to g — the groupBy that
    # replaces the old pair distinct() computes the bound for free on
    # the same shuffle.  Pairs whose bound cannot reach the threshold
    # (bound·(1+t) < t·(na+nb), epsilon erring toward keeping) are
    # dropped BEFORE the exact verify join ships their full gram
    # arrays: 409k -> 125k candidate pairs at sf0.1, an exact filter —
    # a discarded pair provably fails jaccard >= t.
    bound = F.lit(1) + F.least(F.col("na") - F.col("ra"),
                               F.col("nb") - F.col("rb"))
    cand = (
        prefix.select(F.col("doc").alias("doc_a"),
                      F.col("n_grams").alias("na"), "gram",
                      F.col("__rk").alias("ra"))
        .join(prefix.select(F.col("doc").alias("doc_b"),
                            F.col("n_grams").alias("nb"), "gram",
                            F.col("__rk").alias("rb")), "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.min("ra").alias("ra"), F.min("rb").alias("rb"),
             F.min("na").alias("na"), F.min("nb").alias("nb"))
        .filter(bound * F.lit(1.0 + threshold)
                >= F.lit(threshold) * (F.col("na") + F.col("nb"))
                - F.lit(1e-9))
        .select("doc_a", "doc_b")
    )
    inter = (
        cand.join(g.select(F.col("doc").alias("doc_a"),
                           F.col("grams").alias("__ga"),
                           F.col("n_grams").alias("na")), "doc_a")
        .join(g.select(F.col("doc").alias("doc_b"),
                       F.col("grams").alias("__gb"),
                       F.col("n_grams").alias("nb")), "doc_b")
        .select("doc_a", "doc_b", "na", "nb",
                F.size(F.array_intersect("__ga", "__gb")).alias("ninter"))
    )
    jacc = F.col("ninter") / (F.col("na") + F.col("nb") - F.col("ninter"))
    return inter.filter(jacc >= threshold).select(
        "doc_a", "doc_b",
        F.floor(jacc * 10000 + F.lit(0.5)).cast("long").alias("jacc_x10k"),
    )


def neardup_clusters(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", bands: int = 4,
                     rows: int = 2) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the banded
    MinHash LSH pair graph, one canonical representative
    (numeric-minimum doc id) per cluster.  Returns (doc_id, canonical)
    for EVERY document — singletons map to themselves — i.e. the
    keep/drop map a dedup stage applies to the corpus.

    Banded (OR-of-ANDs) buckets are the right input: the similarity
    relation is NOT transitive (doc A~B via band 0, B~C via band 3),
    so clusters genuinely need the transitive closure — unlike
    full-signature AND-pairs, whose graph is a union of disjoint
    cliques a plain groupBy could fold.

    Scale shape: edges are BUCKET STARS, not within-bucket pairs —
    every doc links to its band-bucket's minimum doc (one window pass
    per band), which preserves connectivity exactly while emitting
    O(docs × bands) edges instead of O(Σ bucket²): a dup-heavy corpus
    turns bucket pairs quadratic (measured 105 s at sf0.1 vs ~10 s for
    stars on the same corpus).  Clustering reuses the pipeline's
    contraction CC (log-round, skew-defended).  Node ids are
    zero-padded so the CC representative (lexicographic min) is the
    numeric min — the same value an ANSI-SQL ``min()`` oracle over the
    pairwise closure computes (star and pair graphs have identical
    components)."""
    from pyspark.sql import Window

    from ramp_shapes_spark.pipeline.canonicalize import (
        connected_components,
    )

    pad = "%019d"
    # zero-padding is order-correct only for non-negative ids ("-…05" <
    # "-…10" lexicographically but -5 > -10 numerically, which would
    # break the claimed equivalence with the SQL min() oracle) — fail
    # loudly rather than return wrong canonicals
    neg = docs.select(id_col).filter(F.col(id_col) < 0).limit(1).collect()
    if neg:
        raise ValueError(
            f"neardup_clusters requires non-negative {id_col} values "
            f"(got {neg[0][0]}): zero-padded lexicographic order must "
            f"equal numeric order; bias ids into >= 0 first")
    sig = minhash_signature(docs, text_col, id_col, k=bands * rows)
    parts = []
    for j in range(bands):
        bucket = F.concat_ws(
            "|", *[F.col(f"sig_{j * rows + r}") for r in range(rows)])
        b = sig.select(
            F.format_string(pad, F.col(id_col)).alias("__doc"),
            bucket.alias("__bkt"),
        )
        w = Window.partitionBy("__bkt")
        m = b.withColumn("__min", F.min("__doc").over(w))
        parts.append(
            m.filter(F.col("__doc") != F.col("__min"))
            .select(F.col("__doc").alias("src"),
                    F.col("__min").alias("dst"))
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionAll(p)
    cc = connected_components(edges, hot_k=0)
    return (
        docs.select(F.format_string(pad, F.col(id_col)).alias("node"))
        .join(cc, "node", "left")
        .select(
            F.col("node").cast("long").alias("doc_id"),
            F.coalesce(F.col("component"), F.col("node"))
            .cast("long").alias("canonical"),
        )
    )


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", sep: str = "\n",
                    max_repeats: int = 2) -> DataFrame:
    """Corpus-level paragraph dedup — the CCNet/RefinedWeb boilerplate
    removal pass: count each distinct paragraph's occurrences across
    the WHOLE corpus, then rebuild every document keeping only
    paragraphs that occur at most ``max_repeats`` times (headers,
    footers, cookie banners and license blurbs repeat far more often
    and are dropped).  Returns one row per document:
    ``(doc_id, n_paras, n_kept, clean_len, clean_hash)`` where
    ``clean_hash`` pins the exact rebuilt text (paragraph order
    preserved, joined by ``sep``) for cross-engine verification
    without shipping the full column.

    Scale shape: one explode → one global groupBy on the paragraph
    md5 with map-side partial combine (the Zipf head of repeated
    boilerplate is absorbed by the combiners) → a LEFT ANTI join
    whose right side is ONLY the boilerplate head (paragraphs with
    count > max_repeats — a tiny fraction of distinct paragraphs, so
    AQE plans it as a broadcast join at any corpus size) → one
    per-document rebuild aggregation.  No per-paragraph shuffle ever
    keys on document content longer than an md5.
    """
    # F.split takes a Java regex; ``sep`` is documented as a LITERAL
    # separator (and is used literally in the rebuild's concat_ws), so
    # quote it — otherwise sep="." or "||" silently shreds every
    # document into per-character "paragraphs"
    quoted_sep = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = F.filter(
        F.transform(F.split(F.col(text_col), quoted_sep),
                    lambda x: F.trim(x)),
        lambda x: x != "",
    )
    ex = (
        docs.select(F.col(id_col), F.posexplode(paras)
                    .alias("__pos", "__para"))
        .withColumn("__ph", F.md5("__para"))
    )
    hot = (
        ex.groupBy("__ph").agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_repeats)
        .select("__ph")
    )
    rebuilt = (
        ex.join(hot, "__ph", "left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("__pos", "__para"))),
                    lambda s: s["__para"],
                ),
                sep,
            ).alias("__clean"),
        )
    )
    base = docs.select(F.col(id_col), F.size(paras).alias("n_paras"))
    clean = F.coalesce(F.col("__clean"), F.lit(""))
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_paras").cast("long").alias("n_paras"),
            F.coalesce(F.col("__n_kept"), F.lit(0))
            .cast("long").alias("n_kept"),
            F.length(clean).cast("long").alias("clean_len"),
            F.md5(clean).alias("clean_hash"),
        )
    )
