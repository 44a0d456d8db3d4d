"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline; ``queries`` /
``oracle_sql`` expose the operator surface of SURVEY.md §2 (shape
engine: records, sets, optionals, unions, property paths incl.
closures, flatten inverse; pipeline ops: dedup/minhash/simhash, text
stats, ANN, connected components, sessionization) with DuckDB-checkable
ANSI-SQL oracles.  Non-SQL-expressible entries (the full KG pipeline)
are rows-only by design.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ramp_shapes_spark.ops import relational as R  # noqa: E402
from ramp_shapes_spark.ops.dedup import (  # noqa: E402
    exact_dedup_groups, minhash_banded_pairs, minhash_dup_pairs,
    minhash_signature, ngram_jaccard_pairs, simhash16, simhash64,
)
from ramp_shapes_spark.ops.similarity import (  # noqa: E402
    brute_force_topk, cosine_dup_pairs, ivf_kmeans_topk, ivf_topk,
)
from ramp_shapes_spark.ops.textstats import (  # noqa: E402
    doc_fingerprint, lang_guess, quality_score, token_stats,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG pipeline on the deterministic transcript corpus
    (smoke scale); returns the canonical triple table."""
    from ramp_shapes_spark.pipeline.datagen import generate_transcripts
    from ramp_shapes_spark.pipeline.run import run_pipeline

    turns = generate_transcripts(spark, 40, n_entities=64, partitions=4)
    result = run_pipeline(spark, turns, track_errors=False)
    from ramp_shapes_spark.pipeline.materialize import triple_flat_view
    return triple_flat_view(result.triples)


# ---------------------------------------------------------------------------
# documents / embeddings / events queries
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return exact_dedup_groups(_docs(spark, sf_dir))


def q_minhash_signature(spark, sf_dir):
    return minhash_signature(_docs(spark, sf_dir))


def q_minhash_pairs(spark, sf_dir):
    return minhash_dup_pairs(_docs(spark, sf_dir))


def q_minhash_banded_pairs(spark, sf_dir):
    return minhash_banded_pairs(_docs(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    # default-on max_pairs guard: the benched path is the guarded path
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_bpe_token_counts(spark, sf_dir):
    from ramp_shapes_spark.ops.textstats import subword_stats
    return subword_stats(_docs(spark, sf_dir))


def q_pii_redaction(spark, sf_dir):
    """PII scrubbing over documents with DETERMINISTIC injected
    emails/IPs (the synthetic corpus contains none), so the oracle can
    reconstruct the exact same input and redacted-text hash."""
    from ramp_shapes_spark.ops.textstats import redact_pii
    d = _docs(spark, sf_dir)
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" ip 10.0."),
                         (F.col("doc_id") % 250).cast("string"),
                         F.lit("."),
                         ((F.col("doc_id") * 7) % 250).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(injected)


def q_neardup_clusters(spark, sf_dir):
    from ramp_shapes_spark.ops.dedup import neardup_clusters
    return neardup_clusters(_docs(spark, sf_dir))


def q_decontaminate(spark, sf_dir):
    """5-gram eval-overlap decontamination: docs with doc_id % 20 == 0
    play the held-out benchmark; the rest are the training corpus."""
    from ramp_shapes_spark.ops.decontam import ngram_decontaminate
    d = _docs(spark, sf_dir)
    return ngram_decontaminate(
        d.filter(F.col("doc_id") % 20 != 0),
        d.filter(F.col("doc_id") % 20 == 0), n=5)


def q_repetition_stats(spark, sf_dir):
    from ramp_shapes_spark.ops.decontam import repetition_stats
    return repetition_stats(_docs(spark, sf_dir))


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing of the document token stream into
    64-token training sequences over 16 deterministic groups."""
    from ramp_shapes_spark.ops.packing import pack_sequences
    return pack_sequences(_docs(spark, sf_dir), budget=64, n_groups=16)


def q_quota_sample(spark, sf_dir):
    """Mixture control: cap every source at 18 documents, selected by
    the deterministic md5 ranking; returns the kept (doc, rank) rows."""
    from ramp_shapes_spark.ops.packing import quota_sample
    kept = quota_sample(_docs(spark, sf_dir), quota=18,
                        group_col="source")
    return kept.select("doc_id", "source",
                       F.col("__rank").alias("rk"))


def q_url_domain_blocked(spark, sf_dir):
    """URL extraction + domain blocklist over documents with
    DETERMINISTIC injected URLs (the synthetic corpus has none), so the
    oracle reconstructs the same input."""
    from ramp_shapes_spark.ops.packing import url_domain_stats
    d = _docs(spark, sf_dir)
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://sub"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".com/p/"), F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" and http://cdn.badsite"),
                         (F.col("doc_id") % 2).cast("string"),
                         F.lit(".net/x")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    block = spark.createDataFrame(
        [("badsite0.net",), ("badsite1.net",)], ["domain"])
    out = url_domain_stats(injected, block)
    return out.select(
        "doc_id", "n_urls",
        F.array_join("domains", ",").alias("domains"),
        F.col("blocked").cast("long").alias("blocked"))


def q_paragraph_dedup(spark, sf_dir):
    """Corpus-level paragraph (boilerplate) dedup over documents with
    DETERMINISTIC injected paragraph breaks: the synthetic corpus has
    no newlines, so every literal ' line ' token becomes one (plain
    leftmost non-overlapping string replace — identical semantics in
    Spark and DuckDB)."""
    from ramp_shapes_spark.ops.dedup import paragraph_dedup
    d = _docs(spark, sf_dir)
    injected = d.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" line "), F.lit("\n"))
        .alias("text"),
    )
    return paragraph_dedup(injected)


def q_vocab_topk(spark, sf_dir):
    """Global vocabulary heavy hitters (top-100 tokens by corpus
    occurrence count, deterministic tie-break)."""
    from ramp_shapes_spark.ops.textstats import vocab_topk
    return vocab_topk(_docs(spark, sf_dir), k=100)


def q_events_asof(spark, sf_dir):
    """Backward as-of join: every click event picks up the most recent
    prior view by the same user (union-tag + running last-ignorenulls
    window — one shuffle; DuckDB's native ASOF JOIN is the oracle)."""
    from ramp_shapes_spark.ops.temporal import asof_join
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view") \
              .select("user_id", "ts", "event_id", "value")
    j = asof_join(clicks, views, on="user_id",
                  right_cols=["ts", "event_id", "value"])
    return j.select(
        "event_id", "user_id",
        F.col("event_id_asof").cast("long").alias("view_event_id"),
        F.col("value_asof").alias("view_value"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("ts_asof").cast("timestamp")))
        .cast("long").alias("gap_us"),
    )


def q_pagerank_nations(spark, sf_dir):
    """Fixed-point weighted PageRank over the nation trade graph
    (customer-nation -> supplier-nation, one raw edge per lineitem).
    Exact 64-bit integer arithmetic end to end, so the DuckDB oracle
    (same unrolled iterations) matches bit-for-bit regardless of
    partitioning or reduction order."""
    from ramp_shapes_spark.ops.graph import pagerank
    edges = _nation_trade_edges(spark, sf_dir) \
        .withColumn("weight", F.lit(1))
    # deterministic row order: the 25-row result's arrival order varied
    # with partitioning run to run, which is the prime suspect for the
    # round-5 driver hash mismatch (values verified bit-equal against
    # the oracle at every local scale factor); the sort is free at this
    # cardinality and the multiset is unchanged
    return pagerank(edges).orderBy("node")


def q_nation_cooccur_lift(spark, sf_dir):
    """Association lift between supplier nations co-occurring in the
    same order (exact parts-per-million integers; candidate-edge
    proposal for the KG)."""
    from ramp_shapes_spark.ops.graph import cooccur_lift
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_suppkey")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet") \
        .select("s_suppkey", "s_nationkey")
    obs = li.join(s, li.l_suppkey == s.s_suppkey) \
            .select(F.col("l_orderkey").alias("container"),
                    F.col("s_nationkey").alias("item"))
    return cooccur_lift(obs, "container", "item")


def _nation_trade_edges(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_suppkey")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select("c_custkey", "c_nationkey")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet") \
        .select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .select(F.col("c_nationkey").alias("src"),
                  F.col("s_nationkey").alias("dst"))
    )


def q_triangle_nations(spark, sf_dir):
    """Per-node triangle counts on the undirected nation trade graph
    (degree-ordered node-iterator: every triangle enumerated once from
    its lowest-rank corner — hub-safe wedge fan-out)."""
    from ramp_shapes_spark.ops.graph import triangle_count
    return triangle_count(_nation_trade_edges(spark, sf_dir))


def q_neighbor_jaccard_nations(spark, sf_dir):
    """Neighborhood-Jaccard link-prediction scores (exact ppm) between
    nations sharing a trade partner."""
    from ramp_shapes_spark.ops.graph import neighbor_jaccard
    return neighbor_jaccard(_nation_trade_edges(spark, sf_dir))


def q_conv_stats(spark, sf_dir):
    """Per-conversation turn-taking stats over the committed smoke
    transcript corpus (one conv_id shuffle feeds both the lag window
    and the aggregate; exact-integer measures)."""
    from ramp_shapes_spark.ops.transcripts import conversation_stats
    return conversation_stats(spark.read.parquet(_KG_SMOKE_PARQUET))


def q_tool_transitions(spark, sf_dir):
    """Tool-call Markov bigrams over the smoke transcript corpus
    (filter before the lag window; map-side-combinable pair count)."""
    from ramp_shapes_spark.ops.transcripts import tool_transitions
    return tool_transitions(spark.read.parquet(_KG_SMOKE_PARQUET))


def q_conv_dedup(spark, sf_dir):
    """Whole-conversation exact dedup over the smoke corpus augmented
    with a deterministic 'dup-' relabeled copy of ~1/4 of the
    conversations (md5(conv_id) first hex digit in 0-3), so the query
    exercises real duplicate groups with known canonicals."""
    from ramp_shapes_spark.ops.transcripts import conversation_dedup
    t = spark.read.parquet(_KG_SMOKE_PARQUET)
    dup = t.filter(
        F.substring(F.md5(F.col("conv_id")), 1, 1).isin(
            "0", "1", "2", "3")
    ).withColumn("conv_id", F.concat(F.lit("dup-"), F.col("conv_id")))
    return conversation_dedup(t.unionByName(dup))


def q_snapshot_delta(spark, sf_dir):
    """Multiset delta between two overlapping snapshots of an
    events-as-triples projection (old = event_id % 10 <> 0, new =
    event_id % 7 <> 0): adds, deletes, and multiplicity changes in one
    full-outer join of two pre-aggregated sides."""
    from ramp_shapes_spark.ops.delta import snapshot_delta
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", "user_id", "event_type")
    old = ev.filter(F.col("event_id") % 10 != 0) \
        .select("user_id", "event_type")
    new = ev.filter(F.col("event_id") % 7 != 0) \
        .select("user_id", "event_type")
    return snapshot_delta(old, new)


def q_inverted_index(spark, sf_dir):
    """Capped inverted index over documents (tokens with df >= 10;
    postings capped at 5 BEFORE assembly by a per-token window, so a
    stopword can never drag its full posting list into the string)."""
    from ramp_shapes_spark.ops.textstats import inverted_index
    return inverted_index(_docs(spark, sf_dir), max_postings=5) \
        .filter(F.col("df") >= 10)


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document by integer-scaled
    tf-idf (tf * (N*1e6 div df)) — exact across engines, no ln."""
    from ramp_shapes_spark.ops.textstats import tfidf_top_terms
    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


def q_value_quantiles(spark, sf_dir):
    """Exact discrete p50/p95/p99 of event value per event type
    (integer-arithmetic rank rule, engine-agnostic)."""
    from ramp_shapes_spark.ops.stats import group_quantiles
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return group_quantiles(ev, "event_type", "value")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup: exact-integer k-means clusters,
    within-cluster cosine pairs at >= 0.95, CC, numeric-min canonical
    keep/drop map over every vector."""
    from ramp_shapes_spark.ops.similarity import semantic_dedup
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, n_clusters=8, iters=2,
                          threshold_x10k=9500)


def q_sample_split_counts(spark, sf_dir):
    from ramp_shapes_spark.ops.sampling import deterministic_split
    d = deterministic_split(
        _docs(spark, sf_dir), "doc_id",
        {"train": 0.8, "valid": 0.1, "test": 0.1})
    return d.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"))


def q_sample_stratified_counts(spark, sf_dir):
    from ramp_shapes_spark.ops.sampling import stratified_sample
    s = stratified_sample(_docs(spark, sf_dir), "doc_id", "lang",
                          {"en": 0.25}, default_rate=1.0)
    return s.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


def q_simhash(spark, sf_dir):
    return simhash16(_docs(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return quality_score(_docs(spark, sf_dir))


def q_lang_guess(spark, sf_dir):
    return lang_guess(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return doc_fingerprint(_docs(spark, sf_dir))


def q_ann_brute(spark, sf_dir):
    return brute_force_topk(_emb(spark, sf_dir))


def q_ann_ivf(spark, sf_dir):
    return ivf_topk(_emb(spark, sf_dir))


def q_ann_ivf_kmeans(spark, sf_dir):
    return ivf_kmeans_topk(_emb(spark, sf_dir))


def q_simhash64(spark, sf_dir):
    return simhash64(_docs(spark, sf_dir))


def q_cosine_dups(spark, sf_dir):
    return cosine_dup_pairs(_emb(spark, sf_dir), threshold_x10k=3000)


def q_media_decode(spark, sf_dir):
    """REAL image decode, end to end: encode a BMP/PPM payload per
    document (distributed, Arrow-batched), decode it back, and report
    dimensions + byte size + the exact green-channel pixel sum — every
    column re-derivable in closed form by the SQL oracle."""
    from ramp_shapes_spark.ops.multimodal import (
        decode_images, synthesize_bmp_media,
    )
    return decode_images(synthesize_bmp_media(_docs(spark, sf_dir)))


def q_events_sessions(spark, sf_dir):
    from pyspark.sql import Window
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_gap = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    return with_gap.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("new_sess").alias("n_sessions"),
        F.sum(
            F.when(F.col("event_type") == "purchase",
                   F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .otherwise(F.lit(0)).cast("long")
        ).alias("purchase_cents"),
    )


def q_cc_customer_chains(spark, sf_dir):
    from ramp_shapes_spark.pipeline.canonicalize import connected_components
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    from pyspark.sql import Window
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    nid = F.concat(F.lit("c:"), F.col("c_custkey").cast("string"))
    nxt = F.lead("c_custkey").over(w)
    edges = (
        cust.withColumn("nk", nxt)
        .filter(F.col("nk").isNotNull())
        .select(nid.alias("src"),
                F.concat(F.lit("c:"), F.col("nk").cast("string")).alias("dst"))
    )
    return connected_components(edges, hot_k=0)


_KG_SMOKE_PARQUET = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "data", "kg_smoke_transcripts.parquet")


def q_kg_turn_records(spark, sf_dir):
    """Full KG frame stage over the committed deterministic transcript
    corpus (data/kg_smoke_transcripts.parquet — byte-identical to
    ``generate_transcripts(spark, 40, n_entities=64)``), so the DuckDB
    oracle can recompute idx/role/n_mentions from the same parquet."""
    from ramp_shapes_spark.pipeline.kgshapes import build_kg_catalog
    from ramp_shapes_spark.pipeline.mentions import detect_mentions, score_links
    from ramp_shapes_spark.pipeline.run import extraction_triples
    from ramp_shapes_spark.frame import FrameEngine

    turns = spark.read.parquet(_KG_SMOKE_PARQUET)
    scored = score_links(detect_mentions(turns))
    ext = extraction_triples(turns, scored).localCheckpoint(eager=True)
    catalog, turn_shape = build_kg_catalog()
    res = FrameEngine(spark, catalog, ext, diagnostics=False).frame(turn_shape)
    return res.matches.select(
        F.get_json_object("value", "$.id").alias("subject"),
        F.get_json_object("value", "$.idx").cast("long").alias("idx"),
        F.get_json_object("value", "$.role").alias("role"),
        F.size(F.from_json(F.get_json_object("value", "$.mentions"),
                           "array<string>")).cast("long").alias("n_mentions"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # shape engine over TPC-H-derived triples
        "frame_supplier_record": R.q_frame_supplier_record,
        "frame_nation_suppliers_set": R.q_frame_nation_suppliers_set,
        "frame_order_optional_union": R.q_frame_order_optional_union,
        "path_sequence_region": R.q_path_sequence_region,
        "path_closure_chain": R.q_path_closure_chain,
        "path_alternative_places": R.q_path_alternative_places,
        "path_one_or_more": R.q_path_one_or_more,
        "path_zero_or_one": R.q_path_zero_or_one,
        "vocabulary_region": R.q_vocabulary_region,
        "frame_map_nations": R.q_frame_map_nations,
        "frame_error_codes": R.q_frame_error_codes,
        "flatten_roundtrip_counts": R.q_flatten_roundtrip_counts,
        "flatten_relational_counts": R.q_flatten_relational_counts,
        "turtle_roundtrip_counts": R.q_turtle_roundtrip_counts,
        "shape_subgraph_counts": R.q_shape_subgraph_counts,
        "store_frame_names": R.q_store_frame_names,
        "ntriples_roundtrip_counts": R.q_ntriples_roundtrip_counts,
        "incremental_frame_names": R.q_incremental_frame_names,
        "neardup_clusters": q_neardup_clusters,
        "bpe_token_counts": q_bpe_token_counts,
        "pii_redaction": q_pii_redaction,
        "decontaminate_5gram": q_decontaminate,
        "repetition_stats": q_repetition_stats,
        "pack_sequences_spans": q_pack_sequences,
        "quota_sample_rows": q_quota_sample,
        "url_domain_blocked": q_url_domain_blocked,
        "paragraph_dedup": q_paragraph_dedup,
        "vocab_topk": q_vocab_topk,
        "events_asof_view": q_events_asof,
        "pagerank_nations": q_pagerank_nations,
        "nation_cooccur_lift": q_nation_cooccur_lift,
        "triangle_nations": q_triangle_nations,
        "neighbor_jaccard_nations": q_neighbor_jaccard_nations,
        "semantic_dedup": q_semantic_dedup,
        "conv_turn_stats": q_conv_stats,
        "tool_transitions": q_tool_transitions,
        "conv_dedup": q_conv_dedup,
        "snapshot_delta": q_snapshot_delta,
        "inverted_index": q_inverted_index,
        "tfidf_top_terms": q_tfidf_top_terms,
        "value_quantiles": q_value_quantiles,
        "sample_split_counts": q_sample_split_counts,
        "sample_stratified_counts": q_sample_stratified_counts,
        "flatten_list_counts": R.q_flatten_list_counts,
        # training-data ops
        "dedup_exact": q_dedup_exact,
        "minhash_signature": q_minhash_signature,
        "minhash_pairs": q_minhash_pairs,
        "minhash_banded_pairs": q_minhash_banded_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard,
        "simhash": q_simhash,
        "token_stats": q_token_stats,
        "quality_score": q_quality,
        "lang_guess": q_lang_guess,
        "doc_fingerprint": q_fingerprint,
        "ann_brute_topk": q_ann_brute,
        "ann_ivf_topk": q_ann_ivf,
        "ann_ivf_kmeans_topk": q_ann_ivf_kmeans,
        "simhash64": q_simhash64,
        "cosine_dup_pairs": q_cosine_dups,
        "media_decode_dims": q_media_decode,
        "events_sessions": q_events_sessions,
        # iterative / pipeline (cc has an oracle via chain structure)
        "cc_customer_chains": q_cc_customer_chains,
        "kg_turn_records": q_kg_turn_records,
    }


_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"


def _simhash_sql() -> str:
    bits = []
    for i in range(16):
        vote = (
            f"sum(CASE WHEN ascii(substr(md5(tok), {i + 1}, 1)) % 2 = 1 "
            f"THEN 1 ELSE -1 END)"
        )
        bits.append(f"CASE WHEN {vote} > 0 THEN {1 << i} ELSE 0 END")
    total = " + ".join(bits)
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        )
        SELECT doc_id, CAST({total} AS INTEGER) AS simhash
        FROM toks GROUP BY doc_id
    """


def _minhash_sig_sql(k: int = 4) -> str:
    sigs = ", ".join(
        f"list_min(list_transform({_TOKS}, t -> md5(t || '#s{j}'))) AS sig_{j}"
        for j in range(k)
    )
    return f"SELECT doc_id, {sigs} FROM documents"


def _banded_union_sql(bands: int = 4, rows: int = 2) -> str:
    """The OR-of-ANDs band joins over a CTE named ``sig`` (no WITH
    prefix, so callers can splice it into their own CTE list)."""
    joins = []
    for j in range(bands):
        conds = " AND ".join(
            f"a.sig_{j * rows + r} = b.sig_{j * rows + r}"
            for r in range(rows)
        )
        joins.append(
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
            f"FROM sig a JOIN sig b ON {conds} AND a.doc_id < b.doc_id"
        )
    return "\nUNION\n".join(joins)


def _minhash_banded_sql(bands: int = 4, rows: int = 2) -> str:
    return (f"WITH sig AS ({_minhash_sig_sql(bands * rows)})\n"
            f"{_banded_union_sql(bands, rows)}")


def _ngram_jaccard_sql(n: int = 3, threshold: float = 0.5) -> str:
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(0, greatest(len(toks) - {n}, 0) + 1),
                     i -> list_aggregate(toks[i+1:i+{n}], 'string_agg', ' ')
                   )) AS grams
            FROM t
        ),
        inv AS (
            SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.ng AS na, b.ng AS nb, count(*) AS ninter
            FROM inv a JOIN inv b
              ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b,
               CAST(floor(ninter * 10000.0 / (na + nb - ninter) + 0.5)
                    AS BIGINT) AS jacc_x10k
        FROM inter
        WHERE ninter * 1.0 / (na + nb - ninter) >= {threshold}
    """


def _simhash64_sql() -> str:
    def half(salt: str) -> str:
        bits = []
        for i in range(32):
            vote = (
                f"sum(CASE WHEN ascii(substr(md5(tok || '{salt}'), "
                f"{i + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END)"
            )
            bits.append(f"CASE WHEN {vote} > 0 THEN CAST({1 << i} AS BIGINT) "
                        f"ELSE 0 END")
        return " + ".join(bits)
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        )
        SELECT doc_id,
               CAST({half('#h')} AS BIGINT) AS simhash_hi,
               CAST({half('')} AS BIGINT) AS simhash_lo
        FROM toks GROUP BY doc_id
    """


def _ivf_kmeans_sql(n_clusters: int = 8, nprobe: int = 2, k: int = 3,
                    n_queries: int = 10) -> str:
    """Unrolled 2-iteration exact-integer Lloyd k-means + multi-probe
    top-k — the bit-exact twin of ops.similarity.ivf_kmeans_topk."""
    sqdist = ("list_sum(list_transform(list_zip({a}, {b}), "
              "x -> (x[1] - x[2]) * (x[1] - x[2])))")
    dot = "list_sum(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]))"
    sq = "list_sum(list_transform({a}, x -> x * x))"

    def assign(cents: str, out: str) -> str:
        d = sqdist.format(a="e.v", b="c.cv")
        return f"""
        {out} AS (
          SELECT nid, cid FROM (
            SELECT e.nid, c.cid,
                   row_number() OVER (PARTITION BY e.nid
                     ORDER BY {d}, c.cid) AS rn
            FROM e CROSS JOIN {cents} c) WHERE rn = 1
        )"""

    def update(assign_t: str, out: str) -> str:
        return f"""
        {out} AS (
          SELECT cid, list(cval ORDER BY dim) AS cv FROM (
            SELECT {assign_t}.cid, ev.dim,
                   CAST(floor(sum(ev.val) * 1.0 / count(*)) AS BIGINT)
                     AS cval
            FROM {assign_t} JOIN ev USING (nid)
            GROUP BY {assign_t}.cid, ev.dim)
          GROUP BY cid
        )"""

    pd_ = sqdist.format(a="e.v", b="c.cv")
    qdot = dot.format(a="q.v", b="b.v")
    qsq, bsq = sq.format(a="q.v"), sq.format(a="b.v")
    return f"""
        WITH e AS (
          SELECT vec_id AS nid,
                 list_transform(embedding,
                   x -> CAST(round(x * 10000) AS BIGINT)) AS v
          FROM embeddings
        ),
        ev AS (
          SELECT nid, unnest(v) AS val, generate_subscripts(v, 1) AS dim
          FROM e
        ),
        c0 AS (SELECT nid AS cid, v AS cv FROM e WHERE nid < {n_clusters}),
        {assign('c0', 'a0')},
        {update('a0', 'c1')},
        {assign('c1', 'a1')},
        {update('a1', 'c2')},
        {assign('c2', 'af')},
        probes AS (
          SELECT qid, cid FROM (
            SELECT e.nid AS qid, c.cid,
                   row_number() OVER (PARTITION BY e.nid
                     ORDER BY {pd_}, c.cid) AS prn
            FROM e CROSS JOIN c2 c WHERE e.nid < {n_queries})
          WHERE prn <= {nprobe}
        ),
        sims AS (
          SELECT p.qid AS query_id, b.nid AS neighbor_id,
                 CAST(floor(({qdot}) / (sqrt({qsq}) * sqrt({bsq}))
                      * 10000 + 0.5) AS BIGINT) AS cosine_x10k
          FROM probes p
          JOIN af ON af.cid = p.cid
          JOIN e b ON b.nid = af.nid
          JOIN e q ON q.nid = p.qid
          WHERE b.nid <> p.qid
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_x10k DESC, neighbor_id) AS INTEGER)
                 AS rank,
               cosine_x10k
        FROM sims QUALIFY rank <= {k}
    """


def _semantic_dedup_sql(n_clusters: int = 8,
                        threshold_x10k: int = 9500) -> str:
    """Bit-exact twin of ops.similarity.semantic_dedup: the same
    unrolled 2-iteration integer k-means as _ivf_kmeans_sql, then
    within-cluster cosine pairs and a recursive-CTE closure with the
    numeric-minimum canonical."""
    sqdist = ("list_sum(list_transform(list_zip({a}, {b}), "
              "x -> (x[1] - x[2]) * (x[1] - x[2])))")

    def assign(cents: str, out: str) -> str:
        d = sqdist.format(a="e.v", b="c.cv")
        return f"""
        {out} AS (
          SELECT nid, cid FROM (
            SELECT e.nid, c.cid,
                   row_number() OVER (PARTITION BY e.nid
                     ORDER BY {d}, c.cid) AS rn
            FROM e CROSS JOIN {cents} c) WHERE rn = 1
        )"""

    def update(assign_t: str, out: str) -> str:
        return f"""
        {out} AS (
          SELECT cid, list(cval ORDER BY dim) AS cv FROM (
            SELECT {assign_t}.cid, ev.dim,
                   CAST(floor(sum(ev.val) * 1.0 / count(*)) AS BIGINT)
                     AS cval
            FROM {assign_t} JOIN ev USING (nid)
            GROUP BY {assign_t}.cid, ev.dim)
          GROUP BY cid
        )"""

    cos = ("CAST(floor(list_cosine_similarity("
           "list_transform(a.embedding, x -> CAST(x AS DOUBLE)), "
           "list_transform(b.embedding, x -> CAST(x AS DOUBLE))) "
           "* 10000 + 0.5) AS BIGINT)")
    return f"""
        WITH RECURSIVE e AS (
          SELECT vec_id AS nid,
                 list_transform(embedding,
                   x -> CAST(round(x * 10000) AS BIGINT)) AS v
          FROM embeddings
        ),
        ev AS (
          SELECT nid, unnest(v) AS val, generate_subscripts(v, 1) AS dim
          FROM e
        ),
        c0 AS (SELECT nid AS cid, v AS cv FROM e WHERE nid < {n_clusters}),
        {assign('c0', 'a0')},
        {update('a0', 'c1')},
        {assign('c1', 'a1')},
        {update('a1', 'c2')},
        {assign('c2', 'af')},
        pairs AS (
          SELECT fa.nid AS id_a, fb.nid AS id_b
          FROM af fa
          JOIN af fb ON fa.cid = fb.cid AND fa.nid < fb.nid
          JOIN embeddings a ON a.vec_id = fa.nid
          JOIN embeddings b ON b.vec_id = fb.nid
          WHERE {cos} >= {threshold_x10k}
        ),
        edges AS (
          SELECT id_a AS s, id_b AS d FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(node, m) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT edges.d, r.m FROM edges JOIN reach r ON r.node = edges.s
        )
        SELECT node AS vec_id,
               CAST(MIN(m) AS BIGINT) AS canonical,
               MIN(m) = node AS kept
        FROM reach GROUP BY node
    """


_NATION_EDGES_SQL = """
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
"""


def _pagerank_nations_sql() -> str:
    from ramp_shapes_spark.ops.graph import pagerank_oracle_sql
    return pagerank_oracle_sql("""
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, 1 AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """)


def oracle_sql() -> dict[str, str]:
    return {
        "frame_supplier_record": R.oracle_frame_supplier_record(),
        "frame_nation_suppliers_set": R.oracle_frame_nation_suppliers_set(),
        "frame_order_optional_union": R.oracle_frame_order_optional_union(),
        "path_sequence_region": R.oracle_path_sequence_region(),
        "path_closure_chain": R.oracle_path_closure_chain(),
        "path_alternative_places": R.oracle_path_alternative_places(),
        "path_one_or_more": R.oracle_path_one_or_more(),
        "path_zero_or_one": R.oracle_path_zero_or_one(),
        "vocabulary_region": R.oracle_vocabulary_region(),
        "frame_map_nations": R.oracle_frame_map_nations(),
        "frame_error_codes": R.oracle_frame_error_codes(),
        "flatten_roundtrip_counts": R.oracle_flatten_roundtrip_counts(),
        "flatten_relational_counts": R.oracle_flatten_relational_counts(),
        "turtle_roundtrip_counts": R.oracle_turtle_roundtrip_counts(),
        "shape_subgraph_counts": R.oracle_shape_subgraph_counts(),
        "store_frame_names": R.oracle_store_frame_names(),
        "ntriples_roundtrip_counts": R.oracle_ntriples_roundtrip_counts(),
        "incremental_frame_names": R.oracle_incremental_frame_names(),
        "flatten_list_counts": R.oracle_flatten_list_counts(),
        "dedup_exact": """
            SELECT md5(text) AS text_hash,
                   count(*) AS n_docs,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        """,
        "minhash_signature": _minhash_sig_sql(),
        "minhash_banded_pairs": _minhash_banded_sql(),
        "ngram_jaccard_pairs": _ngram_jaccard_sql(),
        "minhash_pairs": f"""
            WITH sig AS ({_minhash_sig_sql()})
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig a JOIN sig b
              ON a.sig_0 = b.sig_0 AND a.sig_1 = b.sig_1
             AND a.sig_2 = b.sig_2 AND a.sig_3 = b.sig_3
             AND a.doc_id < b.doc_id
        """,
        # clusters = connected components of the BANDED LSH pair graph
        # (non-transitive similarity → a real closure, not clique
        # folding); the recursive CTE propagates every reachable id and
        # min() picks the component representative (numeric minimum —
        # the Spark side zero-pads node ids so its lexicographic CC rep
        # is the same value)
        "neardup_clusters": f"""
            WITH RECURSIVE sig AS ({_minhash_sig_sql(8)}),
            pairs AS ({_banded_union_sql()}),
            edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION ALL
                SELECT doc_b AS src, doc_a AS dst FROM pairs),
            reach(node, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.dst, r.m
                FROM reach r JOIN edges e ON e.src = r.node)
            SELECT node AS doc_id, min(m) AS canonical
            FROM reach GROUP BY node
        """,
        # thresholds are the cumulative 4-hex-digit bucket bounds of
        # ops/sampling.py: 0.8 -> 0xcccc, 0.9 -> 0xe666
        "sample_split_counts": """
            SELECT CASE
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                          < 'cccc' THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                          < 'e666' THEN 'valid'
                     ELSE 'test'
                   END AS split,
                   lang, count(*) AS n_docs
            FROM documents GROUP BY 1, 2
        """,
        # the exact BPE_SEGMENT_RE pattern (Java-regex/RE2-common
        # subset), whitespace split matches _TOKS
        "bpe_token_counts": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(
                       text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+'))
                       AS BIGINT) AS n_subwords,
                   CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens
            FROM documents
        """,
        # the exact PII patterns (Java-regex/RE2-common subset) over the
        # same deterministically injected corpus; DuckDB regexp_replace
        # needs the 'g' flag for replace-all (Spark replaces all by
        # default)
        "pii_redaction": """
            WITH injected AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com now'
                            || CASE WHEN doc_id % 3 = 0
                               THEN ' ip 10.0.'
                                    || CAST(doc_id % 250 AS VARCHAR)
                                    || '.'
                                    || CAST((doc_id * 7) % 250 AS VARCHAR)
                               ELSE '' END AS text
                FROM documents
            ), e AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                           AS BIGINT) AS n_emails,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g') AS t2
                FROM injected
            )
            SELECT doc_id, n_emails,
                   CAST(len(regexp_extract_all(t2,
                       '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
                   CAST(length(regexp_replace(t2,
                       '([0-9]{1,3}\\.){3}[0-9]{1,3}', '[IP]', 'g'))
                       AS BIGINT) AS clean_len,
                   md5(regexp_replace(t2,
                       '([0-9]{1,3}\\.){3}[0-9]{1,3}', '[IP]', 'g'))
                       AS clean_hash
            FROM e
        """,
        # eval set = doc_id % 20 == 0; a training doc is contaminated
        # when one of its DISTINCT 5-grams appears anywhere in the eval
        # corpus; n_hit_grams counts those distinct grams
        "decontaminate_5gram": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS w FROM documents
            ),
            epos AS (
                SELECT doc_id, unnest(generate_series(1, len(w) - 4)) AS i,
                       w
                FROM toks WHERE doc_id % 20 = 0
            ),
            eg AS (
                SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS gram
                FROM epos
            ),
            tpos AS (
                SELECT doc_id, unnest(generate_series(1, len(w) - 4)) AS i,
                       w
                FROM toks WHERE doc_id % 20 <> 0
            ),
            tg AS (
                SELECT DISTINCT doc_id,
                       array_to_string(w[i:i+4], ' ') AS gram
                FROM tpos
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
            FROM tg JOIN eg USING (gram)
            GROUP BY doc_id
        """,
        # most-frequent-bigram coverage via explode+groupBy (the Spark
        # side computes the same mode inside the row, shuffle-free)
        "repetition_stats": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS w FROM documents
            ),
            bpos AS (
                SELECT doc_id, unnest(generate_series(1, len(w) - 1)) AS i,
                       w
                FROM toks
            ),
            bg AS (
                SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
                FROM bpos
            ),
            mx AS (
                SELECT doc_id, max(c) AS mx FROM (
                    SELECT doc_id, gram, count(*) AS c
                    FROM bg GROUP BY doc_id, gram
                ) GROUP BY doc_id
            )
            SELECT t.doc_id,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN len(w) > 0 THEN floor(
                       10000.0 * len(list_distinct(w)) / len(w) + 0.5)
                       ELSE 0 END AS BIGINT) AS distinct_x10k,
                   CAST(CASE WHEN len(w) > 0 THEN floor(
                       20000.0 * coalesce(mx.mx, 0) / len(w) + 0.5)
                       ELSE 0 END AS BIGINT) AS top_bigram_x10k
            FROM toks t LEFT JOIN mx ON t.doc_id = mx.doc_id
        """,
        # concat-and-chunk packing: identical window math (group =
        # doc_id % 16, stream order = doc_id, budget 64 tokens)
        "pack_sequences_spans": f"""
            WITH nz AS (
                SELECT doc_id, CAST(doc_id % 16 AS BIGINT) AS grp,
                       CAST(len({_TOKS}) AS BIGINT) AS n
                FROM documents
                WHERE len({_TOKS}) > 0
            ), cum AS (
                SELECT doc_id, grp, n,
                       SUM(n) OVER (PARTITION BY grp ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n AS cb
                FROM nz
            ), spans AS (
                SELECT doc_id, grp, n, cb,
                       unnest(generate_series(CAST(cb // 64 AS BIGINT),
                           CAST((cb + n - 1) // 64 AS BIGINT))) AS seq
                FROM cum
            )
            SELECT doc_id, grp, CAST(seq AS BIGINT) AS seq,
                   CAST(GREATEST(seq * 64 - cb, 0) AS BIGINT) AS tok_start,
                   CAST(LEAST(seq * 64 + 64 - cb, n)
                        - GREATEST(seq * 64 - cb, 0) AS BIGINT) AS n_toks,
                   CAST(GREATEST(cb - seq * 64, 0) AS BIGINT) AS seq_pos
            FROM spans
        """,
        # per-source quota: the same deterministic md5 ranking
        "quota_sample_rows": """
            SELECT doc_id, source, rk FROM (
                SELECT doc_id, source,
                       CAST(row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                         AS BIGINT) AS rk
                FROM documents
            ) WHERE rk <= 18
        """,
        # URL regex + last-two-label domain + blocklist membership over
        # the same deterministically injected corpus
        "url_domain_blocked": """
            WITH injected AS (
                SELECT doc_id,
                       text || ' see https://sub'
                            || CAST(doc_id % 7 AS VARCHAR)
                            || '.example' || CAST(doc_id % 5 AS VARCHAR)
                            || '.com/p/' || CAST(doc_id AS VARCHAR)
                            || CASE WHEN doc_id % 5 = 0
                               THEN ' and http://cdn.badsite'
                                    || CAST(doc_id % 2 AS VARCHAR)
                                    || '.net/x'
                               ELSE '' END AS text
                FROM documents
            ), u AS (
                SELECT doc_id,
                       regexp_extract_all(text,
                           'https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^ ]*)?')
                         AS urls
                FROM injected
            ), d AS (
                SELECT doc_id,
                       CAST(len(urls) AS BIGINT) AS n_urls,
                       list_sort(list_distinct(list_transform(urls, x ->
                           array_to_string(
                               (string_split(regexp_extract(x,
                                    'https?://([A-Za-z0-9.-]+)', 1), '.'))[
                                 GREATEST(len(string_split(regexp_extract(x,
                                    'https?://([A-Za-z0-9.-]+)', 1), '.'))
                                    - 1, 1):],
                               '.')))) AS domains
                FROM u
            )
            SELECT doc_id, n_urls,
                   array_to_string(domains, ',') AS domains,
                   CAST(len(list_filter(domains, dd ->
                       dd IN ('badsite0.net', 'badsite1.net'))) > 0
                     AS BIGINT) AS blocked
            FROM d
        """,
        # paragraph breaks injected by replacing ' line ' with \n (plain
        # string replace, same leftmost non-overlapping scan in both
        # engines); paragraphs occurring > 2 times corpus-wide dropped,
        # documents rebuilt preserving paragraph order
        "paragraph_dedup": """
            WITH injected AS (
                SELECT doc_id, replace(text, ' line ', chr(10)) AS text
                FROM documents
            ), paras AS (
                SELECT doc_id,
                       list_filter(list_transform(
                           string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS ps
                FROM injected
            ), e2 AS (
                SELECT doc_id, i, ps[i] AS para FROM (
                    SELECT doc_id,
                           unnest(generate_series(1, len(ps))) AS i, ps
                    FROM paras)
            ), hot AS (
                SELECT md5(para) AS ph FROM e2
                GROUP BY md5(para) HAVING count(*) > 2
            ), kept AS (
                SELECT doc_id, i, para FROM e2
                WHERE md5(para) NOT IN (SELECT ph FROM hot)
            ), reb AS (
                SELECT doc_id, count(*) AS n_kept,
                       array_to_string(list(para ORDER BY i), chr(10))
                         AS clean
                FROM kept GROUP BY doc_id
            )
            SELECT b.doc_id,
                   CAST(len(b.ps) AS BIGINT) AS n_paras,
                   CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(length(coalesce(r.clean, '')) AS BIGINT)
                     AS clean_len,
                   md5(coalesce(r.clean, '')) AS clean_hash
            FROM paras b LEFT JOIN reb r USING (doc_id)
        """,
        # top-100 corpus tokens; ties broken by token text so the
        # limit boundary is engine-independent
        "vocab_topk": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS w FROM documents
            ), t AS (
                SELECT doc_id, unnest(w) AS token FROM toks
            ), c AS (
                SELECT token,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                       CAST(count(*) AS BIGINT) AS n_occurrences
                FROM t GROUP BY token
            )
            SELECT token, n_docs, n_occurrences,
                   CAST(row_number() OVER (
                       ORDER BY n_occurrences DESC, token) AS BIGINT)
                     AS vocab_rank
            FROM c
            ORDER BY n_occurrences DESC, token
            LIMIT 100
        """,
        # DuckDB's NATIVE asof join vs the Spark union-tag + running
        # last(ignorenulls) window — two independent formulations of
        # inclusive backward as-of semantics
        "events_asof_view": """
            SELECT c.event_id, c.user_id,
                   CAST(v.event_id AS BIGINT) AS view_event_id,
                   v.value AS view_value,
                   CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT)
                     AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'view') v
            ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        # same unrolled fixed-point iterations as ops/graph.pagerank —
        # floor division per edge, exact longs, dangling mass dropped
        "pagerank_nations": _pagerank_nations_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "conv_turn_stats": f"""
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(*) FILTER (role = 'user') AS BIGINT)
                     AS n_user,
                   CAST(count(*) FILTER (role = 'assistant') AS BIGINT)
                     AS n_assistant,
                   CAST(count(*) FILTER (role = 'tool') AS BIGINT)
                     AS n_tool,
                   CAST(count(DISTINCT CASE WHEN tool <> '' THEN tool END)
                     AS BIGINT) AS n_tools_distinct,
                   CAST(sum(CASE WHEN prev_role IS NOT NULL
                                  AND role <> prev_role
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_role_switches,
                   CAST(sum(COALESCE(gap, 0)) AS BIGINT) AS total_gap_us,
                   CAST(max(COALESCE(gap, 0)) AS BIGINT) AS max_gap_us
            FROM (
              SELECT conv_id, role, tool,
                     lag(role) OVER w AS prev_role,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
              FROM read_parquet('{_KG_SMOKE_PARQUET}')
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            )
            GROUP BY conv_id
        """,
        "tool_transitions": f"""
            SELECT COALESCE(prev_tool, '<start>') AS prev_tool, tool,
                   CAST(count(*) AS BIGINT) AS n_transitions
            FROM (
              SELECT tool,
                     lag(tool) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev_tool
              FROM read_parquet('{_KG_SMOKE_PARQUET}')
              WHERE tool <> ''
            )
            GROUP BY 1, 2
        """,
        # same prefix-free encoding as ops/transcripts.py: role,
        # chr(30), text per turn; turns joined with chr(31)
        "conv_dedup": f"""
            WITH base AS (
              SELECT * FROM read_parquet('{_KG_SMOKE_PARQUET}')
            ), aug AS (
              SELECT conv_id, turn_idx, role, text FROM base
              UNION ALL
              SELECT 'dup-' || conv_id, turn_idx, role, text FROM base
              WHERE substr(md5(conv_id), 1, 1) IN ('0','1','2','3')
            ), fp AS (
              SELECT conv_id,
                     md5(string_agg(role || chr(30) || text, chr(31)
                                    ORDER BY turn_idx)) AS conv_sha
              FROM aug GROUP BY conv_id
            ), g AS (
              SELECT conv_sha,
                     CAST(count(*) AS BIGINT) AS n_dup_convs,
                     min(conv_id) AS canonical_conv_id
              FROM fp GROUP BY conv_sha
            )
            SELECT fp.conv_id, fp.conv_sha, g.n_dup_convs,
                   g.canonical_conv_id,
                   fp.conv_id = g.canonical_conv_id AS is_canonical
            FROM fp JOIN g USING (conv_sha)
        """,
        "inverted_index": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS w FROM documents
            ), t AS (
                SELECT doc_id AS doc, unnest(w) AS token FROM toks
            ), tf AS (
                SELECT token, doc, CAST(count(*) AS BIGINT) AS tf
                FROM t GROUP BY token, doc
            ), stats AS (
                SELECT token, CAST(count(*) AS BIGINT) AS df,
                       CAST(sum(tf) AS BIGINT) AS total_tf
                FROM tf GROUP BY token
            ), capped AS (
                SELECT token, doc, tf,
                       row_number() OVER (PARTITION BY token
                                          ORDER BY tf DESC, doc) AS rn
                FROM tf QUALIFY rn <= 5
            ), p AS (
                SELECT token,
                       string_agg(doc || '|' || tf, ',' ORDER BY rn)
                         AS postings
                FROM capped GROUP BY token
            )
            SELECT s.token, s.df, s.total_tf, p.postings
            FROM stats s JOIN p USING (token)
            WHERE s.df >= 10
        """,
        "tfidf_top_terms": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS w FROM documents
            ), t AS (
                SELECT doc_id AS doc, unnest(w) AS token FROM toks
            ), tf AS (
                SELECT token, doc, CAST(count(*) AS BIGINT) AS tf
                FROM t GROUP BY token, doc
            ), dfq AS (
                SELECT token, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY token
            ), nn AS (
                SELECT count(*) * 1000000 AS n_scaled FROM documents
            ), scored AS (
                SELECT doc, token, tf, df,
                       CAST(tf * (n_scaled // df) AS BIGINT) AS score
                FROM tf JOIN dfq USING (token) CROSS JOIN nn
            )
            SELECT doc AS doc_id, token, tf, df, score,
                   CAST(row_number() OVER (
                       PARTITION BY doc
                       ORDER BY score DESC, token) AS BIGINT)
                     AS term_rank
            FROM scored
            QUALIFY term_rank <= 3
        """,
        "value_quantiles": """
            WITH ranked AS (
                SELECT event_type AS grp, value AS val,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value) AS rn
                FROM events WHERE value IS NOT NULL
            ), c AS (
                SELECT grp, CAST(max(rn) AS BIGINT) AS n
                FROM ranked GROUP BY grp
            )
            SELECT r.grp AS event_type,
                   CAST(max(c.n) AS BIGINT) AS n,
                   min(CASE WHEN r.rn = greatest(1, (50*c.n+99)//100)
                            THEN r.val END) AS q50,
                   min(CASE WHEN r.rn = greatest(1, (95*c.n+99)//100)
                            THEN r.val END) AS q95,
                   min(CASE WHEN r.rn = greatest(1, (99*c.n+99)//100)
                            THEN r.val END) AS q99
            FROM ranked r JOIN c USING (grp)
            GROUP BY r.grp
        """,
        "snapshot_delta": """
            WITH oc AS (
              SELECT user_id, event_type, count(*) AS no
              FROM events WHERE event_id % 10 <> 0
              GROUP BY user_id, event_type
            ), nc AS (
              SELECT user_id, event_type, count(*) AS nn
              FROM events WHERE event_id % 7 <> 0
              GROUP BY user_id, event_type
            ), j AS (
              SELECT user_id, event_type,
                     COALESCE(nn, 0) - COALESCE(no, 0) AS d
              FROM oc FULL OUTER JOIN nc USING (user_id, event_type)
            )
            SELECT user_id, event_type,
                   CASE WHEN d > 0 THEN 'add' ELSE 'del' END AS op,
                   CAST(abs(d) AS BIGINT) AS n
            FROM j WHERE d <> 0
        """,
        # triangles counted from the canonical (u < v) undirected edge
        # set: one canonical triple (a < b < c) per triangle, then each
        # corner gets +1 (the Spark side's degree-ordered enumeration
        # finds the same set of triangles)
        "triangle_nations": f"""
            WITH und AS (
              SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM ({_NATION_EDGES_SQL}) WHERE src <> dst
            ),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM und e1
              JOIN und e2 ON e2.u = e1.v
              JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
            ),
            corners AS (
              SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri
            ),
            nodes AS (SELECT u AS node FROM und UNION SELECT v FROM und)
            SELECT n.node,
                   CAST(COALESCE(t.cnt, 0) AS BIGINT) AS triangles
            FROM nodes n
            LEFT JOIN (SELECT node, COUNT(*) AS cnt FROM corners
                       GROUP BY node) t
              ON t.node = n.node
        """,
        "neighbor_jaccard_nations": f"""
            WITH und AS (
              SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM ({_NATION_EDGES_SQL}) WHERE src <> dst
            ),
            adj AS (
              SELECT u AS n, v AS nbr FROM und
              UNION ALL SELECT v, u FROM und
            ),
            deg AS (SELECT n, COUNT(*) AS d FROM adj GROUP BY n),
            centers AS (
              SELECT adj.n, adj.nbr FROM adj JOIN deg USING (n)
              WHERE deg.d <= 10000
            ),
            common AS (
              SELECT x.nbr AS node_a, y.nbr AS node_b,
                     CAST(COUNT(*) AS BIGINT) AS n_common
              FROM centers x JOIN centers y ON x.n = y.n
              WHERE x.nbr < y.nbr
              GROUP BY x.nbr, y.nbr
            )
            SELECT c.node_a, c.node_b, c.n_common,
                   (c.n_common * 1000000)
                     // (da.d + db.d - c.n_common) AS jaccard_ppm
            FROM common c
            JOIN deg da ON da.n = c.node_a
            JOIN deg db ON db.n = c.node_b
        """,
        "nation_cooccur_lift": """
            WITH obs AS (
              SELECT DISTINCT l.l_orderkey AS c, s.s_nationkey AS i
              FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            ),
            sizes AS (SELECT c, COUNT(*) AS n FROM obs GROUP BY c),
            kept AS (
              SELECT obs.c, obs.i FROM obs JOIN sizes USING (c)
              WHERE sizes.n <= 1000
            ),
            nc AS (SELECT COUNT(DISTINCT c) AS n_containers FROM kept),
            ic AS (SELECT i, COUNT(*) AS ni FROM kept GROUP BY i),
            pairs AS (
              SELECT a.i AS item_a, b.i AS item_b,
                     CAST(COUNT(*) AS BIGINT) AS n_ab
              FROM kept a JOIN kept b ON a.c = b.c AND a.i < b.i
              GROUP BY a.i, b.i
            )
            SELECT p.item_a, p.item_b, p.n_ab,
                   (p.n_ab * nc.n_containers * 1000000)
                     // (ia.ni * ib.ni) AS lift_ppm
            FROM pairs p
            CROSS JOIN nc
            JOIN ic ia ON ia.i = p.item_a
            JOIN ic ib ON ib.i = p.item_b
        """,
        # en downsampled to 0.25 (threshold 0x4000), other strata kept
        # ('g' sorts above every hex bucket)
        "sample_stratified_counts": """
            SELECT lang, count(*) AS n_docs
            FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                  < CASE WHEN lang = 'en' THEN '4000' ELSE 'g' END
            GROUP BY lang
        """,
        "simhash": _simhash_sql(),
        "simhash64": _simhash64_sql(),
        # every column of the REAL decode has a closed form under the
        # synthesis rule (w = 16 + id%49, h = 16 + id%33, gray pixel
        # (x,y) = x + y, even id -> 24-bit BMP, odd id -> binary P6 PPM)
        "media_decode_dims": """
            SELECT 'img' || CAST(doc_id AS VARCHAR) AS media_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END
                     AS fmt,
                   CAST(16 + doc_id % 49 AS INTEGER) AS width,
                   CAST(16 + doc_id % 33 AS INTEGER) AS height,
                   CAST(CASE WHEN doc_id % 2 = 0
                     THEN 54 + (16 + doc_id % 33)
                          * ((3 * (16 + doc_id % 49) + 3) // 4 * 4)
                     ELSE 9
                          + length(CAST(16 + doc_id % 49 AS VARCHAR))
                          + length(CAST(16 + doc_id % 33 AS VARCHAR))
                          + 3 * (16 + doc_id % 49) * (16 + doc_id % 33)
                     END AS BIGINT) AS n_bytes,
                   CAST((16 + doc_id % 49) * (16 + doc_id % 33)
                        * ((16 + doc_id % 49) + (16 + doc_id % 33) - 2)
                        // 2 AS BIGINT) AS sum_lum
            FROM documents
        """,
        "ann_ivf_kmeans_topk": _ivf_kmeans_sql(),
        "kg_turn_records": f"""
            SELECT 'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR)
                     AS subject,
                   CAST(turn_idx AS BIGINT) AS idx,
                   role,
                   CAST(len(regexp_extract_all(text,
                     '(the )?acme-?(\\d{{5}})( inc| corp)?'))
                     AS BIGINT) AS n_mentions
            FROM read_parquet('{_KG_SMOKE_PARQUET}')
        """,
        "token_stats": f"""
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(length(text) AS INTEGER) AS n_chars,
                   CAST(floor(
                     CASE WHEN len({_TOKS}) > 0 THEN
                       CAST(length(text) - (len({_TOKS}) - 1) AS DOUBLE)
                         / len({_TOKS})
                     ELSE 0.0 END * 10000 + 0.5) AS BIGINT)
                     AS avg_token_len_x10k,
                   CAST(floor(
                     CASE WHEN len({_TOKS}) > 0 THEN
                       CAST(len(list_filter({_TOKS},
                         t -> list_contains(
                           ['the','a','and','of','to','in','is','for'], t)))
                         AS DOUBLE) / len({_TOKS})
                     ELSE 0.0 END * 10000 + 0.5) AS BIGINT) AS stopword_x10k
            FROM documents
        """,
        "quality_score": f"""
            SELECT doc_id,
                   CAST(floor((
                     (CASE WHEN len({_TOKS}) BETWEEN 10 AND 100000
                           THEN 0.4 ELSE 0.0 END)
                     + (CASE WHEN len(list_filter({_TOKS},
                          t -> list_contains(
                            ['the','a','and','of','to','in','is','for'], t)))
                          > 0 THEN 0.2 ELSE 0.0 END)
                     + (CASE WHEN length(text) > 0 THEN
                          CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                            AS DOUBLE) / length(text)
                        ELSE 0.0 END) * 0.4
                   ) * 10000 + 0.5) AS BIGINT) AS quality_x10k
            FROM documents
        """,
        "lang_guess": f"""
            WITH counts AS (
                SELECT doc_id,
                  len(list_filter({_TOKS}, t -> list_contains(['the','and','of'], t))) AS c_en,
                  len(list_filter({_TOKS}, t -> list_contains(['der','die','und'], t))) AS c_de,
                  len(list_filter({_TOKS}, t -> list_contains(['el','la','de'], t))) AS c_es,
                  len(list_filter({_TOKS}, t -> list_contains(['le','la','et'], t))) AS c_fr
                FROM documents
            )
            SELECT doc_id,
                   CASE
                     WHEN c_en >= 1 AND c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
                     WHEN c_de >= 1 AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                     WHEN c_es >= 1 AND c_es >= c_fr THEN 'es'
                     WHEN c_fr >= 1 THEN 'fr'
                     ELSE 'und'
                   END AS lang_guess
            FROM counts
        """,
        "doc_fingerprint": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   list_min(list_transform(
                     range(0, greatest(len(toks) - 8, 0) + 1),
                     i -> md5(list_aggregate(toks[i+1:i+8], 'string_agg', ' '))
                   )) AS fingerprint
            FROM t
        """,
        "events_sessions": """
            WITH g AS (
                SELECT user_id, event_type, value,
                       CASE WHEN lag(epoch(ts)) OVER
                              (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                            OR epoch(ts) - lag(epoch(ts)) OVER
                              (PARTITION BY user_id ORDER BY ts, event_id)
                               > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
            )
            SELECT user_id,
                   count(*) AS n_events,
                   CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS purchase_cents
            FROM g GROUP BY user_id
        """,
        "cc_customer_chains": """
            WITH stats AS (
                SELECT c_nationkey,
                       min('c:' || CAST(c_custkey AS VARCHAR)) AS comp,
                       count(*) AS n
                FROM customer GROUP BY c_nationkey
            )
            SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS node,
                   comp AS component
            FROM customer JOIN stats USING (c_nationkey)
            WHERE n >= 2
        """,
        "ann_brute_topk": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       CAST(floor(
                         list_cosine_similarity(
                           list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                           list_transform(n.embedding, x -> CAST(x AS DOUBLE))
                         ) * 10000 + 0.5) AS BIGINT) AS cosine_x10k
                FROM embeddings q, embeddings n
                WHERE q.vec_id < 10 AND q.vec_id <> n.vec_id
            )
            SELECT query_id, neighbor_id,
                   CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cosine_x10k DESC, neighbor_id ASC) AS INTEGER)
                     AS rank,
                   cosine_x10k
            FROM sims
            QUALIFY rank <= 3
        """,
        "ann_ivf_topk": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       CAST(floor(
                         list_cosine_similarity(
                           list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                           list_transform(n.embedding, x -> CAST(x AS DOUBLE))
                         ) * 10000 + 0.5) AS BIGINT) AS cosine_x10k
                FROM embeddings q JOIN embeddings n ON q.label = n.label
                WHERE q.vec_id < 10 AND q.vec_id <> n.vec_id
            )
            SELECT query_id, neighbor_id,
                   CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cosine_x10k DESC, neighbor_id ASC) AS INTEGER)
                     AS rank,
                   cosine_x10k
            FROM sims
            QUALIFY rank <= 3
        """,
        "cosine_dup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(floor(
                     list_cosine_similarity(
                       list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(b.embedding, x -> CAST(x AS DOUBLE))
                     ) * 10000 + 0.5) AS BIGINT) AS cosine_x10k
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE CAST(floor(
                     list_cosine_similarity(
                       list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(b.embedding, x -> CAST(x AS DOUBLE))
                     ) * 10000 + 0.5) AS BIGINT) >= 3000
        """,
    }
