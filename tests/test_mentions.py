"""Parity of the pure-column mention detector/scorer against a
row-by-row Python ``re``/float reference (the semantics the previous
pandas-UDF implementation computed directly)."""

import re

import pytest
from pyspark.sql import functions as F

from ramp_shapes_spark.pipeline.datagen import generate_transcripts
from ramp_shapes_spark.pipeline.mentions import detect_mentions, score_links

_REF_RE = re.compile(r"(?:the )?acme-?(\d{5})(?: inc| corp)?")


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_transcripts(spark, 120, n_entities=64, partitions=4) \
        .localCheckpoint(eager=True)


def _ref_rows(turns_rows):
    out = set()
    for row in turns_rows:
        text = row["text"] or ""
        for m in _REF_RE.finditer(text):
            surface = m.group(0)
            grade = 2 if surface.startswith("the ") else (
                1 if "-" in surface else 0)
            base = 1.0 - float(grade) * 0.07
            prior = {"user": 0.0, "assistant": 0.02,
                     "tool": -0.03}.get(row["role"], 0.0)
            bonus = min(len(surface), 24) / 240.0
            score = min(max(base + prior + bonus, 0.0), 1.0)
            out.add((row["conv_id"], row["turn_idx"], surface,
                     m.start(), score))
    return out


def test_detect_and_score_matches_re_reference(spark, corpus):
    got = {
        (r["conv_id"], r["turn_idx"], r["surface"], r["start"], r["score"])
        for r in score_links(detect_mentions(corpus)).collect()
    }
    want = _ref_rows(corpus.collect())
    assert got == want
    assert len(want) > 50  # the corpus genuinely exercises the grammar


def test_detect_positions_with_adversarial_text(spark):
    # repeated/overlapping-prefix surfaces: the locate fold must land on
    # the true finditer starts even when earlier literal copies exist
    texts = [
        "acme-00001 then the acme-00001 inc and acme-00001 again",
        "the acme-00002 corp acme-00002 the acme-00002",
        "acme00003acme-00003 acme00003 inc",
        "no mentions here",
        "",
    ]
    df = spark.createDataFrame(
        [("c", i, "user", t, "") for i, t in enumerate(texts)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    got = {(r["turn_idx"], r["surface"], r["start"])
           for r in detect_mentions(df).collect()}
    want = set()
    for i, t in enumerate(texts):
        for m in _REF_RE.finditer(t):
            want.add((i, m.group(0), m.start()))
    assert got == want
