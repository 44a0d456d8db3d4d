"""Distributed frame engine vs all reference frame goldens.

Each case loads the fixture shape TTL and data TTL, runs the compiled
DataFrame program on Spark and compares framed JSON values (multiset,
``@ref``/``@use``-canonicalized) or the first error-channel row
(code + normalized stack) against the golden file.
"""

import json

import pytest

from ramp_shapes_spark.compare import (
    errors_equal, match_sets_equal,
)
from ramp_shapes_spark.dataset import load_turtle_df
from ramp_shapes_spark.frame import FrameEngine
from ramp_shapes_spark.shape_ttl import load_shapes_from_file

TD = "/root/reference/test-data"

FRAME_CASES = [
    c["name"] for c in json.load(open(f"{TD}/index.json"))
    if c["type"] == "frame"
]


@pytest.mark.parametrize("name", FRAME_CASES)
def test_frame_fixture(spark, name):
    golden = json.load(open(f"{TD}/frame/{name}.json"))
    cat, root = load_shapes_from_file(f"{TD}/shapes/{golden['shapes']}.ttl")
    triples = load_turtle_df(spark, f"{TD}/frame/{name}.ttl")
    engine = FrameEngine(spark, cat, triples)
    result = engine.frame(root)

    if "error" in golden:
        first = result.first_error()
        assert first is not None, (
            "expected error "
            f"{golden['error']['code']}, engine reported none; matches="
            f"{[r['value'] for r in result.matches.collect()]}"
        )
        code, stack = first
        assert errors_equal(code, stack, golden["error"]), (
            f"error mismatch: got ({code}, {stack}), want {golden['error']}"
        )
        return

    rows = result.matches.collect()
    got = [json.loads(r["value"]) for r in rows]
    assert match_sets_equal(got, golden["matches"]), (
        f"matches mismatch:\n  got  {json.dumps(got)}\n"
        f"  want {json.dumps(golden['matches'])}"
    )
