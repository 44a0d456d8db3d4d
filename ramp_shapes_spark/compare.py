"""Golden-fixture comparison utilities.

Mirrors the reference test comparator (test/compare.ts:3-63 structural
equality; test/runner.ts:89-99 stack normalization) with two deliberate
relaxations documented in the survey:

* arrays are compared as **multisets** when an ordered comparison
  fails — the reference's set iteration order (variant-major, then
  dataset insertion order) is an artifact of its sequential evaluator
  and is not a semantic guarantee a distributed engine should replicate;
* blank-node focus strings in error stacks normalize to ``_:blank``
  (exactly what the reference harness does).

``@ref``/``@use`` ids are canonicalized by first-occurrence renumbering
before comparison, so only cycle topology matters.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List


def normalize_refs(value: Any, mapping: Dict[int, int] = None) -> Any:
    if mapping is None:
        mapping = {}
    if isinstance(value, dict):
        out = {}
        for k, v in value.items():
            if k in ("@ref", "@use"):
                out[k] = mapping.setdefault(v, len(mapping) + 1)
            else:
                out[k] = normalize_refs(v, mapping)
        return out
    if isinstance(value, list):
        return [normalize_refs(v, mapping) for v in value]
    return value


def values_equal(got: Any, want: Any) -> bool:
    """Structural equality; unordered arrays fall back to multiset
    matching (small sizes — fixtures)."""
    if isinstance(got, dict) and isinstance(want, dict):
        if set(got.keys()) != set(want.keys()):
            return False
        return all(values_equal(got[k], want[k]) for k in got)
    if isinstance(got, list) and isinstance(want, list):
        if len(got) != len(want):
            return False
        if all(values_equal(g, w) for g, w in zip(got, want)):
            return True
        # multiset matching with backtracking
        remaining = list(want)
        def match_rest(items: List[Any]) -> bool:
            if not items:
                return True
            head, *rest = items
            for i, cand in enumerate(remaining):
                if values_equal(head, cand):
                    removed = remaining.pop(i)
                    if match_rest(rest):
                        return True
                    remaining.insert(i, removed)
            return False
        return match_rest(list(got))
    if isinstance(got, bool) != isinstance(want, bool):
        return False
    if isinstance(got, (int, float)) and isinstance(want, (int, float)):
        return got == want
    return got == want


def match_sets_equal(got: List[Any], want: List[Any]) -> bool:
    """Top-level match lists compare as multisets (candidate iteration
    order is an evaluator artifact)."""
    got_n = [normalize_refs(g) for g in got]
    want_n = [normalize_refs(w) for w in want]
    return values_equal(got_n, want_n) or values_equal(
        sorted(got_n, key=lambda x: json.dumps(x, sort_keys=True)),
        sorted(want_n, key=lambda x: json.dumps(x, sort_keys=True)),
    )


def normalize_stack(stack: List[dict]) -> List[dict]:
    out = []
    for frame in stack:
        frame = dict(frame)
        focus = frame.get("focus")
        if isinstance(focus, str) and focus.startswith("_:"):
            frame["focus"] = "_:blank"
        if "edge" in frame and isinstance(frame["edge"], str) and \
                frame["edge"].isdigit():
            frame["edge"] = int(frame["edge"])
        out.append(frame)
    return out


def errors_equal(got_code: int, got_stack: List[dict],
                 want: dict) -> bool:
    if got_code != want["code"]:
        return False
    if "stack" not in want:
        return True
    return normalize_stack(got_stack) == normalize_stack(want["stack"])


def triple_sets_isomorphic(got, want) -> bool:
    """Quad-set equality up to blank-node renaming.

    ``got``/``want``: iterables of (Term, str, Term).  Small-graph
    backtracking matcher (closes the gap the reference harness left
    open: flatten success-path graph comparison is TODO there,
    test/operations.ts:219-224).
    """
    got = list(got)
    want = list(want)
    if len(got) != len(want):
        return False

    def tkey(term, mapping):
        if term.kind == "bnode":
            return ("b", mapping.get(term.value))
        return ("t", term.key())

    def solve(remaining_got, remaining_want, mapping):
        if not remaining_got:
            return True
        s, p, o = remaining_got[0]
        for i, (ws, wp, wo) in enumerate(remaining_want):
            if wp != p:
                continue
            new_map = dict(mapping)
            ok = True
            for a, b in ((s, ws), (o, wo)):
                if a.kind == "bnode" and b.kind == "bnode":
                    bound = new_map.get(a.value)
                    if bound is None:
                        if b.value in new_map.values():
                            ok = False
                            break
                        new_map[a.value] = b.value
                    elif bound != b.value:
                        ok = False
                        break
                elif a != b:
                    ok = False
                    break
            if ok and solve(remaining_got[1:],
                            remaining_want[:i] + remaining_want[i + 1:],
                            new_map):
                return True
        return False

    return solve(got, want, {})
