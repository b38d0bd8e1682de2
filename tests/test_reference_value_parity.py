"""Rule-level parity sweep: evaluate hundreds of seeded-random (rule, cell)
combinations through BOTH the reference's ``get_value`` interpreter
(imported in-process with the tests/refshim dependency shims) and this
engine's compiled columns — in ONE batched Spark action — and compare the
canonical renders cell by cell.

This complements test_reference_differential.py (whole-parser subprocess
byte-compare) with much denser coverage of the value-mapping / coercion /
fold rule space.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

from adtl_spark.api import Parser

REFERENCE = Path("/root/reference/src")
SHIMS = Path(__file__).parent / "refshim"

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref():
    # shims go at the END of sys.path: only modules genuinely absent from
    # the environment (tomli, pint, joblib, ...) resolve to them
    for p in (str(SHIMS), str(REFERENCE)):
        if p not in sys.path:
            sys.path.append(p)
    from adtl.get_value import get_value

    return get_value


CELLS = ["", "1", "0", "2", "yes", "no", "Yes", "NO", "True", "False",
         "7.5", "007", "-3", "0.0", "x y", "NA", "3.14", " 1 ", "true"]

LITERALS = [True, False, 1, 0, 2, "alpha", "beta", 7.5, None, "True", "0"]


def _random_rules(rng: random.Random, n: int) -> list[dict]:
    rules = []
    for _ in range(n):
        kind = rng.choice(["map", "map", "field", "apply"])
        if kind == "field":
            rules.append({"field": "c"})
        elif kind == "apply":
            rules.append({"field": "c", "apply": {"function": "getFloat"}})
        else:
            keys = rng.sample(CELLS[1:], k=rng.randint(1, 4))
            rule = {
                "field": "c",
                "values": {k: rng.choice(LITERALS) for k in keys},
            }
            if rng.random() < 0.4:
                rule["caseInsensitive"] = True
            if rng.random() < 0.4:
                rule["ignoreMissingKey"] = True
            rules.append(rule)
    return rules


def _canon(v) -> str | None:
    """Reference Python value -> this engine's canonical string render."""
    if v is None or v == "":
        return None
    return str(v)


def test_rule_space_parity_with_reference(spark, ref):
    rng = random.Random(20260813)
    rules = _random_rules(rng, 24)
    ctx = {
        "returnUnmatched": False,
        "defaultDateFormat": "%Y-%m-%d",
        "skip_pattern": None,
    }

    # reference verdicts, one per (rule, cell)
    expected: dict[tuple[int, str], str | None] = {}
    for i, rule in enumerate(rules):
        for cell in CELLS:
            expected[(i, cell)] = _canon(ref({"c": cell}, dict(rule), ctx))

    # engine: ONE table with a column per rule, a row per cell, keyed by a
    # separate id column (the raw cell itself would be numeric-coerced)
    spec = {
        "adtl": {"name": "parity", "description": "", "tables": {"t": {"kind": "oneToOne"}}},
        "t": {"cell": {"field": "id"}, **{f"r{i}": r for i, r in enumerate(rules)}},
    }
    rows = [{"id": str(n), "c": cell} for n, cell in enumerate(CELLS)]
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    mismatches = []
    for row in p.table("t").collect():
        cell = CELLS[int(row["cell"])]
        for i, rule in enumerate(rules):
            got = row[f"r{i}"]
            got = None if got is None else str(got)
            want = expected[(i, cell)]
            if got != want:
                mismatches.append((rule, cell, want, got))
    assert not mismatches, f"{len(mismatches)} divergences, first: {mismatches[0]}"


def test_return_unmatched_rule_space_parity(spark, ref):
    """Same sweep with returnUnmatched=True (failed coercions pass the
    original text through)."""
    rng = random.Random(99)
    rules = _random_rules(rng, 16)
    ctx = {
        "returnUnmatched": True,
        "defaultDateFormat": "%Y-%m-%d",
        "skip_pattern": None,
    }
    expected = {}
    for i, rule in enumerate(rules):
        for cell in CELLS:
            expected[(i, cell)] = _canon(ref({"c": cell}, dict(rule), ctx))

    spec = {
        "adtl": {
            "name": "parity2",
            "description": "",
            "returnUnmatched": True,
            "tables": {"t": {"kind": "oneToOne"}},
        },
        "t": {"cell": {"field": "id"}, **{f"r{i}": r for i, r in enumerate(rules)}},
    }
    rows = [{"id": str(n), "c": cell} for n, cell in enumerate(CELLS)]
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    mismatches = []
    for row in p.table("t").collect():
        cell = CELLS[int(row["cell"])]
        for i, rule in enumerate(rules):
            got = row[f"r{i}"]
            got = None if got is None else str(got)
            want = expected[(i, cell)]
            if got != want:
                mismatches.append((rule, cell, want, got))
    assert not mismatches, f"{len(mismatches)} divergences, first: {mismatches[0]}"


def test_predicate_space_parity_with_reference(spark):
    """Random `if` predicate trees (comparisons, regex, equality sugar,
    any/all/not nesting) against the reference's parse_if on messy cells —
    via oneToMany block selection, so the whole F-layer runs end-to-end."""
    for p in (str(SHIMS), str(REFERENCE)):
        if p not in sys.path:
            sys.path.append(p)
    from adtl.get_value import parse_if

    rng = random.Random(4242)

    def leaf():
        mode = rng.choice(["sugar", "cmp", "regex"])
        if mode == "sugar":
            return {"c": rng.choice(["1", "yes", 1, 2.5, "x y"])}
        if mode == "cmp":
            op = rng.choice([">", ">=", "<", "<=", "!=", "=="])
            return {"c": {op: rng.choice([0, 1, 2, 7.5, -3])}}
        return {"c": {"=~": rng.choice(["^y", "a", "[0-9]+", "^\\s*x"])}}

    def tree(depth=0):
        if depth >= 2 or rng.random() < 0.5:
            return leaf()
        kind = rng.choice(["any", "all", "not"])
        if kind == "not":
            return {"not": tree(depth + 1)}
        return {kind: [tree(depth + 1) for _ in range(rng.randint(1, 3))]}

    predicates = [tree() for _ in range(20)]
    cells = ["", "1", "0", "2", "yes", "Yes", "7.5", "-3", "x y", "abc", "2.5", "007"]

    expected = {}
    for i, pred in enumerate(predicates):
        for cell in cells:
            expected[(i, cell)] = parse_if({"c": cell}, pred)

    blocks = [
        {"name": f"p{i}", "hit": {"field": "id"}, "if": pred}
        for i, pred in enumerate(predicates)
    ]
    spec = {
        "adtl": {"name": "predp", "description": "", "tables": {"t": {"kind": "oneToMany", "discriminator": "attr"}}},
        "t": blocks,
    }
    rows = [{"id": str(n), "c": cell} for n, cell in enumerate(cells)]
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    got = {(r["name"], str(r["hit"])) for r in p.table("t").collect()}
    mismatches = []
    for i, pred in enumerate(predicates):
        for n, cell in enumerate(cells):
            want = expected[(i, cell)]
            have = (f"p{i}", str(n)) in got
            if want != have:
                mismatches.append((pred, cell, want, have))
    assert not mismatches, f"{len(mismatches)} divergences, first: {mismatches[0]}"


def test_transform_space_parity_with_reference(spark, ref):
    """All 16 shipped transforms over valid + junk inputs, expectations
    from the reference's own get_value/apply path (T1-T16)."""
    ctx = {
        "returnUnmatched": False,
        "defaultDateFormat": "%Y-%m-%d",
        "skip_pattern": None,
    }
    rules = [
        {"field": "c", "apply": {"function": "isNotNull"}},
        {"field": "c", "apply": {"function": "textIfNotNull", "params": ["seen"]}},
        {"field": "c", "apply": {"function": "wordSubstituteSet",
                                 "params": [["type 1", "t1"], ["type 2", "t2"]]}},
        {"field": "c", "apply": {"function": "getFloat"}},
        {"field": "c", "apply": {"function": "getFloat", "params": [","]}},
        {"field": "c", "apply": {"function": "Percentage"}},
        {"field": "c", "apply": {"function": "yearsElapsed",
                                 "params": ["$d", 2022, "%d/%m/%Y", "%d/%m/%Y"]}},
        {"field": "c", "apply": {"function": "durationDays", "params": ["$d", "%Y-%m-%d"]}},
        {"field": "c", "apply": {"function": "startDate", "params": ["$n"]}},
        {"field": "c", "apply": {"function": "endDate", "params": ["$n", "%Y-%m-%d"]}},
        {"field": "y", "apply": {"function": "makeDate", "params": ["$m", "$dd"]}},
        {"field": "c", "apply": {"function": "splitDate",
                                 "params": ["year", 2022, "%Y-%m-%d"]}},
        {"field": "dur", "apply": {"function": "startYear",
                                   "params": [["$ref_date"], 2022, "%Y-%m-%d"]}},
        {"field": "dur", "apply": {"function": "startMonth",
                                   "params": [["$ref_date"], 2022, "%Y-%m-%d", "months"]}},
    ]
    datasets = [
        # c, d, n, y, m, dd, dur, ref_date
        ("12.5", "2022-02-01", "5", "1990", "6", "15", "3", "2022-03-01"),
        ("1,5", "2022-01-15", "10", "2001", "2", "29", "12", "2022-06-15"),
        ("abc", "bad", "x", "", "13", "40", "junk", "bad"),
        ("", "", "", "1985", "1", "1", "", ""),
        ("15/03/1990", "20/07/2021", "2", "2000", "12", "31", "24", "2021-12-31"),
        ("2022-01-10", "2022-03-01", "7", "1999", "7", "4", "6", "2022-01-01"),
        ("type 1 diabetes", "type 2", "1", "2010", "3", "3", "1", "2022-02-02"),
        ("50", "2021-06-01", "3", "1970", "11", "30", "48", "2020-05-05"),
    ]
    cols = ["c", "d", "n", "y", "m", "dd", "dur", "ref_date"]

    expected = {}
    for i, rule in enumerate(rules):
        for j, vals in enumerate(datasets):
            row = dict(zip(cols, vals))
            try:
                expected[(i, j)] = _canon(ref(row, dict(rule), ctx))
            except Exception as e:  # reference crash = nothing to match
                expected[(i, j)] = ("__REF_RAISED__", type(e).__name__)

    spec = {
        "adtl": {"name": "tfp", "description": "", "tables": {"t": {"kind": "oneToOne"}}},
        "t": {"cell": {"field": "id"}, **{f"r{i}": r for i, r in enumerate(rules)}},
    }
    rows = [dict(zip(cols, vals), id=str(j)) for j, vals in enumerate(datasets)]
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    mismatches = []
    for row in p.table("t").collect():
        j = int(row["cell"])
        for i, rule in enumerate(rules):
            want = expected[(i, j)]
            if isinstance(want, tuple):
                continue  # reference raised; engine nulls/passthrough: skip
            got = row[f"r{i}"]
            got = None if got is None else str(got)
            if got != want:
                mismatches.append((rule["apply"]["function"], datasets[j], want, got))
    assert not mismatches, f"{len(mismatches)} divergences, first: {mismatches[0]}"
