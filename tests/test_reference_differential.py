"""Differential tests: run the PUBLIC reference implementation at
/root/reference side-by-side with adtl_spark on the same spec + data and
compare the rendered CSV output byte-for-byte.

This is the strongest correctness oracle available — no hand-derived
expectations, just the reference's own row interpreter (executed in a
subprocess with the dependency shims in tests/refshim).  Skipped wholesale
when the reference checkout is absent.
"""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

from adtl_spark.api import Parser

REFERENCE = Path("/root/reference/src")
SHIMS = Path(__file__).parent / "refshim"

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

_RUNNER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, sys.argv[1])   # shims
    sys.path.insert(1, sys.argv[2])   # reference src
    import adtl

    payload = json.load(open(sys.argv[3]))
    parser = adtl.Parser(payload["spec"], quiet=True)
    parser.parse(payload["csv"])
    out = {t: parser.write_csv(t) for t in payload["tables"]}
    json.dump(out, open(sys.argv[4], "w"))
    """
)


def run_reference(spec: dict, csv_path: str, tables: list[str], tmp_path: Path) -> dict:
    payload = tmp_path / "payload.json"
    result = tmp_path / "result.json"
    payload.write_text(json.dumps({"spec": spec, "csv": csv_path, "tables": tables}))
    script = tmp_path / "run_ref.py"
    script.write_text(_RUNNER)
    proc = subprocess.run(
        [sys.executable, str(script), str(SHIMS), str(REFERENCE), str(payload), str(result)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{proc.stderr[-2000:]}")
    return json.loads(result.read_text())


def compare(spark, spec: dict, csv_text: str, tables: list[str], tmp_path: Path) -> None:
    src = tmp_path / "data.csv"
    src.write_text(csv_text)
    ref = run_reference(spec, str(src), tables, tmp_path)
    ours = Parser(spec, spark=spark).parse(str(src), skip_validation=True)
    for t in tables:
        got = ours.write_csv(t)
        assert got == ref[t], f"table {t!r} diverges from reference"


def test_groupby_combined_types_match_reference(spark, tmp_path):
    spec = {
        "adtl": {
            "name": "diff-g",
            "description": "differential",
            "defaultDateFormat": "%d/%m/%Y",
            "tables": {
                "subject": {
                    "kind": "groupBy",
                    "groupBy": "subject_id",
                    "aggregation": "applyCombinedType",
                }
            },
            "defs": {"yn": {"values": {"1": True, "0": False}}},
        },
        "subject": {
            "subject_id": {"field": "sid"},
            "sex": {"field": "sex", "values": {"m": "male", "f": "female"}},
            "age_months": {
                "field": "age",
                "source_unit": {"field": "unit", "values": {"y": "years", "m": "months"}},
                "unit": "months",
            },
            "ever_cough": {"combinedType": "any", "fields": [{"field": "cough", "ref": "yn"}]},
            "all_fever": {"combinedType": "all", "fields": [{"field": "fever", "ref": "yn"}]},
            "first_visit": {
                "combinedType": "min",
                "fields": [{"field": "visit", "source_date": "%d/%m/%Y", "date": "%Y-%m-%d"}],
            },
            "max_score": {
                "combinedType": "max",
                "fields": [{"field": "score_a"}, {"field": "score_b"}],
            },
        },
    }
    csv_text = (
        "sid,sex,age,unit,cough,fever,visit,score_a,score_b\n"
        "A,m,2,y,1,1,05/01/2022,3,7.5\n"
        "A,,25,m,0,1,01/01/2022,9,2\n"
        "B,f,30,m,,0,28/02/2022,4.25,4\n"
        "C,m,1,y,1,,bad-date,,\n"
        "C,m,14,m,0,0,15/03/2022,0,0.0\n"
    )
    compare(spark, spec, csv_text, ["subject"], tmp_path)


def test_one_to_many_passthrough_match_reference(spark, tmp_path):
    spec = {
        "adtl": {
            "name": "diff-o",
            "description": "differential",
            "returnUnmatched": True,
            "tables": {"obs": {"kind": "oneToMany", "discriminator": "name"}},
        },
        "obs": [
            {
                "name": "fever",
                "subject": {"field": "sid"},
                "value": {"field": "fever", "values": {"yes": True, "no": False}, "ignoreMissingKey": True},
                "if": {"fever": {"!=": ""}},
            },
            {
                "name": "spo2",
                "subject": {"field": "sid"},
                "value": {"field": "spo2", "apply": {"function": "getFloat"}},
                "if": {"spo2": {">": 0}},
            },
        ],
    }
    csv_text = (
        "sid,fever,spo2\n"
        "A,yes,95\n"
        "B,no,88.5\n"
        "C,007,0\n"
        "D,False,91\n"
        "E,,\n"
    )
    compare(spark, spec, csv_text, ["obs"], tmp_path)


def test_folds_enum_list_sensitive_match_reference(spark, tmp_path):
    spec = {
        "adtl": {
            "name": "diff-f",
            "description": "differential",
            "tables": {
                "t": {"kind": "groupBy", "groupBy": "sid", "aggregation": "lastNotNull"}
            },
        },
        "t": {
            "sid": {"field": "sid", "sensitive": True},
            "symptoms": {
                "combinedType": "set",
                "excludeWhen": "false-like",
                "fields": [
                    {"field": "cough", "values": {"1": "cough", "0": False}},
                    {"field": "fever", "values": {"1": "fever", "0": False}},
                ],
            },
            "all_reported": {
                "combinedType": "list",
                "excludeWhen": "none",
                "fields": [{"field": "cough"}, {"field": "fever"}],
            },
            "labs": {"field": "labs", "type": "enum_list", "values": {"na": "sodium", "k": "potassium"}, "caseInsensitive": True},
            "last_note": {"field": "note"},
        },
    }
    # NOTE: every group yields at most ONE surviving set element — the
    # reference renders multi-element sets in Python-set (hash-seed) order,
    # which is nondeterministic across processes; our engine canonicalizes
    # by sorting (documented deviation), so only 0/1-element sets are
    # byte-comparable
    csv_text = (
        "sid,cough,fever,labs,note\n"
        "A,1,0,\"[Na, K]\",first\n"
        "A,0,1,[na],second\n"
        "B,1,0,[K],only\n"
        "C,0,0,,\n"
    )
    compare(spark, spec, csv_text, ["t"], tmp_path)


def test_seeded_random_rows_match_reference(spark, tmp_path):
    """Randomized differential: seeded messy cells (empty, numeric,
    bool-ish text, junk) through value maps, folds and date parsing —
    whatever the reference renders, we must render byte-identically."""
    import random

    rng = random.Random(20260813)
    cells = ["", "1", "0", "yes", "no", "True", "False", "7.5", "007", "x y", "NA"]
    # min/max fold fields draw numeric-or-empty cells ONLY: the reference's
    # eval(combined_type)(values) crashes with TypeError on mixed str/int
    # groups (get_value.py:353) — messy cells there are not comparable
    # behavior, they are a reference crash
    numeric_cells = ["", "1", "0", "7.5", "007", "12", "0.25"]
    dates = ["05/01/2022", "29/02/2020", "31/11/2021", "bad", ""]
    rows = [
        (
            f"S{rng.randint(1, 8)}",
            rng.choice(cells),
            rng.choice(numeric_cells),
            rng.choice(dates),
            rng.choice(numeric_cells),
        )
        for _ in range(60)
    ]
    csv_text = "sid,a,b,d,c\n" + "".join(
        ",".join(r) + "\n" for r in rows
    )
    spec = {
        "adtl": {
            "name": "diff-r",
            "description": "differential",
            "tables": {
                "t": {"kind": "groupBy", "groupBy": "sid", "aggregation": "applyCombinedType"}
            },
            "defs": {"yn": {"values": {"yes": True, "no": False}, "caseInsensitive": True}},
        },
        "t": {
            "sid": {"field": "sid"},
            "any_a": {"combinedType": "any", "fields": [{"field": "a", "ref": "yn"}]},
            "min_b": {"combinedType": "min", "fields": [{"field": "b"}]},
            "max_b": {"combinedType": "max", "fields": [{"field": "b"}, {"field": "c"}]},
            "first_d": {
                "combinedType": "min",
                "fields": [{"field": "d", "source_date": "%d/%m/%Y", "date": "%Y-%m-%d"}],
            },
            "vals": {"combinedType": "list", "excludeWhen": "none", "fields": [{"field": "c"}]},
        },
    }
    compare(spark, spec, csv_text, ["t"], tmp_path)


def test_transform_suite_match_reference(spark, tmp_path):
    spec = {
        "adtl": {
            "name": "diff-t",
            "description": "differential",
            "tables": {"t": {"kind": "oneToOne"}},
        },
        "t": {
            "sid": {"field": "sid"},
            "f": {"field": "num", "apply": {"function": "getFloat"}},
            "words": {
                "field": "cond",
                "apply": {
                    "function": "wordSubstituteSet",
                    "params": [["type 1", "t1"], ["type 2", "t2"]],
                },
            },
            "yr": {"field": "dob", "apply": {"function": "yearsElapsed", "params": ["$visit", 2022, "%d/%m/%Y", "%d/%m/%Y"]}},
            "dur": {"field": "start", "apply": {"function": "durationDays", "params": ["$end", "%Y-%m-%d"]}},
        },
    }
    csv_text = (
        "sid,num,cond,dob,visit,start,end\n"
        "A,12.5,type 1 diabetes,01/06/1990,01/06/2021,2022-01-01,2022-01-15\n"
        "B,\"1,200\",type 2,15/03/1985,20/07/2021,2022-02-01,2022-02-03\n"
        "C,abc,none,,bad,2022-03-01,\n"
    )
    compare(spark, spec, csv_text, ["t"], tmp_path)
