"""T1-T16 transformation library (SURVEY.md §2.7) + custom transforms (U1).

Each test mirrors the reference function's documented behaviour
(src/adtl/transformations.py) through the spec surface."""

import pytest

from adtl_spark.api import Parser


def apply_rule(spark, rule, rows, **header):
    spec = {
        "adtl": {
            "name": "t",
            "description": "",
            "tables": {"tab": {"kind": "oneToOne"}},
            **header,
        },
        "tab": {"v": rule},
    }
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    return [r.get("v") for r in p.read_table("tab")]


def test_is_not_null(spark):
    rule = {"field": "x", "apply": {"function": "isNotNull"}}
    assert apply_rule(spark, rule, [{"x": "something"}, {"x": ""}]) == [True, False]


def test_text_if_not_null(spark):
    rule = {"field": "x", "apply": {"function": "textIfNotNull", "params": ["seen"]}}
    assert apply_rule(spark, rule, [{"x": "1"}, {"x": ""}]) == ["seen", None]


def test_word_substitute_set(spark):
    rule = {
        "field": "x",
        "apply": {
            "function": "wordSubstituteSet",
            "params": [["type 1", "type-1"], ["type 2", "type-2"], ["dm", "unspecified"]],
        },
    }
    out = apply_rule(
        spark,
        rule,
        [{"x": "type 1 and type 2"}, {"x": "DM"}, {"x": "no match here"}, {"x": ""}],
    )
    assert out[0] == ["type-1", "type-2"]
    assert out[1] == ["unspecified"]
    assert out[2] is None  # warning -> null
    assert out[3] is None


def test_get_float(spark):
    rule = {"field": "x", "apply": {"function": "getFloat"}}
    out = apply_rule(
        spark, rule, [{"x": "60 kg"}, {"x": '"72.5"'}, {"x": "eighty"}, {"x": ""}]
    )
    assert out == [60.0, 72.5, "eighty", None]


def test_get_float_separators(spark):
    rule = {
        "field": "x",
        "apply": {"function": "getFloat", "params": [",", "."]},
    }
    out = apply_rule(spark, rule, [{"x": "1.234,5"}])
    assert out == [1234.5]


def test_percentage(spark):
    rule = {"field": "x", "apply": {"function": "Percentage"}}
    out = apply_rule(spark, rule, [{"x": "0.5"}, {"x": "87"}, {"x": "1"}, {"x": "word"}])
    assert out == [50.0, 87.0, 100.0, "word"]


def test_years_elapsed(spark):
    rule = {
        "field": "bd",
        "apply": {"function": "yearsElapsed", "params": ["$cd", 2022]},
    }
    out = apply_rule(
        spark,
        rule,
        [
            {"bd": "1990-06-15", "cd": "2020-06-15"},
            {"bd": "", "cd": "2020-06-15"},
            {"bd": "junk", "cd": "2020-06-15"},
        ],
    )
    assert out[0] == pytest.approx(10958 / 365.25)
    assert out[1] is None
    assert out[2] is None


def test_duration_days(spark):
    rule = {
        "field": "start",
        "apply": {"function": "durationDays", "params": ["$end"]},
    }
    out = apply_rule(
        spark, rule, [{"start": "2022-01-01", "end": "2022-01-31"}, {"start": "", "end": "2022-01-31"}]
    )
    assert out == [30, None]


def test_start_end_date(spark):
    rule = {"field": "ed", "apply": {"function": "startDate", "params": ["$dur"]}}
    out = apply_rule(spark, rule, [{"ed": "2022-01-10", "dur": "3"}])
    assert out == ["2022-01-07"]
    rule = {"field": "sd", "apply": {"function": "endDate", "params": ["$dur"]}}
    out = apply_rule(spark, rule, [{"sd": "2022-01-10", "dur": "2.5"}])
    assert out == ["2022-01-12"]  # +2.5 days lands at 12:00 on the 12th


def test_make_date(spark):
    rule = {"field": "y", "apply": {"function": "makeDate", "params": ["$m", "$d"]}}
    out = apply_rule(
        spark,
        rule,
        [
            {"y": "1997", "m": "6", "d": "3"},
            {"y": "2022", "m": "2", "d": "30"},  # invalid -> warning -> null
            {"y": "", "m": "1", "d": "1"},
        ],
    )
    assert out == ["1997-06-03", None, None]


def test_make_datetime(spark):
    rule = {
        "field": "d",
        "apply": {
            "function": "makeDateTime",
            "params": ["$t", "%Y-%m-%d", "Europe/London"],
        },
    }
    out = apply_rule(
        spark,
        rule,
        [
            {"d": "2022-06-08", "t": "14:30"},  # BST: +01:00
            {"d": "2022-01-08", "t": "14:30"},  # GMT: +00:00
            {"d": "2022-06-08", "t": ""},
        ],
    )
    assert out == [
        "2022-06-08T14:30:00+01:00",
        "2022-01-08T14:30:00+00:00",
        "2022-06-08",
    ]


def test_make_datetime_from_seconds(spark):
    rule = {
        "field": "d",
        "apply": {
            "function": "makeDateTimeFromSeconds",
            "params": ["$s", "%Y-%m-%d", "UTC"],
        },
    }
    out = apply_rule(
        spark,
        rule,
        [{"d": "2022-03-05", "s": "3661"}, {"d": "2022-03-05", "s": ""}],
    )
    assert out == ["2022-03-05T01:01:00+00:00", "2022-03-05"]


def test_split_date(spark):
    rule = {
        "field": "d",
        "apply": {"function": "splitDate", "params": ["year", 2022]},
    }
    assert apply_rule(spark, rule, [{"d": "1997-06-03"}]) == [1997]
    rule = {
        "field": "d",
        "apply": {"function": "splitDate", "params": ["month", 2022]},
    }
    assert apply_rule(spark, rule, [{"d": "1997-06-03"}]) == [6]


def test_start_year_hierarchy(spark):
    rule = {
        "field": "age",
        "apply": {
            "function": "startYear",
            "params": [["$d1", "$d2"], 2022],
        },
    }
    out = apply_rule(
        spark,
        rule,
        [
            {"age": "30", "d1": "", "d2": "2020-06-15"},
            {"age": "30", "d1": "2021-01-01", "d2": "2020-06-15"},
            {"age": "", "d1": "2021-01-01", "d2": ""},
        ],
    )
    assert out == [1990, 1991, None]


def test_start_month(spark):
    rule = {
        "field": "dur",
        "apply": {
            "function": "startMonth",
            "params": ["$cd", 2022, "%Y-%m-%d", "months"],
        },
    }
    assert apply_rule(spark, rule, [{"dur": "3", "cd": "2022-05-10"}]) == [2]


def test_correct_old_date(spark):
    rule = {
        "field": "d",
        "apply": {"function": "correctOldDate", "params": [2022, "%d/%m/%y"]},
    }
    out = apply_rule(
        spark, rule, [{"d": "01/01/23"}, {"d": "01/01/12"}, {"d": "junk"}]
    )
    # 2023 >= epoch 2022 -> 1923; 2012 < epoch stays
    assert out == ["1923-01-01", "2012-01-01", None]


def test_century_pivot_not_applied_for_four_digit_year(spark):
    rule = {
        "field": "d",
        "apply": {"function": "correctOldDate", "params": [2022, "%Y-%m-%d"]},
    }
    # "%Y-%m-%d" has no two-digit-year directive -> no pivot
    assert apply_rule(spark, rule, [{"d": "2023-01-01"}]) == ["2023-01-01"]


def test_custom_transform(spark, tmp_path):
    mod = tmp_path / "custom.py"
    mod.write_text(
        "def shout(value):\n"
        "    return value.upper() if value else None\n"
        "def add_n(value, n):\n"
        "    return int(value) + n if value else None\n"
    )
    spec = {
        "adtl": {
            "name": "t",
            "description": "",
            "tables": {"tab": {"kind": "oneToOne"}},
        },
        "tab": {
            "a": {"field": "x", "apply": {"function": "shout"}},
            "b": {"field": "n", "apply": {"function": "add_n", "params": [10]}},
        },
    }
    p = Parser(spec, include_transform=str(mod), spark=spark).parse_rows(
        [{"x": "hello", "n": "5"}], skip_validation=True
    )
    assert list(p.read_table("tab")) == [{"a": "HELLO", "b": 15}]


def test_unknown_transform_raises(spark):
    with pytest.raises(AttributeError, match="has not been defined"):
        apply_rule(spark, {"field": "x", "apply": {"function": "nope"}}, [{"x": "1"}])
