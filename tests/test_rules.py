"""Rule compiler semantics: projections P1-P17 and predicates F1-F8
(SURVEY.md §2.2-§2.3).  Golden style: spec + rows -> expected dynamic rows,
mirroring the reference's get_value/parse_if behaviour."""

import pytest

from adtl_spark.api import Parser


def one_to_one(spark, rules, rows, **header):
    spec = {
        "adtl": {
            "name": "t",
            "description": "",
            "tables": {"tab": {"kind": "oneToOne"}},
            **header,
        },
        "tab": rules,
    }
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    return list(p.read_table("tab"))


def test_constant_and_field(spark):
    rows = [{"x": "hello", "y": ""}]
    out = one_to_one(
        spark,
        {"c": "fixed", "n": 42, "v": {"field": "x"}, "e": {"field": "y"}},
        rows,
    )
    assert out == [{"c": "fixed", "n": 42, "v": "hello"}]  # empty -> dropped


def test_numeric_autocast(spark):
    rows = [{"x": "25"}, {"x": "2.50"}, {"x": "007"}, {"x": "abc"}, {"x": "1e2"}]
    out = one_to_one(spark, {"v": {"field": "x"}}, rows)
    assert [r.get("v") for r in out] == [25, 2.5, 7, "abc", 100.0]


def test_value_mapping(spark):
    rules = {"sex": {"field": "s", "values": {"1": "male", "2": "female", "3": True}}}
    rows = [{"s": "1"}, {"s": "2"}, {"s": "3"}, {"s": "9"}, {"s": ""}]
    out = one_to_one(spark, rules, rows)
    assert [r.get("sex") for r in out] == ["male", "female", True, None, None]


def test_values_map_to_empty_is_null(spark):
    rules = {"v": {"field": "s", "values": {"1": "", "2": "kept"}}}
    out = one_to_one(spark, rules, [{"s": "1"}, {"s": "2"}])
    assert [r.get("v") for r in out] == [None, "kept"]


def test_ignore_missing_key(spark):
    rules = {"v": {"field": "s", "values": {"1": "one"}, "ignoreMissingKey": True}}
    out = one_to_one(spark, rules, [{"s": "1"}, {"s": "today"}])
    assert [r.get("v") for r in out] == ["one", "today"]


def test_case_insensitive_values(spark):
    rules = {
        "v": {
            "field": "s",
            "caseInsensitive": True,
            "values": {"Oui": True, "Non": False},
        }
    }
    out = one_to_one(spark, rules, [{"s": "OUI"}, {"s": " non "}, {"s": "x"}])
    assert [r.get("v") for r in out] == [True, False, None]


def test_enum_list(spark):
    rules = {
        "v": {
            "field": "s",
            "type": "enum_list",
            "values": {"1": "alpha", "2": "beta"},
        }
    }
    out = one_to_one(spark, rules, [{"s": "[1, 2]"}, {"s": "2"}, {"s": ""}])
    assert out[0]["v"] == ["alpha", "beta"]
    assert out[1]["v"] == ["beta"]
    assert "v" not in out[2]


def test_conditional_field_rule(spark):
    rules = {"v": {"field": "x", "if": {"flag": "1"}}}
    rows = [{"x": "a", "flag": "1"}, {"x": "b", "flag": "0"}]
    out = one_to_one(spark, rules, rows)
    assert [r.get("v") for r in out] == ["a", None]


def test_sensitive_hash(spark):
    import hashlib

    rules = {"v": {"field": "x", "sensitive": True}}
    out = one_to_one(spark, rules, [{"x": "alice"}, {"x": ""}])
    assert out[0]["v"] == hashlib.sha256(b"alice").hexdigest()
    assert "v" not in out[1]


def test_date_reformat(spark):
    rules = {"v": {"field": "d", "source_date": "%d/%m/%Y", "date": "%Y-%m-%d"}}
    rows = [{"d": "20/11/2023"}, {"d": "8/6/2022"}, {"d": "junk"}]
    out = one_to_one(spark, rules, rows)
    assert [r.get("v") for r in out] == ["2023-11-20", "2022-06-08", None]


def test_date_reformat_return_unmatched(spark):
    rules = {"v": {"field": "d", "source_date": "%d/%m/%Y"}}
    rows = [{"d": "20/11/2023"}, {"d": "last tuesday"}]
    out = one_to_one(spark, rules, rows, returnUnmatched=True)
    assert [r.get("v") for r in out] == ["2023-11-20", "last tuesday"]


def test_unit_conversion_static(spark):
    rules = {"v": {"field": "w", "source_unit": "lb", "unit": "kg"}}
    out = one_to_one(spark, rules, [{"w": "100"}])
    assert out[0]["v"] == pytest.approx(45.359237)


def test_unit_conversion_dynamic(spark):
    rules = {
        "age_years": {
            "field": "age",
            "source_unit": {"field": "ageu", "values": {"1": "months", "2": "years"}},
            "unit": "years",
        }
    }
    rows = [
        {"age": "36", "ageu": "1"},
        {"age": "5", "ageu": "2"},
        {"age": "7", "ageu": ""},  # unmapped unit -> assume target unit
    ]
    out = one_to_one(spark, rules, rows)
    assert out[0]["age_years"] == pytest.approx(3.0)
    assert out[1]["age_years"] == pytest.approx(5.0)
    assert out[2]["age_years"] == pytest.approx(7.0)


def test_skippable_field(spark):
    rules = {"v": {"field": "gone", "can_skip": True}, "w": {"field": "x"}}
    out = one_to_one(spark, rules, [{"x": "1"}])
    assert out == [{"w": 1}]


def test_skip_field_pattern(spark):
    rules = {"v": {"field": "flw_cough"}, "w": {"field": "x"}}
    out = one_to_one(spark, rules, [{"x": "1"}], skipFieldPattern="flw.*")
    assert out == [{"w": 1}]


def test_combined_any_all(spark):
    rules = {
        "any_sym": {
            "combinedType": "any",
            "fields": [
                {"field": "a", "values": {"1": True, "0": False}},
                {"field": "b", "values": {"1": True, "0": False}},
            ],
        },
        "all_sym": {
            "combinedType": "all",
            "fields": [
                {"field": "a", "values": {"1": True, "0": False}},
                {"field": "b", "values": {"1": True, "0": False}},
            ],
        },
    }
    rows = [
        {"a": "1", "b": "0"},
        {"a": "1", "b": "1"},
        {"a": "0", "b": "0"},
        {"a": "", "b": ""},
    ]
    out = one_to_one(spark, rules, rows)
    assert [r.get("any_sym") for r in out] == [True, True, False, None]
    assert [r.get("all_sym") for r in out] == [False, True, False, None]


def test_combined_min_max(spark):
    rules = {
        "lo": {"combinedType": "min", "fields": [{"field": "a"}, {"field": "b"}]},
        "hi": {"combinedType": "max", "fields": [{"field": "a"}, {"field": "b"}]},
    }
    out = one_to_one(spark, rules, [{"a": "10", "b": "9"}, {"a": "", "b": "4"}])
    assert [r.get("lo") for r in out] == [9, 4]
    assert [r.get("hi") for r in out] == [10, 4]


def test_combined_first_non_null(spark):
    rules = {
        "id": {
            "combinedType": "firstNonNull",
            "fields": [{"field": "a"}, {"field": "b"}],
        }
    }
    out = one_to_one(spark, rules, [{"a": "", "b": "x"}, {"a": "y", "b": "z"}])
    assert [r.get("id") for r in out] == ["x", "y"]


def test_combined_list_set_exclude(spark):
    rules = {
        "lst": {
            "combinedType": "list",
            "excludeWhen": "none",
            "fields": [{"field": "a"}, {"field": "b"}],
        },
        "st": {
            "combinedType": "set",
            "fields": [
                {"field": "a", "values": {"1": "x"}},
                {"field": "b", "values": {"1": "x"}},
            ],
        },
    }
    out = one_to_one(spark, rules, [{"a": "1", "b": ""}, {"a": "1", "b": "1"}])
    assert out[0]["lst"] == [1]
    assert out[1]["lst"] == [1, 1]
    # reference keeps None in a set unless excludeWhen filters it
    # (get_value.py:373-383); order is arbitrary there, sorted here
    assert out[0]["st"] == ["x", None]
    assert out[1]["st"] == ["x"]


def test_field_pattern_expansion(spark):
    rules = {
        "n": {
            "combinedType": "list",
            "excludeWhen": "none",
            "fields": [{"fieldPattern": "sym_.*", "values": {"1": "yes"}}],
        }
    }
    rows = [{"sym_a": "1", "sym_b": "1", "other": "1"}]
    out = one_to_one(spark, rules, rows)
    assert out[0]["n"] == ["yes", "yes"]


def test_if_operators(spark):
    rows = [
        {"n": "5", "s": "alpha", "f": "2.5"},
        {"n": "15", "s": "beta", "f": "0.5"},
    ]
    rules = {
        "gt": {"field": "s", "if": {"n": {">": 10}}},
        "le_f": {"field": "s", "if": {"f": {"<=": 1.0}}},
        "eq": {"field": "s", "if": {"s": "alpha"}},
        "regex": {"field": "s", "if": {"s": {"=~": "ALPHA|gamma"}}},
        "combo": {
            "field": "s",
            "if": {"any": [{"n": {">": 10}}, {"s": "alpha"}]},
        },
        "neg": {"field": "s", "if": {"not": {"s": "alpha"}}},
    }
    out = one_to_one(spark, rules, rows)
    assert [r.get("gt") for r in out] == [None, "beta"]
    assert [r.get("le_f") for r in out] == [None, "beta"]
    assert [r.get("eq") for r in out] == ["alpha", None]
    assert [r.get("regex") for r in out] == ["alpha", None]
    assert [r.get("combo") for r in out] == ["alpha", "beta"]
    assert [r.get("neg") for r in out] == [None, "beta"]


def test_if_cast_failure_is_false(spark):
    # "5.5" cast to int fails -> predicate False (reference: get_value.py:274-281)
    rules = {"v": {"field": "s", "if": {"n": {">": 1}}}}
    out = one_to_one(spark, rules, [{"n": "5.5", "s": "x"}])
    assert out == [{}]


def test_if_bool_truthiness(spark):
    # {field: true} compares bool(value): any non-empty string is truthy
    rules = {"v": {"field": "s", "if": {"flag": True}}}
    out = one_to_one(spark, rules, [{"flag": "0", "s": "a"}, {"flag": "", "s": "b"}])
    assert [r.get("v") for r in out] == ["a", None]


def test_if_missing_column_can_skip(spark):
    rules = {"v": {"field": "s", "if": {"gone": "1", "can_skip": True}}}
    out = one_to_one(spark, rules, [{"s": "x"}])
    assert out == [{}]


def test_generate_uuid5(spark):
    import uuid as uuid_mod

    spec = {
        "adtl": {
            "name": "t",
            "description": "",
            "tables": {"tab": {"kind": "oneToOne"}},
        },
        "tab": {"gid": {"generate": {"type": "uuid5", "values": ["a", "b"]}}},
    }
    p = Parser(spec, spark=spark).parse_rows(
        [{"a": "X", "b": "Y"}, {"a": "", "b": "Y"}], skip_validation=True
    )
    out = list(p.read_table("tab"))
    ns = p.spec.namespace_uuid()
    assert out[0]["gid"] == str(uuid_mod.uuid5(ns, "x|y"))
    assert out[1]["gid"] == str(uuid_mod.uuid5(ns, "none|y"))


def test_empty_fields_token(spark):
    rules = {"v": {"field": "x"}}
    out = one_to_one(
        spark, rules, [{"x": "NA"}, {"x": "ok"}], emptyFields="NA"
    )
    assert [r.get("v") for r in out] == [None, "ok"]


def test_schema_coercion(spark, tmp_path):
    import json

    schema = {
        "properties": {
            "n_int": {"type": "integer"},
            "n_num": {"type": "number"},
            "s": {"type": "string"},
        },
        "required": [],
    }
    schema_file = tmp_path / "s.json"
    schema_file.write_text(json.dumps(schema))
    spec = {
        "adtl": {
            "name": "t",
            "description": "",
            "tables": {"tab": {"kind": "oneToOne", "schema": str(schema_file)}},
        },
        "tab": {
            "n_int": {"field": "a"},
            "n_num": {"field": "a"},
            "s": {"field": "b"},
        },
    }
    p = Parser(spec, spark=spark).parse_rows(
        [{"a": "2.5", "b": "x"}, {"a": "3", "b": "y"}], skip_validation=True
    )
    out = list(p.read_table("tab"))
    # int(round(2.5)) == 2 (banker's rounding), number keeps 2.5
    assert out[0]["n_int"] == 2
    assert out[0]["n_num"] == 2.5
    assert out[1]["n_int"] == 3


def test_empty_source_produces_empty_tables(spark):
    spec = {
        "adtl": {
            "name": "empty",
            "description": "",
            "tables": {
                "wide": {"kind": "oneToOne"},
                "grouped": {
                    "kind": "groupBy",
                    "groupBy": "sid",
                    "aggregation": "applyCombinedType",
                },
                "long": {"kind": "oneToMany", "discriminator": "attr"},
            },
        },
        "wide": {"v": {"field": "x"}},
        "grouped": {
            "sid": {"field": "x"},
            "m": {"combinedType": "min", "fields": [{"field": "x"}]},
        },
        "long": [{"name": "n", "if": {"x": "1"}}],
    }
    from adtl_spark.sources.io import dataframe_from_rows

    # schema present, zero rows
    src = dataframe_from_rows(spark, [{"x": "seed"}]).limit(0)
    p = Parser(spec, spark=spark).parse_dataframe(src, skip_validation=True)
    assert p.table("wide").count() == 0
    assert p.table("grouped").count() == 0
    assert p.table("long").count() == 0
