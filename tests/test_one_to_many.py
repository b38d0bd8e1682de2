"""oneToMany table semantics: R1-R5 (SURVEY.md §2.6) — block emission,
default-if synthesis, for-expansion, common mappings, schema-driven
fieldnames and coercion."""

import json

from adtl_spark.api import Parser


def obs_schema(tmp_path, extra_props=None):
    schema = {
        "properties": {
            "name": {"type": "string"},
            "phase": {"type": "string", "enum": ["admission", "followup"]},
            "date": {"type": "string", "format": "date"},
            "is_present": {"type": "boolean"},
            "value": {"type": "number"},
            **(extra_props or {}),
        },
        "required": ["name", "phase"],
        "oneOf": [
            {"properties": {"name": {"const": "cough"}}, "required": ["is_present"]},
            {"properties": {"name": {"const": "oxygen"}}, "required": ["value"]},
        ],
    }
    f = tmp_path / "obs.schema.json"
    f.write_text(json.dumps(schema))
    return str(f)


def test_blocks_with_explicit_if(spark):
    spec = {
        "adtl": {
            "name": "o",
            "description": "",
            "tables": {"obs": {"kind": "oneToMany", "discriminator": "attr"}},
        },
        "obs": [
            {
                "name": "cough",
                "if": {"cough": "1"},
                "is_present": {"field": "cough", "values": {"1": True}},
            },
            {
                "name": "oxygen",
                "if": {"oxy": {">": 0}},
                "value": {"field": "oxy"},
            },
        ],
    }
    rows = [
        {"cough": "1", "oxy": "95"},
        {"cough": "0", "oxy": "0"},
        {"cough": "1", "oxy": ""},
    ]
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    out = list(p.read_table("obs"))
    # row1 emits both blocks (in block order), row2 none, row3 cough only
    assert out == [
        {"name": "cough", "is_present": True},
        {"name": "oxygen", "value": 95},
        {"name": "cough", "is_present": True},
    ]


def test_default_if_synthesis(spark, tmp_path):
    schema_file = obs_schema(tmp_path)
    spec = {
        "adtl": {
            "name": "o",
            "description": "",
            "tables": {
                "obs": {
                    "kind": "oneToMany",
                    "schema": schema_file,
                    "discriminator": "name",
                }
            },
        },
        "obs": [
            {
                "name": "cough",
                "phase": "followup",
                "is_present": {"field": "cough", "values": {"1": True, "0": False}},
            }
        ],
    }
    # default if: any of the mapped source values present ("1" or "0")
    rows = [{"cough": "1"}, {"cough": ""}, {"cough": "0"}, {"cough": "9"}]
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    out = list(p.read_table("obs", typed=False))
    present = [r.get("is_present") for r in out]
    assert present == ["True", "False"]  # rows "" and "9" not emitted


def test_for_expansion_end_to_end(spark, tmp_path):
    schema_file = obs_schema(tmp_path)
    spec = {
        "adtl": {
            "name": "o",
            "description": "",
            "tables": {
                "obs": {
                    "kind": "oneToMany",
                    "schema": schema_file,
                    "discriminator": "name",
                }
            },
        },
        "obs": [
            {
                "for": {"n": {"range": [1, 2]}},
                "name": "cough",
                "phase": "followup",
                "is_present": {
                    "field": "fu{n}_cough",
                    "values": {"1": True, "0": False},
                },
            }
        ],
    }
    rows = [{"fu1_cough": "1", "fu2_cough": "0"}]
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    out = list(p.read_table("obs"))
    assert [r["is_present"] for r in out] == [True, False]


def test_common_mappings_merged(spark):
    spec = {
        "adtl": {
            "name": "o",
            "description": "",
            "tables": {
                "obs": {
                    "kind": "oneToMany",
                    "discriminator": "attr",
                    "common": {"subject_id": {"field": "sid"}},
                }
            },
        },
        "obs": [
            {"name": "cough", "if": {"cough": "1"}},
            {"name": "fever", "if": {"fever": "1"}},
        ],
    }
    rows = [{"sid": "S1", "cough": "1", "fever": "1"}]
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    out = list(p.read_table("obs"))
    assert all(r["subject_id"] == "S1" for r in out)
    assert {r["name"] for r in out} == {"cough", "fever"}


def test_schema_coercion_in_one_to_many(spark, tmp_path):
    schema_file = obs_schema(tmp_path)
    spec = {
        "adtl": {
            "name": "o",
            "description": "",
            "tables": {
                "obs": {
                    "kind": "oneToMany",
                    "schema": schema_file,
                    "discriminator": "name",
                }
            },
        },
        "obs": [
            {
                "name": "oxygen",
                "phase": "admission",
                "value": {"field": "oxy"},
                "if": {"oxy": {"!=": ""}},
            }
        ],
    }
    p = Parser(spec, spark=spark).parse_rows([{"oxy": "87.5"}], skip_validation=True)
    out = list(p.read_table("obs"))
    assert out[0]["value"] == 87.5


def test_validation_annotations(spark, tmp_path):
    schema_file = obs_schema(tmp_path)
    spec = {
        "adtl": {
            "name": "o",
            "description": "",
            "tables": {
                "obs": {
                    "kind": "oneToMany",
                    "schema": schema_file,
                    "discriminator": "name",
                }
            },
        },
        "obs": [
            {
                "name": "cough",
                "phase": {"field": "ph"},  # may produce invalid enum
                "is_present": {"field": "cough", "values": {"1": True, "0": False}},
            }
        ],
    }
    rows = [{"cough": "1", "ph": "followup"}, {"cough": "0", "ph": "somewhere"}]
    p = Parser(spec, spark=spark).parse_rows(rows)
    out = list(p.read_table("obs"))
    assert out[0]["adtl_valid"] is True
    assert out[1]["adtl_valid"] is False
    assert "phase" in out[1]["adtl_error"]


def test_validation_report(spark, tmp_path):
    schema_file = obs_schema(tmp_path)
    spec = {
        "adtl": {
            "name": "o",
            "description": "",
            "tables": {
                "obs": {
                    "kind": "oneToMany",
                    "schema": schema_file,
                    "discriminator": "name",
                }
            },
        },
        "obs": [
            {
                "name": "cough",
                "phase": {"field": "ph"},
                "is_present": {"field": "cough", "values": {"1": True, "0": False}},
            }
        ],
    }
    rows = [{"cough": "1", "ph": "followup"}, {"cough": "0", "ph": "bad"}]
    p = Parser(spec, spark=spark).parse_rows(rows)
    report = p.build_report()
    assert report["total"]["obs"] == 2
    assert report["total_valid"]["obs"] == 1
    assert sum(report["validation_errors"]["obs"].values()) == 1
