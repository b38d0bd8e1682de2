"""Spec loading and compile-time rewrites (SURVEY.md §2.6 R2-R5)."""

import pytest

from adtl_spark.spec import (
    CompiledSpec,
    SpecError,
    expand_for_blocks,
    infer_date_fields,
    relax_schema,
    splice_refs,
    synthesize_default_if,
)


def test_splice_refs_merges_local_overrides():
    defs = {"yn": {"values": {"1": True, "0": False}}}
    frag = {"x": {"ref": "yn", "field": "smoker"}}
    out = splice_refs(frag, defs)
    assert out == {"x": {"values": {"1": True, "0": False}, "field": "smoker"}}


def test_splice_refs_local_wins():
    defs = {"base": {"field": "a", "values": {"1": "x"}}}
    out = splice_refs({"r": {"ref": "base", "values": {"2": "y"}}}, defs)
    assert out["r"]["values"] == {"2": "y"}
    assert out["r"]["field"] == "a"


def test_splice_refs_unknown_raises():
    with pytest.raises(SpecError):
        splice_refs({"r": {"ref": "nope"}}, {})


def test_expand_for_range():
    blocks = [
        {
            "for": {"n": {"range": [1, 3]}},
            "name": "fever_{n}",
            "value": {"field": "flw_fever_{n}"},
        }
    ]
    out = expand_for_blocks(blocks)
    assert [b["name"] for b in out] == ["fever_1", "fever_2", "fever_3"]
    assert out[2]["value"]["field"] == "flw_fever_3"


def test_expand_for_list_and_product():
    blocks = [{"for": {"a": [1, 2], "b": ["x", "y"]}, "k": "{a}-{b}"}]
    out = expand_for_blocks(blocks)
    assert sorted(b["k"] for b in out) == ["1-x", "1-y", "2-x", "2-y"]


def test_expand_for_bad_domain():
    with pytest.raises(SpecError):
        expand_for_blocks([{"for": {"n": 5}, "k": "{n}"}])


def test_infer_date_fields():
    schema = {
        "properties": {
            "enrolment_date": {"type": "string"},
            "date_of_birth": {},
            "date": {},
            "other": {"format": "date"},
            "name": {},
        }
    }
    assert infer_date_fields(schema) == [
        "date",
        "date_of_birth",
        "enrolment_date",
        "other",
    ]


def test_relax_schema_drops_optional_required():
    schema = {"required": ["a", "b"], "properties": {"a": {}, "b": {}}}
    out = relax_schema(schema, ["b"])
    assert out["required"] == ["a"]
    # original untouched
    assert schema["required"] == ["a", "b"]


def test_relax_schema_oneof_dedupe():
    schema = {
        "required": [],
        "oneOf": [{"required": ["x"]}, {"required": ["y"]}],
    }
    out = relax_schema(schema, ["x", "y"])
    assert "oneOf" not in out


def test_default_if_from_values():
    schema = {"oneOf": [{"required": ["name"]}]}
    block = {"name": {"field": "cough", "values": {"1": "yes", "2": "no"}}}
    out = synthesize_default_if("t", block, schema)
    assert out["if"] == {"any": [{"cough": "1"}, {"cough": "2"}]}


def test_default_if_plain_field():
    schema = {"oneOf": [{"required": ["name"]}]}
    block = {"name": {"field": "cough"}}
    out = synthesize_default_if("t", block, schema)
    assert out["if"] == {"cough": {"!=": ""}}


def test_default_if_combined():
    schema = {"oneOf": [{"required": ["name"]}]}
    block = {
        "name": {
            "combinedType": "any",
            "fields": [
                {"field": "a", "values": {"1": True}},
                {"field": "b"},
            ],
        }
    }
    out = synthesize_default_if("t", block, schema)
    assert out["if"] == {"any": [{"a": "1"}, {"b": {"!=": ""}}]}


def test_compiled_spec_basic():
    spec = CompiledSpec(
        {
            "adtl": {
                "name": "t",
                "description": "",
                "tables": {"tab": {"kind": "oneToOne"}},
            },
            "tab": {"b_field": "const", "a_field": {"field": "x"}},
        }
    )
    assert spec.fieldnames["tab"] == ["a_field", "b_field"]
    assert spec.default_date_format == "%Y-%m-%d"


def test_compiled_spec_missing_header():
    with pytest.raises(SpecError):
        CompiledSpec({"tab": {}})


def test_namespace_uuid_deterministic():
    doc = {
        "adtl": {"name": "n", "description": "d", "tables": {"t": {"kind": "oneToOne"}}},
        "t": {"a": {"field": "x"}},
    }
    assert CompiledSpec(doc).namespace_uuid() == CompiledSpec(doc).namespace_uuid()
