"""AP1 dictionary inference + AP6 skeleton generation (SURVEY.md §2.11)."""

import pytest

from adtl_spark import autoparser as AP
from adtl_spark.api import Parser


@pytest.fixture(scope="module")
def source(spark):
    rows = [
        ("S1", "1", "34", "2022-01-01", "free text one"),
        ("S2", "2", "40", "2022-02-01", "other text"),
        ("S3", "1", "", "2022-03-01", "more words"),
        ("S4", "2", "29.5", "", "unique string"),
        ("S5", "1", "31", "2022-05-01", "another"),
    ]
    return spark.createDataFrame(rows, ["sid", "sex", "age", "visit", "notes"])


def test_infer_dictionary_types(spark, source):
    profile = {e["field"]: e for e in AP.infer_dictionary(source)}
    assert profile["sex"]["type"] == "integer"
    assert profile["age"]["type"] == "number"  # mixed int/float strings
    assert profile["notes"]["type"] == "string"
    assert profile["age"]["null_frac"] == pytest.approx(0.2)


def test_infer_dictionary_common_values(spark, source):
    profile = {e["field"]: e for e in AP.infer_dictionary(source)}
    assert profile["sex"]["common_values"] == ["1", "2"]
    # near-unique free text never lists raw values (privacy guard)
    assert profile["notes"]["common_values"] is None
    assert profile["sid"]["common_values"] is None


def test_generated_skeleton_is_runnable(spark, source):
    dictionary = AP.infer_dictionary(source)
    spec = AP.generate_spec_skeleton(dictionary, name="gen", group_by="sid")
    p = Parser(spec, spark=spark).parse_dataframe(source, skip_validation=True)
    out = sorted(p.read_table("data"), key=lambda r: r["sid"])
    assert len(out) == 5
    assert out[0]["sex"] == 1


def test_llm_steps_are_stubbed(spark, source):
    with pytest.raises(NotImplementedError):
        AP.describe_fields_llm([])
    with pytest.raises(NotImplementedError):
        AP.map_fields_llm([], {})
