"""Golden end-to-end snapshot: a comprehensive spec + CSV source must
produce byte-stable CSV output (the reference's syrupy-snapshot pattern,
tests/test_adtl/__snapshots__)."""

import textwrap

from adtl_spark.api import Parser

SPEC = {
    "adtl": {
        "name": "golden",
        "description": "golden snapshot spec",
        "defaultDateFormat": "%d/%m/%Y",
        "tables": {
            "subject": {
                "kind": "groupBy",
                "groupBy": "subject_id",
                "aggregation": "applyCombinedType",
            },
            "observation": {"kind": "oneToMany", "discriminator": "attr"},
            "metadata": {"kind": "constant"},
        },
        "defs": {
            "yesno": {"values": {"1": True, "0": False}},
        },
    },
    "subject": {
        "subject_id": {"field": "sid", "sensitive": False},
        "sex": {
            "field": "sex",
            "values": {"1": "male", "2": "female"},
            "description": "sex at birth",
        },
        "age_months": {
            "field": "age",
            "source_unit": {"field": "ageu", "values": {"1": "years", "2": "months"}},
            "unit": "months",
        },
        "first_visit": {
            "combinedType": "min",
            "fields": [{"field": "visit", "source_date": "%d/%m/%Y", "date": "%Y-%m-%d"}],
        },
        "any_symptom": {
            "combinedType": "any",
            "fields": [
                {"field": "cough", "ref": "yesno"},
                {"field": "fever", "ref": "yesno"},
            ],
        },
        "symptom_list": {
            "combinedType": "set",
            "excludeWhen": "none",
            "fields": [
                {"field": "cough", "values": {"1": "cough"}},
                {"field": "fever", "values": {"1": "fever"}},
            ],
        },
    },
    "observation": [
        {
            "name": "cough",
            "phase": "admission",
            "subject": {"field": "sid"},
            "is_present": {"field": "cough", "ref": "yesno"},
            "if": {"any": [{"cough": "1"}, {"cough": "0"}]},
        },
        {
            "name": "spo2",
            "phase": "admission",
            "subject": {"field": "sid"},
            "value": {"field": "spo2"},
            "if": {"spo2": {">": 0}},
        },
    ],
    "metadata": {"dataset": "golden-fixture", "version": 2},
}

CSV = textwrap.dedent(
    """\
    sid,sex,age,ageu,visit,cough,fever,spo2
    P1,1,5,1,20/01/2022,1,0,95
    P1,,5,1,15/01/2022,0,1,
    P2,2,18,2,01/03/2022,,,88
    P3,9,,,bad-date,1,,0
    """
)

EXPECTED_SUBJECT = (
    "age_months,any_symptom,first_visit,sex,subject_id,symptom_list\r\n"
    "60.0,True,2022-01-15,male,P1,\"['cough', 'fever']\"\r\n"
    "18.0,,2022-03-01,female,P2,\r\n"
    ",True,,,P3,['cough']\r\n"
)

# verified against the reference parser run offline on this exact fixture:
# a schema-less oneToMany table orders columns as sorted pre-common-merge
# block keys, INCLUDING an always-empty 'if' column when blocks spell out
# explicit if predicates (parser.py:_set_field_names)
EXPECTED_OBSERVATION = (
    "if,is_present,name,phase,subject,value\r\n"
    ",True,cough,admission,P1,\r\n"
    ",,spo2,admission,P1,95\r\n"
    ",False,cough,admission,P1,\r\n"
    ",,spo2,admission,P2,88\r\n"
    ",True,cough,admission,P3,\r\n"
)


def test_golden_csv_snapshot(spark, tmp_path):
    src = tmp_path / "golden.csv"
    src.write_text(CSV)
    p = Parser(SPEC, spark=spark).parse(str(src), skip_validation=True)
    subject = p.write_csv("subject")
    observation = p.write_csv("observation")
    metadata = p.write_csv("metadata")
    assert subject == EXPECTED_SUBJECT
    assert observation == EXPECTED_OBSERVATION
    assert metadata == "dataset,version\r\ngolden-fixture,2\r\n"
