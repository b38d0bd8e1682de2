"""autoparser pipeline (SURVEY.md §2.11): AP1 dictionary inference, AP2
descriptions, AP3 dictionary formatting, AP4/AP5 mapping with the
deterministic mock LLM client, AP6 TOML generation — ending with the
generated spec executing end-to-end on adtl_spark.Parser (the reference
golden-snapshots the same chain in
tests/test_autoparser/test_parser_generator.py)."""

import tomllib

import pandas as pd
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
    # repeat so the reference's 30%-of-rows privacy clamp doesn't swallow
    # the common values on purpose-built fixtures
    rows = rows * 6
    rows = [(f"S{i}", *r[1:]) for i, r in enumerate(rows)]
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
    # ids never repeat -> no common values (freq-1 values are dropped)
    assert profile["sid"]["common_values"] is None


def test_infer_dictionary_small_dataset_privacy_clamp(spark):
    """On a tiny dataset the reference clamps max_common_count to 30% of
    rows (dict_writer.py:113-126) so near-unique values never leak."""
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",)], ["v"]
    )
    profile = {e["field"]: e for e in AP.infer_dictionary(df)}
    assert profile["v"]["common_values"] is None  # 2 distinct > 30% of 5


def test_generated_skeleton_is_runnable(spark, source):
    dictionary = AP.infer_dictionary(source)
    spec = AP.generate_spec_skeleton(dictionary, name="gen", group_by="sid")
    p = Parser(spec, spark=spark).parse_dataframe(source, skip_validation=True)
    out = sorted(p.read_table("data"), key=lambda r: r["sid"])
    assert len(out) == 30
    assert out[0]["sex"] == 1


# --------------------------------------------------------------- AP2 / AP3


def test_create_dict_reference_shape(spark, source):
    dd = AP.create_dict(source)
    assert list(dd.columns) == [
        "Field Name",
        "Description",
        "Field Type",
        "Common Values",
    ]
    row = dd.set_index("Field Name").loc["sex"]
    assert row["Field Type"] == "number"
    assert row["Common Values"] == "1, 2"


def test_format_dict_parses_choices_strings():
    dd = pd.DataFrame(
        {
            "Field Name": ["statut"],
            "Field Type": ["string"],
            "Description": ["Status"],
            "Choices": ["1=vivant, 2=décédé"],
        }
    )
    cfg = AP.AutoparserConfig(
        column_mappings={
            "source_field": "Field Name",
            "source_type": "Field Type",
            "source_description": "Description",
            "choices": "Choices",
        }
    )
    out = AP.format_dict(dd, cfg)
    assert out.iloc[0]["choices"] == {"1": "vivant", "2": "décédé"}


def test_generate_descriptions_with_mock_llm():
    dd = pd.DataFrame(
        {
            "Field Name": ["Sexe", "EspeceAnimale"],
            "Description": [None, None],
            "Field Type": ["string", "string"],
            "Common Values": ["m, f", "chien, chat"],
        }
    )
    client = AP.MockLLMClient(
        glossary={"Sexe": "Sex", "EspeceAnimale": "Animal species"}
    )
    out = AP.generate_descriptions(dd, client)
    assert list(out["Description"]) == ["Sex", "Animal species"]


# --------------------------------------------------------------- AP4 / AP5

SCHEMA = {
    "$schema": "https://json-schema.org/draft-07/schema",
    "required": ["pet_id", "country_iso3"],
    "properties": {
        "pet_id": {"type": ["string"], "description": "unique id"},
        "country_iso3": {"type": ["string"]},
        "species": {"enum": ["dog", "cat", "bird", None]},
        "sex": {"enum": ["male", "female", "unknown", None]},
        "status": {"enum": ["alive", "dead", "unknown", None]},
        "vaccinated": {"type": ["boolean", "null"]},
        "dewormed": {"type": ["boolean", "null"]},
        "symptoms": {
            "type": ["array", "null"],
            "items": {"enum": ["cough", "fever", "vomiting"]},
        },
        "visit_date": {"type": ["string", "null"], "format": "date"},
    },
}

GLOSSARY = {
    # header -> english description
    "IdAnimal": "Pet id",
    "Espece": "Species",
    "Sexe": "Sex",
    "Statut": "Status",
    "Vaccine": "Vaccinated",
    "Vermifuge": "Dewormed",
    "Symptomes": "Symptoms",
    "DateVisite": "Visit date",
    # value translations
    "chien": "dog",
    "chat": "cat",
    "oiseau": "bird",
    "m": "male",
    "f": "female",
    "vivant": "alive",
    "mort": "dead",
    "oui": "true",
    "non": "false",
    "toux": "cough",
    "fievre": "fever",
}


@pytest.fixture(scope="module")
def data_dictionary():
    return pd.DataFrame(
        {
            "Field Name": [
                "IdAnimal",
                "Espece",
                "Sexe",
                "Statut",
                "Vaccine",
                "Vermifuge",
                "Symptomes",
                "DateVisite",
            ],
            "Description": [
                "Pet id",
                "Species",
                "Sex",
                "Status",
                "Vaccinated",
                "Dewormed",
                "Symptoms",
                "Visit date",
            ],
            "Field Type": [
                "string",
                "string",
                "string",
                "string",
                "string",
                "string",
                "list",
                "date",
            ],
            "Common Values": [
                None,
                "chien, chat, oiseau",
                "m, f",
                "vivant, mort",
                "oui, non",
                "oui, non",
                "toux, fievre",
                None,
            ],
        }
    )


@pytest.fixture(scope="module")
def wide_mapping(data_dictionary):
    cfg = AP.AutoparserConfig(schemas={"pets": SCHEMA})
    client = AP.MockLLMClient(glossary=GLOSSARY)
    with pytest.warns(UserWarning, match="country_iso3"):
        return AP.create_mapping(data_dictionary, "pets", cfg, client)


def test_wide_mapping_fields_and_values(wide_mapping):
    m = wide_mapping
    assert m.loc["species", "source_field"] == "Espece"
    assert m.loc["sex", "source_field"] == "Sexe"
    assert m.loc["visit_date", "source_field"] == "DateVisite"
    assert m.loc["country_iso3", "source_field"] is None
    # AP5: value maps serialized the reference way ("a=b | c=d"); common
    # values are sorted (the reference's set-ordering made this arbitrary)
    assert AP.parse_mapped_values(m.loc["vaccinated", "value_mapping"]) == {
        "oui": True,
        "non": False,
    }
    assert "vivant=alive" in m.loc["status", "value_mapping"]
    assert "mort=dead" in m.loc["status", "value_mapping"]


def test_wide_mapping_relabels_coded_choices():
    """Dictionary choices {1: chien} + LLM label mapping -> code-keyed map
    (base_mapper.py:108-145)."""
    dd = pd.DataFrame(
        {
            "Field Name": ["Espece"],
            "Description": ["Species"],
            "Field Type": ["string"],
            "Choices": ["1=chien, 2=chat"],
        }
    )
    cfg = AP.AutoparserConfig(
        schemas={"pets": {"properties": {"species": {"enum": ["dog", "cat"]}}}},
        column_mappings={
            "source_field": "Field Name",
            "source_type": "Field Type",
            "source_description": "Description",
            "choices": "Choices",
        },
    )
    client = AP.MockLLMClient(glossary=GLOSSARY)
    m = AP.create_mapping(dd, "pets", cfg, client)
    assert m.loc["species", "value_mapping"] == "1=dog | 2=chat".replace("chat", "cat")


# --------------------------------------------------------------------- AP6


@pytest.fixture(scope="module")
def generated_spec(wide_mapping):
    cfg = AP.AutoparserConfig(schemas={"pets": SCHEMA})
    gen = AP.ParserGenerator(wide_mapping, cfg, "pets-parser")
    return gen.make_parser()


def test_parser_generator_refs_defs(generated_spec):
    """The repeated oui/non boolean map is lifted into ONE Y/N/NK def and
    both boolean fields reference it (make_toml.py:90-137)."""
    defs = generated_spec["adtl"]["defs"]
    assert "Y/N/NK" in defs
    assert defs["Y/N/NK"]["values"] == {"oui": True, "non": False}
    assert generated_spec["pets"]["vaccinated"]["ref"] == "Y/N/NK"
    assert generated_spec["pets"]["dewormed"]["ref"] == "Y/N/NK"
    assert "values" not in generated_spec["pets"]["vaccinated"]


def test_parser_generator_field_rules(generated_spec):
    pets = generated_spec["pets"]
    assert pets["species"]["field"] == "Espece"
    assert pets["species"]["values"] == {
        "chien": "dog",
        "chat": "cat",
        "oiseau": "bird",
    }
    assert pets["species"]["caseInsensitive"] is True
    # array-typed target -> enum_list
    assert pets["symptoms"]["type"] == "enum_list"
    # required-but-unmapped field backfilled as empty
    assert pets["country_iso3"] == ""
    assert generated_spec["adtl"]["returnUnmatched"] is True


def test_generated_toml_round_trips(generated_spec):
    text = AP.dumps(generated_spec)
    parsed = tomllib.loads(text)
    assert parsed == generated_spec


def test_generated_parser_runs_end_to_end(spark, generated_spec, tmp_path):
    """The whole point: the generated TOML executes on adtl_spark.Parser
    and maps real rows."""
    toml_path = tmp_path / "pets.toml"
    AP.dump(generated_spec, str(toml_path))
    csv_path = tmp_path / "pets.csv"
    csv_path.write_text(
        "IdAnimal,Espece,Sexe,Statut,Vaccine,Vermifuge,Symptomes,DateVisite\n"
        "P1,chien,m,vivant,oui,non,toux,2022-01-05\n"
        "P2,chat,f,mort,non,oui,fievre,2022-02-06\n"
    )
    p = Parser(str(toml_path), spark=spark).parse(str(csv_path), skip_validation=True)
    rows = {r["pet_id"]: r for r in p.read_table("pets")}
    assert rows["P1"]["species"] == "dog"
    assert rows["P1"]["vaccinated"] is True
    assert rows["P1"]["dewormed"] is False
    assert rows["P2"]["status"] == "dead"
    assert rows["P2"]["sex"] == "female"


# -------------------------------------------------------------- long tables


def test_long_mapper_and_parser(spark):
    schema = {
        "properties": {
            "subjid": {"type": ["string"]},
            "attribute": {"enum": ["vaccinated", "dewormed"]},
            "value_bool": {"type": ["boolean", "null"]},
            "value": {"type": ["string", "null"]},
            "dataset": {"type": ["string"]},
        }
    }
    cfg = AP.AutoparserConfig(
        schemas={"attrs": schema},
        long_tables={
            "attrs": AP.LongTableConfig(
                variable_col="attribute",
                value_cols=["value_bool", "value"],
                common_fields={"subjid": "IdAnimal", "dataset": "petclinic"},
            )
        },
    )
    dd = pd.DataFrame(
        {
            "Field Name": ["IdAnimal", "Vaccine", "Vermifuge"],
            "Description": ["Pet id", "Vaccinated", "Dewormed"],
            "Field Type": ["string", "boolean", "boolean"],
            "Common Values": [None, "oui, non", "oui, non"],
        }
    )
    client = AP.MockLLMClient(glossary=GLOSSARY)
    mapping = AP.create_mapping(
        dd[dd["Field Name"] != "IdAnimal"], "attrs", cfg, client, table_format="long"
    )
    assert mapping.loc["Vaccine", "attribute"] == "vaccinated"
    assert mapping.loc["Vaccine", "value_col"] == "value_bool"

    spec = AP.ParserGenerator(mapping, cfg, "attrs-parser").make_parser()
    blocks = spec["attrs"]
    assert len(blocks) == 2
    vac = next(b for b in blocks if b["attribute"] == "vaccinated")
    assert vac["value_bool"]["field"] == "Vaccine"
    assert vac["value_bool"]["values"] == {"oui": True, "non": False}
    assert vac["subjid"] == "IdAnimal"  # constant-by-default long fields
    assert vac["dataset"] == "petclinic"

    # the long spec must also round-trip as TOML
    parsed = tomllib.loads(AP.dumps(spec))
    assert parsed == spec


def test_read_tabular_xlsx_round_trip(tmp_path):
    """S10: the xlsx path works WITHOUT an excel engine — pandas first,
    stdlib xlsx_lite fallback.  Round trip through the lite writer
    covers strings/ints/floats/booleans/None."""
    from adtl_spark.autoparser.xlsx_lite import write_xlsx

    df = pd.DataFrame(
        {
            "A": [1, 2, 3],
            "Name": ["alpha", "béta & <co>", ""],
            "Ratio": [0.5, 2.25, -1.0],
            "Flag": [True, False, True],
        }
    )
    path = tmp_path / "dict.xlsx"
    write_xlsx(df, str(path))
    out = AP.read_tabular(str(path))
    assert list(out.columns) == ["A", "Name", "Ratio", "Flag"]
    assert list(out["A"]) == [1, 2, 3]
    assert list(out["Name"]) == ["alpha", "béta & <co>", ""]
    assert list(out["Ratio"]) == [0.5, 2.25, -1.0]
    assert list(out["Flag"]) == [True, False, True]


def test_xlsx_lite_reads_spec_constructed_package(tmp_path):
    """Reader pinned against HAND-WRITTEN SpreadsheetML (not our own
    writer): shared strings incl. a rich-text run, a sparse row with a
    skipped cell, a non-sheet1 filename resolved through the workbook
    rels, int-vs-float typing."""
    import zipfile

    from adtl_spark.autoparser.xlsx_lite import read_xlsx

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f'<worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="inlineStr"><is><t>Score</t></is></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="C2"><v>1.5</v></c></row>'
        '<row r="3"><c r="A3" t="s"><v>0</v></c><c r="B3" t="b"><v>1</v></c>'
        '<c r="C3"><v>7</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        f'<sst {ns} count="3" uniqueCount="3">'
        "<si><t>Name</t></si><si><t>Keep</t></si>"
        "<si><r><t>two-</t></r><r><t>part</t></r></si></sst>"
    )
    workbook = (
        f'<workbook {ns} xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        '<sheet name="Data" sheetId="1" r:id="rId9"/></sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId9" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/worksheet"
        '" Target="worksheets/data99.xml"/></Relationships>'
    )
    path = tmp_path / "hand.xlsx"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/data99.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    out = read_xlsx(str(path))
    assert list(out.columns) == ["Name", "Keep", "Score"]
    assert out.iloc[0]["Name"] == "two-part"  # rich-text runs concatenate
    assert out.iloc[0]["Keep"] is None  # sparse row: skipped cell
    assert out.iloc[0]["Score"] == 1.5
    assert out.iloc[1]["Keep"] is True
    # a mixed int/float column homogenizes to float at the DataFrame
    # level — the same dtype pd.read_excel produces on this sheet
    assert out.iloc[1]["Score"] == 7.0


# ---- real-provider adapters, driven through fake SDK objects (the
# reference tests mock the identical seam: test_openai.py monkeypatches
# client.beta.chat.completions.parse, test_gemini.py the generate_content
# call) ----


class _FakeOpenAI:
    """Minimal openai-SDK shape: beta.chat.completions.parse returning a
    completion whose message carries the parsed response model."""

    def __init__(self):
        self.calls = []
        fake = self

        class _Completions:
            def parse(self, *, model, messages, response_format):
                fake.calls.append(
                    {"model": model, "messages": messages, "rf": response_format}
                )
                from types import SimpleNamespace as NS

                parsed = fake.respond(response_format)
                return NS(choices=[NS(message=NS(parsed=parsed))])

        from types import SimpleNamespace as NS

        self.beta = NS(chat=NS(completions=_Completions()))

    def respond(self, response_format):
        from adtl_spark.autoparser import llm as L

        if response_format is L.ColumnDescriptionRequest:
            return L.ColumnDescriptionRequest(
                field_descriptions=[
                    L.SingleField(field_name="Identité", translation="Identity"),
                    L.SingleField(field_name="Sexe", translation="Sex"),
                ]
            )
        if response_format is L.MappingRequest:
            return L.MappingRequest(
                targets_descriptions=[
                    L.SingleMapping(
                        target_field="subject_id", source_description="Identity"
                    ),
                    L.SingleMapping(target_field="country", source_description=None),
                ]
            )
        return L.ValuesRequest(
            values=[
                L.FieldMapping(
                    field_name="sex",
                    mapped_values=[
                        L.ValueMapping(source_value="homme", target_value="male"),
                        L.ValueMapping(source_value="inconnu", target_value=None),
                    ],
                )
            ]
        )


def test_openai_compat_client_three_calls():
    from adtl_spark.autoparser import llm as L

    fake = _FakeOpenAI()
    client = L.OpenAICompatClient(client=fake, model="gpt-4o-mini")

    defs = client.get_definitions(["Identité", "Sexe"], "fr")
    assert defs == {"Identité": "Identity", "Sexe": "Sex"}

    fields = client.map_fields(["Identity", "Sex"], ["subject_id", "country"])
    assert fields == {"subject_id": "Identity", "country": None}

    values = client.map_values([("sex", ["homme", "inconnu"], ["male"])], "fr")
    assert values == {"sex": {"homme": "male", "inconnu": None}}

    # three calls, each bound to its own response model, prompts carry the
    # language / payload
    assert len(fake.calls) == 3
    assert fake.calls[0]["model"] == "gpt-4o-mini"
    assert "fr" in fake.calls[0]["messages"][0]["content"]
    assert "Identité" in fake.calls[0]["messages"][1]["content"]
    rf = [c["rf"].__name__ for c in fake.calls]
    assert rf == ["ColumnDescriptionRequest", "MappingRequest", "ValuesRequest"]


class _FakeGemini:
    """Minimal google-genai shape: models.generate_content returning JSON
    text matching the requested response schema."""

    def __init__(self):
        self.calls = []
        fake = self

        class _Models:
            def generate_content(self, *, model, contents, config):
                fake.calls.append(
                    {"model": model, "contents": contents, "config": config}
                )
                from types import SimpleNamespace as NS

                return NS(text=fake.respond(config["response_schema"]))

        from types import SimpleNamespace as NS

        self.models = _Models()
        del NS

    def respond(self, schema):
        import json

        from adtl_spark.autoparser import llm as L

        if schema is L.ColumnDescriptionRequest:
            return json.dumps(
                {
                    "field_descriptions": [
                        {"field_name": "Province", "translation": "Province"}
                    ]
                }
            )
        if schema is L.MappingRequest:
            return json.dumps(
                {
                    "targets_descriptions": [
                        {"target_field": "province", "source_description": "Province"}
                    ]
                }
            )
        return json.dumps(
            {
                "values": [
                    {
                        "field_name": "status",
                        "mapped_values": [
                            {"source_value": "vivant", "target_value": "alive"}
                        ],
                    }
                ]
            }
        )


def test_gemini_compat_client_three_calls():
    from adtl_spark.autoparser import llm as L

    fake = _FakeGemini()
    client = L.GeminiCompatClient(client=fake, model="gemini-2.5-flash")

    assert client.get_definitions(["Province"], "fr") == {"Province": "Province"}
    assert client.map_fields(["Province"], ["province"]) == {"province": "Province"}
    assert client.map_values([("status", ["vivant"], ["alive"])], "fr") == {
        "status": {"vivant": "alive"}
    }
    assert len(fake.calls) == 3
    assert all(
        c["config"]["response_mime_type"] == "application/json" for c in fake.calls
    )


def test_make_llm_client_provider_selection():
    from adtl_spark.autoparser import llm as L

    mock = L.make_llm_client("mock", glossary={"a": "b"})
    assert isinstance(mock, L.MockLLMClient) and mock.glossary == {"a": "b"}

    oai = L.make_llm_client("openai", client=_FakeOpenAI())
    assert isinstance(oai, L.OpenAICompatClient)

    gem = L.make_llm_client("gemini", client=_FakeGemini(), model="gemini-2.5-pro")
    assert isinstance(gem, L.GeminiCompatClient)

    with pytest.raises(ValueError, match="unknown LLM provider"):
        L.make_llm_client("no-such-provider")


def test_provider_client_satisfies_pipeline_protocol():
    """The wired adapter drops into the same AP4 pipeline slot as the mock:
    generate_mapping consumes its dict shapes unchanged."""
    from adtl_spark.autoparser import llm as L

    client = L.OpenAICompatClient(client=_FakeOpenAI())
    # same call pattern mapping.py uses: descriptions in, target fields in
    fields = client.map_fields(["Identity", "Sex"], ["subject_id", "country"])
    assert set(fields) == {"subject_id", "country"}
