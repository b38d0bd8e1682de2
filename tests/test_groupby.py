"""groupBy table semantics: A1-A5 (SURVEY.md §2.5) — lastNotNull file-order
semantics and applyCombinedType group folds."""

from adtl_spark.api import Parser


def run(spark, table_meta, rules, rows):
    spec = {
        "adtl": {
            "name": "g",
            "description": "",
            "tables": {"tab": table_meta},
        },
        "tab": rules,
    }
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    return sorted(p.read_table("tab"), key=lambda r: str(r.get("sid")))


def test_last_not_null(spark):
    meta = {"kind": "groupBy", "groupBy": "sid", "aggregation": "lastNotNull"}
    rules = {"sid": {"field": "id"}, "v": {"field": "x"}}
    rows = [
        {"id": "a", "x": "1"},
        {"id": "a", "x": ""},
        {"id": "a", "x": "3"},
        {"id": "b", "x": ""},
        {"id": "b", "x": "9"},
        {"id": "b", "x": ""},
    ]
    out = run(spark, meta, rules, rows)
    # later non-empty values win; trailing empties are ignored
    assert out == [{"sid": "a", "v": 3}, {"sid": "b", "v": 9}]


def test_group_combined_min_first(spark):
    meta = {"kind": "groupBy", "groupBy": "sid", "aggregation": "applyCombinedType"}
    rules = {
        "sid": {"field": "id"},
        "first_date": {
            "combinedType": "min",
            "fields": [{"field": "d1"}, {"field": "d2"}],
        },
        "initial": {
            "combinedType": "firstNonNull",
            "fields": [{"field": "x"}],
        },
    }
    rows = [
        {"id": "a", "d1": "2022-05-01", "d2": "", "x": ""},
        {"id": "a", "d1": "2022-01-15", "d2": "2022-03-01", "x": "first"},
        {"id": "a", "d1": "", "d2": "", "x": "second"},
    ]
    out = run(spark, meta, rules, rows)
    assert out == [{"sid": "a", "first_date": "2022-01-15", "initial": "first"}]


def test_group_combined_set_list(spark):
    meta = {"kind": "groupBy", "groupBy": "sid", "aggregation": "applyCombinedType"}
    rules = {
        "sid": {"field": "id"},
        "symptoms": {
            "combinedType": "set",
            "excludeWhen": "none",
            "fields": [
                {"field": "cough", "values": {"1": "cough"}},
                {"field": "fever", "values": {"1": "fever"}},
            ],
        },
        "trail": {
            "combinedType": "list",
            "excludeWhen": "none",
            "fields": [{"field": "ev"}],
        },
    }
    rows = [
        {"id": "a", "cough": "1", "fever": "", "ev": "e1"},
        {"id": "a", "cough": "1", "fever": "1", "ev": "e2"},
        {"id": "a", "cough": "", "fever": "", "ev": ""},
    ]
    out = run(spark, meta, rules, rows)
    assert out[0]["symptoms"] == ["cough", "fever"]  # sorted set across rows
    assert out[0]["trail"] == ["e1", "e2"]  # file order preserved


def test_group_combined_any_all(spark):
    meta = {"kind": "groupBy", "groupBy": "sid", "aggregation": "applyCombinedType"}
    yn = {"values": {"1": True, "0": False}}
    rules = {
        "sid": {"field": "id"},
        "ever": {"combinedType": "any", "fields": [{"field": "flag", **yn}]},
        "always": {"combinedType": "all", "fields": [{"field": "flag", **yn}]},
    }
    rows = [
        {"id": "a", "flag": "1"},
        {"id": "a", "flag": "0"},
        {"id": "b", "flag": "1"},
        {"id": "b", "flag": ""},
        {"id": "c", "flag": ""},
    ]
    out = run(spark, meta, rules, rows)
    assert out[0] == {"sid": "a", "ever": True, "always": False}
    assert out[1] == {"sid": "b", "ever": True, "always": True}
    assert out[2] == {"sid": "c"}  # no values at all -> attrs dropped


def test_group_min_max_numeric_vs_string(spark):
    meta = {"kind": "groupBy", "groupBy": "sid", "aggregation": "applyCombinedType"}
    rules = {
        "sid": {"field": "id"},
        "lo": {"combinedType": "min", "fields": [{"field": "n"}]},
        "hi": {"combinedType": "max", "fields": [{"field": "n"}]},
    }
    rows = [
        {"id": "a", "n": "9"},
        {"id": "a", "n": "10"},  # numeric: 9 < 10 (lexicographic would flip)
        {"id": "b", "n": "beta"},
        {"id": "b", "n": "alpha"},
    ]
    out = run(spark, meta, rules, rows)
    assert out[0] == {"sid": "a", "lo": 9, "hi": 10}
    assert out[1] == {"sid": "b", "lo": "alpha", "hi": "beta"}


def test_single_row_group_passthrough(spark):
    meta = {"kind": "groupBy", "groupBy": "sid", "aggregation": "applyCombinedType"}
    rules = {
        "sid": {"field": "id"},
        "v": {"combinedType": "min", "fields": [{"field": "n"}]},
    }
    out = run(spark, meta, rules, [{"id": "solo", "n": "5"}])
    assert out == [{"sid": "solo", "v": 5}]


def test_conflict_detection(spark):
    from adtl_spark.api import Parser
    from adtl_spark.sources.io import dataframe_from_rows

    spec = {
        "adtl": {
            "name": "g",
            "description": "",
            "tables": {
                "tab": {"kind": "groupBy", "groupBy": "sid", "aggregation": "lastNotNull"}
            },
        },
        "tab": {"sid": {"field": "id"}, "v": {"field": "x"}, "w": {"field": "y"}},
    }
    rows = [
        {"id": "a", "x": "1", "y": "same"},
        {"id": "a", "x": "2", "y": "same"},  # x conflicts, y does not
        {"id": "b", "x": "3", "y": ""},
    ]
    p = Parser(spec, spark=spark)
    source = dataframe_from_rows(spark, rows)
    out = {r["attribute"]: r["n_conflicting_groups"] for r in p.conflicts("tab", source).collect()}
    assert out == {"v": 1, "w": 0}


def test_group_min_mixed_int_float_keeps_winner_render(spark):
    """Python semantics: str(min(7, 9.5)) == '7' (the winning value keeps
    its own type/render); str(min(7, 2.5)) == '2.5'.  The engine must not
    re-render an int winner through double ('7.0')."""
    meta = {"kind": "groupBy", "groupBy": "sid", "aggregation": "applyCombinedType"}
    rules = {
        "sid": {"field": "id"},
        "lo": {"combinedType": "min", "fields": [{"field": "x"}]},
        "hi": {"combinedType": "max", "fields": [{"field": "x"}]},
    }
    rows = [
        {"id": "a", "x": "7"},
        {"id": "a", "x": "9.5"},
        {"id": "b", "x": "7"},
        {"id": "b", "x": "2.5"},
    ]
    out = run(spark, meta, rules, rows)
    # read_table re-types: int 7 stays int, 2.5/9.5 floats
    assert out == [
        {"sid": "a", "lo": 7, "hi": 9.5},
        {"sid": "b", "lo": 2.5, "hi": 7},
    ]
    raw = {
        r["sid"]: (r["lo"], r["hi"])
        for r in __import__("adtl_spark.api", fromlist=["Parser"])
        .Parser(
            {
                "adtl": {"name": "g", "description": "", "tables": {"tab": meta}},
                "tab": rules,
            },
            spark=spark,
        )
        .parse_rows(rows, skip_validation=True)
        .table("tab")
        .collect()
    }
    assert raw["a"] == ("7", "9.5")  # canonical strings, not '7.0'
    assert raw["b"] == ("2.5", "7")


def test_rowwise_min_mixed_int_float_keeps_winner_render(spark):
    """Row-wise combinedType min across two fields of different numeric
    types: the winner's own render survives."""
    meta = {"kind": "oneToOne"}
    rules = {
        "lo": {"combinedType": "min", "fields": [{"field": "a"}, {"field": "b"}]},
        "hi": {"combinedType": "max", "fields": [{"field": "a"}, {"field": "b"}]},
    }
    rows = [{"a": "7", "b": "9.5"}, {"a": "7", "b": "2.5"}]
    spec = {
        "adtl": {"name": "g", "description": "", "tables": {"tab": meta}},
        "tab": rules,
    }
    p = Parser(spec, spark=spark).parse_rows(rows, skip_validation=True)
    got = [(r["lo"], r["hi"]) for r in p.table("tab").collect()]
    assert ("7", "9.5") in got and ("2.5", "7") in got


def test_last_not_null_multi_file_order(spark, tmp_path):
    """lastNotNull across a GLOBBED multi-file source follows sorted-path
    file order (the multi-file extension of the reference's single-file
    order): later files override earlier ones.  Many small files force
    Spark to pack splits by size, so a plain monotonic id would interleave
    — the composite (file, offset, id) row id must not."""
    from adtl_spark.api import Parser

    # file sizes deliberately NOT in path order: pack-by-size would reorder
    (tmp_path / "part-000.csv").write_text(
        "id,x\n" + "".join(f"a,{i}\n" for i in range(1, 200)) + "b,10\n"
    )
    (tmp_path / "part-001.csv").write_text("id,x\na,500\n")
    (tmp_path / "part-002.csv").write_text(
        "id,x\n" + "".join(f"c,{i}\n" for i in range(50)) + "a,900\nb,20\n"
    )
    spec = {
        "adtl": {
            "name": "mf",
            "description": "",
            "tables": {
                "tab": {"kind": "groupBy", "groupBy": "sid", "aggregation": "lastNotNull"}
            },
        },
        "tab": {"sid": {"field": "id"}, "v": {"field": "x"}},
    }
    p = Parser(spec, spark=spark).parse(str(tmp_path / "*.csv"), skip_validation=True)
    got = {r["sid"]: r["v"] for r in p.table("tab").collect()}
    assert got["a"] == "900"  # last file wins, not the largest split
    assert got["b"] == "20"
    assert got["c"] == "49"
