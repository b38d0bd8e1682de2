"""JSON-Schema (draft-07 subset) -> Column predicate compiler.

The reference validates each output row with fastjsonschema and annotates
``adtl_valid``/``adtl_error`` — invalid rows are kept, never dropped
(src/adtl/parser.py:736-757; docs/specification.md:87-92).  Long tables with
a ``oneOf`` discriminator get per-discriminator validators
(src/adtl/util.py:43-98).

Here the supported keyword subset (type / enum / const / required / pattern /
format:date / oneOf-by-discriminator) compiles to boolean Columns evaluated
in the same single pass as the projection.  Error messages are this engine's
own wording; parity is on validity and counts, not message text (the
reference's messages come from fastjsonschema internals).

Type checks interpret the canonical-string cell rendering: a cell "25" *is*
the integer 25 (the reference's dynamic typing), so it fails a
``type: string`` check exactly as the reference's int cell does.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adtl_spark.functions import render as R
from adtl_spark.spec import CompiledSpec, StrDict


def _type_check(col: Column, is_array_col: bool, expected: str | list[str]) -> Column:
    types = [expected] if isinstance(expected, str) else list(expected)
    checks = []
    for t in types:
        if t == "null":
            checks.append(col.isNull())
        elif t == "array":
            checks.append(F.lit(is_array_col))
        elif is_array_col:
            checks.append(F.lit(False))
        elif t == "integer":
            checks.append(R.is_int_string(col))
        elif t == "number":
            checks.append(R.is_numeric_string(col))
        elif t == "boolean":
            checks.append(col.isin("True", "False"))
        elif t == "string":
            checks.append(~R.is_numeric_string(col) & ~col.isin("True", "False"))
        else:
            checks.append(F.lit(True))
    out = checks[0]
    for c in checks[1:]:
        out = out | c
    return out


def _property_checks(
    attr: str,
    prop: StrDict,
    df_columns: list[str],
    array_cols: set[str],
) -> list[tuple[Column, str]]:
    """(violation_condition, message) pairs for one schema property."""
    if attr not in df_columns:
        return []
    col = F.col(attr)
    is_arr = attr in array_cols
    present = col.isNotNull() if not is_arr else col.isNotNull()
    checks: list[tuple[Column, str]] = []

    if "type" in prop:
        ok = _type_check(col, is_arr, prop["type"])
        checks.append((present & ~ok, f"data.{attr} must be {prop['type']}"))
    if "enum" in prop and not is_arr:
        rendered = [R.render_literal(v) for v in prop["enum"]]
        checks.append(
            (present & ~col.isin(*rendered), f"data.{attr} must be one of {prop['enum']}")
        )
    if "const" in prop and not is_arr:
        checks.append(
            (
                present & (col != F.lit(R.render_literal(prop["const"]))),
                f"data.{attr} must be same as const definition: {prop['const']}",
            )
        )
    if "pattern" in prop and not is_arr:
        checks.append(
            (
                present & ~col.rlike(prop["pattern"]),
                f"data.{attr} must match pattern {prop['pattern']}",
            )
        )
    if prop.get("format") == "date" and not is_arr:
        parsed = F.try_to_timestamp(col, F.lit("yyyy-M-d"))
        checks.append((present & parsed.isNull(), f"data.{attr} must be date"))
    if "minimum" in prop and not is_arr:
        num = F.when(R.is_numeric_string(col), col.cast("double"))
        checks.append(
            (
                present & num.isNotNull() & (num < float(prop["minimum"])),
                f"data.{attr} must be bigger than or equal to {prop['minimum']}",
            )
        )
    if "maximum" in prop and not is_arr:
        num = F.when(R.is_numeric_string(col), col.cast("double"))
        checks.append(
            (
                present & num.isNotNull() & (num > float(prop["maximum"])),
                f"data.{attr} must be smaller than or equal to {prop['maximum']}",
            )
        )
    if "minLength" in prop and not is_arr:
        checks.append(
            (
                present & (F.length(col) < int(prop["minLength"])),
                f"data.{attr} must be longer than or equal to {prop['minLength']} characters",
            )
        )
    if "maxLength" in prop and not is_arr:
        checks.append(
            (
                present & (F.length(col) > int(prop["maxLength"])),
                f"data.{attr} must be shorter than or equal to {prop['maxLength']} characters",
            )
        )
    if "items" in prop and is_arr and "enum" in prop.get("items", {}):
        rendered = [R.render_literal(v) for v in prop["items"]["enum"]]
        bad = F.exists(col, lambda x: ~x.isin(*rendered))
        checks.append(
            (present & bad, f"data.{attr}[] must be one of {prop['items']['enum']}")
        )
    if prop.get("uniqueItems") and is_arr:
        dup = F.size(col) != F.size(F.array_distinct(col))
        checks.append((present & dup, f"data.{attr} must contain unique items"))
    return checks


def _subschema_violations(
    schema: StrDict, df: DataFrame, array_cols: set[str]
) -> list[tuple[Column, str]]:
    checks: list[tuple[Column, str]] = []
    for req in schema.get("required", []):
        if req in df.columns:
            cond = F.col(req).isNull()
        else:
            cond = F.lit(True)
        checks.append((cond, f"data must contain ['{req}'] properties"))
    for attr, prop in schema.get("properties", {}).items():
        if isinstance(prop, dict):
            checks.extend(_property_checks(attr, prop, df.columns, array_cols))
    return checks


def _discriminator_subschemas(schema: StrDict, discriminator: str) -> dict[str, StrDict] | None:
    """Expand oneOf options keyed by discriminator const/enum
    (mirrors util.expand_schema semantics)."""
    options = schema.get("oneOf", [])
    if not any("properties" in o for o in options):
        return None
    general_props = schema.get("properties", {})
    general_req = schema.get("required", [])
    expanded: dict[str, StrDict] = {}
    for option in options:
        props = option.get("properties", {})
        disc = props.get(discriminator, {})
        if "const" in disc:
            keys = [disc["const"]]
        elif "enum" in disc:
            keys = list(disc["enum"])
        else:
            return None  # fall back to unexpanded mode
        sub = {
            "properties": {**general_props, **props},
            "required": general_req + option.get("required", []),
        }
        for k in keys:
            expanded[str(k)] = sub
    return expanded or None


def annotate_validation(
    spec: CompiledSpec, table: str, df: DataFrame
) -> DataFrame:
    """Add adtl_valid / adtl_error columns; rows are never dropped."""
    schema = spec.schemas.get(table)
    if schema is None:
        return df
    array_cols = {
        f.name for f in df.schema.fields if f.dataType.typeName() == "array"
    }

    meta = spec.tables[table]
    if meta.get("kind") == "oneToMany" and meta.get("discriminator") and "oneOf" in schema:
        expanded = _discriminator_subschemas(schema, meta["discriminator"])
        if expanded is not None:
            disc_col = F.col(meta["discriminator"])
            error: Column = F.lit(None).cast("string")
            # build per-discriminator error expressions, innermost last
            for key, sub in expanded.items():
                sub_err = _first_error(_subschema_violations(sub, df, array_cols))
                error = F.when(disc_col == F.lit(key), sub_err).otherwise(error)
            known = F.lit(None).cast("string")
            unknown_msg = F.concat(
                F.lit("No validator found for attribute '"),
                F.coalesce(disc_col, F.lit("None")),
                F.lit(f"' in table '{table}'"),
            )
            is_known = disc_col.isin(*expanded.keys())
            error = F.when(is_known, error).otherwise(unknown_msg)
            return _attach(df, error)

    error = _first_error(_subschema_violations(schema, df, array_cols))
    return _attach(df, error)


def _first_error(checks: list[tuple[Column, str]]) -> Column:
    error: Column = F.lit(None).cast("string")
    for cond, msg in reversed(checks):
        error = F.when(cond, F.lit(msg)).otherwise(error)
    return error


def _attach(df: DataFrame, error: Column) -> DataFrame:
    annotated = df.withColumn("adtl_error", error).withColumn(
        "adtl_valid", F.col("adtl_error").isNull()
    )
    return annotated.select(
        "adtl_valid", "adtl_error", *[c for c in df.columns]
    )


def validation_report(tables: dict[str, DataFrame]) -> dict[str, Any]:
    """S9 validation counters: totals + error histogram per table
    (reference: parser.py:845-863, cli.py:78-90) — computed as aggregations,
    not a second row-wise pass."""
    report: dict[str, Any] = {"total": {}, "total_valid": {}, "validation_errors": {}}
    for name, df in tables.items():
        if "adtl_valid" not in df.columns:
            continue
        counts = df.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("adtl_valid").cast("int")).alias("valid"),
        ).collect()[0]
        report["total"][name] = counts["total"]
        report["total_valid"][name] = counts["valid"] or 0
        errors = (
            df.filter(F.col("adtl_error").isNotNull())
            .groupBy("adtl_error")
            .count()
            .collect()
        )
        report["validation_errors"][name] = {r["adtl_error"]: r["count"] for r in errors}
    return report
