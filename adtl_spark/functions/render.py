"""Canonical rendering for adtl's dynamically-typed cells.

The reference engine produces *per-cell* dynamic Python values: every string
result is re-parsed as int, then float, then left as a string
(src/adtl/get_value.py:162-170); a failed schema cast keeps the original
value (src/adtl/util.py:29-40).  Spark columns are statically typed, so the
engine's bit-compat mode represents every scalar cell as a **StringType
column holding the canonical Python rendering** of the dynamic value:

- ``int``   -> ``str(int(v))``     ("007" -> "7")
- ``float`` -> ``str(float(v))``   ("2.50" -> "2.5")
- ``bool``  -> ``"True"``/``"False"``
- ``None``  -> SQL null
- lists     -> ``ArrayType(StringType)`` with element-rendered values

This matches what the reference's CSV sink writes cell-for-cell for the value
domains exercised by its test corpus.  Divergence: Java renders doubles
outside [1e-3, 1e7) in scientific notation where Python may not; such
magnitudes do not occur in the reference fixtures.

A typed (non-bit-compat) mode is available in the table materializer for
parquet-native pipelines where a JSON schema pins column types.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python int()/float() accept surrounding whitespace; keep parity.
INT_REGEX = r"^\s*[+-]?[0-9]+\s*$"
FLOAT_REGEX = r"^\s*[+-]?(([0-9]+\.?[0-9]*)|(\.[0-9]+))([eE][+-]?[0-9]+)?\s*$"


def is_int_string(col: Column) -> Column:
    return col.rlike(INT_REGEX)


def is_float_string(col: Column) -> Column:
    return col.rlike(FLOAT_REGEX)


def is_numeric_string(col: Column) -> Column:
    """True when Python ``int(v)`` or ``float(v)`` would succeed."""
    return col.rlike(FLOAT_REGEX)


def render_double(col: Column) -> Column:
    """Render a double column the way Python ``str(float)`` does for the
    common magnitude range: integral doubles keep one trailing ``.0``."""
    return col.cast("double").cast("string")


def render_long(col: Column) -> Column:
    return col.cast("long").cast("string")


def render_bool(col: Column) -> Column:
    return F.when(col, F.lit("True")).when(~col, F.lit("False"))


def numeric_coerce(col: Column) -> Column:
    """The reference's final int-then-float coercion on string values
    (src/adtl/get_value.py:162-170), expressed as a canonical re-rendering.

    Non-numeric strings pass through unchanged; empty string is left to the
    caller (the reference nulls ``""`` *before* this step).
    """
    return (
        F.when(is_int_string(col), render_long(col))
        .when(is_float_string(col), render_double(col))
        .otherwise(col)
    )


def render_literal(value: object) -> str | None:
    """Driver-side canonical rendering of a spec literal (map values,
    constants).  Applies the same int/float re-parse the engine applies to
    string results so 'values = {"1" = "2"}' renders as "2" -> int 2 -> "2".
    """
    if value is None:
        return None
    if isinstance(value, bool):
        return "True" if value else "False"
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, str):
        try:
            return str(int(value))
        except ValueError:
            try:
                return str(float(value))
            except ValueError:
                return value
    return str(value)


def repr_element(col: Column) -> Column:
    """Python ``repr`` of a rendered element, for ``str(list)`` CSV parity:
    numbers and booleans bare, everything else single-quoted."""
    is_bare = col.rlike(FLOAT_REGEX) | col.isin("True", "False", "None")
    return F.when(is_bare, col).otherwise(F.concat(F.lit("'"), col, F.lit("'")))


def render_array_python(col: Column) -> Column:
    """Render an ArrayType(String) column as Python's ``str(list)``:
    ``['a', 'b']`` / ``[1, 2]`` — what the reference CSV sink emits for
    combinedType list/set cells."""
    return F.when(
        col.isNotNull(),
        F.concat(
            F.lit("["),
            F.array_join(F.transform(col, repr_element), ", ", "None"),
            F.lit("]"),
        ),
    )
