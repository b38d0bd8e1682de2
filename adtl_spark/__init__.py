"""adtl_spark — a PySpark-native re-implementation of the adtl
("another data transformation language") spec-driven ETL engine.

The reference (globaldothealth/adtl, surveyed in /root/repo/SURVEY.md) is a
row-at-a-time Python interpreter: a TOML/JSON *parser specification* maps one
wide source CSV into one or more target tables.  This package compiles the
same specification format into a static Spark DataFrame plan instead:

- per-field rules      -> ``pyspark.sql.Column`` expressions (one ``select``)
- ``kind = groupBy``   -> ``groupBy().agg()`` with order-aware aggregates
- ``kind = oneToMany`` -> single-pass array-of-structs ``explode`` (one scan)
- JSON-Schema checks   -> boolean ``Column`` predicates (``adtl_valid``)

Nothing is interpreted per row on the driver; Catalyst sees the whole plan and
applies predicate pushdown / column pruning / whole-stage codegen.

Reference entry points mirrored here (citations are into /root/reference):
``adtl.parse``/``adtl.Parser`` (src/adtl/__init__.py:3-6,
src/adtl/python_interface.py:14-59).
"""

from adtl_spark.api import Parser, check_mapping, parse, parse_rows, validate_specification
from adtl_spark.session import get_spark

__all__ = [
    "Parser",
    "parse",
    "parse_rows",
    "check_mapping",
    "validate_specification",
    "get_spark",
]
__version__ = "0.1.0"
