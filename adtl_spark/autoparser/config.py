"""Autoparser configuration (AP7).

The reference keeps a process-global singleton initialized from a TOML file
(src/adtl/autoparser/config/config.py:149-182).  Spark-first code passes an
explicit config object instead — no global state to leak between jobs on a
shared driver — while accepting the same TOML/dict shape via
:func:`load_config`.
"""

from __future__ import annotations

import json
import tomllib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass
class LongTableConfig:
    """Long-table wiring (reference config.py:55-71): which schema column
    discriminates the variable, which carry values, and which are shared
    across every row of the long table."""

    variable_col: str
    value_cols: list[str]
    common_cols: list[str] = field(default_factory=list)
    common_fields: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.common_cols and self.common_fields:
            raise ValueError(
                "only one of 'common_cols' and 'common_fields' may be set"
            )
        if self.common_fields and not self.common_cols:
            self.common_cols = list(self.common_fields)


@dataclass
class AutoparserConfig:
    """Everything the build-time pipeline needs, defaults matching the
    reference's autoparser.toml."""

    language: str = "en"
    schemas: dict[str, Any] = field(default_factory=dict)  # table -> schema dict|path
    num_refs: int = 3
    max_common_count: int = 25
    min_common_frequency: float | None = None
    choice_delimiter: str = ","
    choice_delimiter_map: str = "="
    long_tables: dict[str, LongTableConfig] = field(default_factory=dict)
    # source dictionary column names -> canonical names
    column_mappings: dict[str, str] = field(
        default_factory=lambda: {
            "source_field": "Field Name",
            "source_type": "Field Type",
            "source_description": "Description",
            "common_values": "Common Values",
        }
    )

    def schema_dict(self, table: str) -> dict[str, Any]:
        schema = self.schemas[table]
        if isinstance(schema, dict):
            return schema
        return json.loads(Path(schema).read_text())


def load_config(source: str | Path | dict[str, Any]) -> AutoparserConfig:
    """Build a config from a TOML/JSON file path or a plain dict with the
    reference's key layout."""
    if isinstance(source, (str, Path)):
        path = Path(source)
        if path.suffix == ".json":
            data = json.loads(path.read_text())
        else:
            data = tomllib.loads(path.read_text())
    else:
        data = dict(source)
    long_tables = {
        name: LongTableConfig(**lt) for name, lt in (data.get("long_tables") or {}).items()
    }
    kwargs: dict[str, Any] = {
        k: v
        for k, v in data.items()
        if k
        in (
            "language",
            "schemas",
            "num_refs",
            "max_common_count",
            "min_common_frequency",
            "choice_delimiter",
            "choice_delimiter_map",
        )
    }
    if "column_mappings" in data:
        kwargs["column_mappings"] = dict(data["column_mappings"])
    return AutoparserConfig(long_tables=long_tables, **kwargs)
