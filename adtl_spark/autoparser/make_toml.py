"""Parser (TOML spec) generation from a mapping table (AP6).

Reference: src/adtl/autoparser/make_toml.py:70-355.  A wide mapping becomes
a oneToOne table of field rules; a long mapping becomes a oneToMany array
of blocks.  The wide path de-duplicates the most common value maps into
``adtl.defs`` references (``num_refs`` of them, with the single boolean map
canonically named Y/N/NK) so the generated spec reads like a hand-written
one.  The generated dict round-trips through
:mod:`adtl_spark.autoparser.toml_writer` and executes on
:class:`adtl_spark.api.Parser`.
"""

from __future__ import annotations

import json
import logging
import warnings
from typing import Any

import pandas as pd

from adtl_spark.autoparser.config import AutoparserConfig
from adtl_spark.autoparser.dictionary import read_tabular
from adtl_spark.autoparser.llm import coerce_mapped_value
from adtl_spark.autoparser.toml_writer import dump, dumps

logger = logging.getLogger(__name__)


def parse_mapped_values(s: Any) -> dict[str, Any] | None:
    """Inverse of the mapping serializer: ``"oui=True | non=False"`` ->
    ``{"oui": True, "non": False}`` with the reference's coercions
    (util.py:48-87): True/False become booleans, None becomes "" (dropping
    an empty key), ``[a, b]`` becomes a list."""
    if not isinstance(s, str):
        return None
    pairs: dict[str, Any] = {}
    for part in _split_top(s):
        k, sep, v = part.partition("=")
        if not sep:
            raise ValueError(f"autoparser: invalid value mapping {s!r}")
        k, v = k.strip(), v.strip()
        coerced = coerce_mapped_value(v)
        if coerced == "" and (k == "" or v.lower() == "none" and k == ""):
            if k == "":
                continue
        pairs[k] = coerced
    return pairs or None


def _split_top(s: str) -> list[str]:
    """Split on '|' except inside [...] lists."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        if ch == "|" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p for p in (x.strip() for x in parts) if p != ""]


def _field_types(props: dict[str, Any], f: str) -> list[str]:
    t = props.get(f, {}).get("type", ["string", "null"])
    return t if isinstance(t, list) else [t]


class WideTableParser:
    """Wide mapping -> oneToOne table rules + shared defs
    (make_toml.py:70-160)."""

    def __init__(self, mapping: pd.DataFrame, schema: dict, table_name: str, num_refs: int = 3):
        self.mapping = mapping.reset_index()
        self.schema = schema
        self.name = table_name
        self.num_refs = num_refs
        self.props = schema["properties"]
        self._choices = {
            row["target_field"]: parse_mapped_values(row.get("value_mapping"))
            for _, row in self.mapping.iterrows()
        }

    def references_definitions(self) -> tuple[dict[str, str], dict[str, dict]]:
        """The ``num_refs`` most repeated value maps become named defs; a
        key is the sort-stable JSON of the map.  Only ONE boolean map is
        lifted, always named Y/N/NK (make_toml.py:90-115)."""
        counts: dict[str, int] = {}
        rep: dict[str, dict] = {}
        for choices in self._choices.values():
            if not choices:
                continue
            key = json.dumps(choices, sort_keys=True)
            counts[key] = counts.get(key, 0) + 1
            rep[key] = choices
        top = sorted(
            (k for k, n in counts.items() if n > 1),
            key=lambda k: (-counts[k], k),
        )[: self.num_refs]

        references: dict[str, str] = {}
        definitions: dict[str, dict] = {}
        bool_found = False
        for key in top:
            mapping = rep[key]
            if True in mapping.values():
                if bool_found:
                    continue
                references[key] = "Y/N/NK"
                definitions["Y/N/NK"] = {
                    "caseInsensitive": True,
                    "values": mapping,
                }
                bool_found = True
                continue
            name = "/".join(map(str, mapping.values()))
            references[key] = name
            definitions[name] = {"values": mapping, "caseInsensitive": True}
        return references, definitions

    def _single_field(self, row: pd.Series, references: dict[str, str]) -> dict[str, Any]:
        out: dict[str, Any] = {
            "field": row["source_field"],
            "description": row["source_description"],
        }
        choices = self._choices.get(row["target_field"])
        if choices:
            key = json.dumps(choices, sort_keys=True)
            if key in references:
                out["ref"] = references[key]
            else:
                out["values"] = choices
                out["caseInsensitive"] = True
            if "array" in _field_types(self.props, row["target_field"]):
                out["type"] = "enum_list"
        return out

    def make_toml_table(self) -> tuple[dict[str, Any], dict[str, dict]]:
        references, definitions = self.references_definitions()
        outmap: dict[str, Any] = {}
        for _, row in self.mapping.iterrows():
            if pd.isna(row.get("source_field")) or row.get("source_field") is None:
                continue
            outmap[row["target_field"]] = self._single_field(row, references)
        for f in self.schema.get("required", []):
            if f not in outmap:
                logger.warning(
                    "Missing required field %s in %s schema. Adding empty field...",
                    f,
                    self.name,
                )
                outmap[f] = ""
        return {self.name: outmap}, definitions


class LongTableParser:
    """Long mapping -> oneToMany blocks (make_toml.py:163-232)."""

    def __init__(
        self,
        mapping: pd.DataFrame,
        schema: dict,
        table_name: str,
        config: AutoparserConfig,
    ):
        self.mapping = mapping.reset_index()
        self.schema = schema
        self.name = table_name
        self.props = schema["properties"]
        self.lt = config.long_tables[table_name]
        # long-table fields are constant text by default, except the value
        # columns which read from the source (make_toml.py:169-178)
        self.constant_field = {f: True for f in self.props}
        for vc in self.lt.value_cols:
            self.constant_field[vc] = False

    def _entry(self, row: pd.Series) -> dict[str, Any]:
        def add(field_name: str, text: Any) -> Any:
            if self.constant_field.get(field_name, False):
                return text
            return {"field": text}

        var_col = self.lt.variable_col
        out: dict[str, Any] = {
            var_col: row[var_col],
            row["value_col"]: add(row["value_col"], row["source_field"]),
        }
        choices = parse_mapped_values(row.get("value_mapping"))
        if choices:
            out[row["value_col"]].update(
                {"values": choices, "caseInsensitive": True}
            )
        for f in self.lt.common_cols:
            if f in row and not pd.isna(row[f]):
                out[f] = add(f, row[f])
        others = [
            f
            for f in self.props
            if f not in (var_col, *self.lt.value_cols, *self.lt.common_cols)
        ]
        for f in others:
            if f in row and not pd.isna(row[f]):
                out[f] = add(f, row[f])
        return out

    def make_toml_table(self) -> tuple[dict[str, Any], None]:
        bad = self.mapping[self.mapping[self.lt.variable_col].isna()]
        if len(bad):
            raise ValueError(
                f"Mapping dataframe must not contain NaN values in "
                f"'{self.lt.variable_col}' column."
            )
        entries = [self._entry(row) for _, row in self.mapping.iterrows()]
        return {self.name: entries}, None


class ParserGenerator:
    """Mapping table(s) -> complete runnable TOML spec
    (make_toml.py:235-355)."""

    def __init__(
        self,
        mappings: Any,
        config: AutoparserConfig,
        parser_name: str,
        description: str | None = None,
    ) -> None:
        self.config = config
        self.parser_name = parser_name
        self.description = description or parser_name
        self.tables = list(config.schemas)
        if not isinstance(mappings, dict):
            if len(self.tables) != 1:
                raise ValueError(
                    "multiple schemas configured: pass mappings as {table: mapping}"
                )
            mappings = {self.tables[0]: mappings}
        self.mappings = {
            t: read_tabular(mappings[t], "mapping file") for t in self.tables
        }
        self.table_types = {
            t: "wide" if "target_field" in m.reset_index().columns else "long"
            for t, m in self.mappings.items()
        }

    def header(self) -> dict[str, Any]:
        tables: dict[str, Any] = {}
        for t in self.tables:
            meta: dict[str, Any] = {
                "kind": "oneToOne" if self.table_types[t] == "wide" else "oneToMany"
            }
            schema = self.config.schemas[t]
            if not isinstance(schema, dict):
                meta["schema"] = str(schema)
            tables[t] = meta
        return {
            "adtl": {
                "name": self.parser_name,
                "description": self.description,
                "returnUnmatched": True,
                "tables": tables,
                "defs": {},
            }
        }

    def make_parser(self) -> dict[str, Any]:
        data = self.header()
        for t in self.tables:
            schema = self.config.schema_dict(t)
            if self.table_types[t] == "wide":
                table, defs = WideTableParser(
                    self.mappings[t], schema, t, num_refs=self.config.num_refs
                ).make_toml_table()
            else:
                table, defs = LongTableParser(
                    self.mappings[t], schema, t, self.config
                ).make_toml_table()
            data.update(table)
            if defs:
                data["adtl"]["defs"].update(defs)
        return data

    def create_parser(self, file_name: str | None = None) -> str:
        """Build the spec and return TOML text (writing it out when
        ``file_name`` is given)."""
        data = self.make_parser()
        text = dumps(data)
        if file_name:
            dump(data, file_name)
        return text


def create_parser(
    mappings: Any,
    config: AutoparserConfig,
    parser_name: str,
    description: str | None = None,
    file_name: str | None = None,
) -> str:
    """Functional entry point mirroring the reference's
    (make_toml.py:358-398)."""
    return ParserGenerator(mappings, config, parser_name, description).create_parser(
        file_name
    )


def generate_spec_skeleton(
    dictionary: list[dict[str, Any]],
    name: str = "generated",
    group_by: str | None = None,
) -> dict[str, Any]:
    """Runnable skeleton spec straight from an inferred dictionary — every
    column mapped as a plain field rule (value maps are the LLM pass above);
    groupBy wiring when a key column is named."""
    table_meta: dict[str, Any] = {"kind": "oneToOne"}
    if group_by:
        table_meta = {
            "kind": "groupBy",
            "groupBy": group_by,
            "aggregation": "lastNotNull",
        }
    rules = {entry["field"]: {"field": entry["field"]} for entry in dictionary}
    return {
        "adtl": {
            "name": name,
            "description": f"auto-generated from {len(dictionary)} profiled columns",
            "tables": {"data": table_meta},
        },
        "data": rules,
    }
