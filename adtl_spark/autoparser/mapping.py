"""Field and value mapping (AP4/AP5): data dictionary -> intermediate
mapping table, via the pluggable LLM client.

Reference shape (src/adtl/autoparser/mapping/base_mapper.py:187-210,
wide_mapper.py:62-114, long_mapper.py:128-178): a wide mapping indexes on
``target_field`` with columns source_description / source_field /
common_values / target_values / value_mapping; a long mapping indexes on
``source_field`` and adds the variable/value-column wiring from the
long-table config.  All of this is driver-side pandas over the (tiny)
dictionary — the dataset itself is never involved.
"""

from __future__ import annotations

import warnings
from typing import Any

import pandas as pd

from adtl_spark.autoparser.config import AutoparserConfig
from adtl_spark.autoparser.dictionary import format_dict
from adtl_spark.autoparser.llm import LLMClient, close_match


def _target_values(props: dict[str, Any], field_name: str) -> list[str] | None:
    """Enum values or boolean options a target field accepts
    (wide_mapper.py:33-52)."""
    spec = props[field_name]
    types = spec.get("type", ["string", "null"])
    if not isinstance(types, list):
        types = [types]
    if "boolean" in types:
        return ["True", "False", "None"]
    if "enum" in spec:
        return [str(v) for v in spec["enum"] if v is not None] + ["None"]
    if "array" in types:
        enum = spec.get("items", {}).get("enum")
        if enum:
            return [str(v) for v in enum if v is not None] + ["None"]
    return None


def _relabel_choices(
    value_mapping: dict[str, str | None] | None, choices: dict[str, str] | None
) -> dict[str, str | None] | None:
    """When the dictionary ships coded choices ({1: Man, 2: Femme}) and the
    LLM mapped the LABELS, re-key the mapping by the CODES
    (base_mapper.py:108-145)."""
    if value_mapping is None:
        return None
    if not isinstance(choices, dict):
        return value_mapping
    lowered = {str(k).lower(): v for k, v in value_mapping.items()}
    return {
        code: lowered.get(str(label).lower())
        for code, label in choices.items()
    }


def _serialize(v: Any) -> Any:
    if isinstance(v, dict):
        return " | ".join(f"{k}={x}" for k, x in v.items())
    if isinstance(v, (list, tuple)):
        return " | ".join(str(x) for x in v)
    return v


class WideMapper:
    """AP4+AP5 for wide (oneToOne) tables."""

    def __init__(
        self,
        data_dictionary: Any,
        table_name: str,
        config: AutoparserConfig,
        client: LLMClient,
    ) -> None:
        self.config = config
        self.client = client
        self.name = table_name
        self.schema = config.schema_dict(table_name)
        self.props = self.schema["properties"]
        self.dd = format_dict(data_dictionary, config)

    def create_mapping(self, save: bool = False, file_name: str = "mapping_file") -> pd.DataFrame:
        dd = self.dd
        target_fields = list(self.props)
        descs = [d for d in dd.get("source_description", pd.Series(dtype=object)) if isinstance(d, str)]

        # AP4: target field -> best source description (LLM), with difflib
        # repair of near-miss description strings (wide_mapper.py:62-114)
        field_map = self.client.map_fields(descs, target_fields)
        by_desc = {str(d): i for i, d in enumerate(dd["source_description"])}
        rows: list[dict[str, Any]] = []
        for tf in target_fields:
            desc = field_map.get(tf)
            if desc is not None and desc not in by_desc:
                desc = close_match(desc, list(by_desc))
            if desc is None:
                rows.append(
                    {
                        "target_field": tf,
                        "source_description": None,
                        "source_field": None,
                        "common_values": None,
                        "choices": None,
                    }
                )
                continue
            src = dd.iloc[by_desc[desc]]
            rows.append(
                {
                    "target_field": tf,
                    "source_description": desc,
                    "source_field": src["source_field"],
                    "common_values": src.get("common_values"),
                    "choices": src.get("choices"),
                }
            )
        mapping = pd.DataFrame(rows).set_index("target_field", drop=False)

        # AP5: source values -> target enum/boolean options (LLM), only for
        # fields that have both sides
        tuples = []
        for tf in target_fields:
            tvals = _target_values(self.props, tf)
            row = mapping.loc[tf]
            svals = row["common_values"]
            if svals is None and isinstance(row.get("choices"), dict):
                svals = list(row["choices"].values())
            if tvals is not None and isinstance(svals, list):
                tuples.append((tf, svals, tvals))
        value_maps = self.client.map_values(tuples, self.config.language)

        mapping["target_values"] = [
            _target_values(self.props, tf) for tf in mapping.index
        ]
        mapping["value_mapping"] = [
            _relabel_choices(value_maps.get(tf), mapping.loc[tf].get("choices"))
            for tf in mapping.index
        ]

        unmapped = [tf for tf in target_fields if mapping.loc[tf, "source_field"] is None]
        if unmapped:
            warnings.warn(
                f"The following schema fields have not been mapped: {unmapped}",
                UserWarning,
            )

        out = mapping.drop(columns=["target_field"])
        if "choices" in out.columns:
            out = out.drop(columns=["choices"])
        for col in ("common_values", "target_values", "value_mapping"):
            out[col] = out[col].map(_serialize)
        if save:
            name = file_name if file_name.endswith(".csv") else file_name + ".csv"
            out.to_csv(name)
        return out


class LongMapper:
    """AP4+AP5 for long (oneToMany) tables: every source field becomes one
    row assigned a variable name from the schema's discriminator enum and a
    value column (long_mapper.py:128-223)."""

    def __init__(
        self,
        data_dictionary: Any,
        table_name: str,
        config: AutoparserConfig,
        client: LLMClient,
    ) -> None:
        self.config = config
        self.client = client
        self.name = table_name
        self.schema = config.schema_dict(table_name)
        self.props = self.schema["properties"]
        if table_name not in config.long_tables:
            raise ValueError(f"no long_tables config for table {table_name!r}")
        self.lt = config.long_tables[table_name]
        if not self.props.get(self.lt.variable_col, {}).get("enum"):
            raise ValueError(
                f"variable column {self.lt.variable_col!r} needs an enum in the schema"
            )
        self.dd = format_dict(data_dictionary, config)

    def _pick_value_col(self, field_type: Any) -> str:
        """Deterministic value-column choice by source type; the reference
        delegates this to the LLM's structured output — a typed rule is
        reproducible and testable."""
        t = str(field_type or "").lower()
        for vc in self.lt.value_cols:
            if "bool" in t and "bool" in vc:
                return vc
            if t in ("number", "integer") and ("num" in vc or "int" in vc):
                return vc
        return self.lt.value_cols[-1]

    def create_mapping(self, save: bool = False, file_name: str = "mapping_file") -> pd.DataFrame:
        dd = self.dd[~self.dd["source_field"].isin(self.lt.common_cols)]
        variable_enum = [str(v) for v in self.props[self.lt.variable_col]["enum"]]
        descs = [d for d in dd.get("source_description", pd.Series(dtype=object)) if isinstance(d, str)]

        # AP4 (long form): variable enum entry -> source description
        var_map = self.client.map_fields(descs, variable_enum)
        desc_to_var = {d: v for v, d in var_map.items() if d is not None}

        rows = []
        for _, src in dd.iterrows():
            desc = src.get("source_description")
            var = desc_to_var.get(desc)
            value_col = self._pick_value_col(src.get("source_type"))
            rows.append(
                {
                    "source_field": src["source_field"],
                    "source_description": desc,
                    self.lt.variable_col: var,
                    "value_col": value_col,
                    "common_values": src.get("common_values"),
                    "choices": src.get("choices"),
                }
            )
        mapping = pd.DataFrame(rows).set_index("source_field", drop=False)

        unmapped = list(mapping[mapping[self.lt.variable_col].isna()].index)
        if unmapped:
            warnings.warn(
                f"The following fields have not been mapped to the new schema: {unmapped}",
                UserWarning,
            )

        # AP5 against each row's value column options
        tuples = []
        for sf, row in mapping.iterrows():
            tvals = _target_values(self.props, row["value_col"])
            svals = row["common_values"]
            if svals is None and isinstance(row.get("choices"), dict):
                svals = list(row["choices"].values())
            if tvals is not None and isinstance(svals, list):
                tuples.append((sf, svals, tvals))
        value_maps = self.client.map_values(tuples, self.config.language)
        mapping["value_mapping"] = [
            _relabel_choices(value_maps.get(sf), mapping.loc[sf].get("choices"))
            for sf in mapping.index
        ]

        for col, value in self.lt.common_fields.items():
            mapping[col] = value

        out = mapping.drop(columns=["source_field"])
        if "choices" in out.columns:
            out = out.drop(columns=["choices"])
        for col in ("common_values", "value_mapping"):
            out[col] = out[col].map(_serialize)
        if save:
            name = file_name if file_name.endswith(".csv") else file_name + ".csv"
            out.to_csv(name)
        return out


def create_mapping(
    data_dictionary: Any,
    table_name: str,
    config: AutoparserConfig,
    client: LLMClient,
    table_format: str = "wide",
    save: bool = False,
    file_name: str = "mapping_file",
) -> pd.DataFrame:
    """Reference interface (mapping/interface.py:21-66)."""
    cls = {"wide": WideMapper, "long": LongMapper}.get(table_format)
    if cls is None:
        raise ValueError(
            f"Invalid table format: {table_format}. Must be either 'wide' or 'long'."
        )
    return cls(data_dictionary, table_name, config, client).create_mapping(
        save=save, file_name=file_name
    )
