"""Pydantic models for the spec document (V1, SURVEY.md §2.10).

The reference validates the whole document eagerly with pydantic
discriminated unions (src/adtl/adtl_pydantic.py:204-280).  These models
cover the same structural surface — header, table metadata, rule forms —
written for pydantic v2.  Rule-level detail errors (unknown source columns,
bad combinedTypes) surface later from the compiler with precise messages;
the model guards document shape.
"""

from __future__ import annotations

from typing import Any, Literal, Optional

from pydantic import BaseModel, ConfigDict, Field, model_validator


class TableMeta(BaseModel):
    model_config = ConfigDict(populate_by_name=True, extra="allow")

    kind: Literal["constant", "groupBy", "oneToOne", "oneToMany"]
    groupBy: Optional[str] = None
    aggregation: Optional[Literal["lastNotNull", "applyCombinedType"]] = None
    schema_: Optional[str] = Field(default=None, alias="schema")
    optional_fields: Optional[list[str]] = Field(default=None, alias="optional-fields")
    common: Optional[dict[str, Any]] = None
    discriminator: Optional[str] = None

    @model_validator(mode="after")
    def _group_by_needs_aggregation(self) -> "TableMeta":
        if self.kind == "groupBy" and (self.groupBy is None or self.aggregation is None):
            raise ValueError("groupBy tables need 'groupBy' and 'aggregation' keys")
        return self


class Header(BaseModel):
    model_config = ConfigDict(populate_by_name=True, extra="allow")

    name: str
    description: str = ""
    tables: dict[str, TableMeta]
    defs: dict[str, Any] = Field(default_factory=dict)
    include_def: list[str] = Field(default_factory=list, alias="include-def")
    returnUnmatched: bool = False
    defaultDateFormat: Optional[str] = None
    skipFieldPattern: Optional[str] = None
    emptyFields: Optional[str] = None


class SpecDocument(BaseModel):
    model_config = ConfigDict(extra="allow")

    adtl: Header

    @model_validator(mode="after")
    def _tables_have_bodies(self) -> "SpecDocument":
        extra = self.__pydantic_extra__ or {}
        for table, meta in self.adtl.tables.items():
            if table not in extra:
                raise ValueError(f"table {table!r} declared in header but not defined")
            body = extra[table]
            if meta.kind == "oneToMany" and not isinstance(body, list):
                raise ValueError(f"table {table!r}: oneToMany body must be a list")
            if meta.kind != "oneToMany" and not isinstance(body, dict):
                raise ValueError(f"table {table!r}: body must be a mapping")
        return self


def validate_document(spec: dict[str, Any]) -> None:
    """Raise pydantic.ValidationError on structural problems."""
    SpecDocument.model_validate(spec)
