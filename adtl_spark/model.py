"""Pydantic models for the spec document (V1, SURVEY.md §2.10).

Eager RULE-LEVEL validation with the same discriminated-union depth as the
reference (src/adtl/adtl_pydantic.py:8-280): every mapping form — constant
string/bool, single-field rule, combinedType block — and the if-predicate
shape validate at load time with pydantic field paths (e.g.
``table.field.values``), so a malformed rule fails BEFORE compilation with
an error naming the exact spec path, not later with a compiler message.

Validation runs on the RAW document, before ref-splicing and ``for``
expansion (reference parser.py:305 calls validate_spec before expand_refs
at :316), which is why rules admit ``ref`` keys and long-table blocks
admit ``for``.

The field vocabulary and permitted value shapes ARE the behavioral
contract being matched (the reference forbids unknown rule keys), so the
accepted surface below mirrors adtl_pydantic.py exactly; the code is an
independent pydantic-v2 implementation.
"""

from __future__ import annotations

from typing import Annotated, Any, Literal, Optional, Union

from pydantic import (
    BaseModel,
    ConfigDict,
    Discriminator,
    Field,
    Tag,
    model_validator,
)

# ---------------------------------------------------------------- rule parts


class ApplySpec(BaseModel):
    """``apply`` block: named transform + positional params
    (reference adtl_pydantic.py:8-12)."""

    model_config = ConfigDict(extra="forbid")

    function: str
    params: Optional[list[Union[str, int, float, list[Any]]]] = None


class GenerateSpec(BaseModel):
    """``generate`` block: uuid5 / timestamp synthesis over source values
    (reference adtl_pydantic.py:15-19)."""

    model_config = ConfigDict(extra="forbid")

    type: Literal["uuid5", "timestamp"]
    values: list[str]


class CmpOps(BaseModel):
    """Comparison-operator object usable as a condition value: the
    ``<, >, <=, >=, ==, !=, =~`` forms (reference adtl_pydantic.py:22-31).
    ``=~`` takes a regex string; the rest take scalars."""

    model_config = ConfigDict(extra="forbid")

    # the reference types comparison scalars str|int (adtl_pydantic.py:
    # 25-30); float is a documented widening — the predicate compiler
    # casts to the literal's type, floats included
    lt: Optional[Union[str, int, float]] = Field(default=None, alias="<")
    gt: Optional[Union[str, int, float]] = Field(default=None, alias=">")
    le: Optional[Union[str, int, float]] = Field(default=None, alias="<=")
    ge: Optional[Union[str, int, float]] = Field(default=None, alias=">=")
    eq: Optional[Union[str, int, float]] = Field(default=None, alias="==")
    ne: Optional[Union[str, int, float]] = Field(default=None, alias="!=")
    regex: Optional[str] = Field(default=None, alias="=~")


# a condition maps a source field to an equality scalar or an operator form
ConditionValue = Union[CmpOps, str, int, float]


class LogicBlock(CmpOps):
    """``all`` / ``any`` / ``not`` combinators over conditions (reference
    adtl_pydantic.py:37-40).  The reference model types the combinator
    arms as DEPTH-1 field-condition maps, but its interpreter (and this
    engine's predicate compiler) recurses arbitrarily — so the arms here
    take full nested condition nodes, a strict superset."""

    all: Optional[list["IfSpec"]] = None
    any: Optional[list["IfSpec"]] = None
    not_: Optional["IfSpec"] = Field(default=None, alias="not")


def _if_tag(v: Any) -> str:
    # an ``if`` that carries all/any/not is the combinator form; anything
    # else is a {field: condition} map (reference adtl_pydantic.py:43-48)
    if isinstance(v, dict) and ("all" in v or "any" in v or "not" in v):
        return "logic"
    return "fields"


IfSpec = Annotated[
    Union[
        Annotated[dict[str, Union[str, int, float, LogicBlock]], Tag("fields")],
        Annotated[LogicBlock, Tag("logic")],
    ],
    Discriminator(_if_tag),
]

LogicBlock.model_rebuild()


# ------------------------------------------------------------------- rules


class FieldRule(BaseModel):
    """Single-field mapping rule: every key the reference admits, unknown
    keys rejected (reference adtl_pydantic.py:66-115)."""

    model_config = ConfigDict(populate_by_name=True, extra="forbid")

    # the reference requires ``field`` unconditionally (adtl_pydantic.py:
    # 69) and only reaches generate-/fieldPattern-only rules through the
    # UNVALIDATED defs escape (its validation runs before ref-splicing);
    # this engine accepts those forms inline too, so ``field`` relaxes to
    # "at least one of field / fieldPattern / generate / ref" — a strict
    # superset that still rejects a rule naming no source at all
    field: Optional[str] = None
    # the reference types mapped values str|bool|int|list
    # (adtl_pydantic.py:70) and the flag keys Literal[True]
    # (adtl_pydantic.py:98-110); this engine widens values to admit
    # float / None targets (dynamic typing maps cells to null or
    # numerics) and the flags to plain bool (False ≡ absent) — strict
    # supersets, every reference-valid spec still validates
    values: Optional[
        dict[str, Union[str, bool, int, float, list[Any], None]]
    ] = None
    description: Optional[str] = None
    source_unit: Optional["RuleValue"] = None
    unit: Optional[str] = None
    source_date: Optional[str] = None
    date: Optional[str] = None
    apply: Optional[ApplySpec] = None
    generate: Optional[GenerateSpec] = None
    fieldPattern: Optional[str] = None
    if_: Optional[IfSpec] = Field(default=None, alias="if")
    sensitive: Optional[bool] = None
    ref: Optional[str] = None
    ignoreMissingKey: Optional[bool] = None
    can_skip: Optional[bool] = None
    caseInsensitive: Optional[bool] = None
    type_: Optional[Literal["enum_list"]] = Field(default=None, alias="type")

    @model_validator(mode="after")
    def _names_a_source(self) -> "FieldRule":
        if (
            self.field is None
            and self.fieldPattern is None
            and self.generate is None
            and self.ref is None
        ):
            raise ValueError(
                "rule must name a source: one of 'field', 'fieldPattern', "
                "'generate' or 'ref' is required"
            )
        return self


class CombinedRule(BaseModel):
    """combinedType fold over several field rules
    (reference adtl_pydantic.py:118-127)."""

    model_config = ConfigDict(extra="forbid")

    combinedType: Literal[
        "list", "any", "all", "min", "max", "firstNonNull", "set"
    ]
    fields: list["RuleValue"]
    description: Optional[str] = None
    excludeWhen: Optional[
        Union[Literal["none"], Literal["false-like"], list[str]]
    ] = None


def _value_tag(v: Any) -> str:
    # constants are scalars; any dict is a field rule (reference
    # adtl_pydantic.py:136-140 admits str/bool only — numeric constants
    # are a documented WIDENING here: this engine's dynamic typing emits
    # them, the widening accepts a strict superset, and every reference
    # error case still errors)
    if isinstance(v, bool):
        return "const_bool"
    if isinstance(v, str):
        return "const_str"
    if isinstance(v, (int, float)):
        return "const_num"
    return "field_rule"


RuleValue = Annotated[
    Union[
        Annotated[str, Tag("const_str")],
        Annotated[bool, Tag("const_bool")],
        Annotated[Union[int, float], Tag("const_num")],
        Annotated[FieldRule, Tag("field_rule")],
    ],
    Discriminator(_value_tag),
]


def _rule_tag(v: Any) -> str:
    # the combinedType key discriminates fold blocks from everything else
    # (reference adtl_pydantic.py:143-146)
    if isinstance(v, dict) and "combinedType" in v:
        return "combined"
    return "single"


Rule = Annotated[
    Union[
        Annotated[RuleValue, Tag("single")],
        Annotated[CombinedRule, Tag("combined")],
    ],
    Discriminator(_rule_tag),
]

FieldRule.model_rebuild()
CombinedRule.model_rebuild()


class ForDomain(BaseModel):
    """``{range = [a, b]}`` domain form inside a ``for`` block
    (reference adtl_pydantic.py:62-63)."""

    range: Optional[list[int]] = None


class LongBlock(BaseModel):
    """One oneToMany block: attribute rules plus the ref / if / for
    escape hatches; the attribute values validate as full rules via
    pydantic extra capture (reference adtl_pydantic.py:167-173)."""

    __pydantic_extra__: dict[str, Rule] = Field(init=False)
    model_config = ConfigDict(populate_by_name=True, extra="allow")

    ref: Optional[str] = None
    if_: Optional[IfSpec] = Field(default=None, alias="if")
    for_: Optional[dict[str, Union[list[int], ForDomain]]] = Field(
        default=None, alias="for"
    )


# ------------------------------------------------------------ table metadata


class TableMeta(BaseModel):
    model_config = ConfigDict(populate_by_name=True, extra="forbid")

    kind: Literal["constant", "groupBy", "oneToOne", "oneToMany"]
    groupBy: Optional[str] = None
    aggregation: Optional[Literal["lastNotNull", "applyCombinedType"]] = None
    schema_: Optional[str] = Field(default=None, alias="schema")
    optional_fields: Optional[list[str]] = Field(
        default=None, alias="optional-fields"
    )
    common: Optional[dict[str, RuleValue]] = None
    discriminator: Optional[str] = None

    @model_validator(mode="after")
    def _group_by_needs_aggregation(self) -> "TableMeta":
        # reference adtl_pydantic.py:187-194
        if self.kind == "groupBy":
            if not self.groupBy:
                raise ValueError("groupBy key is required for 'groupBy' tables")
            if not self.aggregation:
                raise ValueError("aggregation is required for 'groupBy' tables")
        return self

    @model_validator(mode="after")
    def _one_to_many_needs_discriminator(self) -> "TableMeta":
        # reference adtl_pydantic.py:196-200
        if self.kind == "oneToMany" and not self.discriminator:
            raise ValueError("'discriminator' is required for 'oneToMany' tables")
        return self


class Header(BaseModel):
    model_config = ConfigDict(populate_by_name=True, extra="forbid")

    name: str
    description: str = ""
    tables: dict[str, TableMeta]
    defs: Optional[dict[str, Any]] = None
    include_def: Optional[list[str]] = Field(default=None, alias="include-def")
    returnUnmatched: Optional[bool] = None
    defaultDateFormat: Optional[str] = None
    skipFieldPattern: Optional[str] = None
    emptyFields: Optional[str] = None


# -------------------------------------------------------------- whole document


class SpecDocument(BaseModel):
    """Whole-document model: the header plus every other top-level key as
    a table body, dispatched by shape — list bodies are oneToMany rule
    blocks, dict bodies are wide attribute→rule maps (reference
    adtl_pydantic.py:219-253) — then cross-checked against the header's
    table set (reference adtl_pydantic.py:256-279)."""

    model_config = ConfigDict(extra="forbid")

    adtl: Header
    wide_tables: dict[str, dict[str, Rule]]
    long_tables: dict[str, list[LongBlock]]

    @model_validator(mode="before")
    @classmethod
    def _dispatch_tables(cls, doc: Any) -> Any:
        if not isinstance(doc, dict):
            return doc
        out: dict[str, Any] = {}
        if "adtl" in doc:
            out["adtl"] = doc["adtl"]
        wide: dict[str, Any] = {}
        long: dict[str, Any] = {}
        for key, body in doc.items():
            if key == "adtl":
                continue
            if isinstance(body, list):
                long[key] = body
            elif isinstance(body, dict):
                wide[key] = body
            else:
                raise ValueError(
                    f"Table {key!r} must be either a dict (constant, groupBy, "
                    "oneToOne tables) or a list (oneToMany)"
                )
        out["wide_tables"] = wide
        out["long_tables"] = long
        return out

    @model_validator(mode="after")
    def _tables_match_header(self) -> "SpecDocument":
        declared = set(self.adtl.tables)
        defined = set(self.wide_tables) | set(self.long_tables)
        missing = declared - defined
        if missing:
            raise ValueError(
                "Parser specification missing tables: " + ", ".join(sorted(missing))
            )
        extra = defined - declared
        if extra:
            raise ValueError(
                "Parser specification has tables not defined in the header: "
                + ", ".join(sorted(extra))
            )
        for table in self.long_tables:
            if self.adtl.tables[table].kind != "oneToMany":
                raise ValueError(
                    "Long format tables must be given kind 'oneToMany' in the header"
                )
        return self


def validate_document(spec: dict[str, Any]) -> None:
    """Raise pydantic.ValidationError on structural OR rule-level problems,
    with pydantic field paths naming the offending spec location."""
    SpecDocument.model_validate(spec)
