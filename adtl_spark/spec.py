"""Spec loading, validation and compile-time rewrites.

This is the driver-side "optimizer" stage of the engine: everything here
operates on the spec dictionary before any Spark plan exists.  Reference
behaviour being matched (citations into /root/reference):

- TOML/JSON loading                    src/adtl/parser.py:183-194
- ``defs``/``ref`` splicing            src/adtl/parser.py:43-57, 306-316
- ``for`` macro expansion              src/adtl/parser.py:60-125
- schema fetch + optional-fields       src/adtl/parser.py:148-176, 327-352
- date-field inference                 src/adtl/parser.py:133-145
- field-name resolution + ``common``   src/adtl/parser.py:401-420
- default-``if`` synthesis             src/adtl/parser.py:422-499
- uuid5 namespace derivation           src/adtl/parser.py:357-361

The reference synthesizes default ``if`` rules per *row* (parser.py:519-520);
here it happens exactly once, at compile time.
"""

from __future__ import annotations

import hashlib
import itertools
import json
import re
import tomllib
import uuid
from pathlib import Path
from typing import Any

StrDict = dict[str, Any]

DEFAULT_DATE_FORMAT = "%Y-%m-%d"


class SpecError(ValueError):
    pass


def read_spec_file(path: str | Path) -> StrDict:
    """Read a TOML or JSON spec document (reference: parser.py:183-194)."""
    path = Path(path)
    if path.suffix == ".json":
        return json.loads(path.read_text())
    if path.suffix == ".toml":
        with path.open("rb") as fp:
            return tomllib.load(fp)
    raise SpecError(f"unsupported spec format: {path}")


def splice_refs(fragment: Any, defs: StrDict) -> Any:
    """Recursively replace ``{"ref": name, ...overrides}`` with the named
    definition merged under the local overrides (``{**def, **local}``,
    reference: parser.py:43-57)."""
    if isinstance(fragment, dict):
        if "ref" in fragment:
            name = fragment["ref"]
            if name not in defs:
                raise SpecError(f"ref to unknown definition: {name!r}")
            merged = {**defs[name], **{k: v for k, v in fragment.items() if k != "ref"}}
            fragment = merged
        return {k: splice_refs(v, defs) for k, v in fragment.items()}
    if isinstance(fragment, list):
        return [splice_refs(item, defs) for item in fragment]
    return fragment


def _format_into(obj: Any, bindings: dict[str, Any]) -> Any:
    """``str.format``-substitute loop variables into keys and values of a
    oneToMany block (reference: parser.py:65-86)."""
    if isinstance(obj, str):
        return obj.format(**bindings)
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            key = k.format(**bindings) if isinstance(k, str) else k
            out[key] = _format_into(v, bindings)
        return out
    if isinstance(obj, list):
        return [_format_into(item, bindings) for item in obj]
    return obj


def expand_for_blocks(blocks: list[StrDict]) -> list[StrDict]:
    """Unroll ``for`` macros: cartesian product over loop variables, inclusive
    integer ranges (reference: parser.py:60-125)."""
    out: list[StrDict] = []
    for block in blocks:
        if "for" not in block:
            out.append(block)
            continue
        block = dict(block)
        for_expr = block.pop("for")
        if not isinstance(for_expr, dict):
            raise SpecError(f"'for' must be a mapping of loop vars, got {for_expr!r}")
        domains: dict[str, list[Any]] = {}
        for var, dom in for_expr.items():
            if isinstance(dom, dict) and "range" in dom:
                rng = dom["range"]
                if (
                    not isinstance(rng, list)
                    or len(rng) != 2
                    or not all(isinstance(x, int) for x in rng)
                    or rng[1] <= rng[0]
                ):
                    raise SpecError(f"bad range for loop var {var!r}: {rng!r}")
                domains[var] = list(range(rng[0], rng[1] + 1))
            elif isinstance(dom, list):
                domains[var] = dom
            else:
                raise SpecError(f"loop var {var!r} must be a list or a range")
        names = sorted(domains)
        for values in itertools.product(*(domains[n] for n in names)):
            out.append(_format_into(block, dict(zip(names, values))))
    return out


def fetch_remote_schema(url: str, timeout: float = 10.0) -> StrDict | None:
    """S5 remote schema source: fetch JSON Schema over HTTP, warn and skip
    validation on any failure (reference: parser.py:329-346 — non-200 or
    connection errors never abort the parse)."""
    import logging
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as res:
            if getattr(res, "status", 200) != 200:
                raise OSError(f"status {res.status}")
            return json.loads(res.read().decode("utf-8"))
    except Exception as e:
        logging.getLogger(__name__).warning(
            "Could not fetch schema from %s (%s), will not validate", url, e
        )
        return None


def infer_date_fields(schema: StrDict) -> list[str]:
    """Schema fields treated as dates: name contains the date patterns or has
    ``format: date`` (reference: parser.py:133-145)."""
    props = schema.get("properties", {})
    by_name = [f for f in props if f == "date" or "date_" in f or "_date" in f]
    by_format = [f for f in props if isinstance(props[f], dict) and props[f].get("format") == "date"]
    return sorted(set(by_name) | set(by_format))


def relax_schema(schema: StrDict, optional_fields: list[str] | None) -> StrDict:
    """Drop ``optional-fields`` from required lists, including inside
    oneOf/anyOf options (reference: parser.py:148-176)."""
    if not optional_fields:
        return schema
    relaxed = json.loads(json.dumps(schema))
    drop = set(optional_fields)
    relaxed["required"] = sorted(set(relaxed.get("required", [])) - drop)
    for key in ("oneOf", "anyOf"):
        options = relaxed.get(key)
        if not options or not any("required" in o for o in options):
            continue
        for option in options:
            option["required"] = sorted(set(option.get("required", [])) - drop)
        if all(all(not bool(v) for v in o.values()) for o in options):
            relaxed.pop(key)
        else:
            relaxed[key] = list(
                {json.dumps(o, sort_keys=True): o for o in options}.values()
            )
    return relaxed


def _required_of_option(option: StrDict) -> str | None:
    """First required field of a oneOf option, honouring if/then blocks
    (reference: parser.py:428-438)."""
    req = option.get("required")
    if req:
        return req[0]
    then_req = option.get("then", {}).get("required")
    if then_req:
        return then_req[0]
    return None


def synthesize_default_if(table: str, block: StrDict, schema: StrDict) -> StrDict:
    """Derive the implicit row-emission predicate for a oneToMany block that
    lacks an explicit ``if`` (reference: parser.py:422-499).

    The predicate is "any of the rule's mapped source values is present", or
    "source field is non-empty" when the rule has no value map (or ignores
    missing keys).
    """
    if "oneOf" not in schema:
        raise SpecError(
            f"table {table!r}: schema has no oneOf, cannot synthesize default if"
        )
    anchors = [_required_of_option(o) for o in schema["oneOf"]]
    if all(a is None for a in anchors):
        raise SpecError(f"table {table!r}: no required fields in schema oneOf options")
    candidates = set(a for a in anchors if a is not None) & set(block.keys())
    if not candidates:
        raise SpecError(
            f"table {table!r}: block maps none of the schema's required fields"
        )
    anchor_rule = block[candidates.pop()]

    def rule_condition(rule: StrDict) -> list[StrDict]:
        field = rule["field"]
        flags = {f: True for f in ("can_skip", "caseInsensitive") if f in rule}
        values = rule.get("values", {})
        if values and not rule.get("ignoreMissingKey", False):
            return [{field: v, **flags} for v in values]
        return [{field: {"!=": ""}, **flags}]

    if "combinedType" in anchor_rule:
        allowed = {"any", "all", "firstNonNull", "set", "list", "min", "max"}
        if anchor_rule["combinedType"] not in allowed:
            raise SpecError(f"invalid combinedType: {anchor_rule['combinedType']}")
        conditions = list(
            itertools.chain.from_iterable(
                rule_condition(r) for r in anchor_rule["fields"]
            )
        )
        if_rule: StrDict = {"any": conditions}
    else:
        flags = {
            f: True for f in ("can_skip", "caseInsensitive") if f in anchor_rule
        }
        if "values" in anchor_rule and not anchor_rule.get("ignoreMissingKey", False):
            if_rule = {
                "any": [
                    {anchor_rule["field"]: v, **flags}
                    for v in anchor_rule["values"]
                ]
            }
        else:
            if_rule = {anchor_rule["field"]: {"!=": ""}, **flags}

    out = dict(block)
    out["if"] = if_rule
    return out


class CompiledSpec:
    """A validated, fully-expanded adtl specification.

    Holds everything the plan builder needs: per-table rule dicts with all
    macros expanded, schemas, date fields, field names and header context.
    """

    def __init__(
        self,
        spec: str | Path | StrDict,
        include_defs: list[str | Path] | None = None,
    ) -> None:
        self.specfile: Path | None = None
        if isinstance(spec, (str, Path)):
            self.specfile = Path(spec)
            spec = read_spec_file(self.specfile)
        self.raw = spec
        self._validate_structure(spec)

        self.header: StrDict = spec["adtl"]
        self.name: str = self.header["name"]
        self.description: str = self.header.get("description", "")
        self.tables: StrDict = self.header["tables"]

        defs = dict(self.header.get("defs", {}))
        def_files = list(include_defs or [])
        if self.specfile is not None:
            def_files = [
                self.specfile.parent / f for f in self.header.get("include-def", [])
            ] + def_files
        for f in def_files:
            defs.update(read_spec_file(f))
        spec = splice_refs(spec, defs)

        self.table_specs: dict[str, Any] = {}
        for table in self.tables:
            body = spec[table]
            if self.tables[table].get("kind") == "oneToMany":
                body = expand_for_blocks(body)
            self.table_specs[table] = body

        self.schemas: dict[str, StrDict] = {}
        self.date_fields: list[str] = []
        for table, meta in self.tables.items():
            schema_ref = meta.get("schema")
            if not schema_ref:
                continue
            if str(schema_ref).startswith("http"):
                schema = fetch_remote_schema(str(schema_ref))
                if schema is None:
                    continue  # warn-and-skip, like the reference (S5)
            else:
                schema_path = (
                    (self.specfile.parent / schema_ref)
                    if self.specfile
                    else Path(schema_ref)
                )
                schema = json.loads(Path(schema_path).read_text())
            self.schemas[table] = relax_schema(schema, meta.get("optional-fields"))
            self.date_fields.extend(infer_date_fields(self.schemas[table]))
        self.date_fields = sorted(set(self.date_fields))

        # merge per-table `common` mappings into every oneToMany block, then
        # synthesize missing `if` predicates once (not per row).  The
        # PRE-merge block-key union feeds schema-less fieldnames below —
        # the reference computes fieldnames before merging common in
        # (parser.py:_set_field_names), so the order must come from the
        # unmerged blocks.
        premerge_keys: dict[str, set[str]] = {}
        for table, meta in self.tables.items():
            if meta.get("kind") != "oneToMany":
                continue
            common = meta.get("common", {})
            blocks = []
            keys: set[str] = set()
            for block in self.table_specs[table]:
                keys.update(block)
                block = {**block, **common}
                if "if" not in block:
                    block = synthesize_default_if(table, block, self.schemas[table])
                blocks.append(block)
            self.table_specs[table] = blocks
            premerge_keys[table] = keys

        self.fieldnames: dict[str, list[str]] = {}
        for table, meta in self.tables.items():
            if meta.get("kind") != "oneToMany":
                self.fieldnames[table] = sorted(self.table_specs[table].keys())
            elif table in self.schemas:
                self.fieldnames[table] = sorted(self.schemas[table]["properties"])
            else:
                # reference ordering for schema-less oneToMany: common keys
                # in insertion order, then the sorted pre-merge block keys —
                # INCLUDING a literal 'if' when a block spells one out (the
                # reference emits it as an always-empty CSV column).  One
                # documented deviation: a key present in BOTH common and a
                # block appears once here (the reference duplicates the CSV
                # column, which DataFrame schemas cannot express).
                ordered = list(meta.get("common", {}).keys())
                ordered += [
                    k for k in sorted(premerge_keys[table]) if k not in set(ordered)
                ]
                self.fieldnames[table] = ordered

        self.default_date_format: str = self.header.get(
            "defaultDateFormat", DEFAULT_DATE_FORMAT
        )
        self.return_unmatched: bool = bool(self.header.get("returnUnmatched", False))
        self.empty_fields = self.header.get("emptyFields")
        skip_pat = self.header.get("skipFieldPattern")
        self.skip_pattern = re.compile(skip_pat) if skip_pat else None

    # -- structure validation -------------------------------------------------

    _VALID_KINDS = {"constant", "groupBy", "oneToMany", "oneToOne"}

    def _validate_structure(self, spec: StrDict) -> None:
        if "adtl" not in spec:
            raise SpecError("spec missing required 'adtl' header")
        header = spec["adtl"]
        for key in ("name", "tables"):
            if key not in header:
                raise SpecError(f"spec header missing required key: {key!r}")
        try:
            from adtl_spark.model import validate_document

            validate_document(spec)
        except ImportError:  # pydantic unavailable: structural checks below
            pass
        except Exception as e:
            raise SpecError(f"spec validation failed: {e}") from e
        for table, meta in header["tables"].items():
            if table not in spec:
                raise SpecError(f"table {table!r} declared in header but not defined")
            kind = meta.get("kind")
            if kind not in self._VALID_KINDS:
                raise SpecError(f"table {table!r}: invalid kind {kind!r}")
            if kind == "groupBy":
                if "groupBy" not in meta or "aggregation" not in meta:
                    raise SpecError(
                        f"table {table!r}: groupBy tables need 'groupBy' and "
                        "'aggregation' keys"
                    )
            if kind == "oneToMany" and not isinstance(spec[table], list):
                raise SpecError(f"table {table!r}: oneToMany body must be a list")
            if kind != "oneToMany" and not isinstance(spec[table], dict):
                raise SpecError(f"table {table!r}: body must be a mapping")

    # -- derived context ------------------------------------------------------

    def namespace_uuid(self) -> uuid.UUID:
        """Deterministic uuid5 namespace from the spec header — byte-compatible
        with the reference (sorted-keys JSON, sha1, uuid5 of NAMESPACE_DNS;
        parser.py:357-361)."""
        digest = hashlib.sha1(
            json.dumps(self.header, sort_keys=True).encode("utf-8")
        ).hexdigest()
        return uuid.uuid5(uuid.NAMESPACE_DNS, digest)

    def is_date_field(self, attribute: str) -> bool:
        return attribute in self.date_fields

    def field_can_skip(self, field: str) -> bool:
        return bool(self.skip_pattern and self.skip_pattern.match(field))

    def spec_fields(self) -> set[str]:
        """All source fields referenced by the spec ('field' keys), for the
        `check` entry point (reference: parser.py:885-913)."""
        found: set[str] = set()

        def walk(node: Any) -> None:
            if isinstance(node, dict):
                for k, v in node.items():
                    if k == "field" and isinstance(v, str):
                        found.add(v)
                    walk(v)
            elif isinstance(node, list):
                for item in node:
                    walk(item)

        walk({t: self.table_specs[t] for t in self.tables})
        return found
