"""Minimal TOML emitter for generated parser specs (AP6).

The reference vendors a modified tomli-w for this job
(src/adtl/autoparser/toml_writer.py:62-117); this is an independent,
much smaller serializer covering exactly the value space a generated adtl
spec uses — strings, numbers, booleans, lists, and nested string-keyed
dicts — with the same *rendering policy*:

- small leaf dicts (e.g. ``values`` maps) render inline:
  ``{ oui = true, non = false }``
- large dicts and all table-like structures render as ``[dotted.headers]``
- lists of dicts render as ``[[array-of-table]]`` blocks

Output re-parses with ``tomllib`` and runs through ``adtl_spark.Parser``
— round-trip tested.
"""

from __future__ import annotations

import re
from typing import Any

_BARE_KEY = re.compile(r"^[A-Za-z0-9_-]+$")
_INLINE_LIMIT = 80


def _key(k: str) -> str:
    return k if _BARE_KEY.match(k) else _string(k)


def _string(s: str) -> str:
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) < 0x20 or ord(ch) == 0x7F:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _value(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return _string(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return _inline_table(v)
    raise TypeError(f"cannot serialize {type(v).__name__} to TOML")


def _inline_table(d: dict) -> str:
    if not d:
        return "{}"
    return "{ " + ", ".join(f"{_key(k)} = {_value(v)}" for k, v in d.items()) + " }"


def _fits_inline(v: Any) -> bool:
    """A dict value is rendered inline when it is a pure leaf mapping (no
    nested dicts / dict lists) and reasonably short."""
    if not isinstance(v, dict):
        return True
    if any(isinstance(x, dict) for x in v.values()):
        return False
    if any(
        isinstance(x, (list, tuple)) and any(isinstance(i, dict) for i in x)
        for x in v.values()
    ):
        return False
    try:
        return len(_inline_table(v)) <= _INLINE_LIMIT
    except TypeError:
        return False


def _is_table_array(v: Any) -> bool:
    return isinstance(v, (list, tuple)) and bool(v) and all(isinstance(x, dict) for x in v)


def _emit_table(out: list[str], table: dict, path: str) -> None:
    scalars = [
        (k, v)
        for k, v in table.items()
        if not (isinstance(v, dict) and not _fits_inline(v)) and not _is_table_array(v)
    ]
    subtables = [
        (k, v) for k, v in table.items() if isinstance(v, dict) and not _fits_inline(v)
    ]
    arrays = [(k, v) for k, v in table.items() if _is_table_array(v)]

    if path and (scalars or not (subtables or arrays)):
        out.append(f"[{path}]\n")
    for k, v in scalars:
        out.append(f"{_key(k)} = {_value(v)}\n")
    if path and scalars:
        out.append("\n")
    for k, v in subtables:
        sub = f"{path}.{_key(k)}" if path else _key(k)
        _emit_table(out, v, sub)
    for k, items in arrays:
        name = f"{path}.{_key(k)}" if path else _key(k)
        for item in items:
            out.append(f"[[{name}]]\n")
            _emit_array_member(out, item, name)
            out.append("\n")


def _emit_array_member(out: list[str], item: dict, path: str) -> None:
    # scalars first: once a [path.key] subtable header is emitted, later
    # bare keys would bind to the subtable instead of the array member
    big = [(k, v) for k, v in item.items() if isinstance(v, dict) and not _fits_inline(v)]
    big_keys = {k for k, _ in big}
    for k, v in item.items():
        if k not in big_keys:
            out.append(f"{_key(k)} = {_value(v)}\n")
    for k, v in big:
        out.append(f"\n[{path}.{_key(k)}]\n")
        for kk, vv in v.items():
            out.append(f"{_key(kk)} = {_value(vv)}\n")


def dumps(data: dict[str, Any]) -> str:
    """Serialize a spec dict to TOML text."""
    out: list[str] = []
    # top-level scalar keys first (rare for specs, but keep TOML validity:
    # scalars must precede any table header)
    _emit_table(out, data, "")
    text = "".join(out)
    return text.rstrip("\n") + "\n"


def dump(data: dict[str, Any], path: str) -> None:
    with open(path, "w", encoding="utf-8") as fp:
        fp.write(dumps(data))
