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
- :class:`OpenAICompatClient` — adapter over an ``openai``-style SDK with
  structured outputs (``beta.chat.completions.parse``), prompts and
  response models matching the reference (openai.py:26-160,
  data_structures.py:1-40).  The SDK object is injectable, so the wiring
  is fully testable offline with a fake client — the reference tests mock
  the identical seam (tests/test_autoparser/test_openai.py monkeypatches
  ``client.beta.chat.completions.parse``).
- :class:`GeminiCompatClient` — same three calls over a
  ``google-genai``-style SDK (``client.models.generate_content`` with a
  JSON response schema), mirroring the reference's second provider
  (gemini.py:1-126).  Also injectable/offline-testable.

:func:`make_llm_client` selects a provider by name the way the reference's
``llm_provider`` argument does (dict_writer.py / create_mapping entry
points).
"""

from __future__ import annotations

import difflib
import json
import re
from dataclasses import dataclass, field
from typing import Any, Iterable, Protocol

from pydantic import BaseModel


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


# Structured-output response models, the same shapes the reference binds
# its completions to (data_structures.py:1-40).


class SingleField(BaseModel):
    field_name: str
    translation: str


class ColumnDescriptionRequest(BaseModel):
    field_descriptions: list[SingleField]


class SingleMapping(BaseModel):
    target_field: str
    source_description: str | None


class MappingRequest(BaseModel):
    targets_descriptions: list[SingleMapping]


class ValueMapping(BaseModel):
    source_value: str
    target_value: str | None


class FieldMapping(BaseModel):
    field_name: str
    mapped_values: list[ValueMapping]


class ValuesRequest(BaseModel):
    values: list[FieldMapping]


def _definitions_prompt(headers: list[str], language: str) -> tuple[str, str]:
    """(system, user) for AP2 header translation (reference openai.py:26-45)."""
    return (
        "You are an expert at structured data extraction. "
        "The following is a list of headers from a data file in "
        f"{language}, some containing shortened words or abbreviations. "
        "Translate them to english. "
        "Return a list of (original header, translation) pairs, "
        "using the given structure.",
        f"{headers}",
    )


def _fields_prompt(
    source_descriptions: list[str], target_fields: list[str]
) -> tuple[str, str]:
    """(system, user) for AP4 field matching (reference openai.py:51-86)."""
    return (
        "You are an expert at structured data extraction. "
        "You will be given two lists of phrases, one is the headers "
        "for a target data file, and the other a set of descriptions "
        "for columns of source data. "
        "Match each target header to the best matching source "
        "description, but match a header to None if a good match does "
        "not exist. "
        "Return the matched target headers and source descriptions "
        "using the provided structure.",
        f"These are the target headers: {target_fields}\n"
        f"These are the source descriptions: {source_descriptions}",
    )


def _values_prompt(values: list, language: str) -> tuple[str, str]:
    """(system, user) for AP5 value matching (reference openai.py:101-146)."""
    return (
        "You are an expert at structured data extraction. "
        "You will be given a list of tuples, where each tuple contains "
        "three sets of string values. "
        "The first set contains field names for a dataset."
        "The second set contains values from a source dataset in "
        f"{language}, and the third set contains target values for an "
        "english-language transformed dataset. "
        "Match all the values in the second set to the appropriate "
        "values in the third set. "
        "Return a list of dictionaries, where each dictionary contains "
        "the field name as a key, and a dictionary containing "
        "source values as keys, and the target text as values, "
        "as the values, using the provided structure.",
        f"These are the field, source, target value sets: {values}",
    )


def _descriptions_to_dict(parsed: ColumnDescriptionRequest) -> dict[str, str]:
    return {f.field_name: f.translation for f in parsed.field_descriptions}


def _mappings_to_dict(parsed: MappingRequest) -> dict[str, str | None]:
    return {m.target_field: m.source_description for m in parsed.targets_descriptions}


def _values_to_dict(parsed: ValuesRequest) -> dict[str, dict[str, str | None]]:
    return {
        fm.field_name: {v.source_value: v.target_value for v in fm.mapped_values}
        for fm in parsed.values
    }


class OpenAICompatClient:
    """Adapter for an ``openai``-SDK-style client with structured outputs.

    Every method issues one ``beta.chat.completions.parse`` call bound to
    the matching response model and coerces the parsed structure into the
    plain-dict protocol above; prompts mirror the reference
    (openai.py:26-160).  Pass ``client=`` to inject any object with that
    method (a fake in tests, an Azure/compat endpoint in production) —
    without it the ``openai`` package is imported, which this container
    does not ship.
    """

    VALID_MODELS = ["gpt-4o-mini", "gpt-4o", "o1", "o3-mini"]

    def __init__(
        self,
        api_key: str | None = None,
        model: str = "gpt-4o-mini",
        client: Any | None = None,
    ) -> None:
        if client is None:  # pragma: no cover - no SDK in this container
            try:
                from openai import OpenAI  # type: ignore
            except ImportError as e:
                raise ImportError(
                    "OpenAICompatClient requires the 'openai' package (or an "
                    "injected client=); install it or use MockLLMClient / "
                    "your own LLMClient implementation"
                ) from e
            client = OpenAI(api_key=api_key)
            if model not in self.VALID_MODELS:
                raise ValueError(
                    f"Unsupported OpenAI model. Must be one of {self.VALID_MODELS}."
                )
        self._client = client
        self._model = model

    def _parse(self, system: str, user: str, response_format: type) -> Any:
        completion = self._client.beta.chat.completions.parse(
            model=self._model,
            messages=[
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ],
            response_format=response_format,
        )
        return completion.choices[0].message.parsed

    def get_definitions(self, headers: list[str], language: str) -> dict[str, str]:
        system, user = _definitions_prompt(headers, language)
        return _descriptions_to_dict(
            self._parse(system, user, ColumnDescriptionRequest)
        )

    def map_fields(
        self, source_descriptions: list[str], target_fields: list[str]
    ) -> dict[str, str | None]:
        system, user = _fields_prompt(source_descriptions, target_fields)
        return _mappings_to_dict(self._parse(system, user, MappingRequest))

    def map_values(
        self,
        value_tuples: Iterable[tuple[str, list[str], list[str]]],
        language: str,
    ) -> dict[str, dict[str, str | None]]:
        system, user = _values_prompt(list(value_tuples), language)
        return _values_to_dict(self._parse(system, user, ValuesRequest))


class GeminiCompatClient:
    """Adapter for a ``google-genai``-SDK-style client, the reference's
    second provider (gemini.py:1-126): each call is one
    ``client.models.generate_content`` with a JSON mime type and a
    response schema, validated back through the same pydantic models.
    ``client=`` injects a fake/offline object exactly as with
    :class:`OpenAICompatClient`.
    """

    VALID_MODELS = [
        "gemini-2.0-flash",
        "gemini-2.0-flash-lite",
        "gemini-2.5-flash-lite",
        "gemini-2.5-flash",
        "gemini-2.5-pro",
    ]

    def __init__(
        self,
        api_key: str | None = None,
        model: str = "gemini-2.5-flash",
        client: Any | None = None,
    ) -> None:
        if client is None:  # pragma: no cover - no SDK in this container
            try:
                from google import genai  # type: ignore
            except ImportError as e:
                raise ImportError(
                    "GeminiCompatClient requires the 'google-genai' package "
                    "(or an injected client=); install it or use "
                    "MockLLMClient / your own LLMClient implementation"
                ) from e
            client = genai.Client(api_key=api_key)
            if model not in self.VALID_MODELS:
                raise ValueError(
                    f"Unsupported Gemini model. Must be one of {self.VALID_MODELS}."
                )
        self._client = client
        self._model = model

    def _generate(self, system: str, user: str, response_schema: type) -> Any:
        result = self._client.models.generate_content(
            model=self._model,
            contents=[system, user],
            config={
                "response_mime_type": "application/json",
                "response_schema": response_schema,
            },
        )
        return response_schema.model_validate(json.loads(result.text))

    def get_definitions(self, headers: list[str], language: str) -> dict[str, str]:
        system, user = _definitions_prompt(headers, language)
        return _descriptions_to_dict(
            self._generate(system, user, ColumnDescriptionRequest)
        )

    def map_fields(
        self, source_descriptions: list[str], target_fields: list[str]
    ) -> dict[str, str | None]:
        system, user = _fields_prompt(source_descriptions, target_fields)
        return _mappings_to_dict(self._generate(system, user, MappingRequest))

    def map_values(
        self,
        value_tuples: Iterable[tuple[str, list[str], list[str]]],
        language: str,
    ) -> dict[str, dict[str, str | None]]:
        system, user = _values_prompt(list(value_tuples), language)
        return _values_to_dict(self._generate(system, user, ValuesRequest))


_PROVIDERS = {
    "openai": OpenAICompatClient,
    "gemini": GeminiCompatClient,
}


def make_llm_client(
    provider: str,
    api_key: str | None = None,
    model: str | None = None,
    client: Any | None = None,
    glossary: dict[str, str] | None = None,
) -> LLMClient:
    """Provider selection by name, the reference's ``llm_provider``
    argument (dict_writer.py:39): ``"openai"``, ``"gemini"``, or
    ``"mock"`` (offline, deterministic)."""
    if provider == "mock":
        return MockLLMClient(glossary=glossary or {})
    try:
        cls = _PROVIDERS[provider]
    except KeyError:
        raise ValueError(
            f"unknown LLM provider {provider!r}; expected one of "
            f"{sorted([*_PROVIDERS, 'mock'])}"
        ) from None
    kwargs: dict[str, Any] = {"api_key": api_key, "client": client}
    if model is not None:
        kwargs["model"] = model
    return cls(**kwargs)


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
