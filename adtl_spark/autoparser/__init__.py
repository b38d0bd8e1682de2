"""autoparser subsystem (SURVEY.md §2.11): the build-time pipeline that
profiles a dataset, maps it to a target schema with a pluggable LLM
client, and emits a runnable TOML spec.

Stage map (reference: src/adtl/autoparser/):

1. AP1 ``create_dict`` / ``infer_dictionary`` — distributed Spark
   profiling of the dataset into a data dictionary (the only stage that
   touches data; everything downstream is driver-side metadata work).
2. AP2 ``generate_descriptions`` — LLM header translation.
3. AP3 ``format_dict`` — user-dictionary normalization incl. ``"1=a, 2=b"``
   choices parsing.
4. AP4/AP5 ``create_mapping`` (``WideMapper``/``LongMapper``) — LLM field
   and value mapping into the intermediate mapping table.
5. AP6 ``create_parser`` (``ParserGenerator``) — mapping -> TOML spec with
   ref/def dedupe, executable by ``adtl_spark.Parser``.

LLM calls go through the :class:`~adtl_spark.autoparser.llm.LLMClient`
protocol; :class:`~adtl_spark.autoparser.llm.MockLLMClient` is the
deterministic offline implementation used in tests (the reference mocks
its OpenAI/Gemini clients the same way).
"""

from adtl_spark.autoparser.config import AutoparserConfig, LongTableConfig, load_config
from adtl_spark.autoparser.dictionary import (
    create_dict,
    format_dict,
    generate_descriptions,
    infer_dictionary,
    read_tabular,
)
from adtl_spark.autoparser.llm import (
    LLMClient,
    MockLLMClient,
    OpenAICompatClient,
    close_match,
)
from adtl_spark.autoparser.make_toml import (
    LongTableParser,
    ParserGenerator,
    WideTableParser,
    create_parser,
    generate_spec_skeleton,
    parse_mapped_values,
)
from adtl_spark.autoparser.mapping import LongMapper, WideMapper, create_mapping
from adtl_spark.autoparser.toml_writer import dump, dumps

__all__ = [
    "AutoparserConfig",
    "LongTableConfig",
    "load_config",
    "create_dict",
    "format_dict",
    "generate_descriptions",
    "infer_dictionary",
    "read_tabular",
    "LLMClient",
    "MockLLMClient",
    "OpenAICompatClient",
    "close_match",
    "WideTableParser",
    "LongTableParser",
    "ParserGenerator",
    "create_parser",
    "generate_spec_skeleton",
    "parse_mapped_values",
    "WideMapper",
    "LongMapper",
    "create_mapping",
    "dump",
    "dumps",
]
