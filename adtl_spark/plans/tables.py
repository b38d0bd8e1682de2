"""Table materializers: one DataFrame plan per target table.

Reference execution walks every table spec per source row
(src/adtl/parser.py:685-732); here each table kind becomes one declarative
plan over the source DataFrame:

- ``constant``  -> single-row createDataFrame       (parser.py:536-537)
- ``oneToOne``  -> one ``select`` of compiled rules
- ``groupBy``   -> ``groupBy(key).agg(...)`` with order-aware aggregates
                   reproducing lastNotNull / applyCombinedType semantics
                   (parser.py:551-637)
- ``oneToMany`` -> ONE scan: array-of-structs -> filter -> explode
                   (vs. parser.py:516-535 which evaluates every block per
                   row).  A union of per-block filters would rescan the
                   source once per block; the explode form is a single
                   narrow pass and preserves the reference's
                   (row, block-index) output order.

File-order semantics: ``lastNotNull``/``firstNonNull``/``list`` depend on
source row order (parser.py:590, 615).  A row id is captured at read time,
before any shuffle: a plain monotonic id for single-file/non-file sources,
and a ``(file, split offset, id)`` composite struct for globbed multi-file
reads (see ``attach_row_id``) — the reference reads exactly one CSV, so the
multi-file order is this engine's extension, defined as sorted-path order.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from adtl_spark.functions import render as R
from adtl_spark.plans.compiler import RuleCompiler, Value, truthy
from adtl_spark.session import scan_parallel
from adtl_spark.spec import CompiledSpec, StrDict

ROW_ID = "__adtl_row_id__"


_CTR_MASK = (1 << 33) - 1  # monotonic id: partition index << 33 | counter


def _file_splits(df: DataFrame) -> list[tuple[int, str, int]] | None:
    """(partition index, file path, byte offset) for every split of a
    file-source DataFrame — DRIVER-ONLY introspection of the planned
    ``FilePartition``s, no Spark job.  Narrow transformations reuse the
    scan's partition objects, so this works on a projected df too.
    Returns None when the plan has no file-partitioned scan."""
    try:
        out: list[tuple[int, str, int]] = []
        for part in df._jdf.rdd().partitions():
            pid = part.index()
            for f in part.files():
                out.append((pid, str(f.filePath()), int(f.start())))
        return out or None
    except Exception:
        return None


def attach_row_id(df: DataFrame) -> DataFrame:
    """Stable per-row LONG id capturing file order; must run before any
    shuffle.

    Single file (or non-file source): ``monotonically_increasing_id`` —
    Spark's split ordering makes it consistent with file order.

    Multi-file reads need more: Spark packs splits into partitions ordered
    by SIZE, not path, so the raw id interleaves files.  The driver
    enumerates the planned splits (``_file_splits`` — plan introspection,
    zero jobs, zero extra scan), ranks them by (path, byte offset), and
    the id becomes ``split_rank << 33 | in-partition counter``:

    - only ORDER matters to every consumer (orderBy / min / max_by /
      array_sort), so ranks replace row-exact offsets and no row counting
      is needed;
    - the counter (low 33 bits of the monotonic id) keeps ascending across
      the splits of a packed partition, which preserves in-split order —
      the rank's high bits dominate between splits;
    - the id stays a plain LONG: a struct id measured ~4x slower through
      the groupBy aggregate path (struct ordering largely escapes
      codegen), and reading the ``_metadata`` column knocks the parquet
      reader off its vectorized path — both avoided.

    Per-row cost in the common (one split per partition) case is one
    ``element_at`` into a constant-folded array literal indexed by
    partition id.  Partitions packing several small files key their rows
    by (pid, file, offset) instead — only those rows pay for
    ``input_file_name``.  "File order" for a glob is defined as
    sorted-path order, each file in its own row order.
    """
    mid = F.monotonically_increasing_id()
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) <= 1:
        return df.withColumn(ROW_ID, mid)
    splits = _file_splits(df)
    if not splits:
        return df.withColumn(ROW_ID, mid)

    ranked = sorted(splits, key=lambda s: (s[1], s[2]))
    rank_of = {key: i for i, key in enumerate(ranked)}
    pid_splits: dict[int, int] = {}
    for pid, _, _ in splits:
        pid_splits[pid] = pid_splits.get(pid, 0) + 1
    multi_pids = sorted(p for p, c in pid_splits.items() if c > 1)

    # dense pid -> rank array (rank -1 marks packed partitions)
    n_pid = max(p for p, _, _ in splits) + 1
    by_pid = [-1] * n_pid
    for (pid, fp, b), r in ((k, rank_of[k]) for k in splits):
        if pid not in multi_pids:
            by_pid[pid] = r
    pid_rank = F.element_at(
        F.array(*[F.lit(r).cast("long") for r in by_pid]),
        F.spark_partition_id() + 1,
    )

    ctr = mid.bitwiseAND(F.lit(_CTR_MASK))
    if multi_pids:
        pairs: list[Column] = []
        for key, r in rank_of.items():
            if key[0] in multi_pids:
                pairs += [F.lit(f"{key[0]}|{key[1]}|{key[2]}"), F.lit(r).cast("long")]
        full_key = F.concat_ws(
            "|",
            F.spark_partition_id().cast("string"),
            F.input_file_name(),
            F.input_file_block_start().cast("string"),
        )
        full_rank = F.create_map(*pairs)[full_key]
        rank = F.when(pid_rank >= 0, pid_rank).otherwise(full_rank)
    else:
        rank = pid_rank
    # NO null-fallback wrapper here: rank can only be null if the executed
    # split layout diverges from the introspected plan (which would void
    # the ordering guarantee anyway), and a Coalesce over the
    # non-deterministic spark_partition_id was measured to keep the whole
    # query ~2.3x slower on every run (it pins the generated code on a
    # permanently-deoptimized path; without it the same plan JITs to the
    # plain-id speed after the first run)
    return df.withColumn(ROW_ID, F.shiftleft(rank, 33).bitwiseOR(ctr))


def _valid_cell(value: Value) -> Column:
    """The group-stage validity filter: cells that are null, "" or [] are
    ignored by every aggregation (parser.py:574, 600)."""
    if value.is_array:
        return value.col.isNotNull() & (F.size(value.col) > 0)
    return value.col.isNotNull() & (value.col != "")


def build_all_tables(
    spec: CompiledSpec,
    df: DataFrame,
    spark: SparkSession,
    custom_transforms: dict[str, Callable] | None = None,
    ordered_output: bool = True,
) -> dict[str, DataFrame]:
    """``ordered_output`` controls the reference-parity total order on
    groupBy tables (groups in first-encounter order).  That final sort is
    correct but costs a global range exchange; pipelines that don't need
    row-order parity (anything feeding another Spark job) should disable
    it."""
    compiler = RuleCompiler(
        spec, df.columns, custom_transforms, dtypes=dict(df.dtypes)
    )
    out: dict[str, DataFrame] = {}
    if not df.isStreaming:
        # row id BEFORE any exchange (it encodes file order), then spread a
        # low-split scan across all cores — the rule projection is the
        # engine's hot loop and must not run on one task just because the
        # local file has one row group.  ordered_output restores file order
        # per table from the row id afterwards; hashing on the unique row id
        # avoids round-robin's defensive pre-shuffle sort.
        df = scan_parallel(attach_row_id(df), by=F.col(ROW_ID))
    for table, meta in spec.tables.items():
        kind = meta.get("kind")
        if kind == "constant":
            out[table] = _constant_table(spec, table, spark)
        elif kind == "oneToMany":
            out[table] = _one_to_many_table(spec, table, df, compiler, ordered_output)
        elif meta.get("groupBy"):
            out[table] = _group_by_table(spec, table, df, compiler, ordered_output)
        else:
            out[table] = _one_to_one_table(spec, table, df, compiler, ordered_output)
    return out


def _schema_type(spec: CompiledSpec, table: str, attr: str) -> Any:
    schema = spec.schemas.get(table)
    if not schema:
        return None
    prop = schema.get("properties", {}).get(attr)
    if isinstance(prop, dict):
        return prop.get("type")
    return None


def _constant_table(spec: CompiledSpec, table: str, spark: SparkSession) -> DataFrame:
    row = {
        k: R.render_literal(v) if not isinstance(v, list) else [R.render_literal(x) for x in v]
        for k, v in spec.table_specs[table].items()
    }
    fields = spec.fieldnames[table]
    return spark.createDataFrame([tuple(row.get(f) for f in fields)], schema=_ddl(row, fields))


def _ddl(row: StrDict, fields: list[str]) -> str:
    parts = []
    for f in fields:
        t = "array<string>" if isinstance(row.get(f), list) else "string"
        parts.append(f"`{f}` {t}")
    return ", ".join(parts)


def _wide_cell(value: Value) -> Column:
    """Wide-table cells drop empty lists (parser.py:547: ``value != []``)."""
    if value.is_array:
        return F.when(F.size(value.col) > 0, value.col)
    return value.col


def _with_stage(df: DataFrame, stage: dict[str, Column]) -> DataFrame:
    """Widen df with the compiler's staging columns (combinedType sub-values
    materialized once so fold expressions reference cheap column refs)."""
    if not stage:
        return df
    return df.select(F.col("*"), *[c.alias(n) for n, c in stage.items()])


def _one_to_one_table(
    spec: CompiledSpec,
    table: str,
    df: DataFrame,
    compiler: RuleCompiler,
    ordered_output: bool = True,
) -> DataFrame:
    stage: dict[str, Column] = {}
    cols = []
    for attr in spec.fieldnames[table]:
        rule = spec.table_specs[table][attr]
        value = compiler.compile_value(
            rule, attr, _schema_type(spec, table, attr), stage=stage
        )
        cols.append(_wide_cell(value).alias(attr))
    if ROW_ID not in df.columns:  # streaming source: no row id, no ordering
        return _with_stage(df, stage).select(*cols)
    out = _with_stage(df, stage).select(F.col(ROW_ID), *cols)
    if ordered_output:
        out = out.orderBy(ROW_ID)
    return out.drop(ROW_ID)


# ---------------------------------------------------------------- groupBy kind


def _group_by_table(
    spec: CompiledSpec,
    table: str,
    df: DataFrame,
    compiler: RuleCompiler,
    ordered_output: bool = True,
) -> DataFrame:
    meta = spec.tables[table]
    group_field = meta["groupBy"]
    aggregation = meta.get("aggregation")
    table_spec = spec.table_specs[table]

    stage: dict[str, Column] = {}
    values: dict[str, Value] = {}
    row_cols: list[Column] = [F.col(ROW_ID)]
    for attr, rule in table_spec.items():
        v = compiler.compile_value(
            rule, attr, _schema_type(spec, table, attr), stage=stage
        )
        values[attr] = v
        row_cols.append(_wide_cell(v).alias(attr))
    projected = _with_stage(df, stage).select(*row_cols)

    aggs: list[Column] = [F.min(F.col(ROW_ID)).alias(ROW_ID)]
    for attr, v in values.items():
        if attr == group_field:
            continue
        rule = table_spec[attr]
        combined = (
            rule.get("combinedType")
            if isinstance(rule, dict) and aggregation == "applyCombinedType"
            else None
        )
        aggs.append(_aggregate_attr(attr, v, combined).alias(attr))

    # groups emitted in first-encounter (file) order — the reference's
    # insertion-ordered dict yields exactly this (parser.py:619-637)
    grouped = projected.groupBy(F.col(group_field)).agg(*aggs)
    if ordered_output:
        grouped = grouped.orderBy(ROW_ID)
    return grouped.select(group_field, *[a for a in values if a != group_field])


def _aggregate_attr(attr: str, value: Value, combined: str | None) -> Column:
    """One aggregate expression reproducing group_attrs semantics
    (parser.py:559-617) for a single attribute."""
    col = F.col(attr)
    valid = (
        (col.isNotNull() & (F.size(col) > 0))
        if value.is_array
        else (col.isNotNull() & (col != ""))
    )
    cell = F.when(valid, col)  # nulls are ignored by all aggregates below
    rid = F.when(valid, F.col(ROW_ID))

    if combined in ("all", "any"):
        # truthiness only over valid cells — null must stay null so the
        # bool_and/bool_or aggregate ignores it instead of folding False
        flag = F.when(cell.isNotNull(), truthy(cell, value.type_hint))
        fold = F.bool_and(flag) if combined == "all" else F.bool_or(flag)
        return R.render_bool(fold)
    if combined in ("min", "max"):
        return _dynamic_min_max(cell, value, combined, rid)
    if combined == "set":
        flat = F.flatten(F.collect_list(cell))
        return F.when(F.count(cell) > 0, F.array_sort(F.array_distinct(flat)))
    if combined == "list":
        ordered = F.array_sort(F.collect_list(F.when(valid, F.struct(F.col(ROW_ID).alias("rid"), col.alias("v")))))
        return F.when(F.count(cell) > 0, F.flatten(F.transform(ordered, lambda s: s["v"])))
    if combined == "firstNonNull":
        return F.min_by(col, rid)
    # default: lastNotNull — keep the last valid value in file order
    # (A2; reference warns on conflicting overwrites, parser.py:603-614)
    return F.max_by(col, rid)


def group_conflicts(
    spec: CompiledSpec, table: str, df: DataFrame, compiler: RuleCompiler
) -> DataFrame:
    """Verbose-mode overwrite detection (reference: parser.py:603-614 warns
    per group when a lastNotNull attribute has conflicting values).  Spark
    shape: one aggregation returning, per attribute, how many groups carry
    more than one distinct value — the actionable summary instead of a
    per-row warning stream."""
    meta = spec.tables[table]
    group_field = meta["groupBy"]
    table_spec = spec.table_specs[table]
    stage: dict[str, Column] = {}
    cols = []
    plain_attrs = []
    for attr, rule in table_spec.items():
        if attr == group_field:
            cols.append(
                compiler.compile_value(rule, attr, stage=stage).col.alias(attr)
            )
            continue
        if isinstance(rule, dict) and "combinedType" in rule:
            continue  # folds aggregate by design; only plain attrs can clash
        v = compiler.compile_value(rule, attr, stage=stage)
        plain_attrs.append(attr)
        cols.append(_wide_cell(v).alias(attr))
    projected = _with_stage(df, stage).select(*cols)
    per_group = projected.groupBy(group_field).agg(
        *[
            F.count_distinct(F.when(F.col(a) != "", F.col(a))).alias(a)
            for a in plain_attrs
        ]
    )
    counts = per_group.select(
        [
            F.sum((F.col(a) > 1).cast("long")).alias(a)
            for a in plain_attrs
        ]
    )
    schema = "attribute string, n_conflicting_groups long"
    if not plain_attrs:
        return df.sparkSession.createDataFrame([], schema)
    row = counts.collect()[0]
    rows = [(a, int(row[a] or 0)) for a in plain_attrs]
    return df.sparkSession.createDataFrame(rows, schema)


def _dynamic_min_max(
    cell: Column, value: Value, combined: str, rid: Column
) -> Column:
    """Python min()/max() over a group's dynamic values: numeric when every
    value parses as a number, lexicographic otherwise (ISO dates compare
    correctly either way).

    Numeric aggregation keeps the WINNING CELL's own canonical render
    (``str(min(7, 9.5))`` is ``"7"``) and breaks double-ties on the
    earliest row in file order — Python's keep-first-of-equals."""
    lo = combined == "min"

    def numeric_keep_render() -> Column:
        tie = rid if lo else -rid
        keyed = F.when(
            cell.isNotNull(),
            F.struct(
                cell.cast("double").alias("k"),
                tie.alias("t"),
                cell.alias("o"),
            ),
        )
        return (F.min(keyed) if lo else F.max(keyed))["o"]

    if value.type_hint == "int":
        agg = F.min(cell.cast("long")) if lo else F.max(cell.cast("long"))
        return agg.cast("string")
    if value.type_hint in ("float", "num"):
        return numeric_keep_render()
    if value.type_hint in ("str", "bool"):
        return F.min(cell) if lo else F.max(cell)
    all_int = F.bool_and(R.is_int_string(cell))
    all_num = F.bool_and(R.is_numeric_string(cell))
    as_str = F.min(cell) if lo else F.max(cell)
    as_long = F.min(cell.cast("long")) if lo else F.max(cell.cast("long"))
    return (
        F.when(all_int, as_long.cast("string"))
        .when(all_num, numeric_keep_render())
        .otherwise(as_str)
    )


# -------------------------------------------------------------- oneToMany kind


def _one_to_many_table(
    spec: CompiledSpec,
    table: str,
    df: DataFrame,
    compiler: RuleCompiler,
    ordered_output: bool = True,
) -> DataFrame:
    blocks = spec.table_specs[table]
    fieldnames = list(spec.fieldnames[table])
    for block in blocks:  # keep any extra-schema attrs (reference keeps them)
        for attr in block:
            if attr != "if" and attr not in fieldnames:
                fieldnames.append(attr)

    # decide one static type per attr across all blocks
    compiled_blocks: list[tuple[Column, dict[str, Value]]] = []
    attr_is_array: dict[str, bool] = {f: False for f in fieldnames}
    attr_mixed: dict[str, bool] = {f: False for f in fieldnames}
    seen_attr: dict[str, bool] = {f: False for f in fieldnames}
    stage: dict[str, Column] = {}
    for block in blocks:
        pred = compiler.compile_if(block["if"])
        vals: dict[str, Value] = {}
        for attr in block:
            if attr == "if":
                continue
            v = compiler.compile_value(
                block[attr], attr, _schema_type(spec, table, attr), stage=stage
            )
            vals[attr] = v
            if seen_attr[attr] and attr_is_array[attr] != v.is_array:
                attr_mixed[attr] = True
            attr_is_array[attr] = attr_is_array[attr] or v.is_array
            seen_attr[attr] = True
        compiled_blocks.append((pred, vals))

    def cell(vals: dict[str, Value], attr: str) -> Column:
        v = vals.get(attr)
        want_array = attr_is_array[attr] and not attr_mixed[attr]
        if v is None:
            t = "array<string>" if want_array else "string"
            return F.lit(None).cast(t)
        if attr_mixed[attr] and v.is_array:
            return R.render_array_python(v.col)  # mixed scalar/list attr
        return v.col

    structs = [
        F.when(pred, F.struct(*[cell(vals, a).alias(a) for a in fieldnames]))
        for pred, vals in compiled_blocks
    ]
    blocks_arr = F.filter(F.array(*structs), lambda s: s.isNotNull())
    if ROW_ID not in df.columns:  # streaming source: no row id, no ordering
        exploded = _with_stage(df, stage).select(
            F.explode(blocks_arr).alias("__row__")
        )
        return exploded.select(*[F.col(f"__row__.`{a}`").alias(a) for a in fieldnames])
    # posexplode keeps the block position so (row, block) file order can be
    # restored after the parallelizing repartition
    exploded = _with_stage(df, stage).select(
        F.col(ROW_ID), F.posexplode(blocks_arr).alias("__pos__", "__row__")
    )
    if ordered_output:
        exploded = exploded.orderBy(ROW_ID, "__pos__")
    return exploded.select(*[F.col(f"__row__.`{a}`").alias(a) for a in fieldnames])
