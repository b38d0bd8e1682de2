"""The adtl ``apply`` transformation surface (T1-T16 in SURVEY.md §2.7) as
native Column builders, plus the custom-transform UDF wrapper (U1/U3).

Reference implementations: src/adtl/transformations.py (row-wise Python).
Here every shipped transformation compiles to JVM-side expressions — no
Python in the hot path; only user-supplied custom transforms become UDFs.

Error-channel parity: the reference raises AdtlTransformationWarning which
``apply_function`` converts to null (or value passthrough under
``returnUnmatched``) — per-cell errors never abort the job
(src/adtl/get_value.py:88-107).  Builders receive ``fail_value`` (null, or
the original raw value) and route the reference's warning sites to it.
Sites where the reference would raise an *uncaught* exception (e.g. a bad
``currentdate`` in durationDays) yield null here instead of aborting — the
one deliberate deviation, documented per builder.
"""

from __future__ import annotations

import warnings
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adtl_spark.functions import render as R
from adtl_spark.functions.datefmt import has_two_digit_year, strftime_to_spark

ISO = "%Y-%m-%d"


def _lit(p: Any) -> Column:
    """Params are either spec literals or already-resolved $field Columns."""
    return p if isinstance(p, Column) else F.lit(p)

def _is_col(p: Any) -> bool:
    return isinstance(p, Column)


def _empty(col: Column) -> Column:
    "value in [None, ''] — the universal null-tolerance guard"
    col = col.cast("string")
    return col.isNull() | (col == "")


def _parse_ts(col: Column, strf_fmt: str) -> Column:
    "strptime -> timestamp, null on failure"
    pattern = strftime_to_spark(strf_fmt, for_parsing=True)
    return F.try_to_timestamp(F.nullif(col, F.lit("")), F.lit(pattern))


def _pivot_century(ts: Column, epoch: Any, strf_fmt: str) -> Column:
    """correctOldDate's century pivot: parsed year >= epoch with a two-digit
    year directive in the format -> subtract 100 years
    (reference: transformations.py:446-489)."""
    if not has_two_digit_year(strf_fmt):
        return ts
    epoch_col = _lit(epoch).cast("double")
    return F.when(
        F.year(ts).cast("double") >= epoch_col, F.add_months(ts, -1200)
    ).otherwise(ts)


def _iso_offset_render(naive_ts: Column, tz: Any) -> Column:
    """Render a wall-clock timestamp as Python ``datetime.isoformat`` with
    the zone's UTC offset at that instant (DST-aware), seconds precision."""
    tz_col = _lit(tz)
    utc_instant = F.to_utc_timestamp(naive_ts, tz_col)
    offset = naive_ts.cast("long") - utc_instant.cast("long")
    sign = F.when(offset < 0, F.lit("-")).otherwise(F.lit("+"))
    abs_off = F.abs(offset)
    hh = F.lpad((abs_off / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(((abs_off % 3600) / 60).cast("int").cast("string"), 2, "0")
    return F.concat(
        F.date_format(naive_ts, "yyyy-MM-dd'T'HH:mm:ss"), sign, hh, F.lit(":"), mm
    )


# --------------------------------------------------------------------------
# builders — each returns (column, type_hint, is_array)

BuildResult = tuple[Column, str, bool]


def t_is_not_null(value: Column, params: list, fail: Column) -> BuildResult:
    return R.render_bool(~_empty(value)), "bool", False


def t_text_if_not_null(value: Column, params: list, fail: Column) -> BuildResult:
    return_val = params[0]
    rendered = (
        return_val
        if _is_col(return_val)
        else F.lit(R.render_literal(return_val))
    )
    return F.when(~_empty(value), rendered), "str", False


def t_word_substitute_set(value: Column, params: list, fail: Column) -> BuildResult:
    branches = []
    for pair in params:
        if _is_col(pair) or len(pair) != 2 or any(_is_col(x) for x in pair):
            raise ValueError("wordSubstituteSet: params item not a (word, sub) pair")
        word, subst = pair
        branches.append(
            F.when(value.rlike(r"(?i)\b" + word + r"\b"), F.lit(subst))
        )
    matches = F.array_sort(
        F.array_distinct(F.filter(F.array(*branches), lambda x: x.isNotNull()))
    )
    no_match = F.size(matches) == 0
    if _FAIL_IS_PASSTHROUGH.get():
        # returnUnmatched: unmatched values pass through as the raw string, so
        # the whole column is stringly-rendered (mixed-type cell parity with
        # the reference's list-or-str cells)
        rendered = (
            F.when(_empty(value), F.lit(None).cast("string"))
            .when(~no_match, R.render_array_python(matches))
            .otherwise(fail)
        )
        return rendered, "str", False
    # no match on a non-empty value warns -> null; empty value -> None
    result = F.when(_empty(value) | no_match, F.lit(None).cast("array<string>")).otherwise(
        matches
    )
    return result, "str", True


def t_get_float(value: Column, params: list, fail: Column) -> BuildResult:
    set_decimal = params[0] if len(params) > 0 else None
    separator = params[1] if len(params) > 1 else None
    cleaned = F.regexp_replace(value, r'^"+|"+$', "")
    cleaned = F.regexp_replace(cleaned, " ", "")
    if set_decimal and set_decimal != ".":
        # convert the LAST decimal-separator occurrence into a dot
        # (partition splits on the last instance)
        esc = _re_escape(set_decimal)
        cleaned = F.when(
            cleaned.contains(set_decimal),
            F.regexp_replace(cleaned, esc + r"(?=[^" + esc + r"]*$)", "."),
        ).otherwise(F.concat(cleaned, F.lit(".")))
    if separator:
        if separator != ".":
            cleaned = F.regexp_replace(cleaned, _re_escape(separator), "")
        else:
            # thousands dot: drop every dot except the last
            cleaned = F.regexp_replace(cleaned, r"\.(?=.*\.)", "")
    num_pat = r"[-+]?\d*\.?\d+"
    n_matches = F.size(F.regexp_extract_all(cleaned, F.lit("(" + num_pat + ")")))
    single = F.regexp_extract(cleaned, "(" + num_pat + ")", 1)
    result = (
        F.when(_empty(value), F.lit(None).cast("string"))
        .when(n_matches == 1, R.render_double(single))
        .when(R.is_float_string(cleaned), R.render_double(cleaned))
        .otherwise(F.nullif(cleaned, F.lit("")))
    )
    return result, "dynamic", False


def _re_escape(s: str) -> str:
    import re

    return re.escape(s)


def t_percentage(value: Column, params: list, fail: Column) -> BuildResult:
    d = value.cast("double")
    result = (
        F.when(~R.is_float_string(value), value)
        .when(d > 1, R.render_double(d))
        .otherwise(R.render_double(d * 100))
    )
    return F.when(_empty(value), F.lit(None).cast("string")).otherwise(result), "float", False


def t_years_elapsed(value: Column, params: list, fail: Column) -> BuildResult:
    currentdate = _lit(params[0])
    epoch = params[1]
    bd_format = params[2] if len(params) > 2 else ISO
    cd_format = params[3] if len(params) > 3 else ISO
    bd_raw = _parse_ts(value, bd_format)
    bd = _pivot_century(bd_raw, epoch, bd_format)
    cd = _parse_ts(currentdate, cd_format)
    years = F.datediff(cd, bd) / F.lit(365.25)  # pint: Julian year = 365.25 d
    result = (
        F.when(_empty(value) | _empty(currentdate), F.lit(None).cast("string"))
        .when(bd_raw.isNull(), fail)  # correctOldDate warning site
        .when(cd.isNull(), F.lit(None).cast("string"))  # reference: uncaught
        .otherwise(R.render_double(years))
    )
    return result, "float", False


def t_duration_days(value: Column, params: list, fail: Column) -> BuildResult:
    currentdate = _lit(params[0])
    fmt = params[1] if len(params) > 1 else ISO
    sd = _parse_ts(value, fmt)
    cd = _parse_ts(currentdate, fmt)
    result = (
        F.when(_empty(value) | _empty(currentdate), F.lit(None).cast("string"))
        .when(sd.isNull() | cd.isNull(), F.lit(None).cast("string"))
        .otherwise(F.datediff(cd, sd).cast("string"))
    )
    return result, "int", False


def _shift_days(ts: Column, days: Column, sign: int) -> Column:
    seconds = (days * 86400).cast("long") * sign
    return F.timestamp_seconds(ts.cast("long") + seconds)


def t_start_date(value: Column, params: list, fail: Column) -> BuildResult:
    duration = _lit(params[0])
    ed = _parse_ts(value, ISO)
    shifted = _shift_days(ed, duration.cast("double"), -1)
    result = F.when(
        _empty(value) | _empty(duration) | ed.isNull() | ~R.is_float_string(duration),
        F.lit(None).cast("string"),
    ).otherwise(F.date_format(shifted, "yyyy-MM-dd"))
    return result, "str", False


def t_end_date(value: Column, params: list, fail: Column) -> BuildResult:
    duration = _lit(params[0])
    fmt = params[1] if len(params) > 1 else ISO
    sd = _parse_ts(value, fmt)
    shifted = _shift_days(sd, duration.cast("double"), +1)
    result = F.when(
        _empty(value) | _empty(duration) | sd.isNull() | ~R.is_float_string(duration),
        F.lit(None).cast("string"),
    ).otherwise(F.date_format(shifted, strftime_to_spark(fmt, for_parsing=False)))
    return result, "str", False


def t_make_date(value: Column, params: list, fail: Column) -> BuildResult:
    month, day = _lit(params[0]), _lit(params[1])
    year = value
    ints_ok = (
        R.is_int_string(year) & R.is_int_string(month) & R.is_int_string(day)
    )
    # make_date yields null on invalid components under non-ANSI semantics
    # (the engine session guarantees ANSI off); try_make_date does not exist
    # as a PySpark function wrapper
    made = F.make_date(year.cast("int"), month.cast("int"), day.cast("int"))
    result = (
        F.when(_empty(year) | _empty(month) | _empty(day), F.lit(None).cast("string"))
        .when(~ints_ok | made.isNull(), fail)  # warning sites
        .otherwise(F.date_format(made, "yyyy-MM-dd"))
    )
    return result, "str", False


def t_make_datetime_from_seconds(value: Column, params: list, fail: Column) -> BuildResult:
    time_seconds, date_format_, timezone_ = params[0], params[1], params[2]
    secs = _lit(time_seconds)
    parsed = _parse_ts(value, date_format_)
    with_time = F.timestamp_seconds(
        parsed.cast("long")
        + (secs.cast("long") - secs.cast("long") % 3600)  # whole hours
        + ((secs.cast("long") % 3600) / 60).cast("long") * 60  # whole minutes
    )
    result = (
        F.when(_empty(value), F.lit(None).cast("string"))
        .when(parsed.isNull(), fail)  # warning site
        .when(_empty(secs.cast("string")), F.date_format(parsed, "yyyy-MM-dd"))
        .otherwise(_iso_offset_render(with_time, timezone_))
    )
    return result, "str", False


def t_make_datetime(value: Column, params: list, fail: Column) -> BuildResult:
    time_24hr, date_format_, timezone_ = params[0], params[1], params[2]
    tm = _lit(time_24hr)
    parsed = _parse_ts(value, date_format_)
    tm_ts = F.try_to_timestamp(F.nullif(tm, F.lit("")), F.lit("H:m"))
    combined = F.timestamp_seconds(
        parsed.cast("long") + F.hour(tm_ts) * 3600 + F.minute(tm_ts) * 60
    )
    result = (
        F.when(_empty(value), F.lit(None).cast("string"))
        .when(parsed.isNull(), fail)  # warning site
        .when(_empty(tm), F.date_format(parsed, "yyyy-MM-dd"))
        .when(tm_ts.isNull(), F.lit(None).cast("string"))  # reference: uncaught
        .otherwise(_iso_offset_render(combined, timezone_))
    )
    return result, "str", False


def t_split_date(value: Column, params: list, fail: Column) -> BuildResult:
    option = params[0]
    epoch = params[1]
    fmt = params[2] if len(params) > 2 else ISO
    parsed = _parse_ts(value, fmt)
    pivoted = _pivot_century(parsed, epoch, fmt)
    extractors = {"year": F.year, "month": F.month, "day": F.dayofmonth}
    if not isinstance(option, str) or option not in extractors:
        return fail, "int", False  # invalid option warning site
    component = extractors[option](pivoted)
    result = (
        F.when(_empty(value), F.lit(None).cast("string"))
        .when(parsed.isNull(), fail)
        .otherwise(component.cast("string"))
    )
    return result, "int", False


def _first_truthy(currentdate: Any) -> Column:
    """A list-valued currentdate param is a hierarchy: first truthy entry
    (reference: transformations.py:379-381)."""
    if isinstance(currentdate, list):
        return F.coalesce(
            *[F.nullif(_lit(c), F.lit("")) for c in currentdate],
            F.lit(None).cast("string"),
        )
    return _lit(currentdate)


def _start_shifted(
    value: Column, params: list
) -> tuple[Column, Column, str, Column]:
    """Shared startYear/startMonth machinery: resolve the anchor date and
    shift it back by the duration.  Returns (duration_ok, shifted_ts,
    duration_type, anchor_ts)."""
    currentdate = _first_truthy(params[0])
    epoch = params[1]
    dateformat = params[2] if len(params) > 2 else ISO
    duration_type = params[3] if len(params) > 3 else "years"
    provide_month_day = params[4] if len(params) > 4 else False

    if provide_month_day:
        month, day = provide_month_day
        cd = F.make_date(
            currentdate.cast("int"), _lit(month).cast("int"), _lit(day).cast("int")
        ).cast("timestamp")
    else:
        cd = _pivot_century(_parse_ts(currentdate, dateformat), epoch, dateformat)

    d = value.cast("double")
    ok = R.is_float_string(value) & currentdate.isNotNull()
    if duration_type == "years":
        shifted = F.add_months(cd, (-12 * F.floor(d)).cast("int"))
    elif duration_type == "months":
        shifted = F.add_months(cd, (-F.floor(d)).cast("int"))
    else:  # days
        shifted = _shift_days(cd, d, -1)
    return ok, shifted.cast("timestamp"), duration_type, cd


def t_start_year(value: Column, params: list, fail: Column) -> BuildResult:
    ok, shifted, duration_type, cd = _start_shifted(value, params)
    if duration_type == "years":
        # cd.year - floor(duration): identical to the shifted year
        out = F.year(shifted)
    else:
        out = F.year(shifted)
    result = (
        F.when(_empty(value), F.lit(None).cast("string"))
        .when(~ok | cd.isNull(), F.lit(None).cast("string"))
        .otherwise(out.cast("string"))
    )
    return result, "int", False


def t_start_month(value: Column, params: list, fail: Column) -> BuildResult:
    ok, shifted, duration_type, cd = _start_shifted(value, params)
    if duration_type == "years":
        # reference startMonth has no 'years' branch -> implicit None
        return F.lit(None).cast("string"), "int", False
    result = (
        F.when(_empty(value), F.lit(None).cast("string"))
        .when(~ok | cd.isNull(), F.lit(None).cast("string"))
        .otherwise(F.month(shifted).cast("string"))
    )
    return result, "int", False


def t_correct_old_date(value: Column, params: list, fail: Column) -> BuildResult:
    epoch = params[0]
    fmt = params[1]
    parsed = _parse_ts(value, fmt)
    pivoted = _pivot_century(parsed, epoch, fmt)
    result = (
        F.when(_empty(value), F.lit(None).cast("string"))
        .when(parsed.isNull(), fail)  # warning site
        .otherwise(F.date_format(pivoted, "yyyy-MM-dd"))
    )
    return result, "str", False


_BUILTINS: dict[str, Callable[[Column, list, Column], BuildResult]] = {
    "isNotNull": t_is_not_null,
    "textIfNotNull": t_text_if_not_null,
    "wordSubstituteSet": t_word_substitute_set,
    "getFloat": t_get_float,
    "Percentage": t_percentage,
    "yearsElapsed": t_years_elapsed,
    "durationDays": t_duration_days,
    "startDate": t_start_date,
    "endDate": t_end_date,
    "makeDate": t_make_date,
    "makeDateTimeFromSeconds": t_make_datetime_from_seconds,
    "makeDateTime": t_make_datetime,
    "splitDate": t_split_date,
    "startYear": t_start_year,
    "startMonth": t_start_month,
    "correctOldDate": t_correct_old_date,
}


class _PassthroughFlag:
    """Whether fail_value is a passthrough (returnUnmatched) — set by
    build_transform for builders whose output shape depends on it."""

    def __init__(self) -> None:
        self._value = False

    def get(self) -> bool:
        return self._value

    def set(self, value: bool) -> None:
        self._value = value


_FAIL_IS_PASSTHROUGH = _PassthroughFlag()


def build_transform(
    name: str,
    value: Column,
    params: list,
    fail_value: Column,
    custom_transforms: dict[str, Callable] | None = None,
    fail_is_passthrough: bool = False,
) -> tuple[Column, str, bool]:
    """Dispatch an ``apply`` rule to a native builder, falling back to a UDF
    wrapper for user-supplied transforms (U1,
    reference: parser.py:197-226)."""
    custom_transforms = custom_transforms or {}
    _FAIL_IS_PASSTHROUGH.set(fail_is_passthrough)
    if name in custom_transforms:
        return _wrap_custom(custom_transforms[name], value, params, fail_value)
    if name in _BUILTINS:
        return _BUILTINS[name](value, params, fail_value)
    raise AttributeError(
        f"Error using a data transformation: Function {name} has not been defined."
    )


class AdtlTransformationWarning(UserWarning):
    """Raised by custom transformations to signal a per-cell failure
    (name-compatible with the reference's error channel)."""


def _py_render(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, (list, tuple, set)):
        return str(list(v))
    return str(v)


def _wrap_custom(
    fn: Callable, value: Column, params: list, fail_value: Column
) -> tuple[Column, str, bool]:
    """User transform -> Arrow-batched pandas UDF.  Column params ($field)
    are passed as UDF arguments; literals are closed over.  The function
    itself is still scalar Python (the reference contract), but data moves
    in Arrow batches instead of per-row pickling.  The
    AdtlTransformationWarning channel maps to (failed, value) so the caller
    can route to fail_value."""
    import pandas as pd

    col_params = [p for p in params if _is_col(p)]
    spec: list[tuple[bool, Any]] = [(_is_col(p), p) for p in params]
    out_type = T.StructType(
        [
            T.StructField("failed", T.BooleanType()),
            T.StructField("value", T.StringType()),
        ]
    )

    def run(*series):
        values = series[0]
        failed = []
        rendered = []
        with warnings.catch_warnings():
            warnings.simplefilter("error", category=AdtlTransformationWarning)
            for i in range(len(values)):
                args = []
                it = iter(series[1:])
                for is_c, p in spec:
                    args.append(next(it).iloc[i] if is_c else p)
                try:
                    out = fn(values.iloc[i], *args)
                    failed.append(False)
                    rendered.append(_py_render(out))
                except AdtlTransformationWarning:
                    failed.append(True)
                    rendered.append(None)
        return pd.DataFrame({"failed": failed, "value": rendered})

    # variadic signature defeats type-hint inference; pass the eval type
    # explicitly (SCALAR pandas UDF)
    run_udf = F.pandas_udf(run, returnType=out_type, functionType=F.PandasUDFType.SCALAR)
    res = run_udf(value, *col_params)
    return (
        F.when(res["failed"], fail_value).otherwise(res["value"]),
        "dynamic",
        False,
    )
