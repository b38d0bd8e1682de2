"""strftime -> Spark pattern translation edge cases."""

from adtl_spark.functions.datefmt import has_two_digit_year, strftime_to_spark


def test_basic_translation():
    assert strftime_to_spark("%Y-%m-%d") == "yyyy-M-d"
    assert strftime_to_spark("%Y-%m-%d", for_parsing=False) == "yyyy-MM-dd"
    assert strftime_to_spark("%d/%m/%Y") == "d/M/yyyy"


def test_literal_text_quoted():
    # bare letters are Java pattern fields and must be quoted
    assert strftime_to_spark("%Y year %m", for_parsing=False) == "yyyy' year 'MM"
    assert strftime_to_spark("day: %d", for_parsing=False) == "'day: 'dd"


def test_percent_escape():
    assert strftime_to_spark("%d%%%m") == "d%M"


def test_month_names_and_time():
    assert strftime_to_spark("%d %b %Y") == "d MMM yyyy"
    assert strftime_to_spark("%H:%M:%S", for_parsing=False) == "HH:mm:ss"
    assert strftime_to_spark("%I %p") == "h a"


def test_unknown_directive_kept_literal():
    # %Q is not a strftime directive; both chars flow through as literal
    out = strftime_to_spark("%Q-%Y")
    assert out.endswith("yyyy")


def test_two_digit_year_detection():
    assert has_two_digit_year("%d/%m/%y")
    assert not has_two_digit_year("%d/%m/%Y")
    # the reference's raw "y in format" check: a literal 'y' also triggers
    assert has_two_digit_year("day %d of %Y")


def test_quote_escaping():
    assert strftime_to_spark("%Y 'quoted'", for_parsing=False) == "yyyy' ''quoted'''"
