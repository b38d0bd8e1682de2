"""strftime(3) → Spark/Java datetime pattern translation.

The adtl spec format expresses dates with C strftime directives
(reference: src/adtl/get_value.py:219-234, src/adtl/transformations.py
throughout).  Spark uses Java DateTimeFormatter patterns, so specs must be
translated once at compile time.

Two flavours:

- *parse* patterns are lenient: ``%d`` becomes ``d`` (Java single-letter
  fields accept 1-2 digits, matching strptime's tolerance of unpadded
  components such as ``8/6/2022``).
- *format* patterns are padded: ``%d`` becomes ``dd`` (strftime always
  zero-pads on output).

Known divergence (documented, not fixed): Java ``yy`` pivots two-digit years
into 2000-2099 while strptime maps 69-99 → 1969-1999.  The reference corrects
century explicitly via ``correctOldDate`` (epoch pivot), which subtracts 100
years whenever parsed-year >= epoch — that correction makes the two engines
agree for every input the pivot is designed for (see functions/transforms.py).
"""

from __future__ import annotations

# directive -> (parse_token, format_token)
_DIRECTIVES: dict[str, tuple[str, str]] = {
    "Y": ("yyyy", "yyyy"),
    "y": ("yy", "yy"),
    "m": ("M", "MM"),
    "d": ("d", "dd"),
    "H": ("H", "HH"),
    "I": ("h", "hh"),
    "M": ("m", "mm"),
    "S": ("s", "ss"),
    "f": ("SSSSSS", "SSSSSS"),
    "p": ("a", "a"),
    "b": ("MMM", "MMM"),
    "B": ("MMMM", "MMMM"),
    "a": ("EEE", "EEE"),
    "A": ("EEEE", "EEEE"),
    "j": ("D", "DDD"),
    "z": ("xx", "xx"),
    "%": ("%", "%"),
}

_ASCII_LETTERS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def strftime_to_spark(fmt: str, for_parsing: bool = True) -> str:
    """Translate a strftime(3) pattern into a Spark datetime pattern.

    Literal letters are single-quoted (Java treats bare letters as pattern
    fields); literal single quotes are doubled.
    """
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if not literal:
            return
        text = "".join(literal)
        if any(ch in _ASCII_LETTERS for ch in text):
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text.replace("'", "''"))
        literal.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            directive = fmt[i + 1]
            if directive in _DIRECTIVES:
                parse_tok, fmt_tok = _DIRECTIVES[directive]
                if directive == "%":
                    literal.append("%")
                else:
                    flush_literal()
                    out.append(parse_tok if for_parsing else fmt_tok)
                i += 2
                continue
        literal.append(ch)
        i += 1
    flush_literal()
    return "".join(out)


def has_two_digit_year(fmt: str) -> bool:
    """True when the strftime pattern contains a two-digit-year directive.

    Mirrors the reference's ``"y" in format`` guard
    (src/adtl/transformations.py:483) which keys the century pivot — note the
    reference checks the raw character, so ``%Y`` does *not* trigger it but
    ``%y`` does.
    """
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            if fmt[i + 1] == "y":
                return True
            i += 2
            continue
        if fmt[i] == "y":
            return True
        i += 1
    return False
