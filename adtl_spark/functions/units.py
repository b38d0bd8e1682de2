"""Unit conversion for adtl ``source_unit``/``unit`` rules (P8).

The reference converts per cell with ``pint.Quantity(float(v), src).to(dst).m``
(src/adtl/get_value.py:200-218).  pint is not needed at run time here: unit
semantics are fixed, so the factors are derived once at compile time from the
same public unit definitions pint uses (SI + pint's default registry, where
``year`` is the Julian year of 365.25 days and ``month`` is year/12).

Each unit maps to ``(dimension, scale, offset)`` such that
``si_value = value * scale + offset``; a conversion src->dst is then
``(v * s_src + o_src - o_dst) / s_dst`` — affine-safe, which plain factor
tables get wrong for °F/°C.
"""

from __future__ import annotations

# dimension, scale-to-SI, offset-to-SI
_UNITS: dict[str, tuple[str, float, float]] = {}


def _register(names: list[str], dim: str, scale: float, offset: float = 0.0) -> None:
    for name in names:
        _UNITS[name] = (dim, scale, offset)


_DAY = 86400.0
_YEAR = 365.25 * _DAY  # pint/Julian year — reference divisor in yearsElapsed
_register(["second", "seconds", "s", "sec"], "time", 1.0)
_register(["minute", "minutes", "min"], "time", 60.0)
_register(["hour", "hours", "h", "hr"], "time", 3600.0)
_register(["day", "days", "d"], "time", _DAY)
_register(["week", "weeks"], "time", 7 * _DAY)
_register(["month", "months", "mo"], "time", _YEAR / 12)
_register(["year", "years", "y", "yr"], "time", _YEAR)

_register(["kilogram", "kilograms", "kg"], "mass", 1.0)
_register(["gram", "grams", "g"], "mass", 1e-3)
_register(["milligram", "milligrams", "mg"], "mass", 1e-6)
_register(["pound", "pounds", "lb", "lbs"], "mass", 0.45359237)
_register(["ounce", "ounces", "oz"], "mass", 0.45359237 / 16)
_register(["stone", "stones"], "mass", 6.35029318)

_register(["meter", "meters", "metre", "metres", "m"], "length", 1.0)
_register(["centimeter", "centimeters", "centimetre", "centimetres", "cm"], "length", 1e-2)
_register(["millimeter", "millimeters", "mm"], "length", 1e-3)
_register(["inch", "inches", "in"], "length", 0.0254)
_register(["foot", "feet", "ft"], "length", 0.3048)

_register(["kelvin", "K"], "temperature", 1.0)
_register(["degC", "celsius", "°C"], "temperature", 1.0, 273.15)
_register(["degF", "fahrenheit", "°F"], "temperature", 5.0 / 9.0, 273.15 - 32 * 5.0 / 9.0)

_register(["liter", "liters", "litre", "litres", "L", "l"], "volume", 1.0)
_register(["milliliter", "milliliters", "mL", "ml"], "volume", 1e-3)


class UnknownUnitError(ValueError):
    pass


def conversion(source_unit: str, target_unit: str) -> tuple[float, float]:
    """Return ``(scale, offset)`` such that ``dst = src * scale + offset``.

    Raises UnknownUnitError for units outside the table and ValueError for
    dimension mismatches (the reference lets pint raise in both cases).
    """
    try:
        dim_s, s_s, o_s = _UNITS[source_unit]
    except KeyError:
        raise UnknownUnitError(f"unknown unit: {source_unit!r}") from None
    try:
        dim_t, s_t, o_t = _UNITS[target_unit]
    except KeyError:
        raise UnknownUnitError(f"unknown unit: {target_unit!r}") from None
    if dim_s != dim_t:
        raise ValueError(f"cannot convert {source_unit!r} -> {target_unit!r}")
    return s_s / s_t, (o_s - o_t) / s_t


def known_units() -> list[str]:
    return sorted(_UNITS)
