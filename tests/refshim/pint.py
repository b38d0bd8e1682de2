"""Linear unit conversions backed by adtl_spark's own unit table."""
import os, sys
_repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _repo not in sys.path:
    sys.path.append(_repo)
from adtl_spark.functions.units import UnknownUnitError, conversion

class UndefinedUnitError(Exception):
    pass

class _Q:
    def __init__(self, value, unit):
        self.magnitude = value
        self._unit = unit
    @property
    def m(self):
        return self.magnitude
    def to(self, target):
        try:
            scale, offset = conversion(self._unit, target)
        except (UnknownUnitError, ValueError) as e:
            raise UndefinedUnitError(str(e))
        return _Q(self.magnitude * scale + offset, target)

def Quantity(value, unit):
    return _Q(value, unit)

class UnitRegistry:
    def __call__(self, unit):
        return _Q(1.0, unit)
    Quantity = staticmethod(Quantity)
