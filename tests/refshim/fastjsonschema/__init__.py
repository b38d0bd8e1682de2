"""No-op validator: differential tests run with skip_validation=True."""
class JsonSchemaValueException(Exception):
    def __init__(self, message="", *a, **k):
        super().__init__(message)
        self.message = message
def compile(schema):
    return lambda value: value
from . import exceptions  # noqa: E402,F401
