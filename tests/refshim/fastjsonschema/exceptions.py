from . import JsonSchemaValueException  # noqa: F401
