from .validate import validate, validate_report  # noqa: F401
