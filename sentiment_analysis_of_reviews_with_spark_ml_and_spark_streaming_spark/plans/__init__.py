from .queries import ORACLE, QUERIES  # noqa: F401
