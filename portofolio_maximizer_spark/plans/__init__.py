from .queries import ORACLE, QUERIES
from . import queries_finance  # noqa: F401  (registers pack 2)

__all__ = ["ORACLE", "QUERIES"]
