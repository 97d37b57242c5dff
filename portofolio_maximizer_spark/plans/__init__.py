from .queries import ORACLE, QUERIES
from . import queries_finance  # noqa: F401  (registers pack 2)
from . import queries_llmdata  # noqa: F401  (registers pack 3)
from . import queries_stats  # noqa: F401  (registers pack 4)

__all__ = ["ORACLE", "QUERIES"]
