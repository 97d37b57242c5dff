from .queries import ORACLE, QUERIES
from . import queries_finance  # noqa: F401  (registers pack 2)
from . import queries_llmdata  # noqa: F401  (registers pack 3)
from . import queries_stats  # noqa: F401  (registers pack 4)
from . import queries_trades  # noqa: F401  (registers pack 5)
from . import queries_eval  # noqa: F401  (registers pack 6)
from . import queries_models  # noqa: F401  (registers pack 7)
from . import queries_signals  # noqa: F401  (registers pack 8)
from . import queries_pipeline  # noqa: F401  (registers pack 9)
from . import queries_risk  # noqa: F401  (registers pack 10)
from . import queries_ops  # noqa: F401  (registers pack 11)
from . import queries_adversarial  # noqa: F401  (registers pack 12)

__all__ = ["ORACLE", "QUERIES"]
