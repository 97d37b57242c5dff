from . import scalars, stats

__all__ = ["scalars", "stats"]
