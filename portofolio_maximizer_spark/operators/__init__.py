from . import aggregates, joins, setops, topk, validation, windows

__all__ = ["aggregates", "joins", "setops", "topk", "validation", "windows"]
