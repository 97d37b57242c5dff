"""Facade: the generated module only calls ``Default()`` and keeps the
handle; nothing is looked up through it in the pyspark TWS path."""

from __future__ import annotations


class SymbolDatabase:
    def RegisterMessage(self, message):  # noqa: N802
        return message


_DEFAULT = SymbolDatabase()


def Default() -> SymbolDatabase:  # noqa: N802
    return _DEFAULT
