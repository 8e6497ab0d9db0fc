"""Debug logging — the reference's --debug-gated printdb helpers
(src/Project4.scala:261, src/KmerTable.scala:19-20, src/BioLibs.scala:18-19)
unified in one place, plus progress heartbeats."""

from __future__ import annotations

import sys

_DEBUG = False


def set_debug(on: bool) -> None:
    global _DEBUG
    _DEBUG = on


def debug_enabled() -> bool:
    return _DEBUG


def printdb(msg: str) -> None:
    if _DEBUG:
        print(msg, file=sys.stderr)


def heartbeat(i: int, every: int, msg: str) -> None:
    """Progress print every N items (the reference's `% 1000` heartbeats)."""
    if _DEBUG and every > 0 and i % every == 0:
        print(msg, file=sys.stderr)
