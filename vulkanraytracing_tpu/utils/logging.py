"""Severity-prefixed stdout logging.

Ref: Source/Utils/Logger.hpp:1-28 — LogE/LogW/LogI always print, LogD only in
debug builds, LogT tags timing lines.  Here debug logging is gated by an env
var instead of NDEBUG.
"""

from __future__ import annotations

import os
import sys

_DEBUG = bool(os.environ.get("VRT_DEBUG", ""))


def _emit(prefix: str, *args: object) -> None:
    # stderr, not stdout: machine-readable surfaces (bench.py's one-JSON-
    # line contract) own stdout; severity logs must never interleave with
    # them (a chunked-build [TIME] line broke a bench capture in r05)
    print(prefix, *args, file=sys.stderr, flush=True)


def log_e(*args: object) -> None:
    _emit("[ERROR]", *args)


def log_w(*args: object) -> None:
    _emit("[WARNING]", *args)


def log_i(*args: object) -> None:
    _emit("[INFO]", *args)


def log_d(*args: object) -> None:
    if _DEBUG:
        _emit("[DEBUG]", *args)


def log_t(*args: object) -> None:
    _emit("[TIME]", *args)
