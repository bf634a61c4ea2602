"""Response-envelope parity layer (SURVEY §2.7 C4).

The reference wraps every API result as
``{ok, data, error{code, message, details}, meta{source_name, metric,
params, generated_at, version}}`` (backend/app/schemas/common.py:10-63).
This is an API concern, not a Spark one — the engine exposes the same
contract as plain dict builders so result shapes can be checked without
a web framework. The clock is injectable (the reference stamps
``generated_at`` from wall clock, which is untestable — SURVEY §7.4.5).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Callable

ENGINE_VERSION = "1.0"

#: error codes used by the reference's ingest/read paths
ERROR_CODES = {
    "EMPTY_FILE",
    "MISSING_COLUMNS",
    "BAD_REQUEST",
    "NOT_FOUND",
    "VALIDATION_ERROR",
}


def _meta(
    source_name: str | None,
    metric: str | None,
    params: dict[str, Any] | None,
    now: Callable[[], dt.datetime] | None,
) -> dict[str, Any]:
    clock = now or (lambda: dt.datetime.now(dt.timezone.utc))
    return {
        "source_name": source_name,
        "metric": metric,
        "params": params or {},
        "generated_at": clock().isoformat().replace("+00:00", "Z"),
        "version": ENGINE_VERSION,
    }


def ok_envelope(
    data: Any,
    source_name: str | None = None,
    metric: str | None = None,
    params: dict[str, Any] | None = None,
    now: Callable[[], dt.datetime] | None = None,
) -> dict[str, Any]:
    """Success envelope. ``data`` is typically ``df.collect()`` rows
    serialized by the caller — never a DataFrame (envelopes are tiny,
    API-edge objects; the heavy lifting stays distributed)."""
    return {
        "ok": True,
        "data": data,
        "error": None,
        "meta": _meta(source_name, metric, params, now),
    }


def error_envelope(
    code: str,
    message: str,
    details: Any = None,
    source_name: str | None = None,
    metric: str | None = None,
    params: dict[str, Any] | None = None,
    now: Callable[[], dt.datetime] | None = None,
) -> dict[str, Any]:
    """Error envelope; ``code`` should come from ERROR_CODES."""
    return {
        "ok": False,
        "data": None,
        "error": {"code": code, "message": message, "details": details},
        "meta": _meta(source_name, metric, params, now),
    }
