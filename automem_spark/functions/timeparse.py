"""Natural-language time expressions and temporal-intent detection.

Driver-side query parsing (not data-plane — SURVEY.md §4.2 item 5).
Reference: automem/utils/time.py:10-27 (intent regex), :89-159 (expressions).
`now` is injectable for determinism (the reference uses wall clock).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_TEMPORAL_INTENT_RE = re.compile(
    r"\b(?:"
    r"latest|most recent|recently|current|currently|now|nowadays|today|"
    r"changed|updated|last time|newest|these days|anymore"
    r")\b",
    re.IGNORECASE,
)


def query_has_temporal_intent(query: str | None) -> bool:
    """True when the query asks about the present/latest state (X16).
    Word-boundaried so 'currency' does not trigger 'current'."""
    if not query:
        return False
    return bool(_TEMPORAL_INTENT_RE.search(query))


def parse_time_expression(
    expression: str | None, *, now: datetime | None = None
) -> tuple[str | None, str | None]:
    """X15: 'today', 'yesterday', 'last N days', 'this week/month/year',
    'last 24/48 hours', ... -> (start_iso, end_iso) or (None, None)."""
    if not expression:
        return None, None
    expr = expression.strip().lower()
    if not expr:
        return None, None
    now = now or datetime.now(timezone.utc)

    def start_of_day(dt: datetime) -> datetime:
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)

    if expr in {"today", "this day"}:
        start = start_of_day(now)
        end = start + timedelta(days=1)
    elif expr == "yesterday":
        start = start_of_day(now - timedelta(days=1))
        end = start + timedelta(days=1)
    elif expr in {"last 24 hours", "past 24 hours"}:
        end, start = now, now - timedelta(hours=24)
    elif expr in {"last 48 hours", "past 48 hours"}:
        end, start = now, now - timedelta(hours=48)
    elif expr == "this week":
        start = start_of_day(now - timedelta(days=now.weekday()))
        end = start + timedelta(days=7)
    elif expr in {"last week", "past week"}:
        end = start_of_day(now - timedelta(days=now.weekday()))
        start = end - timedelta(days=7)
    elif expr == "this month":
        start = now.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        end = (
            start.replace(year=start.year + 1, month=1)
            if start.month == 12
            else start.replace(month=start.month + 1)
        )
    elif expr in {"last month", "past month"}:
        cur = now.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        start = (
            cur.replace(year=cur.year - 1, month=12)
            if cur.month == 1
            else cur.replace(month=cur.month - 1)
        )
        end = cur
    elif expr.startswith("last ") and expr.endswith(" days"):
        try:
            days = int(expr.split()[1])
        except ValueError:
            return None, None
        end, start = now, now - timedelta(days=days)
    elif expr in {"last year", "past year", "this year"}:
        start = now.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
        if expr.startswith(("last", "past")):
            end, start = start, start.replace(year=start.year - 1)
        else:
            end = now if start.year == 9999 else start.replace(year=start.year + 1)
    else:
        return None, None
    return start.isoformat(), end.isoformat()
