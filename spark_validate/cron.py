"""Five-field cron expressions, stdlib-only.

Reference parity: `nannyml/cli/run.py:46-58` accepts an APScheduler
``CronTrigger.from_crontab`` string. This module implements the same
standard five-field grammar (minute hour day-of-month month day-of-week)
with ``*``, lists, ranges, and ``/step``; day-of-week 0-7 where both 0 and
7 mean Sunday. Standard cron OR-rule: when BOTH day-of-month and
day-of-week are restricted, a day matches if either does.
"""

from __future__ import annotations

from datetime import datetime, time as dtime, timedelta
from typing import Set, Tuple

_BOUNDS = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]
_FIELDS = ["minute", "hour", "day-of-month", "month", "day-of-week"]


def _parse_field(spec: str, lo: int, hi: int, name: str) -> Set[int]:
    vals: Set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron {name}: step must be >= 1 in {spec!r}")
        if part in ("*", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(part)
            if step != 1:  # "5/15" = every 15 from 5 (vixie-cron extension)
                end = hi
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"cron {name}: {spec!r} out of range [{lo},{hi}]")
        vals.update(range(start, end + 1, step))
    return vals


def parse_cron(expr: str) -> Tuple[Set[int], Set[int], Set[int], Set[int], Set[int], bool, bool]:
    """→ (minutes, hours, days-of-month, months, days-of-week,
    dom_restricted, dow_restricted). dow normalized to 0-6 (Sunday=0)."""
    parts = expr.split()
    if len(parts) != 5:
        raise ValueError(f"cron expression must have 5 fields, got {len(parts)}: {expr!r}")
    sets = []
    for spec, (lo, hi), name in zip(parts, _BOUNDS, _FIELDS):
        sets.append(_parse_field(spec, lo, hi, name))
    m, h, dom, mon, dow = sets
    dow = {d % 7 for d in dow}  # 7 → 0 (Sunday)
    return m, h, dom, mon, dow, parts[2] != "*", parts[4] != "*"


def next_fire(expr: str, after: datetime) -> datetime:
    """First fire time strictly after ``after`` (second/µs truncated)."""
    m, h, dom, mon, dow, dom_r, dow_r = parse_cron(expr)
    hours, minutes = sorted(h), sorted(m)

    def day_ok(d) -> bool:
        if d.month not in mon:
            return False
        in_dom = d.day in dom
        in_dow = ((d.weekday() + 1) % 7) in dow  # python Mon=0 → cron Sun=0
        if dom_r and dow_r:
            return in_dom or in_dow  # standard cron OR rule
        return in_dom and in_dow  # unrestricted side is the full set

    t = (after.replace(second=0, microsecond=0)) + timedelta(minutes=1)
    for _ in range(366 * 5):  # 5-year horizon covers any 5-field pattern
        d = t.date()
        if day_ok(d):
            same_day = d == t.date()
            for hh in hours:
                if same_day and hh < t.hour:
                    continue
                for mm in minutes:
                    cand = datetime.combine(d, dtime(hh, mm), tzinfo=after.tzinfo)
                    if cand >= t:
                        return cand
        t = datetime.combine(d + timedelta(days=1), dtime(0, 0), tzinfo=after.tzinfo)
    raise ValueError(f"cron expression never fires: {expr!r}")
