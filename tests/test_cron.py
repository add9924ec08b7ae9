"""Five-field cron parsing + next-fire (reference `cli/run.py:46-58`
CronTrigger.from_crontab parity; spark-free unit tests)."""

from datetime import datetime

import pytest

from spark_validate.cron import next_fire, parse_cron


def test_parse_fields():
    m, h, dom, mon, dow, dom_r, dow_r = parse_cron("*/15 0 1,15 * 1-5")
    assert m == {0, 15, 30, 45}
    assert h == {0}
    assert dom == {1, 15}
    assert mon == set(range(1, 13))
    assert dow == {1, 2, 3, 4, 5}
    assert dom_r and dow_r


def test_parse_sunday_alias_and_steps():
    *_, dow, _, _ = parse_cron("0 0 * * 7")
    assert dow == {0}
    m, *_ = parse_cron("5/20 * * * *")  # vixie extension: from 5 every 20
    assert m == {5, 25, 45}
    m, *_ = parse_cron("10-30/10 * * * *")
    assert m == {10, 20, 30}


@pytest.mark.parametrize(
    "expr",
    ["* * * *", "60 * * * *", "* 24 * * *", "* * 0 * *", "* * * 13 *", "* * * * 8", "*/0 * * * *"],
)
def test_parse_rejects_bad_expressions(expr):
    with pytest.raises(ValueError):
        parse_cron(expr)


def test_next_fire_basics():
    # every 5 minutes
    assert next_fire("*/5 * * * *", datetime(2026, 8, 18, 10, 2)) == datetime(2026, 8, 18, 10, 5)
    # exact boundary is NOT refired: strictly after
    assert next_fire("*/5 * * * *", datetime(2026, 8, 18, 10, 5)) == datetime(2026, 8, 18, 10, 10)
    # daily at 02:30, requested after that time today → tomorrow
    assert next_fire("30 2 * * *", datetime(2026, 8, 18, 3, 0)) == datetime(2026, 8, 19, 2, 30)
    # month rollover: 31st of month from a 30-day month
    assert next_fire("0 0 31 * *", datetime(2026, 9, 1, 0, 0)) == datetime(2026, 10, 31, 0, 0)
    # weekday constraint: 2026-08-18 is a Tuesday; next Monday is 08-24
    assert next_fire("0 9 * * 1", datetime(2026, 8, 18, 12, 0)) == datetime(2026, 8, 24, 9, 0)


def test_next_fire_dom_dow_or_rule():
    # both restricted → OR: fires on the 15th OR on Mondays
    after = datetime(2026, 8, 11, 0, 0)  # Tue Aug 11
    assert next_fire("0 0 15 * 1", after) == datetime(2026, 8, 15, 0, 0)  # Sat 15th wins
    after = datetime(2026, 8, 16, 0, 0)  # Sun
    assert next_fire("0 0 15 * 1", after) == datetime(2026, 8, 17, 0, 0)  # Mon 17th wins


def test_next_fire_leap_day():
    assert next_fire("0 0 29 2 *", datetime(2026, 3, 1, 0, 0)) == datetime(2028, 2, 29, 0, 0)


def test_run_scheduled_cron_waits_to_next_fire():
    from spark_validate.runner import run_scheduled

    sleeps, runs = [], []
    cfg = {"scheduling": {"cron": "*/10 * * * *"}, "run_id": "r"}
    run_scheduled(
        spark=None,
        config=cfg,
        run_fn=lambda s, c: runs.append(c["run_id"]) or {},
        sleep_fn=sleeps.append,
        max_runs=3,
        now_fn=lambda: datetime(2026, 8, 18, 10, 2, 30),
    )
    assert runs == ["r__0", "r__1", "r__2"]
    # 10:02:30 → 10:10:00 = 450 s
    assert sleeps == [450.0, 450.0]


def test_run_scheduled_rejects_both_modes():
    from spark_validate.runner import run_scheduled

    with pytest.raises(ValueError):
        run_scheduled(None, {"scheduling": {"cron": "* * * * *", "interval_seconds": 5}})
