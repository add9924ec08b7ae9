"""Driver-contract registry invariants (__spark_entry__.py).

No Spark session needed: these pin the pure-python registry properties the
grading driver depends on — rotation determinism, name/oracle alignment.
"""

import json
import os

import __spark_entry__ as E

HERE = os.path.dirname(os.path.abspath(E.__file__))


def test_registry_order_is_fixed_and_complete():
    q1, q2 = E.queries(), E.queries()
    assert list(q1) == list(q2)  # deterministic — a pure function of source
    base_names = sorted(q1)
    assert len(base_names) == len(set(base_names)) == len(q1)
    # the canonical order leads with the never-driver-sampled head (r5
    # advisor finding: NO dependence on grader artifacts on disk)
    assert tuple(list(q1)[: len(E._SAMPLE_HEAD)]) == E._SAMPLE_HEAD


def test_oracle_sql_covers_queries():
    q, o = E.queries(), E.oracle_sql()
    missing = [n for n in q if n not in o]
    # payload_drift is the one documented rows-only entry (Arrow decode)
    assert missing == ["payload_drift"] or missing == []
    # no orphan oracles
    assert not [n for n in o if n not in q]


def test_sample_window_covers_never_sampled_queries():
    """The first-50 window must contain the full never-sampled head and
    still bring ≥25 queries absent from the latest driver sample."""
    q = list(E.queries())
    assert set(E._SAMPLE_HEAD) <= set(q[:50])
    art = sorted(
        p for p in os.listdir(HERE) if p.startswith("CORRECTNESS_r") and p.endswith(".json")
    )
    if not art:  # fresh checkout without driver artifacts: nothing to check
        return
    prev = set(json.load(open(os.path.join(HERE, art[-1]))))
    fresh = [n for n in q[:50] if n not in prev]
    assert len(fresh) >= 25, f"only {len(fresh)} unsampled queries in the window"
