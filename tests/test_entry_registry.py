"""Driver-contract registry invariants (__spark_entry__.py).

No Spark session needed: these pin the pure-python registry properties the
grading driver depends on — rotation determinism, name/oracle alignment.
"""

import json
import os

import __spark_entry__ as E

HERE = os.path.dirname(os.path.abspath(E.__file__))


def test_registry_rotation_is_deterministic_and_complete():
    q1, q2 = E.queries(), E.queries()
    assert list(q1) == list(q2)  # same artifacts on disk → same order
    # rotation permutes, never drops or duplicates
    base_names = sorted(q1)
    assert len(base_names) == len(set(base_names)) == len(q1)
    # window offset matches the artifact count contract
    import glob

    n_rounds = len(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")))
    names = list(q1)
    # rotating back by the documented offset yields a fixed canonical order
    off = (50 * n_rounds) % len(names)
    canonical = names[len(names) - off:] + names[: len(names) - off]
    assert sorted(canonical) == base_names


def test_oracle_sql_covers_queries():
    q, o = E.queries(), E.oracle_sql()
    missing = [n for n in q if n not in o]
    # payload_drift is the one documented rows-only entry (Arrow decode)
    assert missing == ["payload_drift"] or missing == []
    # no orphan oracles
    assert not [n for n in o if n not in q]


def test_rotation_moves_driver_sample_window():
    """Each completed round must shift ≥25 new queries into the first-50
    window (the round-4 review's acceptance bar for the rotation)."""
    q = list(E.queries())
    art = sorted(
        p for p in os.listdir(HERE) if p.startswith("CORRECTNESS_r") and p.endswith(".json")
    )
    if not art:  # fresh checkout without driver artifacts: nothing to check
        return
    prev = set(json.load(open(os.path.join(HERE, art[-1]))))
    fresh = [n for n in q[:50] if n not in prev]
    assert len(fresh) >= 25, f"only {len(fresh)} unsampled queries in the window"
