"""Property tests: apply_changes and value_cap_admissions against
plain-Python reference folds on randomized inputs (hypothesis).

Spark session startup is expensive, so examples are capped low and
deadlines disabled; the generators bias toward collisions (small key
spaces) because last-wins ordering and per-key budgets only get
exercised under contention.
"""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from voter_gateway_spark.plans.merging import apply_changes
from voter_gateway_spark.streaming.events import value_cap_admissions

KEYS = st.integers(min_value=1, max_value=6)


@st.composite
def change_streams(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    changes = []
    for seq in range(1, n + 1):
        changes.append(
            (
                draw(KEYS),
                draw(st.text(alphabet="abcxyz", min_size=0, max_size=4)),
                draw(st.sampled_from(["U", "U", "U", "D"])),
                seq,
            )
        )
    return changes


def _python_fold(target: dict, changes):
    latest = {}
    for key, v, op, seq in changes:
        cur = latest.get(key)
        # last-wins: higher seq, ties by op desc (matches the plan's
        # deterministic tie-break; seqs here are unique anyway)
        if cur is None or (seq, op) > (cur[2], cur[1]):
            latest[key] = (v, op, seq)
    out = dict(target)
    for key, (v, op, _) in latest.items():
        if op == "D":
            out.pop(key, None)
        else:
            out[key] = v
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=change_streams())
def test_apply_changes_matches_python_fold(spark, changes):
    target_rows = {1: "t1", 2: "t2", 3: "t3"}
    target = spark.createDataFrame(
        [Row(id=k, v=v) for k, v in target_rows.items()], "id int, v string"
    )
    ch = spark.createDataFrame(
        [Row(id=k, v=v, op=op, seq=s) for k, v, op, s in changes],
        "id int, v string, op string, seq int",
    )
    got = {r.id: r.v for r in apply_changes(target, ch, "id", "seq").collect()}
    assert got == _python_fold(target_rows, changes)


@st.composite
def event_sets(draw):
    n = draw(st.integers(min_value=0, max_value=15))
    evs = []
    for i in range(n):
        evs.append(
            (
                i + 1,                                   # event_id (unique)
                draw(st.integers(min_value=1, max_value=3)),   # user
                draw(st.integers(min_value=0, max_value=50)),  # minutes offset
                # negative values included: refunds must accumulate
                # identically in the batch window form and the
                # streaming state fold (can re-open a capped budget)
                draw(st.integers(min_value=-30, max_value=40)),  # value
            )
        )
    return evs


def _python_cap(evs, cap):
    admitted = {}
    totals = {}
    for eid, user, mins, value in sorted(evs, key=lambda e: (e[2], e[0])):
        t = totals.get(user, 0.0)
        totals[user] = t + value       # every event accumulates
        if t < cap:                    # admitted iff total BEFORE < cap
            admitted[eid] = totals[user]
    return admitted


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=event_sets())
def test_value_cap_matches_python_fold(spark, evs):
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(
                event_id=eid,
                user_id=user,
                ts=base + datetime.timedelta(minutes=mins),
                value=float(value),
            )
            for eid, user, mins, value in evs
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    got = {
        r.event_id: r.running_total
        for r in value_cap_admissions(df, 100.0).collect()
    }
    assert got == _python_cap(evs, 100.0)
