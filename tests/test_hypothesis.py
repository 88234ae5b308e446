"""Randomized property tests (hypothesis): the as-of join against pandas
merge_asof, and CDC latest-state against a dict replay, on arbitrary
generated inputs — catching edge shapes the fixed corpus can't."""

from __future__ import annotations

import json

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_local_data_pipeline_docker_spark.cdc import latest_state as LS
from cdc_local_data_pipeline_docker_spark.cdc import parse as P
from cdc_local_data_pipeline_docker_spark.operators.asof import asof_join

# Spark round-trips per example are expensive → few, larger examples.
_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _asof_case(draw):
    n_keys = draw(st.integers(1, 4))
    left = []
    right = []
    for k in range(n_keys):
        for ts in draw(st.lists(st.integers(0, 100), min_size=0, max_size=8,
                                unique=True)):
            left.append((k, ts))
        for ts in draw(st.lists(st.integers(0, 100), min_size=0, max_size=8,
                                unique=True)):
            right.append((k, ts))
    return left, right


@given(_asof_case())
@_SETTINGS
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    if not left_rows:
        return
    left = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "key INT, lts INT"
    )
    right = spark.createDataFrame(
        [(k, t, t) for k, t in right_rows] or [(None, None, None)],
        "key INT, rts INT, rval INT",
    ).filter("key IS NOT NULL")
    out = asof_join(left, right, key="key", left_ts="lts",
                    right_ts="rts", right_value="rval")
    got = {(r.key, r.lts): r._asof for r in out.collect()}

    lp = pd.DataFrame(left_rows, columns=["key", "lts"]).sort_values("lts")
    if right_rows:
        rp = pd.DataFrame(right_rows, columns=["key", "rts"]).sort_values("rts")
        rp["rval"] = rp["rts"]
        m = pd.merge_asof(
            lp, rp, left_on="lts", right_on="rts", by="key",
            direction="backward", allow_exact_matches=True,
        )
        expected = {
            (int(r.key), int(r.lts)): (None if pd.isna(r.rval) else int(r.rval))
            for r in m.itertuples()
        }
    else:
        expected = {(int(k), int(t)): None for k, t in left_rows}
    assert got == expected


@st.composite
def _event_sequence(draw):
    ops = draw(st.lists(
        st.tuples(
            st.integers(1, 5),                    # pk
            st.sampled_from(["upsert", "delete"]),
            st.integers(0, 999999),               # payload discriminator
        ),
        min_size=1, max_size=25,
    ))
    return ops


@given(_event_sequence())
@_SETTINGS
def test_latest_state_matches_dict_replay(spark, ops):
    events = []
    expected: dict[int, str] = {}
    for offset, (pk, kind, disc) in enumerate(ops):
        if kind == "delete":
            value = None
            expected.pop(pk, None)
        else:
            amount = f"{(disc % 99999) / 100 + 1:.2f}"
            value = json.dumps(
                {"order_id": pk, "customer_id": 1, "order_date": 0,
                 "status": f"s{disc}", "total_amount": amount,
                 "shipping_address": "x"}
            )
            expected[pk] = amount
        events.append({"key": json.dumps({"order_id": pk}), "value": value,
                       "topic": "t", "partition": 0, "offset": offset,
                       "timestamp": 0})
    env = spark.createDataFrame(
        [(e["key"], e["value"], e["topic"], e["partition"], e["offset"],
          e["timestamp"]) for e in events],
        P.ENVELOPE_DDL,
    )
    state = LS.latest_state(P.parse_events(env, "orders"), "orders")
    got = {r.order_id: str(r.total_amount) for r in state.collect()}
    assert got == expected
