"""Stateful-v2 processor parity: UserProfileProcessor's multi-variable
state logic must reproduce the batch aggregate across micro-batches.

The real ``transformWithStateInPandas`` wire path needs the
``protobuf`` package (the Python worker's state-server protocol),
which this container cannot install — so instead of import-skipping
(a perpetual blind spot), the processor is driven DIRECTLY against
in-memory ValueState/MapState fakes that implement the documented
state-variable contract. That covers everything the engine delegates
to user code: state reads/updates, per-key accumulation, emission
shape. The engine-side plumbing (shuffle by key, state store, update
mode) is the same machinery the applyInPandasWithState parity test
(tests/test_stateful_streaming.py) exercises end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.streaming import stateful_v2 as SV2


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = tuple(v)

    def clear(self) -> None:
        self._v = None


class FakeMapState:
    def __init__(self):
        self._m: dict = {}

    def exists(self) -> bool:
        return bool(self._m)

    def containsKey(self, key) -> bool:
        return tuple(key) in self._m

    def getValue(self, key):
        return self._m[tuple(key)]

    def updateValue(self, key, value) -> None:
        self._m[tuple(key)] = tuple(value)

    def keys(self):
        return iter(list(self._m))

    def removeKey(self, key) -> None:
        self._m.pop(tuple(key), None)

    def clear(self) -> None:
        self._m.clear()


class FakeHandle:
    """StatefulProcessorHandle double: hands out named fake state vars."""

    def __init__(self):
        self.states: dict = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def getMapState(self, name, key_schema, value_schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeMapState())


def _run_processor(batches_per_user: dict) -> dict:
    """Feed each user's list of pandas micro-batches through a fresh
    processor-per-key lifecycle (init once, handleInputRows per batch,
    close) and return the LAST emission per user."""
    final = {}
    for user_id, batches in batches_per_user.items():
        proc = SV2.UserProfileProcessor()
        proc.init(FakeHandle())
        for pdf in batches:
            for out in proc.handleInputRows((user_id,), iter([pdf]), None):
                final[user_id] = out.iloc[0]
        proc.close()
    return final


def test_stateful_v2_processor_matches_batch_aggregate(spark, sf_dir):
    ev = (
        Catalog(spark, sf_dir)
        .events.select("user_id", "event_type", "value")
        .toPandas()
    )
    # 3 deterministic micro-batches, interleaved rows (not time-sorted:
    # the profile monoid is order-insensitive and the test should prove
    # that)
    batches_per_user: dict = {}
    for uid, grp in ev.groupby("user_id"):
        chunks = [grp.iloc[i::3].reset_index(drop=True) for i in range(3)]
        batches_per_user[int(uid)] = [c for c in chunks if len(c)]

    got = _run_processor(batches_per_user)

    want = (
        ev.groupby("user_id")
        .agg(
            n_events=("value", "size"),
            total_value=("value", "sum"),
            n_distinct_types=("event_type", "nunique"),
        )
        .reset_index()
    )
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[int(w["user_id"])]
        assert int(g["n_events"]) == int(w["n_events"])
        assert abs(float(g["total_value"]) - float(w["total_value"])) < 1e-6
        assert int(g["n_distinct_types"]) == int(w["n_distinct_types"])


def test_stateful_v2_emits_running_profile_each_batch(spark):
    """Update-mode contract: every batch emits the profile-so-far."""
    proc = SV2.UserProfileProcessor()
    proc.init(FakeHandle())
    b1 = pd.DataFrame({"event_type": ["a", "b"], "value": [1.0, 2.0]})
    b2 = pd.DataFrame({"event_type": ["a", "c"], "value": [3.0, 4.0]})
    (out1,) = proc.handleInputRows((7,), iter([b1]), None)
    assert (
        int(out1["n_events"][0]),
        float(out1["total_value"][0]),
        int(out1["n_distinct_types"][0]),
    ) == (2, 3.0, 2)
    (out2,) = proc.handleInputRows((7,), iter([b2]), None)
    assert (
        int(out2["n_events"][0]),
        float(out2["total_value"][0]),
        int(out2["n_distinct_types"][0]),
    ) == (4, 10.0, 3)


def test_transform_with_state_api_is_wired(spark):
    """The v2 entry point must target the real Spark API so the module
    works unmodified on a protobuf-equipped cluster: the grouped-data
    class exposes transformWithStateInPandas and running_user_profiles_v2
    passes a StatefulProcessor."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    gd = spark.range(1).groupBy("id")
    assert hasattr(gd, "transformWithStateInPandas")
    assert isinstance(SV2.UserProfileProcessor(), StatefulProcessor)
