"""Production connector adapters (sources/connectors.py) with the
driver modules MOCKED in ``sys.modules`` — no PLC or database server
exists in this sandbox, so these tests pin the call plumbing the real
deployment depends on: batched ``randomread`` device lists, retry +
reconnect on socket failure, offset monotonicity, per-host outage
isolation (null words, not a stalled batch), pyodbc connection-string
shape, and the T-SQL MERGE executed through ``ConnectFactory``.

All calls here are DRIVER-SIDE by construction (the simple
stream-reader protocol and the writer's ``write()`` are invoked
directly), so the ``sys.modules`` mocks are visible — an end-to-end
``readStream`` would import the driver in a separate planner worker
process where a test mock cannot reach; the ``plcsim`` source
(test_plc_source.py) covers that full source-protocol path with a
dependency-free register map."""

from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import Row
from pyspark.sql.types import LongType, StringType, StructField, StructType

from iotdatapipeline_spark.sources.connectors import (
    MCClient,
    PLCLiveDataSource,
    PLCLiveStreamReader,
    as400_connect_factory,
    mssql_connect_factory,
    register_plclive,
)


def _word(host: str, device: str, n_call: int) -> int:
    return (hash((host, device, n_call)) & 0x7FFF) % 65536


class _FakeType3E:
    """Recording stand-in for pymcprotocol.Type3E: deterministic words,
    scriptable failures."""

    instances: list["_FakeType3E"] = []
    fail_plan: dict[str, int] = {}  # host -> number of calls to fail first

    def __init__(self, plctype="Q"):
        self.plctype = plctype
        self.soc_timeout = None
        self.host = None
        self.connects = 0
        self.closes = 0
        self.calls: list[list[str]] = []
        _FakeType3E.instances.append(self)

    def connect(self, ip, port):
        self.host, self.port = ip, port
        self.connects += 1

    def close(self):
        self.closes += 1

    def randomread(self, word_devices, dword_devices):
        assert dword_devices == []
        n = len(self.calls)
        self.calls.append(list(word_devices))
        remaining = _FakeType3E.fail_plan.get(self.host, 0)
        if remaining > 0:
            _FakeType3E.fail_plan[self.host] = remaining - 1
            raise OSError("socket timed out")
        return [_word(self.host, d, n) for d in word_devices], []


@pytest.fixture()
def fake_pymc(monkeypatch):
    mod = types.ModuleType("pymcprotocol")
    mod.Type3E = _FakeType3E
    _FakeType3E.instances = []
    _FakeType3E.fail_plan = {}
    monkeypatch.setitem(sys.modules, "pymcprotocol", mod)
    return mod


class TestMCClient:
    def test_batched_read_one_roundtrip(self, fake_pymc):
        c = MCClient("10.0.0.1", plctype="L", timeout_s=2.5)
        devices = ["D100", "D101", "M20"]
        words = c.read_words(devices)
        plc = _FakeType3E.instances[-1]
        # the WHOLE device list in ONE randomread, like Prensas.py:506-509
        assert plc.calls == [devices]
        assert plc.plctype == "L" and plc.soc_timeout == 2.5
        assert plc.connects == 1
        assert words == [_word("10.0.0.1", d, 0) for d in devices]

    def test_retry_reconnects_then_succeeds(self, fake_pymc):
        _FakeType3E.fail_plan["10.0.0.2"] = 2
        c = MCClient("10.0.0.2", retries=2)
        words = c.read_words(["D7"])
        plc = _FakeType3E.instances[-1]
        assert len(plc.calls) == 3  # 2 failures + 1 success
        assert plc.connects == 3  # reconnect per retry
        assert words == [_word("10.0.0.2", "D7", 2)]

    def test_retries_exhausted_raises(self, fake_pymc):
        _FakeType3E.fail_plan["10.0.0.3"] = 99
        c = MCClient("10.0.0.3", retries=1)
        with pytest.raises(OSError):
            c.read_words(["D0"])

    def test_missing_driver_names_the_extra(self):
        assert "pymcprotocol" not in sys.modules  # genuinely absent here
        with pytest.raises(ImportError, match=r"\[plc\]"):
            MCClient("10.0.0.9")


class TestPLCLiveStreamReader:
    OPTS = {"hosts": "10.0.0.1,10.0.0.2:5010", "devices": "D100,D101"}

    def test_option_validation(self):
        with pytest.raises(ValueError, match="hosts"):
            PLCLiveStreamReader({"devices": "D1"})
        with pytest.raises(ValueError, match="devices"):
            PLCLiveStreamReader({"hosts": "10.0.0.1"})

    def test_offsets_monotone_one_poll_per_tick(self, fake_pymc):
        r = PLCLiveStreamReader(dict(self.OPTS))
        assert r.initialOffset() == {"tick": 0}
        rows0, end0 = r.read({"tick": 0})
        rows0 = list(rows0)
        assert end0 == {"tick": 1}
        _, end1 = r.read(end0)
        assert end1 == {"tick": 2}
        # one poll cycle = every host × every device, correct port; the
        # host column carries the RAW configured token so endpoints
        # sharing an IP stay distinguishable
        assert {(h, t, d) for h, t, d, _ in rows0} == {
            ("10.0.0.1", 0, "D100"),
            ("10.0.0.1", 0, "D101"),
            ("10.0.0.2:5010", 0, "D100"),
            ("10.0.0.2:5010", 0, "D101"),
        }
        ports = {p.host: p.port for p in _FakeType3E.instances}
        assert ports == {"10.0.0.1": 5007, "10.0.0.2": 5010}
        r.stop()
        assert all(p.closes >= 1 for p in _FakeType3E.instances)

    def test_dead_host_emits_nulls_not_stall(self, fake_pymc):
        _FakeType3E.fail_plan["10.0.0.1"] = 99  # down past all retries
        r = PLCLiveStreamReader(dict(self.OPTS, retries="0"))
        rows, _ = r.read({"tick": 0})
        by_host = {}
        for h, _t, d, w in rows:
            by_host.setdefault(h, []).append(w)
        assert by_host["10.0.0.1"] == [None, None]  # outage visible
        assert all(w is not None for w in by_host["10.0.0.2:5010"])  # others flow

    def test_same_ip_different_ports_get_distinct_clients(self, fake_pymc):
        r = PLCLiveStreamReader({"hosts": "10.0.0.1:5007,10.0.0.1:5010", "devices": "D1"})
        rows, _ = r.read({"tick": 0})
        hosts = {h for h, _t, _d, _w in rows}
        assert hosts == {"10.0.0.1:5007", "10.0.0.1:5010"}
        ports = sorted(p.port for p in _FakeType3E.instances)
        assert ports == [5007, 5010]  # two clients, both endpoints polled

    def test_aliased_endpoint_polls_serialized_on_one_client(self, fake_pymc):
        # '10.0.0.1,10.0.0.1:5007' — two raw tokens, ONE endpoint. Both
        # rows must emit (raw tokens stay distinguishable) but the
        # shared non-thread-safe client must never see overlapping
        # reads: the per-endpoint lock serializes the two poll threads.
        overlaps = []
        import threading

        active = {"n": 0}
        guard = threading.Lock()
        orig = _FakeType3E.randomread

        def traced(self, word_devices, dword_devices):
            with guard:
                active["n"] += 1
                if active["n"] > 1:
                    overlaps.append(list(word_devices))
            try:
                import time as _t

                _t.sleep(0.01)
                return orig(self, word_devices, dword_devices)
            finally:
                with guard:
                    active["n"] -= 1

        _FakeType3E.randomread = traced
        try:
            r = PLCLiveStreamReader({"hosts": "10.0.0.1,10.0.0.1:5007", "devices": "D1"})
            rows, _ = r.read({"tick": 0})
            hosts = {h for h, _t, _d, _w in rows}
            assert hosts == {"10.0.0.1", "10.0.0.1:5007"}
            assert len(_FakeType3E.instances) == 1  # one shared client
            assert not overlaps  # no concurrent use of the shared socket
        finally:
            _FakeType3E.randomread = orig

    def test_replay_repolls_every_tick(self, fake_pymc):
        r = PLCLiveStreamReader({"hosts": "10.0.0.1", "devices": "D1"})
        rows = list(r.readBetweenOffsets({"tick": 3}, {"tick": 6}))
        assert [t for _h, t, _d, _w in rows] == [3, 4, 5]
        assert len(_FakeType3E.instances[-1].calls) == 3

    def test_datasource_shape(self):
        assert PLCLiveDataSource.name() == "plclive"
        ds = PLCLiveDataSource(dict(self.OPTS))
        assert isinstance(ds.simpleStreamReader(None), PLCLiveStreamReader)

    def test_registration_needs_no_driver(self, spark):
        # the [plc] extra is required at first poll, not registration
        register_plclive(spark)


class _FakeCursor:
    def __init__(self, log):
        self.log = log

    def executemany(self, sql, data):
        self.log.append((sql, list(data)))


class _FakeConnection:
    def __init__(self, log):
        self.log = log
        self.committed = 0

    def cursor(self):
        return _FakeCursor(self.log)

    def commit(self):
        self.committed += 1

    def close(self):
        pass


@pytest.fixture()
def fake_pyodbc(monkeypatch):
    mod = types.ModuleType("pyodbc")
    mod.connect_calls = []
    mod.executed = []

    def connect(*args, **kwargs):
        mod.connect_calls.append((args, kwargs))
        return _FakeConnection(mod.executed)

    mod.connect = connect
    monkeypatch.setitem(sys.modules, "pyodbc", mod)
    return mod


class TestRelationalFactories:
    def test_mssql_connection_string(self, fake_pyodbc):
        fac = mssql_connect_factory(
            "192.0.2.47", "IOT", "sa", "pw", driver="ODBC Driver 17 for SQL Server"
        )
        fac()
        ((conn_str,), _) = fake_pyodbc.connect_calls[0]
        assert conn_str == (
            "DRIVER={ODBC Driver 17 for SQL Server};SERVER=192.0.2.47;"
            "DATABASE=IOT;UID=sa;PWD=pw;"
        )

    def test_as400_connection_string_with_library(self, fake_pyodbc):
        as400_connect_factory("192.0.2.7", "QUSER", "pw", database="LX834F01")()
        ((conn_str,), _) = fake_pyodbc.connect_calls[0]
        assert "DRIVER={iSeries Access ODBC Driver}" in conn_str
        assert "SYSTEM=192.0.2.7" in conn_str and conn_str.endswith("DBQ=LX834F01;")

    def test_factory_is_picklable(self):
        import pickle

        fac = mssql_connect_factory("h", "d", "u", "p")
        fac2 = pickle.loads(pickle.dumps(fac))
        assert fac2.module == "pyodbc" and fac2.args == fac.args

    def test_tsql_merge_through_writer(self, fake_pyodbc):
        """The format("dbapi") writer task, executed directly with the
        mocked pyodbc: the T-SQL MERGE text and batch chunking the SQL
        Server deployment would see (Prensas.py:216-223 / :319-331 as
        one atomic MERGE)."""
        from iotdatapipeline_spark.sources.dbapi import _dbapi_writer_classes

        ds_cls = _dbapi_writer_classes()
        schema = StructType(
            [StructField("id", LongType()), StructField("qty", LongType()), StructField("who", StringType())]
        )
        writer = ds_cls(
            {"module": "pyodbc", "conn": "DSN=plant;", "table": "registros",
             "keys": "id", "dialect": "tsql", "batch_size": "2"}
        ).writer(schema, False)
        rows = [Row(id=i, qty=10 * i, who=f"u{i}") for i in range(5)]
        msg = writer.write(iter(rows))
        assert msg.n_rows == 5
        sql = fake_pyodbc.executed[0][0]
        assert sql.startswith("MERGE INTO registros WITH (HOLDLOCK) AS tgt")
        assert "WHEN MATCHED THEN UPDATE SET qty = src.qty, who = src.who" in sql
        assert sql.rstrip().endswith(";")
        assert [len(batch) for _sql, batch in fake_pyodbc.executed] == [2, 2, 1]
        assert fake_pyodbc.executed[0][1][0] == (0, 0, "u0")
        # each chunk ran on a fresh connection opened with the configured string
        assert [a for (a, _k) in fake_pyodbc.connect_calls] == [("DSN=plant;",)] * 3
