"""Production connector adapters: the real-device/real-database ends
of the pluggable source/sink seams, behind import guards.

The repo's connector seams are driver-agnostic by design —
``plcsim`` speaks Spark's source protocol over a simulated register
map (sources/plc_source.py), and the relational MERGE executors take
any PEP-249 module via :class:`~.dbapi.ConnectFactory`
(sources/dbapi.py). This module supplies the PRODUCTION ends of those
seams, exactly the shape the reference deploys:

* ``plclive`` — a streaming source that polls real Mitsubishi PLCs
  over pymcprotocol, one batched ``randomread`` per host per tick
  (the reference's per-IP reader loop, Prensas.py:480-509: a
  ``Type3E`` client per IP, all word devices for that IP read in ONE
  call each ~1 s cycle, station fan-out happening downstream from
  config). Install with the ``[plc]`` extra.
* :func:`mssql_connect_factory` / :func:`as400_connect_factory` —
  picklable pyodbc connection factories for the SQL Server record
  store (Prensas.py:93-99) and the AS400/DB2 multiplier host
  (Prensas.py:102-113), ready to hand to ``dbapi_upsert`` /
  ``format("dbapi")`` with ``dialect="tsql"`` / ``"db2"``. Install
  with the ``[mssql]`` / ``[db2]`` extras.

None of the driver packages are importable in this sandbox (no PLC,
no database server), so every import is guarded and raises an
``ImportError`` that names the pip extra; the tests mock the driver
modules in ``sys.modules`` and verify the full call plumbing —
device-list batching, retry/backoff, offset monotonicity, MERGE
statement text — without the hardware (tests/test_connectors.py).

Scale shape: the live poll is inherently a per-host serial protocol
(a PLC answers one socket), so the stream reader polls all hosts per
tick on the driver — the same topology as the reference's asyncio
reader tasks — and Spark distributes the resulting micro-batch. At
plant scale (dozens of PLCs, a few hundred words each, 1 Hz) the
batch is KB-sized; the heavy lifting (state machines, rollups,
sinks) runs distributed downstream. Thousands of devices would shard
hosts across multiple streams, which union cleanly.
"""

from __future__ import annotations

import time

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from iotdatapipeline_spark.sources.dbapi import ConnectFactory

__all__ = [
    "MCClient",
    "PLCLiveDataSource",
    "register_plclive",
    "mssql_connect_factory",
    "as400_connect_factory",
]

#: host column first so a config join on (host, address) is direct;
#: word is nullable — a failed poll emits nulls, not silence, so
#: downstream quality gates can SEE the outage (the reference logs
#: and sleeps, Prensas.py:598-601).
SCHEMA = "host string, tick bigint, address string, word bigint"


def _require(module: str, extra: str):
    """Import a driver module or fail with the install recipe."""
    try:
        import importlib

        return importlib.import_module(module)
    except ImportError as e:  # pragma: no cover - exercised via mocks
        raise ImportError(
            f"{module} is required for this connector; "
            f'install with: pip install "iotdatapipeline-spark[{extra}]"'
        ) from e


class MCClient:
    """One Mitsubishi MC-protocol client (pymcprotocol ``Type3E``) —
    the reference's per-IP reader connection (Prensas.py:480-484:
    ``Type3E(plctype=...)``, 5 s socket timeout, ``connect(ip, port)``).

    ``read_words(devices)`` is the batched register read: the WHOLE
    device list for this host in one ``randomread`` round trip
    (Prensas.py:506-509), with bounded retry/backoff and one
    reconnect attempt per retry — transient plant-network drops are
    normal and the poll loop must outlive them."""

    def __init__(
        self,
        host: str,
        port: int = 5007,
        *,
        plctype: str = "Q",
        timeout_s: float = 5.0,
        retries: int = 2,
    ):
        pymc = _require("pymcprotocol", "plc")
        self.host, self.port = host, port
        self.retries = retries
        self._plc = pymc.Type3E(plctype=plctype)
        self._plc.soc_timeout = timeout_s
        self._connected = False

    def connect(self) -> None:
        if not self._connected:
            self._plc.connect(self.host, self.port)
            self._connected = True

    def close(self) -> None:
        if self._connected:
            try:
                self._plc.close()
            except Exception:
                pass
            self._connected = False

    def read_words(self, devices: list[str]) -> list[int]:
        """All ``devices`` (e.g. ``["D100", "D101", "M20"]``) in one
        batched read; raises after ``retries`` failed attempts."""
        last = None
        for attempt in range(self.retries + 1):
            try:
                self.connect()
                words, _dwords = self._plc.randomread(word_devices=list(devices), dword_devices=[])
                return list(words)
            except Exception as e:
                last = e
                self.close()
                if attempt < self.retries:  # no sleep after the final failure
                    time.sleep(0.1 * (2**attempt))
        raise last


class PLCLiveStreamReader(SimpleDataSourceStreamReader):
    """Live poll stream on the SIMPLE stream-reader contract (reads
    happen driver-side — correct here: the device protocol is one
    socket per PLC, the same reason the reference runs one asyncio
    reader per IP, Prensas.py:476-509).

    Offset = global tick counter, exactly like ``plcsim``; each
    ``read(start)`` performs ONE poll cycle across every configured
    host. A host whose poll fails after retries emits its devices
    with NULL words for that tick (outage visibility) rather than
    stalling the batch — the other hosts' data still flows, matching
    the reference's per-IP error isolation (Prensas.py:597-601).

    ``readBetweenOffsets`` (replay of a logged-but-uncommitted batch
    after restart) RE-POLLS: a live register has no history, so
    replayed ticks carry fresh values — at-least-once tick delivery
    with latest-value semantics, the standard contract for
    non-replayable device sources (and harmless downstream: the
    latest-snapshot / state-machine consumers key on tick time)."""

    def __init__(self, options):
        hosts = [h.strip() for h in options.get("hosts", "").split(",") if h.strip()]
        if not hosts:
            raise ValueError("plclive requires hosts=ip[:port][,ip[:port]...]")
        devices = [d.strip() for d in options.get("devices", "").split(",") if d.strip()]
        if not devices:
            raise ValueError('plclive requires devices="D100,D101,..."')
        # (raw token, ip, port): the EMITTED host value is the raw
        # token the user configured, so two endpoints sharing an IP
        # ("10.0.0.1:5007,10.0.0.1:5010") stay distinguishable in the
        # output and in the per-endpoint client cache
        self.hosts: list[tuple[str, str, int]] = []
        for h in hosts:
            ip, _, port = h.partition(":")
            self.hosts.append((h, ip, int(port) if port else 5007))
        self.devices = devices
        self.plctype = options.get("plctype", "Q")
        self.timeout_s = float(options.get("timeout_s", 5.0))
        self.retries = int(options.get("retries", 2))
        self._clients: dict[tuple[str, int], MCClient] = {}
        # Two raw tokens can alias one endpoint ("10.0.0.1,10.0.0.1:5007")
        # and they share one MCClient — a Type3E socket is NOT thread-safe,
        # so per-endpoint locks serialize both client creation and use
        # while distinct endpoints still poll fully concurrently.
        import threading

        self._locks: dict[tuple[str, int], threading.Lock] = {
            key: threading.Lock() for key in {(ip, port) for _, ip, port in self.hosts}
        }

    def _client(self, ip: str, port: int) -> MCClient:
        key = (ip, port)
        if key not in self._clients:
            self._clients[key] = MCClient(
                ip, port, plctype=self.plctype, timeout_s=self.timeout_s, retries=self.retries
            )
        return self._clients[key]

    def _poll(self, tick: int) -> list[tuple]:
        """One tick: every host polled CONCURRENTLY (one thread per
        host, mirroring the reference's per-IP reader tasks) so a dead
        host's retry/timeout budget never delays the live hosts' rows —
        the tick costs max(host latencies), not their sum."""
        from concurrent.futures import ThreadPoolExecutor

        def one(entry):
            raw, ip, port = entry
            try:
                with self._locks[(ip, port)]:
                    words = self._client(ip, port).read_words(self.devices)
            except Exception:
                words = [None] * len(self.devices)
            return [
                (raw, tick, d, None if w is None else int(w))
                for d, w in zip(self.devices, words)
            ]

        rows: list[tuple] = []
        with ThreadPoolExecutor(max_workers=len(self.hosts)) as ex:
            for host_rows in ex.map(one, self.hosts):
                rows.extend(host_rows)
        return rows

    def initialOffset(self):
        return {"tick": 0}

    def read(self, start):
        t = int(start["tick"])
        # list-iterator, not generator: the prefetch cache both
        # next()s and copy.copy()s the return (see plc_source.py)
        return iter(self._poll(t)), {"tick": t + 1}

    def readBetweenOffsets(self, start, end):
        rows: list[tuple] = []
        for t in range(int(start["tick"]), int(end["tick"])):
            rows.extend(self._poll(t))
        return iter(rows)

    def commit(self, end):
        pass

    def stop(self):
        for c in self._clients.values():
            c.close()
        self._clients.clear()


class PLCLiveDataSource(DataSource):
    """``plclive``: real-device twin of ``plcsim``.

    Options: ``hosts`` (comma ``ip[:port]`` list), ``devices`` (comma
    MC device-name list, e.g. ``"D100,D101"``), ``plctype``
    (``Q``/``L``/``iQ-R``...), ``timeout_s``, ``retries``::

        spark.readStream.format("plclive")
             .option("hosts", "192.168.130.10,192.168.130.11:5010")
             .option("devices", "D100,D101,D102")
             .load()
    """

    @classmethod
    def name(cls):
        return "plclive"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):
        return PLCLiveStreamReader(self.options)


def register_plclive(spark) -> None:
    """Idempotent registration of the ``plclive`` format. Requires the
    ``[plc]`` extra at STREAM START (first poll), not at registration:
    registration only ships the class."""
    spark.dataSource.register(PLCLiveDataSource)


# ── pyodbc / AS400 connection factories for the dbapi MERGE executors ────────


def mssql_connect_factory(
    server: str,
    database: str,
    uid: str,
    pwd: str,
    *,
    driver: str = "ODBC Driver 18 for SQL Server",
    **extra: str,
) -> ConnectFactory:
    """Picklable pyodbc factory for the SQL Server record store — the
    reference's connection (Prensas.py:93-99) as executor-side
    configuration. Hand to :func:`~.dbapi.dbapi_upsert` or
    ``format("dbapi")`` with ``dialect="tsql"``::

        fac = mssql_connect_factory("192.168.130.47", "IOT_YKM", "sa", "...")
        dbapi_upsert(df, fac, "registros", ["id"], dialect="tsql")

    The factory only stores the connection STRING; pyodbc imports on
    the executor (``[mssql]`` extra must be installed cluster-wide).

    Encryption note: the default ``ODBC Driver 18 for SQL Server``
    enforces ``Encrypt=yes`` (a behavior change from Driver 17, which
    the reference deployment uses). Against a plant SQL Server without
    a trusted TLS certificate the connection FAILS at connect time —
    pass ``Encrypt="no"`` or ``TrustServerCertificate="yes"`` via
    ``**extra`` (or ``driver="ODBC Driver 17 for SQL Server"``) to
    match the reference deployment's plaintext/self-signed setup::

        mssql_connect_factory(host, db, uid, pwd, TrustServerCertificate="yes")
    """
    parts = [f"DRIVER={{{driver}}}", f"SERVER={server}", f"DATABASE={database}", f"UID={uid}", f"PWD={pwd}"]
    parts += [f"{k}={v}" for k, v in extra.items()]
    return ConnectFactory("pyodbc", ";".join(parts) + ";")


def as400_connect_factory(
    host: str,
    user: str,
    password: str,
    *,
    database: str = "",
    driver: str = "iSeries Access ODBC Driver",
) -> ConnectFactory:
    """Picklable pyodbc factory for the AS400/DB2-for-i multiplier
    host (Prensas.py:102-113 — iSeries Access ODBC, optional ``DBQ``
    library). Pair with ``dialect="db2"`` for the MERGE spelling."""
    conn = f"DRIVER={{{driver}}};SYSTEM={host};UID={user};PWD={password};"
    if database:
        conn += f"DBQ={database};"
    return ConnectFactory("pyodbc", conn)
