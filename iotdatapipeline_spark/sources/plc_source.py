"""PLC register source as a REAL Spark data source (Python DataSource
API, Spark 4): ``spark.read.format("plcsim")`` /
``spark.readStream.format("plcsim")``.

The reference polls Mitsubishi PLCs over pymcprotocol — per IP, one
batched register-block read per ~1 s tick (Prensas.py:506-509,
602-604) — and the repo has so far simulated that with a file-replay
stream. This module closes the connector-shape gap: the PLC becomes a
first-class PLUGGABLE SOURCE speaking Spark's source protocol
(partition planning for the batch scan; offsets / rate limiting /
commit for the stream), so swapping the simulated register read for a
pymcprotocol call is a one-method change (``_word``), not a pipeline
change — exactly how a production deployment would host the real
device protocol.

The simulated register map is md5-derived and therefore
ENGINE-REPRODUCIBLE: word(station, tick, address) =
int(md5("s:t:a")[:4hex], 16) — a DuckDB oracle regenerates the exact
same words with ``generate_series`` + ``md5``, giving the custom
source full value-hash driver gates (plans/lakehouse-style) with no
side files.

Scale shape: batch partitions are STATION RANGES (option
``partition_stations``), so a cluster scans disjoint station blocks in
parallel — the real topology too (each executor polls a subset of
IPs). The stream reader's offset is the global tick counter;
``ticks_per_batch`` rate-limits each micro-batch exactly like
``maxFilesPerTrigger`` in the replay source.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "station bigint, tick bigint, address bigint, word bigint"


def word_at(station: int, tick: int, address: int) -> int:
    """Deterministic 16-bit register word — the simulated PLC memory.
    A production build replaces this with the pymcprotocol batched
    block read (Prensas.py:506-509); everything else is unchanged."""
    key = f"{station}:{tick}:{address}".encode()
    return int(hashlib.md5(key).hexdigest()[:4], 16)


def oracle_sql(stations: int, ticks: int, registers: int) -> str:
    """DuckDB SQL regenerating the source's exact output — the oracle
    twin of a full scan at these dimensions."""
    return f"""
    SELECT s.i AS station, t.i AS tick, a.i AS address,
           ('0x' || substr(md5(s.i || ':' || t.i || ':' || a.i), 1, 4))::BIGINT AS word
    FROM generate_series(0, {stations - 1}) s(i),
         generate_series(0, {ticks - 1}) t(i),
         generate_series(0, {registers - 1}) a(i)
    """


class _StationRange(InputPartition):
    def __init__(self, lo: int, hi: int, t0: int, t1: int):
        self.lo, self.hi, self.t0, self.t1 = lo, hi, t0, t1


def _emit(p: _StationRange, registers: int):
    for s in range(p.lo, p.hi):
        for t in range(p.t0, p.t1):
            for a in range(registers):
                yield (s, t, a, word_at(s, t, a))


class PLCSimBatchReader(DataSourceReader):
    """Full scan of the register history: one partition per station
    range — the unit a cluster parallelizes over."""

    def __init__(self, options):
        self.stations = int(options.get("stations", 40))
        self.ticks = int(options.get("ticks", 10))
        self.registers = int(options.get("registers", 6))
        self.chunk = max(1, int(options.get("partition_stations", 8)))

    def partitions(self):
        return [
            _StationRange(lo, min(lo + self.chunk, self.stations), 0, self.ticks)
            for lo in range(0, self.stations, self.chunk)
        ]

    def read(self, partition):
        return _emit(partition, self.registers)


class PLCSimStreamReader(SimpleDataSourceStreamReader):
    """Tick-offset stream over the same register map, on the SIMPLE
    stream-reader contract: Spark hands ``read(start)`` the current
    checkpointed start offset and the reader returns (rows, next
    offset) — the offset trajectory is a pure function of the
    checkpoint, so a restarted reader is monotone BY CONSTRUCTION.
    (The first cut used the partition-planning
    ``DataSourceStreamReader`` with a per-call ``latestOffset``
    counter; a restart reset the counter and Spark — to which offsets
    are opaque JSON — happily committed a backward batch, duplicating
    delivered ticks. The test that caught it is
    tests/test_plc_source.py::test_checkpoint_restart_no_dup_no_loss.)
    ``ticks_per_batch`` rate-limits each micro-batch;
    ``readBetweenOffsets`` replays a logged-but-uncommitted batch after
    restart."""

    def __init__(self, options):
        self.stations = int(options.get("stations", 40))
        self.max_ticks = int(options.get("ticks", 10))
        self.registers = int(options.get("registers", 6))
        self.per_batch = max(1, int(options.get("ticks_per_batch", 2)))

    def initialOffset(self):
        return {"tick": 0}

    def read(self, start):
        t0 = int(start["tick"])
        t1 = min(t0 + self.per_batch, self.max_ticks)
        # a LIST ITERATOR, not a generator: the runner's prefetch
        # cache both next()s the return value AND copy.copy()s it
        # (datasource_internal.py add_result_to_cache / getCache);
        # generators aren't copyable and bare lists aren't iterators
        rows = list(_emit(_StationRange(0, self.stations, t0, t1), self.registers))
        return iter(rows), {"tick": t1}

    def readBetweenOffsets(self, start, end):
        # iterator required (DATA_SOURCE_INVALID_RETURN_TYPE on a bare
        # list); list-iterator rather than generator for copyability,
        # matching read()
        return iter(
            list(
                _emit(
                    _StationRange(0, self.stations, int(start["tick"]), int(end["tick"])),
                    self.registers,
                )
            )
        )

    def commit(self, end):
        # nothing external to acknowledge in the simulation; the real
        # PLC is a poll-only device with no consumer offsets either
        pass


class PLCSimDataSource(DataSource):
    """``plcsim``: the PLC register map as a pluggable Spark source.

    Options: ``stations``, ``ticks``, ``registers``,
    ``partition_stations`` (batch-scan parallelism unit),
    ``ticks_per_batch`` (stream rate limit)."""

    @classmethod
    def name(cls):
        return "plcsim"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return PLCSimBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return PLCSimStreamReader(self.options)


def register_plcsim(spark) -> None:
    """Idempotent registration of the ``plcsim`` format on a session."""
    spark.dataSource.register(PLCSimDataSource)
