"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic-events generator — the dsdgen-style load source every scale
test wants, as a first-class `spark.read.format(...)` citizen.

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
               .option("rows", 100_000).option("partitions", 32).load())

Rows derive from the engine-neutral multiplicative hash of the row id, so
any (rows, partitions) request yields bit-identical content on every run
and every cluster layout — generation is embarrassingly parallel (one
InputPartition per slice, no driver materialization) and columns match
the events table shape for drop-in load testing.

This is the one deliberately Python-path source in the engine: a
GENERATOR is source-bounded (no upstream bytes to scan), so Python row
assembly is the cost ceiling by construction, not a hot-path tax.  At
real scale you point the same query at parquet; this source exists to
exercise plans and partitioning without any files at all.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

HASH_MULT = 2654435761
HASH_MOD = 1 << 32
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

SCHEMA = ("event_id bigint, user_id bigint, event_type string, "
          "value double, ts timestamp")


def _hash(i: int) -> int:
    return (i % HASH_MOD) * HASH_MULT % HASH_MOD


class _SlicePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.partitions_n = int(options.get("partitions", 8))
        self.n_users = int(options.get("users", max(1, self.rows // 64)))

    def partitions(self):
        per = -(-self.rows // self.partitions_n)  # ceil
        return [_SlicePartition(i * per, min((i + 1) * per, self.rows))
                for i in range(self.partitions_n)
                if i * per < self.rows]

    def read(self, partition: _SlicePartition):
        naive_epoch = _EPOCH.replace(tzinfo=None)
        for i in range(partition.start, partition.end):
            h = _hash(i)
            yield (i,
                   h % self.n_users,
                   EVENT_TYPES[h % len(EVENT_TYPES)],
                   round((h % 100_000) / 100.0, 2),
                   naive_epoch + timedelta(seconds=h % 2_678_400))


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)
