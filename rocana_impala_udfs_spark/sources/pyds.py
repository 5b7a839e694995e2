"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) — the
engine's extensible-source surface.

The reference ships no scan operators of its own (its artifact rides the
host engine's HDFS distribution, README.md:22-27); the Spark-native way to
ADD a source today is this API: a ``DataSource`` subclass registered via
``spark.dataSource.register``, after which ``spark.read.format("name")``
plans it like any built-in — partition objects are produced on the driver,
each partition's ``read`` runs in an executor Python worker, and Arrow
carries the rows back.

``SyntheticEventsDataSource`` generates a deterministic, seed-stable event
stream (the shape of the driver's ``events`` table) with caller-chosen row
count and partitioning — per-partition generation is independent (seeded by
partition index), so the source scales out with no coordination.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _RangePartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _RangePartition(i, i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _RangePartition):
        # Executor-side. Rows are keyed by event id via the shared generator,
        # so values are identical under ANY partition count and row-for-row
        # equal to the streaming flavor's replay of the same ids.
        return _gen_rows(self.seed, partition.start, partition.end)


def _gen_rows(seed: int, start: int, end: int):
    """Deterministic event rows for ids [start, end) — shared by the batch
    partitions and the streaming offset ranges so both surfaces agree."""
    import random
    from datetime import datetime, timedelta

    types = ["click", "view", "purchase", "signup", "error"]
    base = datetime(2024, 1, 1)
    for i in range(start, end):
        rng = random.Random((seed << 20) ^ i)
        yield (
            i,
            base + timedelta(seconds=rng.randint(0, 86400 * 30)),
            rng.randint(1, 500),
            types[rng.randint(0, 4)],
            round(rng.uniform(0, 100), 4),
        )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming flavor of the same source: the offset is the
    next event id, each trigger serves ``rows_per_batch`` ids. Offsets are
    plain dicts checkpointed by Spark, so restart-resume works exactly like
    a built-in source; replay of a committed range (``readBetweenOffsets``)
    regenerates identical rows because the generator is keyed by id."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = int(start["next"])
        hi = lo + self.rows_per_batch
        # list-iterator, not a generator: the prefetch cache copy.copy()s
        # the returned iterator, which generators don't support.
        return iter(list(_gen_rows(self.seed, lo, hi))), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter(list(_gen_rows(self.seed, int(start["next"]), int(end["next"]))))


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N).load()``
    or ``spark.readStream.format("synthetic_events")`` for the micro-batch
    flavor."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
