"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) —
a deterministic synthetic-corpus generator.

The reference reads fixed Delta tables (`01_merchcat_etl.py:20-27`);
this engine additionally needs load-test input at ARBITRARY scale
without staging 100 TB first. ``synthetic_corpus`` plans N partitions
driver-side and generates rows executor-side — zero input IO, linear
scale-out, and fully deterministic: a (seed, doc_id) pair always yields
the same document, independent of partition count, so results are
reproducible across cluster sizes.

This is also the engine's exercise of the Python DataSource API surface
itself (partition planning + per-partition iterators), the modern
replacement for RDD-based custom inputs.

Usage::

    register_synthetic_corpus(spark)
    df = (spark.read.format("synthetic_corpus")
          .option("n_rows", 100_000).option("n_partitions", 32)
          .option("seed", 7).load())
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu data spark corpus merchant narrative token"
).split()

_LANGS = ["en", "fr", "de", "es"]
_SOURCES = ["web", "wiki", "news"]

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


class _CorpusPartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class _CorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        # contiguous row ranges; row content depends only on (seed,
        # doc_id), so any partitioning yields identical data
        per = -(-self.n_rows // self.n_partitions)
        return [
            _CorpusPartition(lo, min(lo + per, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _CorpusPartition):
        for doc_id in range(partition.start, partition.end):
            rng = random.Random((partition.seed << 40) ^ doc_id)
            n = rng.randint(5, 60)
            text = " ".join(rng.choice(_WORDS) for _ in range(n))
            yield (
                doc_id,
                text,
                rng.choice(_LANGS),
                rng.choice(_SOURCES),
                len(text),
            )


class SyntheticCorpusSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _CorpusReader:
        return _CorpusReader(self.options)


def register_synthetic_corpus(spark) -> None:
    spark.dataSource.register(SyntheticCorpusSource)
