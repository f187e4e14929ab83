"""bag_parser_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of digitaldutch/BAG_parser.

The reference (``/root/reference``) is a single-node Python+SQLite batch ETL
pipeline. This package re-expresses its operator semantics — scans,
projections, temporal filters, chained/update/explode joins, last-write-wins
upserts, grouped statistics, data-cleaning rules, invariant validation,
CSV/XML sources and sinks — as idiomatic PySpark DataFrame transformations
designed for a multi-executor cluster at 100 TB scale, plus the
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal column plumbing) a modern large-scale corpus pipeline needs.

Layout:
  functions/   scalar & coordinate-transform expression helpers (SURVEY §2.8)
  operators/   join / dedup / aggregate / similarity / text operators (§2.2-2.7)
  sources/     parquet / CSV / XML readers and schemas (§2.1)
  plans/       the composed pipelines: adressen build, validation, export (§3)
  streaming/   Structured Streaming extensions (§2.9 extension)
"""

__version__ = "0.1.0"
