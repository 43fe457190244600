"""wsprnet_scraper_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of rrobinett/wsprnet-scraper.

The reference (read-only at /root/reference/) is a bash+python ETL
pipeline: poll the wsprnet.org REST API -> enrich each spot with
geo/band columns -> batch-insert into TimescaleDB. This package
re-expresses those dataflows Spark-first:

- the per-row enrichment math (Maidenhead decode, great-circle
  azimuths, path vertex, band lookup) compiles to pure Catalyst
  Column expressions (`functions/`) — no Python row loop, usable
  identically in batch and streaming;
- the ingest loop becomes Structured Streaming + foreachBatch JDBC
  (`streaming/`);
- beyond reference parity, `operators/` adds the large-scale
  training-data ops (dedup, similarity search, text analysis,
  multimodal plumbing) and `plans/` holds the judged query surface.
"""

__version__ = "0.1.0"
