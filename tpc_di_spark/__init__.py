"""tpc_di_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the query and data-processing capabilities of the reference
TPC-DI implementation (Reitnos/TPC-DI, read-only at /root/reference) as an
idiomatic Spark engine:

- ``tpc_di_spark.lake``      — transactional bucketed-parquet table format
  (snapshot log, atomic commits, schema evolution, time travel) standing in
  for the Iceberg sink; MERGE is copy-on-write per bucket.
- ``tpc_di_spark.cdc``       — the change-event apply pipeline: LWW dedup,
  SCD2 expire-and-insert, exactly-once batch orchestration with
  per-partition-group checkpoint manifests and mid-batch resume.
- ``tpc_di_spark.operators`` — reusable DataFrame operators mirroring the
  reference's semantic units (SURVEY.md §2): temporal/as-of joins, running
  balances, trailing windows, top-1 per key, change detection, dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search.
- ``tpc_di_spark.functions`` — scalar/column function library (cleaning,
  phone formatting, nameplate tagging, text analysis, multimodal plumbing).
- ``tpc_di_spark.sources``   — scans for the reference's source formats
  (pipe-delimited, CSV, fixed-width FINWIRE, nested XML action logs).
- ``tpc_di_spark.streaming`` — Structured Streaming wrapper
  (``foreachBatch`` → CDC apply) over the same engine.

Everything is DataFrame/Column expressions or vectorized pandas/Arrow UDFs;
no per-row Python, no RDDs, no driver-side collect loops in hot paths.
"""

__version__ = "0.1.0"
