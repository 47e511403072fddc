"""Sources & sinks — the Spark analog of the reference's storage surface.

The reference's only "connector" is its own page/block storage engine
(doradb-storage) fed by DDL + (parsed-only) DML; there are no file
formats (SURVEY.md §2.6). Here the storage layer IS Spark's source API:
parquet (primary, what the driver testdata uses), CSV — including
classic ``dbgen``-style ``.tbl`` pipe-delimited files — and JSON lines,
all with **explicit schemas, never inference** (the reference is
DDL-declared/schema-fixed, doradb-catalog/src/lib.rs:60-99, and at
100 TB schema inference is a full extra pass over the data).

Writers cover partitioned parquet (partition pruning at read time — the
coarse-grained analog of the reference's SMA zone-map skipping,
doradb-storage/src/col/sma.rs:10-15) and bucketed tables (pre-shuffled
join co-location, the scale path for repeated fact-fact joins).
"""

from xngin_spark.sources.schemas import REFERENCE_SCHEMAS, schema_for
from xngin_spark.sources.readers import read_csv, read_json, read_parquet, read_tbl
from xngin_spark.sources.writers import write_parquet, write_bucketed_table

__all__ = [
    "REFERENCE_SCHEMAS",
    "schema_for",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_tbl",
    "write_parquet",
    "write_bucketed_table",
]
