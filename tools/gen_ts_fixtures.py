#!/usr/bin/env python3
"""Regenerate src/test/resources/tsfix/*.parquet (EventsTypeMatrixSpec).

Build-time tooling only — pyarrow is NOT a library/test dependency; the
committed parquet files are what the spec reads. Three variants of the
driver's `events` schema differing only in the physical type of `ts`:
  - events_int64_ns : plain int64 epoch nanoseconds (round<=6 layout)
  - events_us_ntz   : TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 7+)
  - events_us_ltz   : TIMESTAMP(MICROS, isAdjustedToUTC=true)
  - events_ns_ntz   : TIMESTAMP(NANOS, isAdjustedToUTC=false)
  - events_ns_ltz   : TIMESTAMP(NANOS, isAdjustedToUTC=true)
The NANOS variants are readable ONLY under
spark.sql.legacy.parquet.nanosAsLong=true (set at runtime by
Tables.events), where they surface as int64 nanos; without the conf
Spark 4.1 rejects them with PARQUET_TYPE_ILLEGAL.
"""
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "src/test/resources/tsfix"
# 8 rows, micro-precision, days 0,2,..,14 of 2024-01; keep in sync with
# EventsTypeMatrixSpec.expectedUs
us = [1704067200000000 + d * 86400000000 + 123456 for d in range(0, 15, 2)]
n = len(us)

def tbl(ts_arr):
    return pa.table({
        "event_id": pa.array(list(range(1, n + 1)), pa.int64()),
        "ts": ts_arr,
        "user_id": pa.array([i * 10 for i in range(1, n + 1)], pa.int64()),
        "event_type": pa.array(["click" if i % 2 == 0 else "view" for i in range(n)]),
        "value": pa.array([float(i) + 0.5 for i in range(n)], pa.float64()),
        "props": pa.array(["{}"] * n),
    })

pq.write_table(tbl(pa.array([u * 1000 for u in us], pa.int64())), f"{OUT}/events_int64_ns.parquet")
pq.write_table(tbl(pa.array(us, pa.timestamp("us"))), f"{OUT}/events_us_ntz.parquet")
pq.write_table(tbl(pa.array(us, pa.timestamp("us", tz="UTC"))), f"{OUT}/events_us_ltz.parquet")
pq.write_table(tbl(pa.array([u * 1000 for u in us], pa.timestamp("ns"))), f"{OUT}/events_ns_ntz.parquet")
pq.write_table(tbl(pa.array([u * 1000 for u in us], pa.timestamp("ns", tz="UTC"))), f"{OUT}/events_ns_ltz.parquet")
