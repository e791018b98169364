#!/usr/bin/env python3
"""One-shot generator for the committed events-ts fixture parquets.

The driver's testdata generator has shipped events.ts under two different
parquet encodings across rounds: TIMESTAMP(NANOS) (Spark reads it as a raw
int64 with nanosAsLong) and TIMESTAMP(MICROS) without UTC adjustment
(pyarrow default; Spark reads TIMESTAMP_NTZ). TablesSpec pins that
graft.Tables.events decodes BOTH to identical wall-clock values.

Run driver-side only (pyarrow is not a repo dependency):
    python3 tools/gen_ts_fixtures.py
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

rows = {
    "event_id": [1, 2, 3, 4],
    # distinct micros-precision instants incl. one pre-epoch-day boundary
    "user_id": [10, 11, 10, 12],
    "event_type": ["click", "purchase", "click", "view"],
    "value": [1.5, 2.5, 3.25, 0.0],
    "props": ["{}", "{}", "{}", "{}"],
}
# micros since epoch; exercise sub-second precision
micros = [1700000000000000, 1700000000123456, 1700000300000001, 1700003600999999]

base = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                    "resources", "fixtures")
for name, unit, vals in [
    ("events_nanos", "ns", [m * 1000 for m in micros]),
    ("events_micros", "us", micros),
]:
    d = os.path.join(base, name)
    os.makedirs(d, exist_ok=True)
    t = pa.table({
        "event_id": pa.array(rows["event_id"], pa.int64()),
        "ts": pa.array(vals, pa.timestamp(unit)),
        "user_id": pa.array(rows["user_id"], pa.int64()),
        "event_type": pa.array(rows["event_type"], pa.string()),
        "value": pa.array(rows["value"], pa.float64()),
        "props": pa.array(rows["props"], pa.string()),
    })
    # version 2.6 keeps nanos as TIMESTAMP(NANOS) instead of coercing
    pq.write_table(t, os.path.join(d, "events.parquet"), version="2.6")
    print(name, pq.read_schema(os.path.join(d, "events.parquet")).field("ts"))
