#!/usr/bin/env python3
"""Generate an N×-scaled corpus from an existing sf directory (driver-side
pyarrow tooling, like gen_ts_fixtures.py) — the input for SCALE.md's
measured scale-trend table.

STRUCTURE-PRESERVING replication: the point is that per-copy workload
semantics stay IDENTICAL to the source corpus, so total work grows
exactly linearly and a super-linear runtime trend can only come from the
engine, never from the data:

- documents: copy k>0 remaps every token w -> "w~k" — a BIJECTION on the
  vocabulary, so every shingle/MinHash/SimHash similarity WITHIN a copy
  is preserved exactly (dup families replicate 1:1) while cross-copy
  token sets are disjoint (no artificial cross-copy near-dups, which
  would grow candidate pairs quadratically and poison the trend).
  doc_id offsets by copy; n_chars recomputed; source kept (sources grow
  with the corpus, per-(source,reader) keying stays realistic).
- embeddings: copy k>0 applies a seeded random ROTATION Q_k (orthogonal,
  via QR) — all within-copy inner products (cosine near-dup structure,
  cluster geometry) are preserved exactly; cross-copy cosines are
  ~N(0, 1/64), far below every threshold. vec_id offsets by copy, so the
  query set (vec_id < 10) stays the 10 original vectors while the corpus
  grows N× — the ANN scale shape.
- events: event_id/user_id offset by copy — N× users at the same
  per-user density and time window, so self-join bucket density and
  window state scale linearly.
- orders/lineitem: orderkeys offset by copy (referential integrity
  kept); part/supplier/customer keys unchanged — dimensions grow
  sublinearly in a real warehouse, so dimension joins stay broadcastable.
- region/nation/customer/supplier/part: copied verbatim.

Deterministic (fixed seeds); one parquet file per table with one row
group per copy (the multi-row-group layout a real lake has).

Usage: python3 tools/gen_scale.py <src_sf_dir> <out_dir> <factor>
"""
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_VERBATIM = ["region", "nation", "customer", "supplier", "part"]


def read(src, name):
    return pq.read_table(f"{src}/{name}.parquet")


def writer_for(out, name, schema):
    return pq.ParquetWriter(f"{out}/{name}.parquet", schema)


def offset_col(t, col, off):
    i = t.schema.get_field_index(col)
    c = pc.add(t.column(col), pa.scalar(off, type=t.schema.field(col).type))
    return t.set_column(i, t.schema.field(col), c)


def scale_keyed(src, out, name, key_offsets, factor, fixed_offs=None):
    """key_offsets: columns to offset per copy. Offsets default to
    max(col)+1 computed on THIS table; fixed_offs overrides per column —
    used to keep cross-table key spaces aligned (lineitem's l_orderkey must
    shift by ORDERS' offset, or any orderkey without lineitems would
    desynchronize the two and silently break referential integrity for
    every copy k>0)."""
    t = read(src, name)
    # strip the pandas metadata so the writer schema is purely structural
    t = t.replace_schema_metadata(None)
    offs = {c: (fixed_offs or {}).get(
                c, int(pc.max(t.column(c)).as_py()) + 1)
            for c in key_offsets}
    with writer_for(out, name, t.schema) as w:
        for k in range(factor):
            tk = t
            for c in key_offsets:
                tk = offset_col(tk, c, k * offs[c])
            w.write_table(tk)
    print(f"  {name}: {t.num_rows} x {factor} rows")


def scale_documents(src, out, factor):
    t = read(src, "documents").replace_schema_metadata(None)
    doc_off = int(pc.max(t.column("doc_id")).as_py()) + 1
    texts = t.column("text").to_pylist()
    doc_ids = t.column("doc_id").to_pylist()
    langs = t.column("lang")
    sources = t.column("source")
    with writer_for(out, "documents", t.schema) as w:
        for k in range(factor):
            if k == 0:
                tk = t
            else:
                # bijective token map: similarity-preserving within the
                # copy, vocabulary-disjoint across copies
                suf = f"~{k}"
                mapped = [" ".join(tok + suf for tok in s.split(" "))
                          for s in texts]
                tk = pa.table({
                    "doc_id": pa.array([d + k * doc_off for d in doc_ids],
                                       type=t.schema.field("doc_id").type),
                    "text": pa.array(mapped, type=pa.string()),
                    "lang": langs,
                    "source": sources,
                    "n_chars": pa.array([len(s) for s in mapped],
                                        type=t.schema.field("n_chars").type),
                }, schema=t.schema)
            w.write_table(tk)
    print(f"  documents: {t.num_rows} x {factor} rows (token-remapped copies)")


def scale_embeddings(src, out, factor):
    t = read(src, "embeddings").replace_schema_metadata(None)
    vec_off = int(pc.max(t.column("vec_id")).as_py()) + 1
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    dim = vecs.shape[1]
    vec_ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    labels = t.column("label")
    emb_type = t.schema.field("embedding").type
    with writer_for(out, "embeddings", t.schema) as w:
        for k in range(factor):
            if k == 0:
                tk = t
            else:
                rng = np.random.RandomState(4242 + k)
                q, _ = np.linalg.qr(rng.randn(dim, dim))
                rot = (vecs @ q.T).astype(np.float32)
                tk = pa.table({
                    "vec_id": pa.array(vec_ids + k * vec_off,
                                       type=t.schema.field("vec_id").type),
                    "embedding": pa.array(list(rot), type=emb_type),
                    "label": labels,
                }, schema=t.schema)
            w.write_table(tk)
    print(f"  embeddings: {t.num_rows} x {factor} rows (rotated copies)")


def main(src, out, factor, tables=None):
    """tables: optional csv subset ("documents,embeddings") — a third-decade
    (1000×) corpus of every fact table is tens of GB and most of it unused
    when the measured subset only reads documents/embeddings; dimensions
    are always copied (they are KBs and Tables warm-up expects them)."""
    factor = int(factor)
    want = set(tables.split(",")) if tables else None
    def wanted(name):
        return want is None or name in want
    import os
    os.makedirs(out, exist_ok=True)
    for name in COPY_VERBATIM:
        shutil.copyfile(f"{src}/{name}.parquet", f"{out}/{name}.parquet")
        print(f"  {name}: copied verbatim (dimension)")
    # one shared orderkey offset for both tables (ADVICE r9): deriving
    # lineitem's from max(l_orderkey) diverges from orders' whenever the
    # highest orderkeys lack lineitems, breaking o↔l joins in every copy
    if wanted("orders") or wanted("lineitem"):
        order_off = int(pc.max(read(src, "orders").column("o_orderkey")
                               ).as_py()) + 1
        scale_keyed(src, out, "orders", ["o_orderkey"], factor,
                    fixed_offs={"o_orderkey": order_off})
        scale_keyed(src, out, "lineitem", ["l_orderkey"], factor,
                    fixed_offs={"l_orderkey": order_off})
    if wanted("events"):
        scale_keyed(src, out, "events", ["event_id", "user_id"], factor)
    if wanted("documents"):
        scale_documents(src, out, factor)
    if wanted("embeddings"):
        scale_embeddings(src, out, factor)
    print(f"done -> {out}")


if __name__ == "__main__":
    main(*sys.argv[1:5])
