"""Generate larger scale factors by deterministic replica-tiling of the
driver's read-only sf0.1 testdata (TESTDATA.md).

Why tiling instead of a fresh synthetic generator: the driver's
generator is not available, and tiling preserves the *distributions*
(value ranges, group cardinalities per key, null rates, text/embedding
geometry) exactly — every replica is the sf0.1 data with its keys
shifted into a disjoint range, so joins stay consistent within a
replica and per-key group sizes match sf0.1. Aggregate-level row counts
scale linearly, which is what a scale-up bench needs.

Blowup guards (documented because naive tiling would poison the dedup /
ANN benchmarks):
- document text gets a per-replica suffix keyed on ``hash(text)`` so
  texts that were identical inside a replica STAY identical (intra-
  replica dup structure preserved) while cross-replica copies become
  near-duplicates, not exact ones — near-dup pair counts grow ~linearly
  in replicas, not quadratically;
- embeddings get small deterministic gaussian noise per replica
  (seeded, sigma = 2% of the global component std) so cross-replica
  vectors are near- but not exact duplicates;
- customer/supplier names get a ``-r<k>`` tag so fuzzy entity
  resolution doesn't see 10 exact copies of every name.

Usage:
    python tools/gen_scale_data.py [--reps 10] [--out /root/repo/.scaledata/sf1]

Writes one parquet file per table, same layout as /root/testdata/sf*.
Deterministic: same inputs + reps -> identical bytes (fixed seeds, no
wall clock). Never touches /root/testdata.
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# Key ranges in the sf0.1 source (verified: all are 0-based contiguous).
OFFSETS = {
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    "p_partkey": 20_000,
    "o_orderkey": 150_000,
    "o_custkey": 15_000,
    "l_orderkey": 150_000,
    "l_partkey": 20_000,
    "l_suppkey": 1_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}

# Per-table select templates; {k} is the replica index column.
TABLE_SQL = {
    "region": None,  # fixed dimension: copy verbatim
    "nation": None,
    "customer": """
        SELECT c_custkey + k*{c_custkey} AS c_custkey,
               c_name || CASE WHEN k=0 THEN '' ELSE '-r'||k END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM src, range({reps}) t(k)""",
    "supplier": """
        SELECT s_suppkey + k*{s_suppkey} AS s_suppkey,
               s_name || CASE WHEN k=0 THEN '' ELSE '-r'||k END AS s_name,
               s_nationkey, s_acctbal
        FROM src, range({reps}) t(k)""",
    "part": """
        SELECT p_partkey + k*{p_partkey} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM src, range({reps}) t(k)""",
    "orders": """
        SELECT o_orderkey + k*{o_orderkey} AS o_orderkey,
               o_custkey + k*{o_custkey} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src, range({reps}) t(k)""",
    "lineitem": """
        SELECT l_orderkey + k*{l_orderkey} AS l_orderkey,
               l_partkey + k*{l_partkey} AS l_partkey,
               l_suppkey + k*{l_suppkey} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src, range({reps}) t(k)""",
    "events": """
        SELECT event_id + k*{event_id} AS event_id, ts,
               user_id + k*{user_id} AS user_id,
               event_type, value, props
        FROM src, range({reps}) t(k)""",
    "documents": """
        SELECT doc_id + k*{doc_id} AS doc_id,
               text || CASE WHEN k=0 THEN ''
                       ELSE ' r'||k||'x'||(abs(hash(text)) % 997) END AS text,
               lang, source,
               n_chars + CASE WHEN k=0 THEN 0
                         ELSE 4 + len(''||k) + len(''||(abs(hash(text)) % 997))
                         END AS n_chars
        FROM src, range({reps}) t(k)""",
}


def tile_sql_tables(out_dir: str, reps: int) -> None:
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for name, tpl in TABLE_SQL.items():
        src = f"{SRC}/{name}.parquet"
        dst = os.path.join(out_dir, f"{name}.parquet")
        if tpl is None:
            sql = f"SELECT * FROM read_parquet('{src}')"
        else:
            body = tpl.format(reps=reps, **OFFSETS)
            sql = body.replace("FROM src", f"FROM read_parquet('{src}')")
        con.execute(
            # ROW_GROUP_SIZE: without it DuckDB writes one giant row
            # group per file, and a Spark scan of that file is ONE task
            # no matter how many splits it plans (a row group is the
            # minimum read unit) — measured at sf10: every corpus scan
            # ran single-task until this was fixed.
            f"COPY ({sql}) TO '{dst}' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 65536)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{name}: {n} rows")


def tile_embeddings(out_dir: str, reps: int) -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = tbl.column("vec_id").to_numpy()
    labels = tbl.column("label").to_numpy()
    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    sigma = 0.02 * float(emb.std())
    out_ids, out_labels, out_vecs = [], [], []
    for k in range(reps):
        rng = np.random.RandomState(1000 + k)
        v = emb if k == 0 else (emb + rng.normal(0.0, sigma, emb.shape)).astype(
            np.float32
        )
        out_ids.append(vec_ids + k * OFFSETS["vec_id"])
        out_labels.append(labels)
        out_vecs.append(v)
    ids = np.concatenate(out_ids)
    labs = np.concatenate(out_labels)
    vecs = np.concatenate(out_vecs)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1), type=pa.float32()), vecs.shape[1]
    ).cast(pa.list_(pa.float32()))
    out = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": arr,
            "label": pa.array(labs, type=pa.int32()),
        }
    )
    pq.write_table(
        out,
        os.path.join(out_dir, "embeddings.parquet"),
        compression="zstd",
        # ≥32 row groups so a Spark scan parallelizes (see the COPY
        # note above); single-row-group files made every embedding
        # scan single-task at sf1/sf10.
        row_group_size=max(1024, len(ids) // 32),
    )
    print(f"embeddings: {len(ids)} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.scaledata/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    tile_sql_tables(args.out, args.reps)
    tile_embeddings(args.out, args.reps)


if __name__ == "__main__":
    main()
