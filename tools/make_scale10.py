#!/usr/bin/env python3
"""Fabricate the 10x scale-rehearsal dirs for SCALE.md (round 9).

/root/testdata has no sf1, so the one-measured-scale-step the verdict
asked for uses an id-shifted 10x replication of sf0.1, written OUTSIDE
the repo's gate inputs (/tmp). This data is for MEASURING SCALING
EXPONENTS ONLY — it is never a correctness-gate input.

Two dirs, so the 10x exponent is apples-to-apples:
  /tmp/scale_base : replica 0 only, with the SAME per-replica transform
  /tmp/scale_10x  : replicas 0..9

Transforms (all pure DuckDB SQL, deterministic):
  documents  : doc_id += r*100_000; every token gains a replica-salt
               PREFIX ("a b" -> "r0a r0b") — a per-token bijection, so
               WITHIN a replica every pairwise k-gram Jaccard is
               EXACTLY the sf0.1 value (the first design, interleaved
               salt tokens, silently lowered the effective shingle
               order and blew d9 up 6-17x at 1x), while CROSS-replica
               shingle sets share nothing — replication must not
               fabricate 45x cross-copy dup pairs that would corrupt
               the exponent. The transform also applies to the base
               dir, keeping per-doc work identical across both runs.
  embeddings : vec_id += r*10_000; every component += r*0.0011 (break
               exact ties between replicas; bucket geometry per
               replica unchanged).
  tpch graph : keys shifted per replica (custkey +1e6, orderkey +1e7,
               partkey +1e6, suppkey +1e5); nation/region SHARED
               (fixed-size dims, as in TPC-H) — replicas connect
               through them, which only makes the WCC/PageRank step
               harder, never easier.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
BASE = "/tmp/scale_base"
TENX = "/tmp/scale_10x"

con = duckdb.connect()
con.execute("SET threads TO 16")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(sql, out, t):
    os.makedirs(out, exist_ok=True)
    path = f"{out}/{t}.parquet"
    con.execute(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
    print(f"{path}: {n} rows")


def gen(out, nrep):
    rep = f"(SELECT unnest(range({nrep})) AS r)"
    write(f"""
      SELECT doc_id + r*100000 AS doc_id,
             regexp_replace(text, '([^ ]+)', 'r' || r || '\\1', 'g') AS text,
             lang, source,
             CAST(length(regexp_replace(text, '([^ ]+)', 'r' || r || '\\1', 'g')) AS BIGINT)
               AS n_chars
      FROM {src('documents')}, {rep}""", out, "documents")
    write(f"""
      SELECT vec_id + r*10000 AS vec_id,
             list_transform(embedding, x -> CAST(x + r*0.0011 AS FLOAT))
               AS embedding,
             label
      FROM {src('embeddings')}, {rep}""", out, "embeddings")
    write(f"""
      SELECT c_custkey + r*1000000 AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM {src('customer')}, {rep}""", out, "customer")
    write(f"""
      SELECT o_orderkey + r*10000000 AS o_orderkey,
             o_custkey + r*1000000 AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM {src('orders')}, {rep}""", out, "orders")
    write(f"""
      SELECT l_orderkey + r*10000000 AS l_orderkey,
             l_partkey + r*1000000 AS l_partkey,
             l_suppkey + r*100000 AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM {src('lineitem')}, {rep}""", out, "lineitem")
    write(f"""
      SELECT p_partkey + r*1000000 AS p_partkey, p_name, p_brand,
             p_type, p_size, p_retailprice
      FROM {src('part')}, {rep}""", out, "part")
    write(f"""
      SELECT s_suppkey + r*100000 AS s_suppkey, s_name, s_nationkey,
             s_acctbal
      FROM {src('supplier')}, {rep}""", out, "supplier")
    for t in ("nation", "region", "events"):
        write(f"SELECT * FROM {src(t)}", out, t)


EV_BASE = "/tmp/scale_ev_base"
EV_TENX = "/tmp/scale_ev_10x"


def gen_events(out, nrep):
    """Streaming-family scale dirs: events replicated nrep× with
    user_id/event_id shifted per replica and ts UNCHANGED — the
    "10× traffic in the same wall-clock window" scale-up, so windowed
    aggregations see 10× keys per window while per-user session shapes
    stay bit-identical across replicas. Kept SEPARATE from
    scale_base/scale_10x: the relational table's q_range_join exponents
    were measured against the FIXED events table and must stay
    reproducible.
    """
    rep = f"(SELECT unnest(range({nrep})) AS r)"
    write(f"""
      SELECT event_id + r*10000000 AS event_id, ts,
             user_id + r*1000000 AS user_id, event_type, value, props
      FROM {src('events')}, {rep}""", out, "events")
    for t in ("nation", "region", "customer", "orders", "lineitem",
              "supplier", "part", "documents", "embeddings"):
        write(f"SELECT * FROM {src(t)}", out, t)


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "base"):
        gen(BASE, 1)
    if only in (None, "10x"):
        gen(TENX, 10)
    if only in (None, "events"):
        gen_events(EV_BASE, 1)
        gen_events(EV_TENX, 10)
    # second decade, opt-in only (1.7 GB): same transform, replicas
    # 0..99 — run the cheap sublinear queries to show the exponents
    # hold across TWO decades, not one lucky step
    if only == "100x":
        gen("/tmp/scale_100x", 100)
