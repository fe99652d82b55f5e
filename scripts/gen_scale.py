"""Deterministic sf1-scale table synthesis for scale evidence runs.

The driver provides parquet only up to sf0.1 (TESTDATA.md); VERDICT r3 #1
asks for the bench + a correctness pass one scale tier up. This script
synthesizes the four tables the bench consumes — ``customer``, ``orders``
(the link-graph source relations, builder.GRAPH_CTE), ``documents`` and
``embeddings`` — at 10x sf0.1 row counts, with the same schemas and the
same distribution *shape* (dense 0-based keys, uniform-ish order fan-out,
small-vocab word-salad documents with a dup stratum, 64-dim embeddings).
Everything is derived from seeded RNG / integer hashes — no external data,
bit-identical across runs (north-rule: synthesize deterministically at
small scale).

Usage:  python scripts/gen_scale.py [out_dir] [scale]
        # default: /root/repo/.data/sf1  10  (10x the sf0.1 counts)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark batch line column order small sort fast value scan hash slow "
    "group query table vector part agg stream customer the key filter "
    "window join a g"
).split()

# sf0.1 row counts (TESTDATA.md); scale multiplies these (the tiny dims
# region/nation stay fixed, like TPC-H)
BASE = {"customer": 15_000, "orders": 150_000, "documents": 5_000,
        "embeddings": 2_000, "events": 100_000, "lineitem": 600_000,
        "supplier": 1_000, "part": 20_000}


def gen_customer(n: int) -> pa.Table:
    rng = np.random.default_rng(4201)
    i = np.arange(n, dtype=np.int64)
    return pa.table({
        "c_custkey": i,
        "c_name": pa.array([f"Customer#{k}" for k in i], pa.string()),
        "c_nationkey": (i * 7 % 25).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n), 2),
        "c_mktsegment": pa.array(
            [["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
              "HOUSEHOLD"][k % 5] for k in i * 13 % 5], pa.string()),
    })


def gen_orders(m: int, n_cust: int) -> pa.Table:
    rng = np.random.default_rng(4202)
    i = np.arange(m, dtype=np.int64)
    # seeded-uniform fan-out over customers. Must be INDEPENDENT of the
    # o_orderkey multiplicative hash: builder.GRAPH_CTE derives
    # dst = (o_orderkey * 2654435761 + 7) % n, so a custkey built from the
    # same hash made dst = src - 6 (mod n) for every order — a circulant
    # 1-regular graph, not a random link graph (caught in the first sf1
    # bench: 238k distinct edges instead of ~1.5M, 33 PageRank supersteps)
    custkey = rng.integers(0, n_cust, size=m, dtype=np.int64)
    base_ts = np.datetime64("1995-01-01")
    return pa.table({
        "o_orderkey": i,
        "o_custkey": custkey,
        "o_orderstatus": pa.array(
            [["O", "F", "P"][int(k)] for k in i * 31 % 3], pa.string()),
        "o_totalprice": np.round(rng.uniform(900.0, 400_000.0, m), 2),
        "o_orderdate": pa.array(
            base_ts + ((i * 17) % 2557).astype("timedelta64[D]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"][int(k)] for k in i * 19 % 5], pa.string()),
    })


def _doc_text(key: int, rng_words: np.ndarray) -> str:
    # word count 8..97 from the key; words from the shared small vocab —
    # the same word-salad shape as the driver corpus (shingle-rich,
    # heavy-tailed shingle collisions for LSH)
    n_words = 8 + (key * 2654435761 % 90)
    # stride must NOT share a factor with the pool size (1_000_003 % pool
    # == 0 made every doc a prefix of one shared sequence — all 50k docs
    # landed in ONE LSH bucket and the candidate join went quadratic)
    start = key * 1009 % len(rng_words)
    idx = rng_words[(start + np.arange(n_words)) % len(rng_words)]
    return " ".join(VOCAB[j] for j in idx)


def gen_documents(n: int) -> pa.Table:
    rng = np.random.default_rng(4203)
    word_pool = rng.integers(0, len(VOCAB), size=1_000_003)
    rows = []
    for i in range(n):
        # dup stratum: ~0.16% of docs repeat doc 0's text (exact-dedup +
        # hot-LSH-bucket fixture, same rate as the driver corpus's 8/5000)
        key = 0 if (i % 613 == 0 and i >= 613) else i
        text = _doc_text(key, word_pool)
        rows.append(text)
    i = np.arange(n, dtype=np.int64)
    return pa.table({
        "doc_id": i,
        "text": pa.array(rows, pa.string()),
        "lang": pa.array([["en", "en", "en", "de", "fr", "es", "zh"][int(k)]
                          for k in i * 11 % 7], pa.string()),
        "source": pa.array([f"src{int(k)}" for k in i % 10], pa.string()),
        "n_chars": pa.array([len(t) for t in rows], pa.int64()),
    })


def gen_embeddings(n: int) -> pa.Table:
    rng = np.random.default_rng(4204)
    vecs = np.round(rng.uniform(-1.0, 1.0, size=(n, 64)), 6).astype(np.float32)
    i = np.arange(n, dtype=np.int64)
    return pa.table({
        "vec_id": i,
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": (i * 23 % 10).astype(np.int32),
    })


def gen_region() -> pa.Table:
    names = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    return pa.table({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": pa.array(names, pa.string()),
    })


def gen_nation() -> pa.Table:
    i = np.arange(25, dtype=np.int32)
    return pa.table({
        "n_nationkey": i,
        "n_name": pa.array([f"NATION_{k}" for k in i], pa.string()),
        "n_regionkey": (i % 5).astype(np.int32),
    })


def gen_supplier(n: int) -> pa.Table:
    rng = np.random.default_rng(4205)
    i = np.arange(n, dtype=np.int64)
    return pa.table({
        "s_suppkey": i,
        "s_name": pa.array([f"Supplier#{k}" for k in i], pa.string()),
        "s_nationkey": (i * 11 % 25).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n), 2),
    })


def gen_part(n: int) -> pa.Table:
    rng = np.random.default_rng(4206)
    i = np.arange(n, dtype=np.int64)
    return pa.table({
        "p_partkey": i,
        "p_name": pa.array([f"part {k}" for k in i], pa.string()),
        "p_brand": pa.array([f"Brand#{int(k) % 5 + 1}{int(k) % 5 + 1}"
                             for k in i * 7 % 25], pa.string()),
        "p_type": pa.array([["STANDARD", "SMALL", "MEDIUM", "LARGE",
                             "ECONOMY", "PROMO"][int(k)]
                            for k in i * 13 % 6], pa.string()),
        "p_size": (i * 17 % 50 + 1).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900.0, 2000.0, n), 2),
    })


def gen_events(m: int, n_users: int) -> pa.Table:
    rng = np.random.default_rng(4207)
    i = np.arange(m, dtype=np.int64)
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base + np.sort(
        rng.integers(0, span_us, size=m)
    ).astype("timedelta64[us]")
    types = ["view", "click", "purchase", "error", "scroll"]
    return pa.table({
        "event_id": i,
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": rng.integers(0, n_users, size=m),
        "event_type": pa.array([types[int(k)] for k in i * 31 % 5],
                               pa.string()),
        "value": np.round(rng.uniform(0.0, 200.0, m), 2),
        "props": pa.array([f'{{"k": {int(k)}}}' for k in i * 13 % 100],
                          pa.string()),
    })


def gen_lineitem(m: int, n_orders: int, n_parts: int, n_supp: int) -> pa.Table:
    rng = np.random.default_rng(4208)
    i = np.arange(m, dtype=np.int64)
    base = np.datetime64("1995-01-01")
    return pa.table({
        "l_orderkey": rng.integers(0, n_orders, size=m),
        "l_partkey": rng.integers(0, n_parts, size=m),
        "l_suppkey": rng.integers(0, n_supp, size=m),
        "l_linenumber": (i % 7 + 1).astype(np.int32),
        "l_quantity": (i * 19 % 50 + 1).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1000.0, 100_000.0, m), 2),
        "l_discount": np.round((i * 7 % 11) / 100.0, 2),
        "l_tax": np.round((i * 3 % 9) / 100.0, 2),
        "l_returnflag": pa.array([["N", "A", "R"][int(k)]
                                  for k in i * 23 % 3], pa.string()),
        "l_linestatus": pa.array([["O", "F"][int(k)] for k in i % 2],
                                 pa.string()),
        "l_shipdate": pa.array(
            base + ((i * 29) % 2500).astype("timedelta64[D]"),
            pa.timestamp("us")),
    })


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    n_cust = BASE["customer"] * scale
    n_orders = BASE["orders"] * scale
    n_parts = BASE["part"] * scale
    n_supp = BASE["supplier"] * scale
    tables = {
        "customer": gen_customer(n_cust),
        "orders": gen_orders(n_orders, n_cust),
        "documents": gen_documents(BASE["documents"] * scale),
        "embeddings": gen_embeddings(BASE["embeddings"] * scale),
        "region": gen_region(),
        "nation": gen_nation(),
        "supplier": gen_supplier(n_supp),
        "part": gen_part(n_parts),
        "events": gen_events(BASE["events"] * scale, n_cust // 10),
        "lineitem": gen_lineitem(
            BASE["lineitem"] * scale, n_orders, n_parts, n_supp),
    }
    for name, tbl in tables.items():
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
