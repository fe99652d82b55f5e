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

# sf0.1 row counts (TESTDATA.md); scale multiplies these
BASE = {"customer": 15_000, "orders": 150_000, "documents": 5_000,
        "embeddings": 2_000}


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
    # uniform-ish fan-out over customers, same multiplicative-hash idiom
    # as builder.GRAPH_CTE's dst derivation
    custkey = (i * 2654435761 + 13) % n_cust
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
    start = key * 1_000_003 % len(rng_words)
    idx = rng_words[(start + np.arange(n_words)) % len(rng_words)]
    return " ".join(VOCAB[j] for j in idx)


def gen_documents(n: int) -> pa.Table:
    rng = np.random.default_rng(4203)
    word_pool = rng.integers(0, len(VOCAB), size=1_000_003)
    rows = []
    for i in range(n):
        # dup stratum: ~0.16% of docs repeat an earlier text (exact-dedup
        # fixture, same rate as the driver corpus's 8/5000)
        key = i - 613 if (i % 613 == 0 and i >= 613) else i
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


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    n_cust = BASE["customer"] * scale
    tables = {
        "customer": gen_customer(n_cust),
        "orders": gen_orders(BASE["orders"] * scale, n_cust),
        "documents": gen_documents(BASE["documents"] * scale),
        "embeddings": gen_embeddings(BASE["embeddings"] * scale),
    }
    for name, tbl in tables.items():
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
