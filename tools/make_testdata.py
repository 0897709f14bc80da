"""Approximate replica of the driver's synthetic star-schema testdata,
fitted to the published sf0.001/0.01/0.1 distributions (TESTDATA.md),
for LOCAL scale measurement only — the driver generates its own data
for the official bench, and /root/testdata is read-only.

Fitted facts (measured on sf0.1, 2026-08, this repo's round 6):
  * per-step x10 row scaling: customer 15k, supplier 1k, part 20k,
    orders 150k, lineitem 600k, events 100k, documents 5k at sf0.1;
    region 5 / nation 25 fixed; embeddings 4x per step (2k at sf0.1).
  * events: fixed 30-day span (2024-01) so density scales with sf;
    user_id ~ U[0, customers/10); value ~ Exp(50) rounded 2dp;
    props = '{"k": U[0,100)}'; five event types, uniform.
  * documents: 31-word spark-ish vocab, U[10,100] words per doc,
    lang {en:.41, zh/es/fr:.15, de:.14}, source src0..src19, plus a
    ~1% near-duplicate injection (perturbed copy of an earlier doc)
    so the dedup surfaces see realistic near-dup structure.
  * embeddings: 64-dim unit vectors in 10 label clusters.

Usage: python tools/make_testdata.py <sf> [out_dir]
  e.g. python tools/make_testdata.py 1.0 /root/testdata_r6/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.151, 0.149, 0.148, 0.142]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PNOUNS = ["ring", "bolt", "screw", "washer", "gear", "cog", "pin", "rod"]
PADJS = ["large", "hot", "cold", "small", "round", "flat", "long", "short"]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/root/testdata_r6/sf{sys.argv[1]}"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(2000 * (sf / 0.1) ** (np.log(4) / np.log(10)))  # 4x per x10 step

    # region / nation: fixed dimensions, copied shapes
    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    nations = [f"NATION_{i:02d}" for i in range(25)]
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": nations,
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
    }))

    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }))

    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{PADJS[a]} {PNOUNS[b]}" for a, b in zip(
            rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"][i]
                   for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    odate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2400, n_ord).astype("timedelta64[D]"))
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [["F", "O", "P"][i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": [PRIOS[i] for i in rng.integers(0, 5, n_ord)],
    }))

    li_order = rng.integers(0, n_ord, n_li)
    sdate = (np.datetime64("1995-01-01") +
             rng.integers(1, 2500, n_li).astype("timedelta64[D]"))
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(li_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [["F", "O"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdate.astype("datetime64[us]")),
    }))

    # events: fixed 30-day span, density scales with sf
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = (np.datetime64("2024-01-01", "us") +
          np.sort(rng.integers(0, span_us, n_ev)).astype("timedelta64[us]"))
    write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, max(n_cust // 10, 1), n_ev), pa.int64()),
        "event_type": [ETYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: U[10,100] words over the 31-word vocab + ~1% near-dups
    nw = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 100 and rng.random() < 0.01:
            # near-duplicate: perturb an earlier doc (swap ~5% of words)
            src = texts[int(rng.integers(0, i))].split()
            for _ in range(max(1, len(src) // 20)):
                src[int(rng.integers(0, len(src)))] = VOCAB[int(rng.integers(0, 31))]
            texts.append(" ".join(src))
        else:
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, 31, nw[i])))
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 64-dim unit vectors in 10 clusters
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.3, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int64()),
    }))
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
