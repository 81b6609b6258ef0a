#!/usr/bin/env python3
"""Generate an sf1 table set (10x sf0.1) for the scale-ratchet gate run.

The driver's generator is not in the repo, so this reproduces the OBSERVED
schema and value conventions of /root/testdata/sf0.1 (re-sampled
2026-08-13 after the driver regenerated: events.ts and orders/lineitem
dates are now all timestamp[us]), same value vocabularies, same
scaling rules (region/nation fixed, everything else 10x), duplicate
(l_orderkey, l_linenumber) pairs present, planted exact- and near-dup
documents so the dedup family stays non-vacuous, 10-cluster unit-norm
embeddings. Seed 42, pure numpy — byte-deterministic.

The correctness gate compares Spark vs DuckDB on the SAME files, so the
data does not need to match the driver's sf1 byte-for-byte — it needs to
be schema-faithful, deterministic, and non-vacuous for every gated query.

Usage: python3 tools/gen_sf1.py [outdir=/root/repo/testdata_sf1]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
rng = np.random.default_rng(42)
os.makedirs(OUT, exist_ok=True)

N_CUST, N_SUPP, N_PART = 150_000, 10_000, 200_000
N_ORDERS, N_LINE, N_EVENTS = 1_500_000, 6_000_000, 1_000_000
N_DOCS, N_EMB, DIMS = 50_000, 20_000, 64


def write(name, cols):
    t = pa.table(cols)
    # ~32 row groups per table (min 8192 rows each): Spark assigns whole
    # row groups to input splits, so a single-row-group file caps every
    # scan at ONE task — with it, exploding queries over documents/events
    # ran single-threaded for minutes at sf1. Multiple row groups also
    # match what a real multi-file 100 TB layout gives the scheduler.
    rgs = max(8192, -(-t.num_rows // 32))
    pq.write_table(t, f"{OUT}/{name}.parquet", row_group_size=rgs)
    print(f"{name}: {t.num_rows} rows, rg={rgs}")


def days(lo, hi, n, unit="us"):
    """Uniform timestamps between date strings, day-grain values."""
    lo64 = np.datetime64(lo).astype("datetime64[D]").astype(np.int64)
    hi64 = np.datetime64(hi).astype("datetime64[D]").astype(np.int64)
    return (rng.integers(lo64, hi64 + 1, n).astype("datetime64[D]")
            .astype(f"datetime64[{unit}]"))


# ---- dimensions (fixed-size, same as every sf) --------------------------
write("region", {
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]})
write("nation", {
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})

segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer", {
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(0, 10000, N_CUST), 2),
    "c_mktsegment": [segments[i] for i in rng.integers(0, 5, N_CUST)]})

write("supplier", {
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(0, 10000, N_SUPP), 2)})

adjs = ["large", "hot", "blue", "old", "new", "small", "red", "green",
        "dark", "pale"]
nouns = ["ring", "bolt", "plate", "tube", "gear", "wheel", "pin", "rod",
         "cap", "disk"]
types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ai = rng.integers(0, len(adjs), N_PART)
ni = rng.integers(0, len(nouns), N_PART)
write("part", {
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in zip(ai, ni)],
    "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, N_PART)],
    "p_type": [types[i] for i in rng.integers(0, 6, N_PART)],
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900.0 + np.arange(N_PART) / 10.0, 2)})

statuses = ["F", "O", "P"]
prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
write("orders", {
    "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
    "o_orderstatus": [statuses[i] for i in rng.integers(0, 3, N_ORDERS)],
    "o_totalprice": np.round(rng.uniform(900, 400000, N_ORDERS), 2),
    "o_orderdate": days("1995-01-01", "2001-08-01", N_ORDERS),
    "o_orderpriority": [prios[i] for i in rng.integers(0, 5, N_ORDERS)]})

flags = ["A", "N", "R"]
lstat = ["F", "O"]
write("lineitem", {
    "l_orderkey": pa.array(rng.integers(0, N_ORDERS, N_LINE), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LINE), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LINE), pa.int64()),
    # linenumber 1..7 over random orderkeys -> plenty of duplicate
    # (orderkey, linenumber) pairs, like the driver's tables
    "l_linenumber": pa.array(rng.integers(1, 8, N_LINE), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LINE).astype(float),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LINE), 2),
    "l_discount": np.round(rng.integers(0, 11, N_LINE) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LINE) / 100.0, 2),
    "l_returnflag": [flags[i] for i in rng.integers(0, 3, N_LINE)],
    "l_linestatus": [lstat[i] for i in rng.integers(0, 2, N_LINE)],
    "l_shipdate": days("1995-01-02", "2001-11-04", N_LINE)})

# ---- events: us timestamps, increasing with event_id --------------------
etypes = ["click", "error", "purchase", "signup", "view"]
span_us = 30 * 24 * 3600 * 10**6
ts = np.sort(rng.integers(0, span_us, N_EVENTS)) + \
    np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
write("events", {
    "event_id": pa.array(range(N_EVENTS), pa.int64()),
    "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, 15_000, N_EVENTS), pa.int64()),
    "event_type": [etypes[i] for i in rng.integers(0, 5, N_EVENTS)],
    "value": np.round(np.minimum(rng.exponential(60, N_EVENTS), 999.0), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)]})

# ---- documents: vocab text + planted exact/near duplicates --------------
vocab = ["spark", "batch", "part", "line", "column", "order", "small",
         "sort", "fast", "value", "scan", "hash", "slow", "group", "agg",
         "filter", "query", "table", "key", "stream", "join", "window",
         "data", "big", "merge", "vector", "customer", "the", "a"]
langs = ["de", "en", "es", "fr", "zh"]
texts = []
for i in range(N_DOCS):
    n = int(rng.integers(8, 101))
    texts.append(" ".join(vocab[j] for j in rng.integers(0, len(vocab), n)))
lang_col = [langs[i] for i in rng.integers(0, 5, N_DOCS)]
src_col = [f"src{i}" for i in rng.integers(0, 20, N_DOCS)]
# exact duplicates: ~10 per 600 docs share their block-leader's text.
# Copies also take the leader's lang/source: every pair query blocks on
# (lang, source), so a dup in a different block would never pair.
for i in range(N_DOCS):
    if i % 600 in (1, 2):
        lead = i - (i % 600)
        texts[i] = texts[lead]
        lang_col[i] = lang_col[lead]
        src_col[i] = src_col[lead]
# near duplicates: one token substituted -> high-Jaccard pair, same block
for i in range(97, N_DOCS, 97):
    toks = texts[i - 1].split()
    toks[len(toks) // 2] = "variant"
    texts[i] = " ".join(toks)
    lang_col[i] = lang_col[i - 1]
    src_col[i] = src_col[i - 1]
write("documents", {
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": texts,
    "lang": lang_col,
    "source": src_col,
    "n_chars": pa.array([len(t) for t in texts], pa.int64())})

# ---- embeddings: uniform random unit vectors (measured: the driver's
# sf0.1 embeddings have no cluster structure — within-label and
# cross-label cosine are both ~N(0, 1/sqrt(dims)); labels are metadata)
labels = rng.integers(0, 10, N_EMB)
vecs = rng.normal(0, 1, (N_EMB, DIMS))
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
write("embeddings", {
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.array([v for v in vecs.astype(np.float32)],
                          pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32())})
print("done:", OUT)
