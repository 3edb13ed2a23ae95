#!/usr/bin/env python3
"""Generate sf1 testdata (10x sf0.1) for LOCAL scale-ratio benchmarking.

The driver only ships sf{0.001,0.01,0.1}; the round-7 verdict asked for
empirical sf0.1 -> sf1 ratios on the heaviest queries (SCALE.md). This
generator mirrors the driver tables' schemas and distributions (verified
against /root/testdata/sf0.1 -- same vocab, key ranges, skew shapes,
timestamp units) at 10x row counts, seed=42. It is NOT the driver's
generator and sf1 results are never oracle-gated; they feed ratio
measurements only.

Usage: python3 tools/gen_sf1.py [outdir=/root/repo/testdata-sf1]

GEN_SF_MULT overrides the multiplier (default 10 = sf1); e.g.
GEN_SF_MULT=30 python3 tools/gen_sf1.py /root/repo/testdata-sf3
generates a 3x-sf1 set for a third scale point. The default output is
byte-identical to the pre-knob generator (same seed, same draw order).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = int(os.environ.get("GEN_SF_MULT", "10"))  # multiplier over sf0.1
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-sf1"
rng = np.random.default_rng(42)
os.makedirs(OUT, exist_ok=True)

N_CUST = 15000 * SF
N_SUPP = 1000 * SF
N_PART = 20000 * SF
N_ORD = 150000 * SF
N_EV = 100000 * SF
N_DOC = 5000 * SF
N_EMB = 2000 * SF


def write(name, table):
    # 250k-row row groups: a single-row-group file is unsplittable for
    # Spark no matter what maxPartitionBytes says, which serializes every
    # scan of the big tables on one task — unrepresentative of any real
    # multi-file 100 TB layout. Row VALUES are unchanged (same seed, same
    # order); only the physical chunking differs.
    pq.write_table(table, f"{OUT}/{name}.parquet", row_group_size=250000)
    print(f"{name}: {table.num_rows} rows")


# region / nation: fixed TPC-H dimensions (same at every sf)
regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": regions}))
nations = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
           "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ",
           "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU",
           "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA",
           "UNITED KINGDOM", "UNITED STATES"]
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": nations,
    "n_regionkey": pa.array(rng.integers(0, 5, 25), pa.int32())}))

segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, 5, N_CUST)])}))

write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)}))

adjs = ["large", "hot", "small", "cold", "red", "blue", "green", "dim"]
nouns = ["ring", "bolt", "washer", "gear", "cam", "rod", "pin", "plate"]
write("part", pa.table({
    "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
    "p_name": [f"{adjs[rng.integers(0, 8)]} {nouns[rng.integers(0, 8)]}"
               for _ in range(N_PART)],
    "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, N_PART)]),
    "p_type": pa.array(np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD",
                                 "MEDIUM", "PROMO"])[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 1000, N_PART), 2)}))

day_ms = 86400000
o_date = (np.int64(788918400000)  # 1995-01-01 UTC in ms
          + rng.integers(0, 2404, N_ORD).astype(np.int64) * day_ms)
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
        rng.choice(3, N_ORD, p=[0.49, 0.49, 0.02])]),
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": pa.array(o_date, pa.timestamp("ms")),
    "o_orderpriority": pa.array(np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
        rng.integers(0, 5, N_ORD)])}))

# lineitem: 1-7+ lines per order, Poisson-shaped like the driver data
n_lines = np.clip(rng.poisson(3.0, N_ORD) + 1, 1, 17)
l_ok = np.repeat(np.arange(N_ORD), n_lines)
N_LI = len(l_ok)
l_ln = np.concatenate([np.arange(1, n + 1) for n in n_lines])
ship = o_date.repeat(n_lines) + rng.integers(1, 95, N_LI).astype(np.int64) * day_ms
write("lineitem", pa.table({
    "l_orderkey": pa.array(l_ok, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
    "l_linenumber": pa.array(l_ln, pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
    "l_discount": np.round(rng.integers(0, 11, N_LI) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LI) / 100.0, 2),
    "l_returnflag": pa.array(np.array(["N", "A", "R"])[
        rng.choice(3, N_LI, p=[0.5, 0.25, 0.25])]),
    "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, N_LI)]),
    "l_shipdate": pa.array(ship, pa.timestamp("ms"))}))
print(f"lineitem rows: {N_LI}")

# events: increasing ns timestamps, ~26 s mean gap at sf0.1 scaled down
# by SF to keep the same one-month span at every multiplier (r16
# review: a hardcoded 2.6 left GEN_SF_MULT=30 spanning ~90 days, so
# per-user density and window selectivity stopped mirroring the driver
# distribution). 26.0/10 == 2.6 exactly in binary, so the default sf1
# output is byte-identical.
gaps_ns = (rng.exponential(26.0 / SF, N_EV) * 1e9).astype(np.int64) + 1
ts = np.int64(1704067200000000000) + np.cumsum(gaps_ns)
etypes = np.array(["click", "view", "purchase", "signup", "error"])
write("events", pa.table({
    "event_id": pa.array(np.arange(N_EV), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("ns")),
    "user_id": pa.array(rng.integers(0, 1500 * SF, N_EV), pa.int64()),
    "event_type": pa.array(etypes[rng.integers(0, 5, N_EV)]),
    "value": np.round(rng.exponential(80, N_EV).clip(0, 600), 2),
    "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EV)])}))

# documents: same 31-word vocab / length model / lang mix as the driver's
vocab = np.array(
    "spark query table join group agg filter scan sort hash merge window "
    "stream batch row column key value data line order part customer vector "
    "big small fast slow a the".split())
langs = np.array(["en", "zh", "es", "fr", "de"])
lang_p = [0.41, 0.15, 0.15, 0.15, 0.14]
lens = rng.integers(10, 101, N_DOC)
starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
words = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
texts = [" ".join(words[s:s + n]) for s, n in zip(starts, lens)]
write("documents", pa.table({
    "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
    "text": texts,
    "lang": pa.array(langs[rng.choice(5, N_DOC, p=lang_p)]),
    "source": pa.array([f"src{i % 20}" for i in range(N_DOC)]),
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

# embeddings: 64-dim float32, L2-normalized, 10 labels
E = rng.normal(0, 1, (N_EMB, 64)).astype(np.float32)
E /= np.linalg.norm(E, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
    "embedding": pa.array(list(E), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32())}))
print("done:", OUT)
