"""Synthesize an sf1.0-SCALE measurement dataset (NOT the driver's data —
distribution-matched to /root/testdata/sf0.1 for timing optimizations at the
scale the driver's round-end bench runs at).  Output: /root/testdata_r08/sf1.0.

Matched properties (from sf0.1 / sf0.01 inspection):
- documents: 50k rows, 31-word vocab, 10..100 tokens/doc, source=src{id%20},
  lang dist ~(en .41, de/fr/es/zh .1475 each), ~0.05*n planted near-dup pairs
  (3% token perturbation -> shingle jaccard ~0.9).
- embeddings: 20k rows, dim 64, labels ~ uniform 10, components ~N(0, .12)
  -> within-label cosine tail past 0.35 at the observed ~0.2% rate.
- events: 1M rows, 15k users, 30 days, 5 types, props='{"k": n}'.
- orders 1.5M / lineitem 6M / customer 150k / part 200k / supplier 10k.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = 10  # x sf0.1
OUT = "/root/testdata_r08/sf1.0"
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(4242)

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window".split()
)

# -- documents ---------------------------------------------------------------
n_docs = 5000 * SF
lens = rng.integers(10, 101, n_docs)
toks = [VOCAB[rng.integers(0, 31, L)] for L in lens]
# plant near-dup pairs: 0.005*n pairs (a, b) b = perturbed copy of a
n_pairs = n_docs // 200
ids = rng.choice(n_docs, size=2 * n_pairs, replace=False)
for a, b in zip(ids[:n_pairs], ids[n_pairs:]):
    t = toks[a].copy()
    flip = rng.random(len(t)) < 0.03
    t[flip] = VOCAB[rng.integers(0, 31, int(flip.sum()))]
    toks[b] = t
texts = [" ".join(t) for t in toks]
langs = rng.choice(["en", "de", "fr", "es", "zh"], n_docs, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
pq.write_table(
    pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": texts,
            "lang": langs,
            "source": [f"src{i % 20}" for i in range(n_docs)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    ),
    f"{OUT}/documents.parquet",
)
print("documents", n_docs)

# -- embeddings --------------------------------------------------------------
n_vec = 2000 * SF
dim = 64
vecs = (rng.standard_normal((n_vec, dim)) * 0.118).astype(np.float32)
labels = rng.integers(0, 10, n_vec).astype(np.int32)
pq.write_table(
    pa.table(
        {
            "vec_id": pa.array(range(n_vec), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    ),
    f"{OUT}/embeddings.parquet",
)
print("embeddings", n_vec)

# -- events ------------------------------------------------------------------
n_ev = 100000 * SF
base = np.datetime64("2024-01-01T00:00:00", "us")
ts = base + (rng.random(n_ev) * 30 * 86400 * 1e6).astype("timedelta64[us]")
ts.sort()
pq.write_table(
    pa.table(
        {
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, 1500 * SF, n_ev), pa.int64()),
            "event_type": rng.choice(["click", "view", "signup", "purchase", "error"], n_ev),
            "value": rng.random(n_ev) * 100,
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
        }
    ),
    f"{OUT}/events.parquet",
)
print("events", n_ev)

# -- orders ------------------------------------------------------------------
n_ord = 150000 * SF
obase = np.datetime64("1995-01-01T00:00:00", "us")
odates = obase + (rng.integers(0, 2404, n_ord) * np.timedelta64(86400_000_000, "us"))
pq.write_table(
    pa.table(
        {
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, 15000 * SF, n_ord), pa.int64()),
            "o_orderstatus": rng.choice(["O", "F", "P"], n_ord),
            "o_totalprice": rng.random(n_ord) * 499000 + 1000,
            "o_orderdate": pa.array(odates),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_ord
            ),
        }
    ),
    f"{OUT}/orders.parquet",
)
print("orders", n_ord)

# -- lineitem ----------------------------------------------------------------
n_li = 600000 * SF
lbase = np.datetime64("1995-01-02T00:00:00", "us")
ldates = lbase + (rng.integers(0, 2498, n_li) * np.timedelta64(86400_000_000, "us"))
pq.write_table(
    pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, 20000 * SF, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, 1000 * SF, n_li), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
            "l_quantity": np.floor(rng.random(n_li) * 50 + 1),
            "l_extendedprice": rng.random(n_li) * 90000 + 900,
            "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
            "l_returnflag": rng.choice(["A", "N", "R"], n_li),
            "l_linestatus": rng.choice(["O", "F"], n_li),
            "l_shipdate": pa.array(ldates),
        }
    ),
    f"{OUT}/lineitem.parquet",
)
print("lineitem", n_li)

# -- small dims --------------------------------------------------------------
n_cust = 15000 * SF
pq.write_table(
    pa.table(
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": rng.random(n_cust) * 11000 - 1000,
            "c_mktsegment": rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"], n_cust),
        }
    ),
    f"{OUT}/customer.parquet",
)
n_part = 20000 * SF
pq.write_table(
    pa.table(
        {
            "p_partkey": pa.array(range(n_part), pa.int64()),
            "p_name": [f"part {i}" for i in range(n_part)],
            "p_brand": rng.choice([f"Brand#{i}{j}" for i in range(1,6) for j in range(1,6)], n_part),
            "p_type": rng.choice(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"], n_part),
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": rng.random(n_part) * 2000 + 900,
        }
    ),
    f"{OUT}/part.parquet",
)
n_sup = 1000 * SF
pq.write_table(
    pa.table(
        {
            "s_suppkey": pa.array(range(n_sup), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_sup)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_sup), pa.int32()),
            "s_acctbal": rng.random(n_sup) * 11000 - 1000,
        }
    ),
    f"{OUT}/supplier.parquet",
)
pq.write_table(
    pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }
    ),
    f"{OUT}/region.parquet",
)
pq.write_table(
    pa.table(
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }
    ),
    f"{OUT}/nation.parquet",
)
print("dims done")
