"""Scale-family generator for the dedup/ANN scaling-exponent runs
(scripts/bench_scale.py) — NOT a replacement for the driver testdata
(TESTDATA.md, read-only, correctness-oracle inputs).

Why a separate family: the driver's `documents` table draws from a
31-word vocabulary, so ANY two random docs share most of their word
set (measured mean pairwise Jaccard ≈ 0.7) — the TRUE near-dup pair
count is Θ(n²) in that family, and every exact dedup algorithm is
therefore Θ(n²) on it regardless of design. Scaling exponents are only
meaningful on a corpus whose true-pair density matches the regime the
100 TB claims are about: real corpora, where a document has O(1)
near-dups. This generator produces that family, holding the generative
process fixed across scale points:

  * documents: UNIFORM 5,000-token vocabulary (deliberately not
    Zipfian: with a Zipf head, two random docs' unigram word sets
    reach Jaccard ≈ 0.2, and the banded MinHash config then admits a
    quadratic random-candidate term — the same Θ(n²) pathology the
    driver corpus has, which is exactly what this family must NOT
    have; token-skew robustness is covered separately by the plan
    gates, e.g. the fluency_unigram de-skew test). Uniform sampling
    puts random-pair Jaccard at ≈ 54²/(5000·108) ≈ 0.005 → banded
    collision probability ~1e-9 — negligible. Doc length uniform
    10..100 words, langs/sources matching the driver's marginals.
    Near-dup structure is BLOCK-BOUNDED: ids are grouped in blocks of
    5; within a block each non-first doc is, with p=0.25, a
    5%-token-perturbed copy of the block head (clusters ≤ 5 → true
    pairs ≤ 10 per block → Θ(n) total). 1% of docs are exact copies of
    their block head.
  * embeddings: unit-normalized isotropic Gaussian, 64-d (the dims the
    registered LSH hyperplanes are built for), same block-bounded dup
    injection (perturbation σ=0.03 → cos ≈ 0.999), label = vec_id % 10.
    NB at the registered COS_TAU=0.4, isotropic random pairs in 64-d
    still exceed τ with p ≈ 5e-4 (t-dist tail), so this family's TRUE
    pair count keeps a small quadratic term — bench_scale.py therefore
    reports the embedding ops' time against BOTH n and the verified
    pair count (output rows), and the claim under test is
    time ≈ O(n + pairs).

Deterministic per (n, seed). Row counts follow the driver's ratio
(documents : embeddings = 5 : 2 at sf0.1).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 5000
BLOCK = 5
P_NEAR_DUP = 0.25
P_EXACT_DUP = 0.01
PERTURB = 0.05
DIM = 64
EMB_NOISE = 0.03
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
N_SOURCES = 20


def gen_documents(out_dir: str, n_docs: int, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])
    # uniform draws — see module docstring for why NOT Zipfian here

    def draw(k: int) -> np.ndarray:
        return vocab[rng.integers(0, VOCAB_SIZE, size=k)]

    lengths = rng.integers(10, 101, size=n_docs)
    texts: list[str] = [""] * n_docs
    tok_cache: list[np.ndarray] = [None] * n_docs  # type: ignore[list-item]
    for i in range(n_docs):
        head = (i // BLOCK) * BLOCK
        r = rng.random()
        if i != head and r < P_EXACT_DUP:
            tok_cache[i] = tok_cache[head]
        elif i != head and r < P_EXACT_DUP + P_NEAR_DUP:
            base = tok_cache[head].copy()
            n_swap = max(1, int(len(base) * PERTURB))
            idx = rng.choice(len(base), size=min(n_swap, len(base)), replace=False)
            base[idx] = draw(len(idx))
            tok_cache[i] = base
        else:
            tok_cache[i] = draw(int(lengths[i]))
        texts[i] = " ".join(tok_cache[i])
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = np.array([f"src{i}" for i in rng.integers(0, N_SOURCES, size=n_docs)])
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    # multiple row groups so Spark can split the scan (the few-row-group
    # driver files are why load(widen=True) exists)
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=max(1000, n_docs // 32))


def gen_embeddings(out_dir: str, n_vecs: int, seed: int = 43) -> None:
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n_vecs, DIM)).astype(np.float64)
    for i in range(n_vecs):
        head = (i // BLOCK) * BLOCK
        if i != head and rng.random() < P_NEAR_DUP:
            v[i] = v[head] + EMB_NOISE * rng.standard_normal(DIM)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb = pa.array(v.astype(np.float32).tolist(), pa.list_(pa.float32()))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": emb,
            "label": pa.array((np.arange(n_vecs) % 10).astype(np.int32), pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=max(500, n_vecs // 32))


def gen_point(root: str, mult: int, base_docs: int = 5000, base_vecs: int = 2000) -> str:
    """Generate one scale point (mult× the sf0.1 row counts) under
    ``root/x{mult}``; returns the dir (idempotent — skips if present)."""
    out = os.path.join(root, f"x{mult}")
    if os.path.exists(os.path.join(out, "documents.parquet")) and os.path.exists(
        os.path.join(out, "embeddings.parquet")
    ):
        return out
    gen_documents(out, base_docs * mult)
    gen_embeddings(out, base_vecs * mult)
    return out


STAR_SRC = "/root/testdata/sf0.1"
_STAR_FACTS = ["orders", "lineitem", "customer", "events"]
_STAR_DIMS = ["supplier", "nation", "region", "part"]


def gen_star_point(root: str, mult: int, src: str = STAR_SRC) -> str:
    """Scaled star-schema + events family for the join/sessionization
    exponent runs (r8 verdict item 6): facts (orders, lineitem,
    customer, events) replicate m× with KEY OFFSETS — per-key
    fan-outs, join selectivities, and date/type distributions stay
    constant, so wall growth measures the engine's scaling, not a
    drifting workload. Replicating users (not events-per-user) is the
    right 100 TB model for sessionization: per-user session structure
    stays fixed while user cardinality grows. Dims copy through
    unscaled — constant-size at any corpus scale, exactly why the
    TPC-H-shape plans broadcast them. Idempotent per (root, mult)."""
    out = os.path.join(root, f"x{mult}")
    if all(
        os.path.exists(os.path.join(out, f"{t}.parquet"))
        for t in _STAR_FACTS + _STAR_DIMS
    ):
        return out
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    o_off = con.sql(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    c_off = con.sql(
        f"SELECT max(c_custkey) + 1 FROM '{src}/customer.parquet'"
    ).fetchone()[0]
    e_off, u_off = con.sql(
        f"SELECT max(event_id) + 1, max(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()
    k = f"(SELECT unnest(range({mult}))::BIGINT AS k) k"
    selects = {
        "orders": (
            f"SELECT o_orderkey + k.k * {o_off} AS o_orderkey, "
            f"o_custkey + k.k * {c_off} AS o_custkey, o_orderstatus, "
            f"o_totalprice, o_orderdate, o_orderpriority "
            f"FROM '{src}/orders.parquet', {k}"
        ),
        "lineitem": (
            f"SELECT l_orderkey + k.k * {o_off} AS l_orderkey, l_partkey, "
            f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
            f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
            f"FROM '{src}/lineitem.parquet', {k}"
        ),
        "customer": (
            f"SELECT c_custkey + k.k * {c_off} AS c_custkey, c_name, "
            f"c_nationkey, c_acctbal, c_mktsegment "
            f"FROM '{src}/customer.parquet', {k}"
        ),
        "events": (
            f"SELECT event_id + k.k * {e_off} AS event_id, ts, "
            f"user_id + k.k * {u_off} AS user_id, event_type, value, props "
            f"FROM '{src}/events.parquet', {k}"
        ),
    }
    for t in _STAR_DIMS:
        selects[t] = f"SELECT * FROM '{src}/{t}.parquet'"
    for t, q in selects.items():
        con.execute(
            f"COPY ({q}) TO '{os.path.join(out, t)}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
        )
    return out


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale"
    for m in [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "2", "5", "10"])]:
        print(gen_point(root, m))
