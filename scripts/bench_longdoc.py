"""Long-document scaling for dedup_repeated_spans (r10 verdict item 4).

The first-occurrence keep-filter is inherently O(spans²) comparisons
per document; the r11 rewrite moved the comparisons from 8-word span
STRINGS to 64-bit span HASHES (datapipe/textprep.py). This harness
measures wall time against DOC LENGTH (doc count fixed, token length
L ∈ 1×..8×) for both forms and appends the table to BENCH_SCALE.md —
near-linear growth for the hashed form on the lengths where the string
form curves up is the acceptance evidence.

Docs are span-duplicate-rich by construction (each 8-token span is,
with p=0.3, a copy of an earlier span of the same doc), so the filter
does real work at every length. Deterministic per (n, L, seed).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SPAN_W = 8
N_DOCS = 2000
BASE_L = 128  # tokens at 1x
P_DUP_SPAN = 0.3
VOCAB = 5000


def gen_longdocs(out_dir: str, mult: int, seed: int = 7) -> str:
    out = os.path.join(out_dir, f"L{mult}")
    path = os.path.join(out, "documents.parquet")
    if os.path.exists(path):
        return out
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(VOCAB)])
    L = BASE_L * mult
    n_spans = L // SPAN_W
    texts = []
    for _ in range(N_DOCS):
        spans: list[np.ndarray] = []
        for k in range(n_spans):
            if k > 0 and rng.random() < P_DUP_SPAN:
                spans.append(spans[rng.integers(0, k)])
            else:
                spans.append(vocab[rng.integers(0, VOCAB, size=SPAN_W)])
        texts.append(" ".join(w for s in spans for w in s))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * N_DOCS, pa.string()),
            "source": pa.array(["src0"] * N_DOCS, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, path, row_group_size=max(64, N_DOCS // 32))
    return out


def string_form(spark, sf_dir):
    """The r10 (pre-rewrite) keep-filter: array_position over span
    STRINGS — kept here as the A/B baseline only."""
    from argus_spark.datapipe.textprep import SPAN_W as W
    from argus_spark.session import load

    d = load(spark, sf_dir, "documents", widen=True)
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    n = F.size(ws)
    n_spans = F.floor((n + F.lit(W - 1)) / F.lit(W)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda k: F.array_join(F.slice(ws, k * W + 1, W), " "),
    )
    kept = F.filter(
        spans, lambda s, i: F.array_position(spans, s) == i + F.lit(1)
    )
    return d.filter(n > 0).select(
        "doc_id",
        F.size(spans).cast("long").alias("n_spans"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, " ").alias("kept_text"),
    )


STRING_FORM_CAP = 4  # the string form is the quadratic under test —
# at L=1024 it runs for tens of minutes; 1x..4x is decisive already


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale_longdoc"
    mults = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,2,4,8").split(",")]

    from argus_spark.datapipe.textprep import dedup_repeated_spans
    from argus_spark.session import get_spark
    from scripts.bench_scale import _fit_exponent

    spark = get_spark("argus_bench_longdoc")
    dirs = {m: gen_longdocs(root, m) for m in mults}

    def timed(fn, d):
        for _ in range(2):
            fn(spark, d).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        return min(walls)

    rows = {}
    for name, fn, ms in (
        ("hashed (r11)", dedup_repeated_spans, mults),
        ("string (r10)", string_form,
         [m for m in mults if m <= STRING_FORM_CAP]),
    ):
        per = {}
        for m in ms:
            per[m] = timed(fn, dirs[m])
            print(f"# {name} x{m}: {per[m]:.2f}s", file=sys.stderr, flush=True)
        rows[name] = per
    # both forms must agree before the numbers mean anything
    vm = max(m for m in mults if m <= STRING_FORM_CAP)
    a = dedup_repeated_spans(spark, dirs[vm])
    b = string_form(spark, dirs[vm])
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), \
        "hashed and string forms diverge"

    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALE.md",
    )
    with open(out_md, "a") as f:
        f.write(
            f"\n## Long-document family — dedup_repeated_spans, doc length"
            f" L ∈ {{{', '.join(str(BASE_L*m) for m in mults)}}} tokens"
            f" ({N_DOCS} docs fixed, span-duplicate-rich p={P_DUP_SPAN})\n\n"
            "Outputs verified identical between forms at the longest "
            "point before timing is reported.\n\n"
            "| form | " + " | ".join(f"L={BASE_L*m}" for m in mults)
            + " | time_exp (vs L) |\n"
            + "|---" * (len(mults) + 2) + "|\n"
        )
        for name, per in rows.items():
            ms = sorted(per)
            exp = _fit_exponent(ms, [per[m] for m in ms])
            f.write(
                f"| {name} | "
                + " | ".join(
                    f"{per[m]:.2f}s" if m in per else "(capped)"
                    for m in mults
                )
                + f" | **{exp:.2f}** |\n"
            )
    print("done; appended to BENCH_SCALE.md")
    spark.stop()


if __name__ == "__main__":
    main()
