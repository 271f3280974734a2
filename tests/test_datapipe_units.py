"""Unit tests for datapipe pure kernels (no Spark needed): fake blob
codec roundtrip, fingerprint bounds, LSH plane determinism, stub gates."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_spark.datapipe import multimodal
from argus_spark.datapipe.similarity import DIM, N_PLANES, PLANES
from argus_spark.datapipe.text import FP_MOD, FP_MULT, FP_WORD_MOD


def test_fake_blob_roundtrip():
    blob = multimodal.encode_fake_blob(7, 123, "hello world, here is text")
    fmt, w, h, n_payload = multimodal.decode_blob_header(blob)
    assert fmt == "IMG1"
    assert (w, h) == multimodal.fake_dims(7, 123)
    assert n_payload == len("hello world, her".encode())
    assert len(blob) == multimodal.HEADER_LEN + n_payload


def test_fake_blob_utf8_payload():
    blob = multimodal.encode_fake_blob(1, 10, "héllo wörld plus more")
    *_, n_payload = multimodal.decode_blob_header(blob)
    assert n_payload == len("héllo wörld plus"[:16].encode("utf-8"))


def test_codec_stubs_gate():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.sample_video_frames(b"", 10)
    with pytest.raises(NotImplementedError):
        multimodal.extract_audio_features(b"")


def test_lsh_planes_deterministic():
    assert len(PLANES) == N_PLANES
    assert all(len(p) == DIM for p in PLANES)
    # re-import must give identical literals (seeded generator)
    import importlib

    from argus_spark.datapipe import similarity as s2

    importlib.reload(s2)
    assert s2.PLANES == PLANES


def test_fingerprint_arithmetic_bounds():
    # every intermediate stays inside int64: acc*mult + h < 2^63
    assert (FP_MOD - 1) * FP_MULT + (FP_WORD_MOD - 1) < 2**63


def test_sampling_deterministic_under_repartitioning(spark):
    """The docstring property that matters at 100 TB: hash-driven
    sampling and packing decisions are pure functions of the row, so
    results are identical no matter how the input is partitioned."""
    from argus_spark.datapipe.sampling import pack_sequences, sample_stratified
    from tests.conftest import SF_SMOKE

    for fn in (sample_stratified, pack_sequences):
        base = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
        parts = sorted(
            map(
                tuple,
                fn(spark, SF_SMOKE)
                .repartition(7)
                .collect(),
            )
        )
        assert base == parts, fn.__name__


class TestEmbeddingLshRecall:
    """The dedup_embedding_cosine contract is precision-1 /
    approximate-recall (see its docstring): every emitted pair truly
    has cos >= tau, and recall vs the quadratic all-pairs ideal is the
    banding probability. This test MEASURES both against the exact
    baseline so the recall loss the round-2 advisory flagged is a
    tested number, not an invisible assumption."""

    def test_precision_and_recall_vs_exact_allpairs(self, spark):
        from pyspark.sql import functions as F

        from argus_spark.datapipe.dedup import (
            COS_TAU,
            _as_double,
            _dot,
            cosine_prenorm,
            dedup_embedding_cosine,
            norm,
        )
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        e = (
            load(spark, SF_SMOKE, "embeddings", widen=True)
            .select("vec_id", _as_double("embedding").alias("v"))
            .withColumn("nrm", norm(F.col("v")))
        )
        a = e.select(
            F.col("vec_id").alias("vec_a"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
        )
        b = e.select(
            F.col("vec_id").alias("vec_b"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
        )
        # exact all-pairs baseline — test-only (quadratic by nature;
        # this is exactly why the operator itself is LSH-banded)
        exact = (
            a.crossJoin(b)
            .filter(F.col("vec_a") < F.col("vec_b"))
            .withColumn(
                "cos_sim",
                cosine_prenorm(
                    _dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
                ),
            )
            .filter(F.col("cos_sim") >= COS_TAU)
        )
        exact_pairs = {
            (r.vec_a, r.vec_b): r.cos_sim for r in exact.collect()
        }
        lsh_pairs = {
            (r.vec_a, r.vec_b)
            for r in dedup_embedding_cosine(spark, SF_SMOKE).collect()
        }
        assert exact_pairs, "fixture should contain near-dup pairs"
        # precision is exactly 1.0: LSH pairs are a verified subset
        assert lsh_pairs <= set(exact_pairs), (
            lsh_pairs - set(exact_pairs)
        )
        # overall recall down to tau=0.4 is documented as ~0.5 and
        # below; floor it loosely to catch catastrophic regressions
        # (measured 0.45 at sf0.001: 30 of 66 exact pairs)
        overall = len(lsh_pairs) / len(exact_pairs)
        assert overall >= 0.15, (len(lsh_pairs), len(exact_pairs))

    def test_band_collision_recall_high_similarity(self, spark):
        """The regime near-dup dedup actually targets (cos ≈ 0.9) has
        no natural pairs in the small fixture, so measure the banding
        recall on synthetic perturbed pairs: P(≥1 band collides) must
        match the documented ≈0.95 at cos 0.9 (gate at ≥0.85)."""
        import numpy as np
        from pyspark.sql import functions as F

        from argus_spark.datapipe.dedup import DIM, EC_BANDS, _ec_band_val

        rng = np.random.default_rng(7)
        rows = []
        for i in range(200):
            v = rng.standard_normal(DIM)
            v /= np.linalg.norm(v)
            # perturb to a target cosine of ~0.9
            noise = rng.standard_normal(DIM)
            noise -= noise.dot(v) * v  # orthogonalize
            noise /= np.linalg.norm(noise)
            t = 0.9
            w = t * v + np.sqrt(1 - t * t) * noise
            rows.append(([float(x) for x in v], [float(x) for x in w]))
        df = spark.createDataFrame(
            rows, "va array<double>, wa array<double>"
        )
        collide = F.lit(False)
        for bnd in range(EC_BANDS):
            collide = collide | (
                _ec_band_val(F.col("va"), bnd) == _ec_band_val(F.col("wa"), bnd)
            )
        hits = df.select(collide.alias("c")).filter("c").count()
        recall = hits / 200
        assert recall >= 0.85, recall


class TestFunnel:
    def test_funnel_matches_per_user_greedy_replay(self, spark):
        """Independent Python re-implementation: replay each user's
        time-sorted events through the greedy stage machine; stage
        counts must match the operator exactly."""
        from argus_spark.operators.temporal import (
            FUNNEL_STAGES,
            funnel_conversion,
        )
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        got = {
            r["event_type"]: r["n_users"]
            for r in funnel_conversion(spark, sf).collect()
        }
        rows = (
            load(spark, sf, "events")
            .select("user_id", "ts", "event_type")
            .collect()
        )
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
        counts = {s: 0 for s in FUNNEL_STAGES}
        for evs in by_user.values():
            evs.sort()
            stage, t_prev = 0, None
            for ts, et in evs:
                if stage < len(FUNNEL_STAGES) and et == FUNNEL_STAGES[stage] and (
                    t_prev is None or ts > t_prev
                ):
                    counts[FUNNEL_STAGES[stage]] += 1
                    stage, t_prev = stage + 1, ts
        assert got == counts


class TestDedupKeepList:
    def test_keep_list_is_corpus_minus_noncanonical(self, spark):
        """Count identity: kept = n_docs − (clustered − canonicals);
        every kept doc is unique; had_dups marks exactly the cluster
        canonicals."""
        from argus_spark.datapipe.dedup import dedup_clusters, dedup_keep_list
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        kept = dedup_keep_list(spark, sf).collect()
        cl = dedup_clusters(spark, sf).collect()
        n_docs = load(spark, sf, "documents").count()
        n_canon = sum(1 for r in cl if r["is_canonical"])
        assert len(kept) == n_docs - (len(cl) - n_canon)
        assert len({r["doc_id"] for r in kept}) == len(kept)
        assert sum(1 for r in kept if r["had_dups"]) == n_canon
        dropped = {r["doc_id"] for r in cl if not r["is_canonical"]}
        assert dropped.isdisjoint({r["doc_id"] for r in kept})


class TestMultiProbeRecall:
    def test_multiprobe_beats_single_probe_recall_at_3(self, spark):
        """The 'recall lever' claim in ann_lsh_multiprobe's docstring,
        as a measured number: recall@3 vs the exact cosine ground truth
        must be strictly higher with Hamming-1 multi-probing than with
        single-bucket probing (the corpus is near-orthogonal random
        vectors — the hardest LSH regime — so absolute recall is low;
        the LEVER is what's pinned). Deterministic: fixed hyperplane
        literals, total tie-broken rankings."""
        from argus_spark.datapipe.similarity import (
            ann_cosine_topk,
            ann_lsh_bucketed,
            ann_lsh_multiprobe,
        )

        sf = "/root/testdata/sf0.001"
        exact = {
            (r.q_id, r.n_id)
            for r in ann_cosine_topk(spark, sf).collect()
            if r.rnk <= 3
        }
        single = {
            (r.q_id, r.n_id) for r in ann_lsh_bucketed(spark, sf).collect()
        }
        multi = {
            (r.q_id, r.n_id) for r in ann_lsh_multiprobe(spark, sf).collect()
        }
        r_single = len(single & exact) / len(exact)
        r_multi = len(multi & exact) / len(exact)
        # measured: 0.083 single vs 0.25 multi (sf0.001)
        assert r_multi > r_single, (r_single, r_multi)
        assert r_multi >= 0.2, r_multi
        # multi-probe candidates are a superset family of single-probe
        # (bucket ∪ Hamming-1): its hit set must contain single's
        assert single & exact <= multi & exact


class TestTextPrep:
    """Semantic properties of the chunking/PII/diversity operators
    (their cross-engine value equality is the oracle's job; these pin
    the CONTRACTS: lossless coverage, no residual PII, metric bounds)."""

    def test_chunks_cover_every_token_in_order(self, spark):
        import re

        from argus_spark.datapipe.textprep import CHUNK, STRIDE, chunk_documents
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        chunks = chunk_documents(spark, sf).orderBy("doc_id", "chunk_id").collect()
        docs = {
            r["doc_id"]: [w for w in re.split(r" ", r["text"]) if w]
            for r in load(spark, sf, "documents").collect()
        }
        by_doc: dict[int, list] = {}
        for r in chunks:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == {d for d, ws in docs.items() if ws}
        for doc_id, rows in by_doc.items():
            toks = docs[doc_id]
            assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
            for r in rows:
                start = r["chunk_id"] * STRIDE
                expect = toks[start : start + CHUNK]
                assert r["chunk_text"].split(" ") == expect
                assert r["n_tokens"] == len(expect)
            # final window reaches the tail — nothing truncated
            last = rows[-1]
            assert last["chunk_id"] * STRIDE + last["n_tokens"] == len(toks)

    def test_pii_redact_leaves_no_matches(self, spark):
        import re

        from argus_spark.datapipe.textprep import (
            EMAIL_RE,
            LONGNUM_RE,
            pii_redact,
        )

        rows = pii_redact(spark, "/root/testdata/sf0.001", enrich=True).collect()
        assert rows
        for r in rows:
            # enrichment plants exactly one of each per doc
            assert r["n_emails"] == 1 and r["n_longnums"] == 1, r
            assert not re.search(EMAIL_RE, r["clean_text"]), r["clean_text"]
            assert not re.search(LONGNUM_RE, r["clean_text"]), r["clean_text"]
            assert "<EMAIL>" in r["clean_text"] and "<NUM>" in r["clean_text"]

    def test_pii_redact_default_leaves_clean_corpus_untouched(self, spark):
        """Live-corpus mode (enrich=False, the default): the synthetic
        corpus has no PII, so the redactor must pass text through
        unchanged with zero match counts."""
        from argus_spark.datapipe.textprep import pii_redact
        from argus_spark.session import load

        rows = pii_redact(spark, "/root/testdata/sf0.001").collect()
        raw = {
            r["doc_id"]: r["text"]
            for r in load(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "text")
            .collect()
        }
        assert rows
        for r in rows:
            assert r["n_emails"] == 0 and r["n_longnums"] == 0, r
            assert r["clean_text"] == raw[r["doc_id"]]

    def test_diversity_matches_reference_computation(self, spark):
        import re
        from collections import Counter

        from argus_spark.datapipe.textprep import text_diversity
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        got = {r["doc_id"]: r for r in text_diversity(spark, sf).collect()}
        for r in load(spark, sf, "documents").limit(50).collect():
            ws = [w for w in re.split(r" ", r["text"]) if w]
            if not ws:
                assert r["doc_id"] not in got
                continue
            c = Counter(ws)
            row = got[r["doc_id"]]
            assert row["n_words"] == len(ws)
            assert row["n_distinct"] == len(c)
            assert row["ttr"] == len(c) / len(ws)
            assert row["simpson"] == 1.0 - sum(v * v for v in c.values()) / (
                len(ws) * len(ws)
            )
            assert 0.0 <= row["simpson"] < 1.0 and 0.0 < row["ttr"] <= 1.0


class TestKMeans:
    def test_inertia_monotone_and_partition_complete(self, spark):
        from argus_spark.datapipe.clustering import kmeans_fit
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        summary, path = kmeans_fit(spark, sf, k=4, iters=3)
        rows = summary.collect()
        n = load(spark, sf, "embeddings").count()
        assert sum(r["n_members"] for r in rows) == n  # total partition
        assert all(r["n_members"] > 0 for r in rows)
        # Lloyd guarantee: assignment then recenter never increases
        # inertia (tiny float tolerance for cross-run sum ordering)
        for a, b in zip(path, path[1:]):
            assert b <= a * (1 + 1e-9), path

    def test_semantic_dedup_matches_brute_force_dominance(self, spark):
        """Independent numpy re-implementation of the SemDeDup keep
        rule (drop i iff a same-cell near-dup with higher priority
        exists; priority = farther-from-centroid, then smaller id)
        must reproduce the operator's kept set exactly."""
        import numpy as np

        from argus_spark.datapipe.clustering import (
            SEM_ITERS,
            SEM_TAU,
            _assign,
            dedup_semantic,
            kmeans_codebook,
        )

        sf = "/root/testdata/sf0.001"
        kept = {r["vec_id"] for r in dedup_semantic(spark, sf).collect()}
        # same derived k as the operator (max(8, ceil(sqrt(n))))
        e, centroids, _ = kmeans_codebook(spark, sf, k=None, iters=SEM_ITERS)
        rows = _assign(e, centroids).collect()
        by_cell: dict[int, list] = {}
        for r in rows:
            by_cell.setdefault(r["cluster_id"], []).append(r)
        expect = set()
        for members in by_cell.values():
            vs = {m["vec_id"]: np.array(m["v"]) for m in members}
            for a in members:
                dropped = False
                for b in members:
                    if b["vec_id"] == a["vec_id"]:
                        continue
                    higher = b["sqdist"] > a["sqdist"] or (
                        b["sqdist"] == a["sqdist"] and b["vec_id"] < a["vec_id"]
                    )
                    if not higher:
                        continue
                    va, vb = vs[a["vec_id"]], vs[b["vec_id"]]
                    cos = float(
                        va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                    )
                    if cos >= SEM_TAU:
                        dropped = True
                        break
                if not dropped:
                    expect.add(a["vec_id"])
        assert kept == expect
        assert len(kept) < len(rows)  # the threshold does real work

    def test_semantic_dedup_in_cell_pair_budget(self, spark):
        """The scale contract behind derived_k (r5 verdict): with
        k = max(8, ceil(sqrt(n))) cells, total in-cell candidate pairs
        must stay well under the all-pairs n(n-1)/2 — gate at n^1.5·4
        (slack for imbalanced cells) so a future fixed-k regression
        (k=8 ⇒ ~n²/8 pairs) fails here before it ships."""
        from argus_spark.datapipe.clustering import (
            SEM_ITERS,
            _assign,
            derived_k,
            kmeans_codebook,
        )

        sf = "/root/testdata/sf0.001"
        e, centroids, _ = kmeans_codebook(spark, sf, k=None, iters=SEM_ITERS)
        n = e.count()
        assert len(centroids) == derived_k(n)
        sizes = [
            r["c"]
            for r in _assign(e, centroids)
            .groupBy("cluster_id")
            .agg(__import__("pyspark.sql.functions", fromlist=["count"])
                 .count("*").alias("c"))
            .collect()
        ]
        pairs = sum(s * (s - 1) // 2 for s in sizes)
        assert pairs <= 4 * n ** 1.5, (pairs, n)
        assert pairs < n * (n - 1) // 8, (pairs, n)  # beats fixed k=8

    def test_assignment_is_map_side_no_corpus_shuffle(self, spark):
        from argus_spark.datapipe.clustering import _assign, kmeans_fit
        from argus_spark.datapipe.dedup import _as_double
        from argus_spark.plans.checks import formatted_plan, n_shuffle_exchanges
        from argus_spark.session import load
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        e = load(spark, sf, "embeddings").select(
            "vec_id", _as_double("embedding").alias("v")
        )
        cents = [(i, [0.0] * 64) for i in range(4)]
        plan = formatted_plan(_assign(e, cents))
        assert n_shuffle_exchanges(plan) == 0, plan


class TestApproxQuantiles:
    def test_sketch_rank_error_within_contract(self, spark):
        """The GK sketch's value must sit within rank n/ACC (+1 slack)
        of the exact median rank — far tighter than the registered 5%-
        of-spread boolean, pinned here per event_type."""
        import bisect

        from argus_spark.operators.temporal import (
            APPROX_Q_ACC,
            approx_quantiles_value,
        )
        from argus_spark.session import load
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.01"
        e = load(spark, sf, "events")
        approx = {
            r["event_type"]: r["ap"]
            for r in e.groupBy("event_type")
            .agg(F.percentile_approx("value", 0.5, APPROX_Q_ACC).alias("ap"))
            .collect()
        }
        vals: dict[str, list] = {}
        for r in e.select("event_type", "value").collect():
            vals.setdefault(r["event_type"], []).append(r["value"])
        out = {r["event_type"]: r for r in approx_quantiles_value(spark, sf).collect()}
        for et, vs in vals.items():
            vs.sort()
            n = len(vs)
            target = (n + 1) // 2  # 1-based ceil(n/2), the exact_p50 rank
            rank = bisect.bisect_left(vs, approx[et]) + 1
            assert abs(rank - target) <= n / APPROX_Q_ACC + 1, (et, rank, target)
            assert out[et]["approx_within_bound"] is True


class TestChunkPropertyRandom:
    def test_chunk_count_formula_on_random_token_lengths(self):
        """Pure-kernel property: the K-chunks formula covers [0, n) with
        stride-aligned windows, last window reaching the tail, for any
        n >= 1 (hypothesis over n)."""
        from hypothesis import given
        from hypothesis import strategies as st

        from argus_spark.datapipe.textprep import CHUNK, STRIDE

        @given(st.integers(min_value=1, max_value=5000))
        def check(n):
            k = 1 if n <= CHUNK else 1 + (n - CHUNK + STRIDE - 1) // STRIDE
            starts = [i * STRIDE for i in range(k)]
            # windows are in-range, and the final window reaches the tail
            assert all(s < n for s in starts)
            assert starts[-1] + CHUNK >= n
            # no earlier truncation: every window before the last is full
            assert all(s + CHUNK <= n for s in starts[:-1])
            # minimality: one fewer window would leave a tail uncovered
            if k > 1:
                assert starts[-2] + CHUNK < n

        check()


class TestMultiprobeRecall:
    def test_multiprobe_dominates_single_probe(self, spark):
        """Hamming-1 probing only ADDS candidates: per query, the
        multiprobe result has at least as many neighbors and an
        at-least-as-good best cosine as single-probe."""
        from argus_spark.datapipe.similarity import (
            ann_lsh_bucketed,
            ann_lsh_multiprobe,
        )

        sf = "/root/testdata/sf0.01"
        single: dict[int, list] = {}
        for r in ann_lsh_bucketed(spark, sf).collect():
            single.setdefault(r["q_id"], []).append(r)
        multi: dict[int, list] = {}
        for r in ann_lsh_multiprobe(spark, sf).collect():
            multi.setdefault(r["q_id"], []).append(r)
        assert set(single) <= set(multi)
        for q, srows in single.items():
            mrows = multi[q]
            assert len(mrows) >= len(srows)
            assert max(m["cos_sim"] for m in mrows) >= max(
                s["cos_sim"] for s in srows
            ) - 1e-12


class TestMinhashEstimate:
    def test_exact_duplicates_estimate_one(self, spark):
        """Identical word sets ⟹ identical signatures ⟹ est_jaccard
        exactly 1.0, and such pairs always survive the band join (all
        bands collide) — the estimator's fixed point."""
        from collections import defaultdict

        from argus_spark.datapipe.dedup import MH_K, dedup_minhash_estimate
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        by_words = defaultdict(list)
        for r in load(spark, sf, "documents").collect():
            by_words[frozenset(w for w in r["text"].split(" ") if w)].append(
                r["doc_id"]
            )
        dup_pairs = {
            (a, b)
            for ids in by_words.values()
            for a in ids
            for b in ids
            if a < b
        }
        assert dup_pairs, "fixture should contain same-word-set docs"
        est = {
            (r["doc_a"], r["doc_b"]): r
            for r in dedup_minhash_estimate(spark, sf).collect()
        }
        for p in dup_pairs:
            assert p in est, p
            assert est[p]["n_match"] == MH_K
            assert est[p]["est_jaccard"] == 1.0
        # grid property: every estimate is k/12
        for r in est.values():
            assert 0 <= r["n_match"] <= MH_K
            assert r["est_jaccard"] == r["n_match"] / MH_K


class TestFunnelProperty:
    def test_random_event_streams_match_greedy_replay(self, spark):
        """Hypothesis: for arbitrary (user, ts, type) event sets —
        duplicate timestamps, missing stages, out-of-order arrival —
        the distributed funnel equals the sequential greedy replay."""
        from datetime import datetime, timedelta

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from argus_spark.operators.temporal import funnel_over

        stages = ["a", "b", "c"]
        event = st.tuples(
            st.integers(min_value=0, max_value=5),          # user
            st.integers(min_value=0, max_value=20),         # ts offset (s)
            st.sampled_from(["a", "b", "c", "x"]),          # type (x = noise)
        )

        @settings(
            max_examples=12, deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(st.lists(event, min_size=0, max_size=40))
        def check(events):
            base = datetime(2024, 1, 1)
            rows = [
                (u, base + timedelta(seconds=off), et) for u, off, et in events
            ]
            # sequential greedy replay (time-sorted per user)
            by_user: dict = {}
            for u, ts, et in rows:
                by_user.setdefault(u, []).append((ts, et))
            want = {s: 0 for s in stages}
            for evs in by_user.values():
                evs.sort(key=lambda p: p[0])
                stage, t_prev = 0, None
                for ts, et in evs:
                    if stage < len(stages) and et == stages[stage] and (
                        t_prev is None or ts > t_prev
                    ):
                        want[stages[stage]] += 1
                        stage, t_prev = stage + 1, ts
            df = spark.createDataFrame(
                rows, "user_id long, ts timestamp, event_type string"
            )
            got = {
                r["event_type"]: r["n_users"]
                for r in funnel_over(df, stages).collect()
            }
            assert got == want, (got, want, rows)

        check()


class TestQuantizeAndFluencyContracts:
    def test_int8_codes_reconstruct_within_one_quantum(self, spark):
        """Dequantization error bound: per dimension, |dequant - v| <
        2 quanta (one from floor, one from the code grid) — the
        contract that makes the 4x memory cut safe for ANN serving."""
        import numpy as np

        from argus_spark.datapipe.quantize import Q_LEVELS, embedding_quantize_int8
        from argus_spark.datapipe.dedup import _as_double
        from argus_spark.session import load
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        q = {r["vec_id"]: [int(x) for x in r["q8_csv"].split(",")] for r in
             embedding_quantize_int8(spark, sf).collect()}
        raw = {r["vec_id"]: np.array(r["v"]) for r in
               load(spark, sf, "embeddings", widen=True)
               .select("vec_id", _as_double("embedding").alias("v")).collect()}
        mat = np.stack([raw[k] for k in sorted(raw)])
        mn, mx = mat.min(axis=0), mat.max(axis=0)
        rng = mx - mn
        quantum = np.where(rng > 0, rng / Q_LEVELS, 1.0)
        for vid, codes in q.items():
            assert all(-127 <= c <= 127 for c in codes), (vid, codes)
            deq = mn + (np.array(codes) + 127.0) * quantum
            err = np.abs(deq - raw[vid])
            assert (err <= 2.0 * quantum + 1e-12).all(), (vid, err.max())

    def test_fluency_bounds_and_extremes(self, spark):
        """fluency = mean corpus frequency of a doc's tokens: bounded
        by [1, n_docs·max_repeats] and ordered sensibly — every value
        ≥ 1 (a token occurs at least once: itself)."""
        from argus_spark.datapipe.textprep import fluency_unigram

        rows = fluency_unigram(spark, "/root/testdata/sf0.001").collect()
        assert rows
        for r in rows:
            assert r["n_tokens"] >= 1
            assert r["freq_mass"] >= r["n_tokens"]  # each tok freq ≥ 1
            assert r["fluency"] >= 1.0


class TestPPJoinBoundary:
    def test_positional_filter_keeps_exact_tau_boundary_pair(
        self, spark, tmp_path
    ):
        """Adversarial boundary pair for the PPJoin positional filter
        (round-5 ADVICE medium): na=63, nb=70 (na+nb=133), overlap 63
        -> Jaccard = 63/70 = 0.9 = tau exactly.  The only shared prefix
        token sits at ranks (ka=1, kb=8), giving positional upper bound
        min(62, 62)+1 = 63, which EQUALS the exact minimum
        ceil(9/19*133) = 63 (9*133 = 1197 = 19*63).  The former
        float form ceil(fp(0.9/1.9)*133) = 64 — fp(0.9/1.9) rounds a
        hair above 9/19 — wrongly pruned this true pair; the
        integer-rational filter (19*overlap_ub >= 9*(na+nb)) keeps it.
        """
        import pandas as pd

        from argus_spark.datapipe.dedup import dedup_ngram_jaccard

        shared = [f"s{i:02d}" for i in range(63)]   # df=2, lexic. ordered
        extras = [f"x{i:02d}" for i in range(7)]    # df=1, doc_b only
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [" ".join(shared), " ".join(extras + shared)],
                "lang": ["en", "en"],
                "source": ["t", "t"],
                "n_chars": [len(" ".join(shared)), len(" ".join(extras + shared))],
            }
        ).to_parquet(tmp_path / "documents.parquet", index=False)

        out = dedup_ngram_jaccard(spark, str(tmp_path)).collect()
        assert len(out) == 1, f"boundary pair pruned: {out}"
        r = out[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert abs(r["jaccard"] - 0.9) < 1e-12


class TestDsirAffinity:
    def test_target_docs_score_higher_and_fixed_point_consistent(self, spark):
        """Semantic sanity for the hashed-unigram domain model: the
        mean affinity of target-domain (en) docs must exceed the mean
        of non-target docs — the separation that makes importance
        selection work — and the published double must be exactly
        affinity_fp / 2^30 (the fixed-point contract)."""
        from argus_spark.datapipe.dsir import DSIR_SCALE, dsir_affinity
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        aff = {r["doc_id"]: r for r in dsir_affinity(spark, sf).collect()}
        langs = {
            r["doc_id"]: r["lang"]
            for r in load(spark, sf, "documents").select("doc_id", "lang").collect()
        }
        for r in aff.values():
            assert r["affinity"] == r["affinity_fp"] / DSIR_SCALE
            assert r["n_tokens"] >= 1
        en = [r["affinity"] for d, r in aff.items() if langs[d] == "en"]
        other = [r["affinity"] for d, r in aff.items() if langs[d] != "en"]
        assert en and other
        assert sum(en) / len(en) > sum(other) / len(other)


class TestRandomProjection:
    def test_matches_sequential_fold_reference_exactly(self, spark):
        """Bit-exactness contract: each projected component must equal
        a Python left-fold over the same rounded plane literals, in
        the same order, scaled by the exact power-of-two 0.25 — no
        tolerance. Also JL sanity: projection is deterministic under
        repartitioning (pure map)."""
        from argus_spark.datapipe.dedup import _as_double
        from argus_spark.datapipe.similarity import (
            RP_DIM,
            RP_PLANES,
            RP_SCALE,
            embedding_project_rp,
        )
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        got = {r["vec_id"]: [r[f"p{i}"] for i in range(RP_DIM)]
               for r in embedding_project_rp(spark, sf).collect()}
        raw = {r["vec_id"]: list(r["v"]) for r in
               load(spark, sf, "embeddings")
               .select("vec_id", _as_double("embedding").alias("v"))
               .collect()}
        for vid, v in raw.items():
            for i, plane in enumerate(RP_PLANES):
                acc = 0.0
                for x, y in zip(v, plane):   # ordered left fold
                    acc = acc + x * y
                assert got[vid][i] == acc * RP_SCALE, (vid, i)


class TestPPJoinExactnessProperty:
    def test_random_cliquey_corpora_match_brute_force(self, spark, tmp_path):
        """The 'filters only DROP false candidates' invariant as a
        randomized end-to-end property: on corpora engineered to sit
        near the tau boundary (shared cores with small per-doc
        mutations), dedup_ngram_jaccard's pair set must EQUAL the
        brute-force all-pairs truth — prefix, length, and positional
        filters may never lose a true pair. Seeded, multi-corpus."""
        import random

        import pandas as pd

        from argus_spark.datapipe.dedup import JACCARD_TAU, dedup_ngram_jaccard

        rng = random.Random(0xBEEF)
        for case in range(3):
            vocab = [f"w{i:03d}" for i in range(80)]
            docs = []
            did = 0
            for clique in range(4):
                core = rng.sample(vocab, rng.randint(20, 40))
                for _ in range(rng.randint(2, 4)):
                    words = list(core)
                    # mutate 0-2 tokens: some pairs land exactly at or
                    # around J = tau
                    for _ in range(rng.randint(0, 2)):
                        if rng.random() < 0.5 and len(words) > 10:
                            words.remove(rng.choice(words))
                        else:
                            extra = rng.choice(vocab)
                            if extra not in words:
                                words.append(extra)
                    rng.shuffle(words)
                    docs.append((did, " ".join(words)))
                    did += 1
            # tiny docs exercise the ℓ=2 scheme's small-doc fallback
            # branch (n ≤ 4 — pairs there need exact set equality at
            # τ=0.9) and the n=4/5 boundary where the branches split
            for n_small in (1, 2, 3, 4, 4, 5, 5):
                words = rng.sample(vocab, n_small)
                for _ in range(rng.randint(1, 2)):  # dup + maybe twin
                    docs.append((did, " ".join(words)))
                    did += 1
            sets = {d: frozenset(t.split(" ")) for d, t in docs}
            truth = {}
            ids = sorted(sets)
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    inter = len(sets[a] & sets[b])
                    j = inter / len(sets[a] | sets[b])
                    if j >= JACCARD_TAU:
                        truth[(a, b)] = j
            case_dir = tmp_path / f"case{case}"
            case_dir.mkdir()
            pd.DataFrame(
                {
                    "doc_id": [d for d, _ in docs],
                    "text": [t for _, t in docs],
                    "lang": ["en"] * len(docs),
                    "source": ["t"] * len(docs),
                    "n_chars": [len(t) for _, t in docs],
                }
            ).to_parquet(case_dir / "documents.parquet", index=False)
            got = {
                (r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in dedup_ngram_jaccard(spark, str(case_dir)).collect()
            }
            assert set(got) == set(truth), (
                case,
                set(truth) - set(got),
                set(got) - set(truth),
            )
            for p, j in truth.items():
                assert abs(got[p] - j) < 1e-12, (case, p, j, got[p])


class TestDecontaminateMinhash:
    def test_precision_one_and_recall_floor_vs_truth(self, spark):
        """Contract: every flagged (doc, bench) pair truly has word-set
        J >= 0.8 (precision 1.0 — candidates are exact-verified), and
        banding recall vs the brute-force truth clears the documented
        floor (P(candidate) ~= 0.79 at J = 0.8; exact dups collide with
        certainty, so the measured mix sits well above 0.5)."""
        from argus_spark.datapipe.dedup import (
            DECON_BENCH_MOD,
            DECON_MH_TAU,
            decontaminate_minhash,
        )
        from argus_spark.session import load

        sf = "/root/testdata/sf0.001"
        got = {
            (r["doc_id"], r["bench_id"]): r["jaccard"]
            for r in decontaminate_minhash(spark, sf).collect()
        }
        sets = {
            r["doc_id"]: frozenset(w for w in r["text"].split(" ") if w)
            for r in load(spark, sf, "documents").collect()
        }
        bench = {d for d in sets if d % DECON_BENCH_MOD == 0}
        truth = {}
        for b in bench:
            for c in sets:
                if c in bench:
                    continue
                inter = len(sets[c] & sets[b])
                j = inter / len(sets[c] | sets[b])
                if j >= DECON_MH_TAU:
                    truth[(c, b)] = j
        assert truth, "fixture should contain cross-slice near-dups"
        assert set(got) <= set(truth), set(got) - set(truth)  # precision 1
        for p, j in got.items():
            assert abs(j - truth[p]) < 1e-12
        recall = len(got) / len(truth)
        assert recall >= 0.5, (len(got), len(truth))


class TestSimhashBruteForceReference:
    def test_pairs_match_independent_python_simhash(self, spark):
        """Independent Python re-implementation of the whole SimHash
        chain (md5-based h64, ±1 bit votes over the word MULTISET,
        MSB-first fold, SH_CHUNK_BITS-wide chunk banding, Hamming <=
        SH_HAMMING verify) must reproduce the operator's pair set
        exactly on the fixture — the same engine-independence proof
        the oracle gives, but against a third implementation with no
        shared code."""
        import hashlib

        from argus_spark.datapipe.dedup import (
            SH_BITS,
            SH_CHUNK_BITS,
            SH_CHUNKS,
            SH_HAMMING,
            dedup_simhash,
        )
        from argus_spark.session import load

        def h64(w: str) -> int:
            return int(hashlib.md5(f"sh|{w}".encode()).hexdigest()[:15], 16)

        def simhash(text: str) -> int:
            hs = [h64(w) for w in text.split(" ") if w]
            sh = 0
            for j in range(SH_BITS):
                p = 1 << j
                votes = sum(1 if h % (2 * p) >= p else -1 for h in hs)
                if votes > 0:
                    sh |= p
            return sh

        sf = "/root/testdata/sf0.001"
        sigs = {
            r["doc_id"]: simhash(r["text"])
            for r in load(spark, sf, "documents").collect()
        }
        ids = sorted(sigs)
        expect = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                sa, sb = sigs[a], sigs[b]
                mask = (1 << SH_CHUNK_BITS) - 1
                if not any(
                    (sa >> (SH_CHUNK_BITS * c)) & mask
                    == (sb >> (SH_CHUNK_BITS * c)) & mask
                    for c in range(SH_CHUNKS)
                ):
                    continue
                ham = bin(sa ^ sb).count("1")
                if ham <= SH_HAMMING:
                    expect[(a, b)] = ham
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in dedup_simhash(spark, sf).collect()
        }
        assert expect, "fixture should contain simhash near-dups"
        assert got == expect, (
            set(got) ^ set(expect),
            {k: (got.get(k), expect.get(k)) for k in set(got) ^ set(expect)},
        )


def test_scoped_cache_released_between_registry_queries(spark):
    """Registry-level cache hygiene (r6 verdict): constructing a
    registered query releases the previous query's scoped caches, so a
    long harness session pins at most one query's frames; an explicit
    flush empties the cache manager entirely. Results stay correct
    after their cache is released (unpersist only loses the cache)."""
    import __spark_entry__ as e
    from argus_spark.datapipe import scoped_cache as sc
    from tests.conftest import SF_SMOKE

    qs = e.queries()
    sc.flush_scoped()

    d1 = qs["dedup_simhash"](spark, SF_SMOKE)
    n1 = d1.count()
    assert len(sc._LIVE) == 1  # the signature frame
    # re-constructing the SAME query keeps its cache (bench's repeat
    # runs reuse the materialized frame) but tracks the new handle
    qs["dedup_simhash"](spark, SF_SMOKE)
    assert len(sc._LIVE) == 2
    d2 = qs["decontaminate_minhash"](spark, SF_SMOKE)
    # constructing a DIFFERENT query flushed query 1's frames
    assert len(sc._LIVE) == 1  # only query 2's candidate frame
    n2 = d2.count()
    # query 1's result is still correct after its cache was released
    assert d1.count() == n1
    d3 = qs["dedup_semantic"](spark, SF_SMOKE)
    assert len(sc._LIVE) == 2  # corpus projection + assignment frame
    assert d3.count() > 0 and n2 >= 0
    released = sc.flush_scoped()
    assert released == 2 and not sc._LIVE
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


class TestNewOpInvariants:
    """Structural invariants for the r7 operators — properties the
    oracle equality can't state on its own (they hold for ANY corpus,
    not just the fixture)."""

    def test_ngram_novelty_partitions_the_gram_universe(self, spark):
        """Every distinct gram has exactly one first-occurrence doc, so
        Σ n_novel over docs == |distinct grams corpus-wide|; and the
        smallest doc_id that has grams is 100% novel by definition."""
        import pyspark.sql.functions as F

        from argus_spark.datapipe.hashing import words_col
        from argus_spark.datapipe.text import (
            NOV_N,
            _gram_hashes,
            ngram_novelty,
        )
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        nov = ngram_novelty(spark, SF_SMOKE).cache()
        rows = nov.collect()
        # n_novel == 0 is legitimate: an exact-duplicate doc later in
        # doc_id order re-sees every gram — precisely the signal
        assert all(0 <= r["n_novel"] <= r["n_grams"] for r in rows)
        assert all(0.0 <= r["novelty"] <= 1.0 for r in rows)
        total_novel = sum(r["n_novel"] for r in rows)
        universe = (
            load(spark, SF_SMOKE, "documents")
            .select(F.explode(_gram_hashes(words_col(), NOV_N, "nov")).alias("g"))
            .agg(F.count_distinct("g"))
            .first()[0]
        )
        assert total_novel == universe
        first_doc = min(r["doc_id"] for r in rows)
        first = next(r for r in rows if r["doc_id"] == first_doc)
        assert first["n_novel"] == first["n_grams"]
        nov.unpersist()

    def test_pack_efficiency_conserves_tokens_and_bounds_utilization(self, spark):
        import pyspark.sql.functions as F

        from argus_spark.datapipe.hashing import words_col
        from argus_spark.datapipe.sampling import pack_efficiency_stats
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        stats = pack_efficiency_stats(spark, SF_SMOKE).collect()
        assert all(0.0 < r["utilization"] <= 1.0 for r in stats)
        corpus_tokens = (
            load(spark, SF_SMOKE, "documents")
            .select(F.sum(F.size(words_col())))
            .first()[0]
        )
        assert sum(r["total_tokens"] for r in stats) == corpus_tokens

    def test_temperature_quotas_fill_budget_and_respect_ranks(self, spark):
        from argus_spark.datapipe.sampling import (
            TEMP_BUDGET,
            dataset_mixture_temperature,
        )
        from tests.conftest import SF_SMOKE

        rows = dataset_mixture_temperature(spark, SF_SMOKE).collect()
        assert all(1 <= r["rk"] <= r["quota"] for r in rows)
        # floors can undershoot the budget by at most one doc per source
        n_sources = len({r["source"] for r in rows})
        assert len(rows) <= TEMP_BUDGET
        assert len(rows) >= TEMP_BUDGET - n_sources

    def test_containment_bounds(self, spark):
        from argus_spark.datapipe.text import (
            CONTAIN_DEN,
            CONTAIN_NUM,
            decontaminate_containment,
        )
        from tests.conftest import SF_SMOKE

        rows = decontaminate_containment(spark, SF_SMOKE).collect()
        assert rows, "fixture should contain at least one containment hit"
        tau = CONTAIN_NUM / CONTAIN_DEN
        for r in rows:
            assert r["doc_id"] % 50 != 0 and r["bench_id"] % 50 == 0
            assert tau <= r["containment"] <= 1.0
            assert r["n_shared"] <= r["n_bench"]


def _py_h64(s: str, seed: str) -> int:
    import hashlib

    return int(hashlib.md5(f"{seed}|{s}".encode()).hexdigest()[:15], 16)


def _py_words(text: str) -> list[str]:
    return [w for w in text.split(" ") if w != ""]


class TestR8OpReferenceExactness:
    """Full independent Python recomputation of the r8 operators at
    smoke scale — a third engine agreeing with both Spark and DuckDB."""

    def _docs(self, spark):
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        return {
            r["doc_id"]: r["text"]
            for r in load(spark, SF_SMOKE, "documents")
            .select("doc_id", "text")
            .collect()
        }

    def test_weighted_bernoulli_matches_python_reference(self, spark):
        import pyspark.sql.functions as F

        from argus_spark.datapipe.sampling import (
            WB_MOD,
            WB_TARGET,
            weighted_sample_bernoulli,
        )
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        corpus = {
            r["doc_id"]: r["n_chars"]
            for r in load(spark, SF_SMOKE, "documents", widen=True)
            .select("doc_id", "n_chars")
            .collect()
        }
        w_total = sum(corpus.values())
        expect = {
            doc_id
            for doc_id, w in corpus.items()
            if _py_h64(str(doc_id), "wbern") * w_total < WB_TARGET * w * WB_MOD
        }
        got = {
            r["doc_id"]: r
            for r in weighted_sample_bernoulli(spark, SF_SMOKE).collect()
        }
        assert set(got) == expect
        for r in got.values():
            assert r["w_total"] == w_total
            assert r["u"] == _py_h64(str(r["doc_id"]), "wbern")
        # the sample is a real downsample, not vacuous or total
        assert 0 < len(got) < len(corpus)

    def test_boilerplate_matches_python_reference(self, spark):
        from collections import Counter

        from argus_spark.datapipe.textprep import (
            BOILER_MINDF,
            BOILER_WIDTH,
            boilerplate_chunk_removal,
        )
        from tests.conftest import SF_SMOKE

        docs = self._docs(spark)
        chunks = {}
        for doc_id, text in docs.items():
            ws = _py_words(text)
            if not ws:
                continue
            chunks[doc_id] = [
                " ".join(ws[k : k + BOILER_WIDTH])
                for k in range(0, len(ws), BOILER_WIDTH)
            ]
        df = Counter()
        for ch in chunks.values():
            for c in set(ch):
                df[c] += 1
        boiler = {c for c, n in df.items() if n >= BOILER_MINDF}
        got = {
            r["doc_id"]: r
            for r in boilerplate_chunk_removal(spark, SF_SMOKE).collect()
        }
        assert set(got) == set(chunks)
        for doc_id, ch in chunks.items():
            r = got[doc_id]
            kept = [c for c in ch if c not in boiler]
            assert r["n_chunks"] == len(ch)
            assert r["n_dropped"] == len(ch) - len(kept)
            assert r["clean_text"] == " ".join(kept)
        # the fixture's duplicated docs must actually trip the df cut
        assert any(r["n_dropped"] > 0 for r in got.values())

    def test_fluency_bigram_matches_python_reference(self, spark):
        import math
        from collections import Counter

        from argus_spark.datapipe.lm import FB_SCALE, fluency_bigram
        from tests.conftest import SF_SMOKE

        docs = {k: _py_words(t) for k, t in self._docs(spark).items()}
        c2, c1 = Counter(), Counter()
        vocab = set()
        for ws in docs.values():
            vocab.update(ws)
            for a, b in zip(ws, ws[1:]):
                c2[(a, b)] += 1
                c1[a] += 1
        v = len(vocab)
        got = {r["doc_id"]: r for r in fluency_bigram(spark, SF_SMOKE).collect()}
        expect_ids = {k for k, ws in docs.items() if len(ws) >= 2}
        assert set(got) == expect_ids
        for doc_id in expect_ids:
            ws = docs[doc_id]
            mass = sum(
                math.floor((c2[(a, b)] + 1) / (c1[a] + v) * float(FB_SCALE))
                for a, b in zip(ws, ws[1:])
            )
            r = got[doc_id]
            assert r["n_bigrams"] == len(ws) - 1
            assert r["prob_mass_fp"] == mass
            assert 0.0 < r["fluency"] <= 1.0

    def test_quality_classifier_matches_python_reference(self, spark):
        from argus_spark.datapipe.lm import (
            QC_BUCKETS,
            QC_RANGE,
            QC_SEED,
            quality_classifier_hashed,
        )
        from tests.conftest import SF_SMOKE

        docs = {k: _py_words(t) for k, t in self._docs(spark).items()}
        got = {
            r["doc_id"]: r
            for r in quality_classifier_hashed(spark, SF_SMOKE).collect()
        }
        assert set(got) == {k for k, ws in docs.items() if ws}
        for doc_id, r in got.items():
            ws = docs[doc_id]
            mass = sum(
                (_py_h64(str(_py_h64(t, QC_SEED) % QC_BUCKETS), QC_SEED)
                 % (2 * QC_RANGE + 1)) - QC_RANGE
                for t in ws
            )
            assert r["n_tokens"] == len(ws)
            assert r["weight_mass"] == mass
            assert abs(r["weight_mass"]) <= r["n_tokens"] * QC_RANGE
            assert r["keep"] == (mass > 0)


class TestR8EmbeddingAndOverlapInvariants:
    def test_standardize_zero_mean_unit_var_per_dim(self, spark):
        """After z-scoring, every dimension's sample mean is ~0 and
        sample variance ~1 (up to the fixed-point quantum and the
        biased-variance estimator)."""
        from collections import defaultdict

        from argus_spark.datapipe.similarity import embedding_standardize
        from tests.conftest import SF_SMOKE

        rows = embedding_standardize(spark, SF_SMOKE).collect()
        by_dim = defaultdict(list)
        for r in rows:
            by_dim[r["dim"]].append(r["z"])
        assert len(by_dim) == 64
        for dim, zs in by_dim.items():
            m = sum(zs) / len(zs)
            v = sum(z * z for z in zs) / len(zs)
            assert abs(m) < 1e-4, (dim, m)
            assert abs(v - 1.0) < 1e-3, (dim, v)

    def test_source_overlap_matches_python_reference(self, spark):
        from collections import defaultdict

        from argus_spark.datapipe.text import source_token_overlap
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        vocab = defaultdict(set)
        for r in (
            load(spark, SF_SMOKE, "documents")
            .select("source", "text")
            .collect()
        ):
            vocab[r["source"]].update(w for w in r["text"].split(" ") if w)
        got = {
            (r["source_a"], r["source_b"]): r
            for r in source_token_overlap(spark, SF_SMOKE).collect()
        }
        srcs = sorted(vocab)
        for i, a in enumerate(srcs):
            for b in srcs[i + 1 :]:
                inter = len(vocab[a] & vocab[b])
                if inter == 0:
                    assert (a, b) not in got
                    continue
                r = got[(a, b)]
                assert r["n_shared"] == inter
                assert r["n_a"] == len(vocab[a]) and r["n_b"] == len(vocab[b])
                assert 0.0 < r["jaccard"] <= 1.0
        assert all(k[0] < k[1] for k in got)


class TestR8PqAndSessionReference:
    def test_pq_adc_matches_python_reference(self, spark):
        """Full PQ pipeline recomputed in Python: codes, reconstruction,
        ADC distances, and the top-k ranking must agree exactly."""
        from argus_spark.datapipe.similarity import (
            N_QUERIES,
            PQ_K,
            PQ_M,
            PQ_SUB,
            PQ_TOP_K,
            ann_pq_adc_topk,
        )
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        vecs = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in load(spark, SF_SMOKE, "embeddings").collect()
        }
        cb = {i - N_QUERIES: vecs[i] for i in range(N_QUERIES, N_QUERIES + PQ_K)}

        def l2sq(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc += (x - y) * (x - y)
            return acc

        recon = {}
        for vid, v in vecs.items():
            if vid < N_QUERIES:
                continue
            r = []
            for m in range(PQ_M):
                lo = m * PQ_SUB
                best = min(
                    (l2sq(v[lo : lo + PQ_SUB], cb[a][lo : lo + PQ_SUB]), a)
                    for a in cb
                )[1]
                r.extend(cb[best][lo : lo + PQ_SUB])
            recon[vid] = r
        got = {}
        for r in ann_pq_adc_topk(spark, SF_SMOKE).collect():
            got.setdefault(r["q_id"], []).append((r["rnk"], r["n_id"], r["adc_dist"]))
        for q_id in range(N_QUERIES):
            qv = vecs[q_id]
            want = sorted((l2sq(qv, r), n) for n, r in recon.items())[:PQ_TOP_K]
            have = sorted(got[q_id])
            assert [(n, d) for _, n, d in have] == [(n, d) for d, n in want]

    def test_sessionize_matches_python_reference(self, spark):
        from collections import defaultdict

        from argus_spark.operators.temporal import (
            SESSION_GAP_US,
            sessionize_events,
        )
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        import pyspark.sql.functions as F

        ev = defaultdict(list)
        for r in (
            load(spark, SF_SMOKE, "events")
            .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
            .collect()
        ):
            ev[r["user_id"]].append((r["us"], r["event_id"]))
        want = {}
        for uid, rows in ev.items():
            rows.sort()
            ord_, prev = 0, None
            sessions = defaultdict(list)
            for us, _eid in rows:
                if prev is None or us - prev > SESSION_GAP_US:
                    ord_ += 1
                sessions[ord_].append(us)
                prev = us
            for o, uss in sessions.items():
                want[(uid, o)] = (len(uss), min(uss), max(uss))
        got = {
            (r["user_id"], r["session_ord"]): (
                r["n_events"], r["start_us"], r["end_us"],
            )
            for r in sessionize_events(spark, SF_SMOKE).collect()
        }
        assert got == want


class TestR8DiagnosticOps:
    def test_skew_detect_matches_python_reference(self, spark):
        from collections import Counter

        from argus_spark.operators.skew import SKEW_P, skew_detect_keys
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        counts = Counter(
            r["event_type"]
            for r in load(spark, SF_SMOKE, "events")
            .select("event_type")
            .collect()
        )
        n = sum(counts.values())
        got = {r["key"]: r for r in skew_detect_keys(spark, SF_SMOKE).collect()}
        assert set(got) == set(counts)
        for k, c in counts.items():
            r = got[k]
            assert r["n_rows"] == c and r["n_total"] == n
            assert r["share_permille"] == c * 1000 // n
            assert r["is_skewed"] == (c * SKEW_P > n)
            want_salt = (c * SKEW_P + n - 1) // n if c * SKEW_P > n else 1
            assert r["salt_factor"] == want_salt
        # 5 event types over the whole table: every key must be hot
        assert all(r["is_skewed"] for r in got.values())

    def test_user_state_diff_classes_and_consistency(self, spark):
        import pyspark.sql.functions as F

        from argus_spark.operators.temporal import DIFF_T1, user_state_diff
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        rows = {r["user_id"]: r for r in user_state_diff(spark, SF_SMOKE).collect()}
        ev = load(spark, SF_SMOKE, "events")
        all_users = {r["user_id"] for r in ev.select("user_id").distinct().collect()}
        early_users = {
            r["user_id"]
            for r in ev.filter(F.col("ts") < F.lit(DIFF_T1).cast("timestamp"))
            .select("user_id")
            .distinct()
            .collect()
        }
        assert set(rows) == all_users
        for uid, r in rows.items():
            assert r["state_b"] is not None
            if uid not in early_users:
                assert r["change"] == "added" and r["state_a"] is None
            elif r["state_a"] == r["state_b"]:
                assert r["change"] == "unchanged"
            else:
                assert r["change"] == "changed"
        # the fixture must exercise at least changed + unchanged
        classes = {r["change"] for r in rows.values()}
        assert {"changed", "unchanged"} <= classes


class TestSessionizeProperty:
    def test_random_event_streams_match_sequential_reference(self, spark):
        """Hypothesis: for arbitrary (user, us, event_id) sets —
        duplicate timestamps, gap exactly at the boundary, ties broken
        by event_id — distributed sessionization equals the sequential
        greedy scan."""
        from collections import defaultdict

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from argus_spark.operators.temporal import sessionize_over

        GAP = 10  # us — tiny gap so random offsets straddle it often
        event = st.tuples(
            st.integers(min_value=0, max_value=4),    # user
            st.integers(min_value=0, max_value=60),   # us
        )

        @settings(
            max_examples=12, deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(st.lists(event, min_size=0, max_size=40))
        def check(events):
            rows = [(u, i, us) for i, (u, us) in enumerate(events)]
            by_user = defaultdict(list)
            for u, eid, us in rows:
                by_user[u].append((us, eid))
            want = {}
            for u, evs in by_user.items():
                evs.sort()
                ord_, prev = 0, None
                sess = defaultdict(list)
                for us, _eid in evs:
                    if prev is None or us - prev > GAP:
                        ord_ += 1
                    sess[ord_].append(us)
                    prev = us
                for o, uss in sess.items():
                    want[(u, o)] = (len(uss), min(uss), max(uss),
                                    max(uss) - min(uss))
            df = spark.createDataFrame(
                rows, "user_id long, event_id long, us long"
            )
            got = {
                (r["user_id"], r["session_ord"]): (
                    r["n_events"], r["start_us"], r["end_us"],
                    r["duration_us"],
                )
                for r in sessionize_over(df, gap_us=GAP).collect()
            }
            assert got == want, (got, want, rows)

        check()


class TestLengthOutlierReference:
    def test_rank_band_matches_python_reference(self, spark):
        from argus_spark.datapipe.textprep import (
            LOF_HI_PERMILLE,
            LOF_LO_PERMILLE,
            length_outlier_filter,
        )
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        lens = {
            r["doc_id"]: len([w for w in r["text"].split(" ") if w])
            for r in load(spark, SF_SMOKE, "documents")
            .select("doc_id", "text")
            .collect()
        }
        n = len(lens)
        per = {}
        for v in lens.values():
            per[v] = per.get(v, 0) + 1
        cum, run = {}, 0
        for v in sorted(per):
            run += per[v]
            cum[v] = run
        lo = min(v for v in per if cum[v] * 1000 > n * LOF_LO_PERMILLE)
        hi = max(
            v for v in per if (cum[v] - per[v]) * 1000 < n * LOF_HI_PERMILLE
        )
        got = {r["doc_id"]: r for r in length_outlier_filter(spark, SF_SMOKE).collect()}
        assert set(got) == set(lens)
        for doc_id, r in got.items():
            assert r["n_tokens"] == lens[doc_id]
            assert (r["lo_len"], r["hi_len"]) == (lo, hi)
            assert r["keep"] == (lo <= lens[doc_id] <= hi)
        kept = sum(1 for r in got.values() if r["keep"])
        # the band must really cut both tails, and keep the bulk
        assert 0 < kept < n
        assert kept * 1000 >= n * (LOF_HI_PERMILLE - LOF_LO_PERMILLE - 30)


class TestIncrementalDelta:
    """dedup_incremental_delta loses nothing: its candidate set must
    equal the FULL-corpus banded-LSH pairs restricted to pairs that
    touch a delta doc (base×base pairs are out of scope by contract —
    they were emitted when those shards were themselves the delta)."""

    def test_completeness_vs_full_lsh(self, spark):
        from tests.conftest import SF_SMOKE
        from argus_spark.datapipe.dedup import (
            DELTA_MOD,
            dedup_incremental_delta,
            dedup_minhash_lsh,
        )

        full = {
            (r.doc_a, r.doc_b)
            for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
        }
        expected = {
            (a, b)
            for a, b in full
            if a % DELTA_MOD == 0 or b % DELTA_MOD == 0
        }
        got = {
            tuple(sorted((r.delta_id, r.match_id)))
            for r in dedup_incremental_delta(spark, SF_SMOKE).collect()
        }
        assert got == expected
        # and every row names the side correctly
        for r in dedup_incremental_delta(spark, SF_SMOKE).collect():
            assert r.delta_id % DELTA_MOD == 0
            if r.side == "delta":
                assert r.match_id % DELTA_MOD == 0
            else:
                assert r.match_id % DELTA_MOD != 0

    def test_token_budget_cap_and_determinism(self, spark):
        from tests.conftest import SF_SMOKE
        from argus_spark.datapipe.sampling import (
            TBM_CAP_EPOCHS,
            TBM_FP,
            token_budget_mixture,
        )

        rows = token_budget_mixture(spark, SF_SMOKE).collect()
        assert rows, "pool must be non-empty"
        for r in rows:
            # never more than CAP full epochs (+1 fractional-epoch copy)
            assert 1 <= r.n_copies <= TBM_CAP_EPOCHS + 1
            assert 0 < r.r_fp <= TBM_CAP_EPOCHS * TBM_FP
        # re-run is bit-identical (hash-determinism, not RNG)
        again = token_budget_mixture(spark, SF_SMOKE).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestGramMatrix:
    """embedding_gram_matrix is the distributed half of PCA: the d×d
    fixed-point Gram must match a direct numpy computation exactly,
    and its eigendecomposition (driver-side — d×d is tiny by design)
    must yield a usable orthonormal projection basis."""

    def _dense_gram(self, spark):
        import numpy as np
        from tests.conftest import SF_SMOKE
        from argus_spark.datapipe.quantize import (
            GRAM_FP,
            embedding_gram_matrix,
        )
        from argus_spark.session import load

        rows = embedding_gram_matrix(spark, SF_SMOKE).collect()
        d = max(r.j for r in rows) + 1
        g = np.zeros((d, d), dtype=np.int64)
        for r in rows:
            g[r.i, r.j] = r.gram_fp
            g[r.j, r.i] = r.gram_fp
        x = np.stack(
            [
                np.asarray(r.embedding, dtype=np.float64)
                for r in load(spark, SF_SMOKE, "embeddings").select(
                    "embedding"
                ).collect()
            ]
        )
        return g, x, GRAM_FP

    def test_matches_direct_numpy(self, spark):
        import numpy as np

        g, x, fp = self._dense_gram(spark)
        outer = x[:, :, None] * x[:, None, :]
        direct = np.floor(outer * float(fp)).astype(np.int64).sum(axis=0)
        assert np.array_equal(g, direct)

    def test_drives_pca_projection(self, spark):
        import numpy as np

        g, x, fp = self._dense_gram(spark)
        # driver-side eigendecomposition of the (symmetrized) Gram —
        # the fixed-point grid perturbs eigenvalues by O(n/fp), far
        # below the spectrum's scale
        evals, evecs = np.linalg.eigh(g.astype(np.float64) / fp)
        # descending, all non-negative up to grid error
        assert evals[-1] > 0
        assert evals[0] > -1e-3 * evals[-1]
        # top-8 basis is orthonormal and captures more energy than
        # any 8 raw axes (the point of doing PCA at all)
        top = evecs[:, -8:]
        assert np.allclose(top.T @ top, np.eye(8), atol=1e-9)
        proj_energy = float(np.sum((x @ top) ** 2))
        raw_energy = float(np.sort(np.sum(x**2, axis=0))[-8:].sum())
        assert proj_energy >= raw_energy


class TestWhitenFit:
    """embedding_whiten's committed literals (whiten_params.py) are
    pinned to the fit pipeline they claim to come from."""

    FIT_SF = "/root/testdata/sf0.001"

    def _fit_module(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "fit_whiten",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts", "fit_whiten.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_committed_literals_match_refit(self):
        """Re-running the fit (Gram oracle SQL over the fit shard +
        eigh + sign canonicalization + 6-decimal rounding) must
        reproduce the committed literal matrix exactly — the committed
        file can't drift from the pipeline that claims to generate it."""
        from argus_spark.datapipe.whiten_params import W_DIM, WHITEN_W

        w_rows, lam, n = self._fit_module().fit(self.FIT_SF)
        assert len(WHITEN_W) == W_DIM == len(w_rows)
        assert w_rows == WHITEN_W
        # eigenvalues strictly positive and descending (sane fit)
        assert all(a > b > 0 for a, b in zip(lam, lam[1:]))

    def test_whitening_property_on_spark_gram(self, spark):
        """W M Wᵀ ≈ I on the SPARK-side Gram of the fit corpus — the
        defining property of a whitening matrix, checked against the
        registered operator (not the fit script's own arithmetic)."""
        import numpy as np

        from argus_spark.datapipe.quantize import (
            GRAM_FP,
            embedding_gram_matrix,
        )
        from argus_spark.datapipe.whiten_params import W_DIM, WHITEN_W
        from argus_spark.session import load

        rows = embedding_gram_matrix(spark, self.FIT_SF).collect()
        n = load(spark, self.FIT_SF, "embeddings").count()
        d = 64
        m = np.zeros((d, d))
        for r in rows:
            v = r.gram_fp / float(GRAM_FP)
            m[r.i, r.j] = v
            m[r.j, r.i] = v
        m /= float(n)
        w = np.array(WHITEN_W)
        # 1e-6-rounded literals + the fixed-point Gram grid bound the
        # off-identity residual well under 1e-3
        assert np.allclose(w @ m @ w.T, np.eye(W_DIM), atol=1e-3)


class TestRotationPlanner:
    """scripts/plan_rotation.py's pure core: stale-first ordering with
    changed-keys-jump-the-queue and never-covered (-1) most urgent."""

    def test_tiers_and_window(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "plan_rotation",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts", "plan_rotation.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        registry = [f"q{i}" for i in range(8)]
        staleness = {
            "q0": 0, "q1": 2, "q2": 1, "q3": 0,
            "q4": -1, "q5": 2, "q6": 0, "q7": 1,
        }
        p = mod.plan(registry, staleness, ["q3"], window=4)
        # changed first; then -1 (never covered); then staleness desc,
        # ties in registry order
        assert p["order"][:4] == ["q3", "q4", "q1", "q5"]
        assert p["order"][4:6] == ["q2", "q7"]
        assert set(p["order"][6:]) == {"q0", "q6"}
        assert p["window"] == ["q3", "q4", "q1", "q5"]
        assert p["enter"] == ["q4", "q5"] and p["exit"] == ["q0", "q2"]
        assert p["max_stale_outside"] == 1

    def test_never_covered_outside_window_is_urgent(self):
        """r11 ADVICE: a never-covered key (-1) that overflows past the
        window must dominate max_stale_outside (sentinel, not -1) and be
        reported by name — otherwise the 'compensate if > 1' hint would
        miss the single most urgent uncovered operator."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "plan_rotation3",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts", "plan_rotation.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        # window=2 with THREE never-covered keys: one must overflow —
        # which is now a contract breach the planner refuses silently
        # (r13 verdict #1: the silent truncation is what dropped
        # sample_stratified to staleness 3); --allow-spill accepts it
        # and reports the spilled keys by name.
        import pytest as _pytest

        registry = ["a", "b", "c", "d"]
        staleness = {"a": -1, "b": -1, "c": -1, "d": 2}
        with _pytest.raises(mod.RotationOverflow):
            mod.plan(registry, staleness, [], window=2)
        p = mod.plan(registry, staleness, [], window=2, allow_spill=True)
        assert p["max_stale_outside"] == 10**6
        assert p["never_covered_outside"] == ["c"]
        assert p["spilled"] == ["c", "d"]

    def test_overflow_hard_fails_on_tier2_pressure(self):
        """Tier-2 (changed) keys consuming slots must not silently push
        a staleness-2 key past the cap — the exact r13 breach shape."""
        import importlib.util
        import os

        import pytest as _pytest

        spec = importlib.util.spec_from_file_location(
            "plan_rotation4",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts", "plan_rotation.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        registry = ["a", "b", "c", "d"]
        staleness = {"a": 0, "b": 2, "c": 2, "d": 0}
        # window 2: changed key "a" + both staleness-2 keys = 3 > 2
        with _pytest.raises(mod.RotationOverflow):
            mod.plan(registry, staleness, ["a"], window=2)
        p = mod.plan(registry, staleness, ["a"], window=2,
                     allow_spill=True)
        assert p["window"] == ["a", "b"] and p["spilled"] == ["c"]
        # fits when nothing changed — no spill, no raise
        p2 = mod.plan(registry, staleness, [], window=2)
        assert p2["spilled"] == [] and p2["window"] == ["b", "c"]

    def test_rejects_unknown_changed_key(self):
        import importlib.util
        import os

        import pytest as _pytest

        spec = importlib.util.spec_from_file_location(
            "plan_rotation2",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts", "plan_rotation.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        with _pytest.raises(ValueError):
            mod.plan(["a"], {}, ["nope"], window=1)


class TestIncrementalDeltaEdges:
    """Degenerate shard splits must not break the incremental path."""

    def _mini_dir(self, spark, tmp_path, ids):
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        docs = load(spark, SF_SMOKE, "documents")
        d = docs.filter(docs.doc_id.isin(ids))
        out = tmp_path / "mini"
        d.coalesce(1).write.parquet(str(out / "documents.parquet"))
        return str(out)

    def test_empty_delta_yields_no_rows(self, spark, tmp_path):
        """A corpus where nothing lands in the delta shard (no
        doc_id % 5 == 0) produces an empty candidate frame — the
        incremental op never invents base×base work."""
        from argus_spark.datapipe.dedup import dedup_incremental_delta

        ids = [1, 2, 3, 4, 6, 7, 8, 9, 11, 12]
        sf = self._mini_dir(spark, tmp_path, ids)
        assert dedup_incremental_delta(spark, sf).count() == 0

    def test_all_delta_matches_plain_lsh(self, spark, tmp_path):
        """A corpus that is ENTIRELY the delta shard reduces to the
        ordinary banded self-join: every pair carries side='delta' and
        the pair set equals dedup_minhash_lsh on the same corpus."""
        from argus_spark.datapipe.dedup import (
            dedup_incremental_delta,
            dedup_minhash_lsh,
        )

        ids = [0, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50, 55, 60]
        sf = self._mini_dir(spark, tmp_path, ids)
        inc = dedup_incremental_delta(spark, sf).collect()
        assert all(r.side == "delta" for r in inc)
        full = {
            (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf).collect()
        }
        assert {(r.delta_id, r.match_id) for r in inc} == full


class TestTokenBudgetThirdSide:
    """Recompute token_budget_mixture end-to-end in pure Python (md5
    hashing + integer arithmetic) from the raw documents — a third
    engine next to Spark and the DuckDB oracle. Any drift in the
    fixed-point formula, the hash seed, or the flooring order fails
    here even if Spark and the SQL happened to drift together."""

    def test_matches_pure_python(self, spark):
        import hashlib

        from tests.conftest import SF_SMOKE
        from argus_spark.datapipe.sampling import (
            TBM_CAP_EPOCHS,
            TBM_FP,
            TBM_WEIGHTS,
            token_budget_mixture,
        )
        from argus_spark.session import load

        def h64(s: str, seed: str) -> int:
            return int(
                hashlib.md5(f"{seed}|{s}".encode()).hexdigest()[:15], 16
            )

        docs = [
            (r.doc_id, r.source, len([w for w in r.text.split(" ") if w]))
            for r in load(spark, SF_SMOKE, "documents")
            .select("doc_id", "source", "text")
            .collect()
        ]
        pool = [
            (d, s, t, TBM_WEIGHTS[s]) for d, s, t in docs if s in TBM_WEIGHTS
        ]
        wsum = sum(TBM_WEIGHTS.values())
        t_src: dict[str, int] = {}
        for _, s, t, _w in pool:
            t_src[s] = t_src.get(s, 0) + t
        t_tot = sum(t_src.values())
        expected = {}
        for d, s, t, w in pool:
            r_fp = min(
                TBM_CAP_EPOCHS * TBM_FP,
                ((t_tot // 2) * w * TBM_FP) // (wsum * t_src[s]),
            )
            n = r_fp // TBM_FP + (1 if h64(str(d), "tbm") % TBM_FP < r_fp % TBM_FP else 0)
            if n > 0:
                expected[d] = (s, t, r_fp, n)

        got = {
            r.doc_id: (r.source, r.tok, r.r_fp, r.n_copies)
            for r in token_budget_mixture(spark, SF_SMOKE).collect()
        }
        assert got == expected


class TestTwoLevelAssign:
    """The staged coarse→fine centroid assignment (r12 verdict #4) is
    an EXACT restaging of the flat scan — identical rows, bit-for-bit,
    including sqdist doubles and tie-breaks — so every chained-CTE
    oracle built on ``_assign`` stays valid whichever path dispatches."""

    def test_two_level_identical_to_flat(self, spark):
        from argus_spark.datapipe.clustering import (
            TWO_LEVEL_MIN_K,
            _assign_flat,
            _assign_two_level,
            kmeans_codebook,
        )
        from tests.conftest import SF_SMOKE

        e, centroids, _ = kmeans_codebook(spark, SF_SMOKE, k=None, iters=1)
        # the derived-√n codebook at the smoke SF must actually be in
        # the two-level regime, or this test pins nothing
        assert len(centroids) >= TWO_LEVEL_MIN_K
        cols = ["vec_id", "cluster_id", "sqdist"]
        flat = sorted(
            map(tuple, _assign_flat(e, centroids).select(*cols).collect())
        )
        two = sorted(
            map(tuple, _assign_two_level(e, centroids).select(*cols).collect())
        )
        assert flat == two and len(flat) > 0

    def test_broadcast_kernel_identical_to_flat(self, spark):
        """The broadcast-codebook Arrow kernel (r13 verdict #3) is the
        third dispatch arm: same per-dim left-fold distance, same
        first-min/(d, cid) tie-break — bit-identical rows to the flat
        literal scan, including the sqdist doubles."""
        from argus_spark.datapipe.clustering import (
            _assign_broadcast,
            _assign_flat,
            kmeans_codebook,
        )
        from tests.conftest import SF_SMOKE

        e, centroids, _ = kmeans_codebook(spark, SF_SMOKE, k=None, iters=1)
        cols = ["vec_id", "cluster_id", "sqdist"]
        flat = sorted(
            map(tuple, _assign_flat(e, centroids).select(*cols).collect())
        )
        bk = sorted(
            map(
                tuple,
                _assign_broadcast(e, centroids).select(*cols).collect(),
            )
        )
        assert flat == bk and len(flat) > 0

    def test_broadcast_kernel_unsorted_codebook_and_empty_ok(self, spark):
        """The kernel sorts the codebook by cid itself (argmin's
        first-min tie-break is only equal to the (d, cid) struct
        minimum on an ascending codebook), and an empty partition
        yields an empty, correctly-typed batch."""
        from pyspark.sql import functions as F

        from argus_spark.datapipe.clustering import (
            _assign_broadcast,
            _assign_flat,
        )

        e = (
            spark.range(40)
            .select(
                F.col("id").alias("vec_id"),
                F.array(
                    (F.col("id") % 7).cast("double"),
                    (F.col("id") % 3).cast("double"),
                ).alias("v"),
            )
            .repartition(8)  # more partitions than distinct rows pays
        )
        cb = [(3, [6.0, 2.0]), (0, [0.0, 0.0]), (2, [6.0, 2.0])]
        cols = ["vec_id", "cluster_id", "sqdist"]
        flat = sorted(
            map(tuple, _assign_flat(e, cb).select(*cols).collect())
        )
        bk = sorted(
            map(tuple, _assign_broadcast(e, cb).select(*cols).collect())
        )
        assert flat == bk and len(flat) == 40
        # the duplicate-centroid tie (cids 2 vs 3 at identical cv) must
        # resolve to the smaller cid on both paths
        assert any(r[1] == 2 for r in bk) and not any(r[1] == 3 for r in bk)

    def test_dispatch_takes_broadcast_arm_at_large_k(self, spark):
        """k ≥ BROADCAST_MIN_K must route through mapInPandas (the
        literal paths' per-task init is O(k) there) — visible in the
        plan, and still map-only: no Exchange."""
        from pyspark.sql import functions as F

        from argus_spark.datapipe.clustering import (
            BROADCAST_MIN_K,
            _assign,
        )
        from argus_spark.plans.checks import formatted_plan

        e = spark.range(20).select(
            F.col("id").alias("vec_id"),
            F.array(F.col("id").cast("double")).alias("v"),
        )
        cb = [(i, [float(i)]) for i in range(BROADCAST_MIN_K)]
        df = _assign(e, cb)
        plan = formatted_plan(df)
        assert "MapInPandas" in plan, plan
        assert "Exchange" not in plan, plan
        rows = {r.vec_id: r.cluster_id for r in df.collect()}
        assert rows == {i: i for i in range(20)}

    def test_staged_query_demonstrably_takes_two_level_arm(self, spark):
        """r13 verdict #4: the staged path needs driver-level evidence
        that it actually RUNS in a registered query. The clustered
        fixed codebook must route `_assign` to the two-level arm —
        asserted via the dispatch side-channel AND the staged plan's
        materialized `__tl_ub` coarse-bound column."""
        from argus_spark.datapipe.clustering import (
            LAST_DISPATCH,
            assign_staged_clustered,
        )
        from tests.conftest import SF_SMOKE

        LAST_DISPATCH["arm"] = ""
        df = assign_staged_clustered(spark, SF_SMOKE)
        assert LAST_DISPATCH["arm"] == "two_level"
        assert "__tl_ub" in df._jdf.queryExecution().analyzed().toString()
        assert df.count() > 0

    def test_coarse_groups_cover_all_centroids(self):
        """Every fine centroid lands in exactly one non-empty group,
        and each group's radius really covers its members (the bound
        the pruning's exactness proof rests on)."""
        import math

        from argus_spark.datapipe.clustering import _coarse_groups

        centroids = [
            (i, [((i * 7 + j * 3) % 13) / 13.0 for j in range(4)])
            for i in range(30)
        ]
        groups = _coarse_groups(centroids)
        seen = [cid for _, _, ms in groups for cid, _ in ms]
        assert sorted(seen) == list(range(30))
        for gc, r, ms in groups:
            for _, cv in ms:
                d = math.sqrt(sum((a - b) ** 2 for a, b in zip(cv, gc)))
                assert d <= r + 1e-9

    def test_dispatch_is_geometry_adaptive(self):
        """The scan-fraction estimate separates the two regimes: an
        isotropic codebook (pruning useless — the measured bench case)
        estimates near 1.0 and dispatches flat; a clustered codebook
        estimates small and stages."""
        import numpy as np

        from argus_spark.datapipe.clustering import (
            TWO_LEVEL_SCAN_FRAC,
            _coarse_groups,
            _two_level_scan_frac,
        )

        rng = np.random.default_rng(3)
        iso = [(i, [float(x) for x in rng.standard_normal(16)])
               for i in range(64)]
        frac_iso = _two_level_scan_frac(iso, _coarse_groups(iso))
        assert frac_iso > TWO_LEVEL_SCAN_FRAC, frac_iso

        # 8 tight clusters of 8 centroids each, far apart
        clustered = []
        for c in range(8):
            base = rng.standard_normal(16) * 50.0
            for j in range(8):
                clustered.append(
                    (c * 8 + j,
                     [float(x) for x in base + rng.standard_normal(16) * 0.1])
                )
        frac_cl = _two_level_scan_frac(clustered, _coarse_groups(clustered))
        assert frac_cl <= TWO_LEVEL_SCAN_FRAC, frac_cl


class TestExprLiteralEquivalence:
    """The r14 construction-time optimization replaced Column-composed
    literal trees (thousands of F.lit Py4J round trips) with single
    parsed F.expr strings in the hyperplane-banding and plane-bucket
    helpers. These tests pin that the parsed form computes BIT-IDENTICAL
    values to the Column form on random vectors — same left-fold order,
    same IEEE doubles (repr round-trip), same CASE/when long sums."""

    def test_ec_band_expr_matches_column_form(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from argus_spark.datapipe.dedup import (
            DIM,
            EC_BANDS,
            _ec_band_val,
            _ec_bands_array_expr,
        )

        rng = np.random.default_rng(11)
        rows = [([float(x) for x in rng.standard_normal(DIM)],)
                for _ in range(64)]
        df = spark.createDataFrame(rows, "v array<double>")
        col_form = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    _ec_band_val(F.col("v"), b).alias("bval"),
                )
                for b in range(EC_BANDS)
            ]
        )
        n_diff = (
            df.select(
                col_form.alias("a"), _ec_bands_array_expr("v").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .count()
        )
        assert n_diff == 0

    def test_quantize_extrema_expr_matches_column_form(self, spark):
        """r15: embedding_quantize_int8's per-dimension extrema arrays
        are parsed as ONE SQL expression each instead of 2×DIM Column
        constructions (128 Py4J hops). The ANALYZED plans must be
        identical modulo expression ids — same aggregate, zero
        semantic drift (stronger than value equality: the engine
        cannot tell the two constructions apart)."""
        import re

        from pyspark.sql import functions as F

        from argus_spark.datapipe.dedup import _as_double
        from argus_spark.datapipe.quantize import DIM
        from argus_spark.session import load

        e = load(
            spark, "/root/testdata/sf0.001", "embeddings", widen=True
        ).select("vec_id", _as_double("embedding").alias("v"))
        expr_form = e.agg(
            F.expr(
                "array(" + ", ".join(f"min(v[{i}])" for i in range(DIM)) + ")"
            ).alias("mn"),
            F.expr(
                "array(" + ", ".join(f"max(v[{i}])" for i in range(DIM)) + ")"
            ).alias("mx"),
        )
        col_form = e.agg(
            F.array(*[F.min(F.col("v")[i]) for i in range(DIM)]).alias("mn"),
            F.array(*[F.max(F.col("v")[i]) for i in range(DIM)]).alias("mx"),
        )

        def norm(df):
            return re.sub(
                r"#\d+", "#", df._jdf.queryExecution().analyzed().toString()
            )

        assert norm(expr_form) == norm(col_form)

    def test_bucket_col_expr_matches_column_form(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from argus_spark.datapipe.similarity import (
            N_PLANES,
            PLANES,
            _bucket_col,
        )
        from argus_spark.datapipe.dedup import DIM

        # the pre-r14 Column-composition form, rebuilt inline
        def old_bucket(v):
            b = F.lit(0).cast("long")
            for p_idx, plane in enumerate(PLANES):
                dot = F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(x)) for x in plane]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
                b = b + F.when(
                    dot > 0, F.lit(1 << p_idx).cast("long")
                ).otherwise(F.lit(0).cast("long"))
            return b

        rng = np.random.default_rng(13)
        rows = [([float(x) for x in rng.standard_normal(DIM)],)
                for _ in range(64)]
        df = spark.createDataFrame(rows, "v array<double>")
        n_diff = (
            df.select(
                old_bucket(F.col("v")).alias("a"),
                _bucket_col("v").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .count()
        )
        assert n_diff == 0


class TestQuintileCutEquivalence:
    def test_rank_cut_equals_ntile_randomized(self, spark):
        """r15: ``quintile_cut_ids`` (distributed rank cut, no global
        sort) must keep EXACTLY the rows the old single-task
        ``ntile(5) <= 3`` window kept, for every n — including ties in
        affinity (doc_id breaks them), n < 5, n % 5 != 0, and n = 0."""
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from argus_spark.datapipe.curation import quintile_cut_ids

        for seed, n in [(1, 0), (2, 3), (3, 5), (4, 23), (5, 100), (6, 997)]:
            rng = random.Random(seed)
            rows = [
                # coarse affinity grid on purpose: plenty of exact ties
                (i, rng.randrange(10) / 4.0)
                for i in range(n)
            ]
            df = (
                spark.createDataFrame(rows, ["doc_id", "affinity"])
                if rows
                else spark.createDataFrame([], "doc_id long, affinity double")
            )
            got = {
                r["doc_id"] for r in quintile_cut_ids(df).collect()
            }
            want = {
                r["doc_id"]
                for r in df.withColumn(
                    "q",
                    F.ntile(5).over(
                        Window.orderBy(F.desc("affinity"), F.asc("doc_id"))
                    ),
                )
                .filter(F.col("q") <= 3)
                .collect()
            }
            assert got == want, (seed, n, sorted(got ^ want)[:10])
