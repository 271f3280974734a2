"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *codec* layer is
stubbed exactly as the build contract requires: real decodes raise
``NotImplementedError`` behind a try-import, while a deterministic
fake blob format ("IMG1" header: 4-byte magic + u32le width + u32le
height + utf-8 payload) exercises the genuinely important Spark parts
— binary schema, Arrow batch transfer, pandas UDF signatures, and the
metadata-extraction plan shape.

``multimodal_meta`` round-trips documents → fake image blobs →
header-decoded metadata entirely through ``mapInPandas`` and is
oracle-checked: because the fake format is a pure function of the doc
row, DuckDB can predict every decoded field.

Scale: blobs never leave executors (no collect); Arrow batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for real
multi-MB images lower it so a batch stays in executor memory, and
partition by size (``maxPartitionBytes``) not row count.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.session import load

MAGIC = b"IMG1"
HEADER_LEN = 12  # 4 magic + 4 width + 4 height


# --------------------------------------------------------------------------
# Codec layer — stubbed behind try-imports, per the build contract
# --------------------------------------------------------------------------


def decode_image_real(blob: bytes):
    """Decode a real image via PIL — unavailable in this container.

    The Spark-side plumbing (binary column in, struct metadata out) is
    identical to the fake path below; only this function changes when a
    codec is installed."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in container
        raise NotImplementedError(
            "image codec not installed; use the deterministic fake path "
            "(encode_fake_blob/decode_blob_header)"
        ) from exc
    raise NotImplementedError("real decode intentionally stubbed")


def sample_video_frames(blob: bytes, every_n: int = 30):
    """Frame sampling stub — same contract as decode_image_real."""
    raise NotImplementedError("video codec not installed in this container")


def extract_audio_features(blob: bytes):
    """Audio feature stub — same contract as decode_image_real."""
    raise NotImplementedError("audio codec not installed in this container")


# --------------------------------------------------------------------------
# Deterministic fake blob format (pure function of the doc row)
# --------------------------------------------------------------------------


def fake_dims(doc_id: int, n_chars: int) -> tuple[int, int]:
    return 16 + n_chars % 240, 16 + (doc_id * 7) % 240


def encode_fake_blob(doc_id: int, n_chars: int, text: str) -> bytes:
    w, h = fake_dims(doc_id, n_chars)
    return MAGIC + struct.pack("<II", w, h) + text[:16].encode("utf-8")


def decode_blob_header(blob: bytes) -> tuple[str, int, int, int]:
    fmt = blob[:4].decode("ascii")
    w, h = struct.unpack("<II", blob[4:HEADER_LEN])
    return fmt, w, h, len(blob) - HEADER_LEN


# --------------------------------------------------------------------------
# The oracle-checked plumbing query
# --------------------------------------------------------------------------

_BLOB_SCHEMA = "doc_id long, blob binary"
_META_SCHEMA = "doc_id long, fmt string, width long, height long, n_payload long, npixels long"


def _encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "blob": [
                    encode_fake_blob(int(i), int(n), t)
                    for i, n, t in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"])
                ],
            }
        )


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        metas = [decode_blob_header(b) for b in pdf["blob"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "fmt": [m[0] for m in metas],
                "width": pd.Series([m[1] for m in metas], dtype="int64"),
                "height": pd.Series([m[2] for m in metas], dtype="int64"),
                "n_payload": pd.Series([m[3] for m in metas], dtype="int64"),
                "npixels": pd.Series([m[1] * m[2] for m in metas], dtype="int64"),
            }
        )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → fake image blobs (mapInPandas encode) → decoded
    header metadata (mapInPandas decode). Two Arrow round-trips over a
    real binary column — the full multimodal plumbing path."""
    d = load(spark, sf_dir, "documents", widen=True).select("doc_id", "n_chars", "text")
    blobs = d.mapInPandas(_encode_batches, schema=_BLOB_SCHEMA)
    return blobs.mapInPandas(_decode_batches, schema=_META_SCHEMA)


# The fake format is a pure function of (doc_id, n_chars, text), so the
# decoded metadata is SQL-predictable: strlen = utf-8 bytes of the first
# 16 characters (matching Python's text[:16].encode()).
MULTIMODAL_META_SQL = """
SELECT doc_id,
       'IMG1' AS fmt,
       (16 + n_chars % 240)::BIGINT AS width,
       (16 + (doc_id * 7) % 240)::BIGINT AS height,
       strlen(substr(text, 1, 16))::BIGINT AS n_payload,
       ((16 + n_chars % 240) * (16 + (doc_id * 7) % 240))::BIGINT AS npixels
FROM documents
"""


RESIZE_MAX_SIDE = 128

_RESIZE_SCHEMA = (
    "doc_id long, width long, height long, r_width long, r_height long, "
    "n_payload long"
)


def resize_dims(w: int, h: int, max_side: int = RESIZE_MAX_SIDE) -> tuple[int, int]:
    """Integer aspect-preserving downscale (no-op if already small).
    Pure integer math so the oracle predicts it exactly."""
    m = max(w, h)
    if m <= max_side:
        return w, h
    return w * max_side // m, h * max_side // m


def _resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for i, b in zip(pdf["doc_id"], pdf["blob"]):
            fmt, w, h, n_payload = decode_blob_header(b)
            rw, rh = resize_dims(w, h)
            rows.append((int(i), w, h, rw, rh, n_payload))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "r_width", "r_height",
                           "n_payload"]
        ).astype("int64")


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: blobs → header decode → aspect-preserving
    downscale to ≤128 px longest side, all inside one ``mapInPandas``
    pass (a real codec would also re-encode the pixel payload here —
    that swap touches only ``_resize_batches``, not the plan)."""
    d = load(spark, sf_dir, "documents", widen=True).select("doc_id", "n_chars", "text")
    blobs = d.mapInPandas(_encode_batches, schema=_BLOB_SCHEMA)
    return blobs.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


MULTIMODAL_RESIZE_SQL = f"""
WITH m AS (
  SELECT doc_id,
         (16 + n_chars % 240)::BIGINT AS width,
         (16 + (doc_id * 7) % 240)::BIGINT AS height,
         strlen(substr(text, 1, 16))::BIGINT AS n_payload
  FROM documents
)
SELECT doc_id, width, height,
       CASE WHEN greatest(width, height) <= {RESIZE_MAX_SIDE} THEN width
            ELSE width * {RESIZE_MAX_SIDE} // greatest(width, height) END AS r_width,
       CASE WHEN greatest(width, height) <= {RESIZE_MAX_SIDE} THEN height
            ELSE height * {RESIZE_MAX_SIDE} // greatest(width, height) END AS r_height,
       n_payload
FROM m
"""


FRAME_STEP = 7

_FRAMES_SCHEMA = "doc_id long, frame_idx long, n_frames long"


def _frame_sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Cardinality-changing mapInPandas: one input blob → 0..n frame rows
    # (the exact shape a real video frame sampler needs).
    for pdf in it:
        rows = []
        for i, b in zip(pdf["doc_id"], pdf["blob"]):
            n_frames = len(b) - HEADER_LEN
            rows.extend(
                (int(i), idx, n_frames) for idx in range(0, n_frames, FRAME_STEP)
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_idx", "n_frames"], dtype="int64"
        )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: treat each blob's payload bytes as video
    frames and emit every ``FRAME_STEP``-th frame index. Demonstrates a
    row-expanding ``mapInPandas`` over binary input — swap the loop body
    for a real demuxer (pyav/ffmpeg) when a codec is installed
    (``sample_video_frames`` stub above)."""
    d = load(spark, sf_dir, "documents", widen=True).select("doc_id", "n_chars", "text")
    blobs = d.mapInPandas(_encode_batches, schema=_BLOB_SCHEMA)
    return blobs.mapInPandas(_frame_sample_batches, schema=_FRAMES_SCHEMA)


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH m AS (
  SELECT doc_id, strlen(substr(text, 1, 16))::BIGINT AS n_frames FROM documents
)
SELECT doc_id,
       unnest(range(0, n_frames, {FRAME_STEP}))::BIGINT AS frame_idx,
       n_frames
FROM m
"""


def _payload_digest_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload_md5": [
                    hashlib.md5(bytes(b)[HEADER_LEN:]).hexdigest()
                    for b in pdf["blob"]
                ],
            }
        )


def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by CONTENT digest of the blob payload — the
    image/audio analogue of ``dedup_exact``: hash the decoded payload
    bytes (header stripped, so re-encodes of the same pixels under
    different container metadata still collide), then one map-side-
    combinable hash aggregate. The digest runs inside the Arrow
    ``mapInPandas`` decode pass (where a real pipeline would hash
    decoded pixels), so this exercises the binary plumbing end-to-end;
    at 100 TB the pattern is hash-at-ingest + one shuffle on uniform
    digest keys. Oracle: the fake payload is the UTF-8 of the first 16
    characters, so DuckDB predicts the digest with md5(substr(text))."""
    d = load(spark, sf_dir, "documents", widen=True).select(
        "doc_id", "n_chars", "text"
    )
    blobs = d.mapInPandas(_encode_batches, schema=_BLOB_SCHEMA)
    digests = blobs.mapInPandas(
        _payload_digest_batches, schema="doc_id long, payload_md5 string"
    )
    return digests.groupBy("payload_md5").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )


MULTIMODAL_PAYLOAD_DEDUP_SQL = """
SELECT md5(substr(text, 1, 16)) AS payload_md5,
       min(doc_id) AS keep_id,
       count(*)::BIGINT AS n_copies
FROM documents
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Perceptual-hash near-dup (the non-exact media dedup mode)
# --------------------------------------------------------------------------

PH_SEED = "ph"
PH_HAMMING = 6  # near-dup acceptance: Hamming ≤ 6 of 48 signature bits
PH_GRAM = 4  # feature shingle width over the payload stream


def phash_signature(payload: bytes) -> int:
    """pHash-style 48-bit perceptual signature of a decoded media
    payload: SimHash sign-votes over the payload's overlapping
    ``PH_GRAM``-char shingles (a real pipeline swaps the feature
    extractor for DCT blocks of decoded pixels — only this function
    changes; the signature width, banding, and verify join stay).
    4-char shingles, not bigrams: the fake payload's character
    alphabet is tiny (~12 symbols), and 2-char features left only
    ~144 distinct features — signatures concentrated and the
    random-pair acceptance mass grew near-quadratically on the scale
    family (measured 329k pairs at x10; 234 with 4-grams — the same
    feature-poverty precision floor the 32→48-bit SimHash widening
    fixed, solved on the feature side this time). Bit/fold semantics
    are EXACTLY datapipe.dedup's ``_simhash_col`` (h % 2p ≥ p bit
    test, sign of the ±1 vote sum, MSB-first fold), and the feature
    hash is the shared seeded-md5 ``h64``, so the DuckDB oracle
    reproduces it with the same list idioms."""
    import hashlib

    from argus_spark.datapipe.dedup import SH_BITS

    s = payload.decode("utf-8")
    feats = [s[i : i + PH_GRAM] for i in range(len(s) - PH_GRAM + 1)]
    hs = [
        int(hashlib.md5(f"{PH_SEED}|{f}".encode()).hexdigest()[:15], 16)
        for f in feats
    ]
    sig = 0
    for j in range(SH_BITS):
        p = 1 << j
        vote = sum(1 if (h % (p * 2)) >= p else -1 for h in hs)
        if vote > 0:
            sig |= p
    return sig


def _phash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "phash": pd.Series(
                    [
                        phash_signature(bytes(b)[HEADER_LEN:])
                        for b in pdf["blob"]
                    ],
                    dtype="int64",
                ),
            }
        )


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash media NEAR-dup — the non-exact counterpart of
    ``multimodal_payload_dedup``: re-encodes/slight edits of the same
    media land at small Hamming distance, not equal digests. The
    signature runs inside the Arrow ``mapInPandas`` decode pass (where
    a real pipeline hashes decoded pixels); candidates come from the
    SAME chunk-banded Hamming machinery as ``dedup_simhash`` (4 ×
    12-bit chunks — pigeonhole recall for H ≤ 3, recall-biased band
    filter up to the τ = 6 verify).

    Identical payloads are collapsed to one signature-group row FIRST
    (min-doc_id representative + copy count), so an m-copy cluster
    costs one join row, not m² pairs — at 100 TB exact-dedup-then-
    near-dup-on-representatives is the only shape that survives; the
    pair join runs over distinct signatures only.

    Output: (rep_a, rep_b, hamming, n_a, n_b) — representative pairs
    with group sizes, rep_a < rep_b."""
    from argus_spark.datapipe.dedup import SH_CHUNK_BITS, SH_CHUNKS

    d = load(spark, sf_dir, "documents", widen=True).select(
        "doc_id", "n_chars", "text"
    )
    blobs = d.mapInPandas(_encode_batches, schema=_BLOB_SCHEMA)
    ph = blobs.mapInPandas(_phash_batches, schema="doc_id long, phash long")
    # Scoped-cached (r14 opt): the signature-group frame is tiny (one
    # row per distinct phash) but its lineage is the WHOLE Python
    # decode+phash mapInPandas pipeline — uncached, both sides of the
    # chunk self-join re-run it (the before-plan showed FOUR MapInPandas
    # pairs: every document encoded and perceptually hashed twice
    # per side). Same pattern as dedup_simhash's signature cache
    # (guide §4/§5 — pay the Python boundary once).
    from argus_spark.datapipe.scoped_cache import scoped_cache

    groups = scoped_cache(
        ph.groupBy("phash").agg(
            F.min("doc_id").alias("rep"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    cb = SH_CHUNK_BITS
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("c"),
                (
                    (F.col("phash") % F.lit(1 << (cb * (c + 1))))
                    / F.lit(1 << (cb * c))
                )
                .cast("long")
                .alias("chunk"),
            )
            for c in range(SH_CHUNKS)
        ]
    )
    e = groups.select(
        "rep", "phash", "n", F.explode(chunks).alias("k")
    ).select(
        "rep", "phash", "n",
        F.col("k.c").alias("c"), F.col("k.chunk").alias("chunk"),
    )
    a, x = e.alias("a"), e.alias("x")
    return (
        a.join(x, ["c", "chunk"], "inner")
        .filter(F.col("a.rep") < F.col("x.rep"))
        .select(
            F.col("a.rep").alias("rep_a"),
            F.col("x.rep").alias("rep_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("x.phash")))
            .cast("long")
            .alias("hamming"),
            F.col("a.n").alias("n_a"),
            F.col("x.n").alias("n_b"),
        )
        .filter(F.col("hamming") <= PH_HAMMING)
        .distinct()
    )


def _phash_dedup_sql() -> str:
    from argus_spark.datapipe.dedup import (
        SH_CHUNK_BITS,
        SH_CHUNKS,
        _simhash_sql_expr,
    )
    from argus_spark.datapipe.hashing import h64_sql

    cb = SH_CHUNK_BITS
    chunk_selects = "\nUNION ALL\n".join(
        f"SELECT rep, phash, n, {c} AS c, "
        f"(phash % {1 << (cb * (c + 1))}) // {1 << (cb * c)} AS chunk "
        "FROM groups"
        for c in range(SH_CHUNKS)
    )
    return f"""
WITH pay AS (
  SELECT doc_id, substr(text, 1, 16) AS s FROM documents
), feats AS (
  SELECT doc_id,
         list_transform(range(1, length(s) - {PH_GRAM - 2}),
                        i -> substr(s, i, {PH_GRAM})) AS bg
  FROM pay
), hh AS (
  SELECT doc_id, list_transform(bg, x -> {h64_sql('x', PH_SEED)}) AS hs
  FROM feats
), ph AS (
  SELECT doc_id, {_simhash_sql_expr()} AS phash FROM hh
), groups AS (
  SELECT phash, min(doc_id) AS rep, count(*)::BIGINT AS n
  FROM ph GROUP BY phash
), chunks AS (
{chunk_selects}
)
SELECT DISTINCT a.rep AS rep_a, x.rep AS rep_b,
       bit_count(xor(a.phash, x.phash))::BIGINT AS hamming,
       a.n AS n_a, x.n AS n_b
FROM chunks a JOIN chunks x ON a.c = x.c AND a.chunk = x.chunk
WHERE a.rep < x.rep
  AND bit_count(xor(a.phash, x.phash)) <= {PH_HAMMING}
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_meta": multimodal_meta,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_payload_dedup": multimodal_payload_dedup,
    "multimodal_phash_dedup": multimodal_phash_dedup,
}

ORACLES: dict[str, str] = {
    "multimodal_meta": MULTIMODAL_META_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_SQL,
    "multimodal_payload_dedup": MULTIMODAL_PAYLOAD_DEDUP_SQL,
    "multimodal_phash_dedup": _phash_dedup_sql(),
}
