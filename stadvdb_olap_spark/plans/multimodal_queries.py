"""Multimodal catalog queries: binary-column plumbing with the fake codec.

The payloads are the documents' utf-8 bytes (the container has no media
libs — TESTDATA has no binary fixtures either); the PLUMBING under test is
identical to real media: binary column + metadata struct in, Arrow-batched
Pandas decode out. The fake features are md5-derived, so the Spark
(hashlib in mapInPandas) and DuckDB (md5 hex arithmetic in SQL) sides are
comparable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.multimodal import (
    N_FAKE_FEATURES,
    attach_media_column,
    encode_y4m,
    extract_features,
    resize_media,
    sample_frames,
    sample_frames_decoded,
)
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table


def _feature_sql(j: int) -> str:
    """Byte j of md5(text) scaled to [0,1]: hex digits 2j+1, 2j+2."""
    d1 = f"(strpos('0123456789abcdef', md5(text)[{2 * j + 1}:{2 * j + 1}]) - 1)"
    d2 = f"(strpos('0123456789abcdef', md5(text)[{2 * j + 2}:{2 * j + 2}]) - 1)"
    return f"CAST({d1} * 16 + {d2} AS DOUBLE) / 255.0"


@query(
    "multimodal_fake_features",
    oracle=f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       {', '.join(f'{_feature_sql(j)} AS f{j}' for j in range(N_FAKE_FEATURES))},
       CAST(NULL AS VARCHAR) AS decode_error
FROM documents
""",
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline end-to-end with the deterministic fake codec:
    attach binary payload + metadata struct, then Arrow-batched
    mapInPandas feature extraction. Note the fixture text is ASCII, so
    length(text) == byte length on the oracle side. The feature vector
    publishes as wide DOUBLE columns f0..f{{N-1}} — certified outputs
    carry no ARRAY columns (a list cell crashes the driver's pandas
    canonicalizer); pipeline consumers take the array form straight from
    ``extract_features``."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_column(docs, F.encode("text", "utf-8"), "image", "raw")
    feats = extract_features(media, "content", "doc_id", codec="fake")
    return feats.select(
        "doc_id",
        "n_bytes",
        *[F.col("features")[j].alias(f"f{j}") for j in range(N_FAKE_FEATURES)],
        "decode_error",
    )


@query(
    "multimodal_frame_sample",
    oracle="""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       CAST(k AS BIGINT) AS frame_no,
       md5(concat(hex(encode(text)), '|', CAST(k AS VARCHAR)))
         AS frame_fingerprint
FROM docs, unnest(generate_series(0, (length(text) - 1) // 64)) AS u(k)
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: one row per sampled offset,
    exploded on the executors (never the driver). Fully SQL-certifiable —
    the fake fingerprint is md5(hex(payload) || '|' || frame_no), and
    both engines produce identical uppercase hex and md5 strings, so the
    oracle reconstructs every row exactly (fixture text is ASCII: char
    length == byte length). Deterministic doc subset via a key
    predicate, not LIMIT."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    media = attach_media_column(docs, F.encode("text", "utf-8"), "video", "raw")
    return sample_frames(media, "content", "doc_id", every_n_bytes=64)


@query(
    "multimodal_resize",
    oracle="""
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(256 AS BIGINT) AS n_bytes,
       upper(repeat(md5(text), 16)) AS content_hex
FROM documents WHERE doc_id < 50
""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over fake image payloads, certified end-to-end:
    the fake codec's deterministic stretch (md5-digest blocks repeated
    to target_w*target_h bytes) makes every output byte reconstructable
    in SQL, so the query publishes hex(content) — the ACTUAL resized
    payload bytes as a 512-char hex string — and the oracle rebuilds it
    as upper(repeat(md5(text), 16)) (16x16 target = 256 bytes = exactly
    16 copies of the 16-byte digest; DuckDB md5 is lowercase hex, Spark
    hex() uppercase). The REAL pixel resample is certified by the
    sibling `multimodal_ppm_resize_fingerprint`; this row certifies the
    generic binary-in/binary-out plumbing surface (dims published from
    meta, payload from content). Deterministic doc subset via a key
    predicate, not LIMIT. 100 TB shape: one Arrow-batched mapInPandas
    pass, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    media = attach_media_column(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload")),
        "payload",
        "image",
        "raw",
    )
    resized = resize_media(media, target_w=16, target_h=16)
    return resized.select(
        "doc_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        F.length("content").cast("long").alias("n_bytes"),
        F.hex("content").alias("content_hex"),
    )


def _text_to_ppm_batch(pdfs):
    """Deterministically render each doc's utf-8 bytes into a valid 8x8
    binary PPM (repeat/truncate to 192 RGB bytes) — real container
    bytes, so the downstream decode is a REAL parse, not plumbing."""
    import pandas as pd

    for pdf in pdfs:
        payloads = []
        for t in pdf["text"]:
            b = t.encode("utf-8") or b"\x00"
            body = (b * (192 // len(b) + 1))[:192]
            payloads.append(b"P6\n8 8\n255\n" + body)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})


def _text_to_wav_batch(pdfs):
    """Render each doc's bytes into a tiny valid 16-bit mono WAV (each
    byte becomes a sample, centered and scaled)."""
    import io
    import struct
    import wave

    import pandas as pd

    for pdf in pdfs:
        payloads = []
        for t in pdf["text"]:
            b = (t.encode("utf-8") or b"\x00")[:400]
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(8000)
                wf.writeframes(
                    b"".join(struct.pack("<h", (x - 128) * 256) for x in b)
                )
            payloads.append(buf.getvalue())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})


_MEDIA_GEN_SCHEMA = "doc_id long, content binary"


# Pixel p's channel bytes are the doc's ASCII bytes (3p+c) mod len(text)
# (the 8x8 P6 body is the text repeated to 192 bytes). _image_stats
# publishes exact-integer-moment statistics (luminance weights as the
# rationals 1063/5000 etc.), so the oracle re-derives every feature from
# the bytes: channel means s/(255n), luminance std
# sqrt(n*l2 - l1^2)/(5000*255*n), edge energy over the horizontal
# neighbor pairs (p, p+1 within a row), and the constant geometry terms.
_PPM_DECODE_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
),
lum AS MATERIALIZED (
  SELECT doc_id, p, r, g, b,
         CAST(1063 * r + 3576 * g + 361 * b AS BIGINT) AS l
  FROM (
    SELECT doc_id, p,
           ascii(substr(text, ((3 * p) % length(text)) + 1, 1)) AS r,
           ascii(substr(text, ((3 * p + 1) % length(text)) + 1, 1)) AS g,
           ascii(substr(text, ((3 * p + 2) % length(text)) + 1, 1)) AS b
    FROM docs, unnest(generate_series(0, 63)) AS u(p)
  )
),
agg AS (
  SELECT doc_id,
         CAST(SUM(r) AS BIGINT) AS sr,
         CAST(SUM(g) AS BIGINT) AS sg,
         CAST(SUM(b) AS BIGINT) AS sb,
         CAST(SUM(l) AS BIGINT) AS l1,
         CAST(SUM(l * l) AS BIGINT) AS l2
  FROM lum GROUP BY doc_id
),
grad AS (
  SELECT a.doc_id, CAST(SUM(abs(n.l - a.l)) AS BIGINT) AS g1
  FROM lum a JOIN lum n ON n.doc_id = a.doc_id AND n.p = a.p + 1
  WHERE a.p % 8 < 7
  GROUP BY a.doc_id
)
SELECT agg.doc_id,
       CAST(203 AS BIGINT) AS n_bytes,
       CAST(sr AS DOUBLE) / (255 * 64) AS f0,
       CAST(sg AS DOUBLE) / (255 * 64) AS f1,
       CAST(sb AS DOUBLE) / (255 * 64) AS f2,
       sqrt(CAST(64 * l2 - l1 * l1 AS DOUBLE))
         / (5000 * 255 * 64) AS f3,
       CAST(g1 AS DOUBLE) / (5000 * 255 * 8 * 7) AS f4,
       CAST(1 AS DOUBLE) AS f5,
       CAST(64 AS DOUBLE) / 1000000 AS f6,
       CAST(1 AS DOUBLE) AS f7,
       CAST(NULL AS VARCHAR) AS decode_error
FROM agg JOIN grad ON agg.doc_id = grad.doc_id
"""


@query("multimodal_ppm_real_decode", oracle=_PPM_DECODE_ORACLE)
def multimodal_ppm_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode path, no media libs needed: docs rendered into
    valid binary P6 PPMs (mapInPandas), then the numpy PPM codec parses
    headers and pixels and emits channel means / luminance std / edge
    energy. Exact-pixel unit tests pin the codec
    (`test_ppm_decode_features_exact`); this query certifies the same
    path at corpus width, ORACLE-BACKED now that `_image_stats`
    publishes exact-integer-moment statistics (see _PPM_DECODE_ORACLE):
    DuckDB re-derives every feature from the same ASCII bytes
    bit-for-bit. Features publish as wide f0..f7 DOUBLE columns per the
    certification output-type rule; pipeline consumers take the array
    form from ``extract_features`` directly. Deterministic doc subset
    via a key predicate, not LIMIT."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    media = docs.mapInPandas(_text_to_ppm_batch, _MEDIA_GEN_SCHEMA)
    feats = extract_features(media, "content", "doc_id", codec="ppm")
    return feats.select(
        "doc_id",
        "n_bytes",
        *[F.col("features")[j].alias(f"f{j}") for j in range(8)],
        "decode_error",
    )


def _text_to_y4m_batch(pdfs):
    """Render each doc's utf-8 bytes into a valid 4-frame 8x8 Cmono
    YUV4MPEG2 stream (repeat/truncate to 256 luma bytes) — real
    container bytes, so the downstream frame sampling is a REAL parse."""
    import numpy as np
    import pandas as pd

    for pdf in pdfs:
        payloads = []
        for t in pdf["text"]:
            b = t.encode("utf-8") or b"\x00"
            body = (b * (256 // len(b) + 1))[:256]
            frames = [
                np.frombuffer(body[i * 64 : (i + 1) * 64], dtype=np.uint8)
                .reshape(8, 8)
                for i in range(4)
            ]
            payloads.append(encode_y4m(frames, fps=(10, 1)))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})


# Frame i's byte j is the doc's ASCII byte (64*i + j) mod len(text)
# (the y4m body is the text repeated to 256 bytes, split into 4 8x8
# frames). All stats come from exact integer moments s1/s2, so the
# oracle re-derives mean = s1/(255n) and std = sqrt(n*s2 - s1^2)/(255n)
# bit-for-bit, and rebuilds each frame's bytes for the md5 fingerprint.
_Y4M_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
),
px AS (
  SELECT doc_id, fr, j,
         ascii(substr(text, ((64 * fr + j) % length(text)) + 1, 1)) AS b,
         chr(ascii(substr(text, ((64 * fr + j) % length(text)) + 1, 1)))
           AS ch
  FROM docs,
       unnest([0, 2]) AS f(fr),
       unnest(generate_series(0, 63)) AS u(j)
)
SELECT doc_id,
       CAST(fr AS BIGINT) AS frame_no,
       CAST(fr * 100 AS BIGINT) AS ts_ms,
       CAST(SUM(b) AS DOUBLE) / (255 * 64) AS mean_luma,
       sqrt(CAST(64 * SUM(b * b) - SUM(b) * SUM(b) AS DOUBLE))
         / (255 * 64) AS std_luma,
       md5(string_agg(ch, '' ORDER BY j)) AS frame_fingerprint,
       CAST(NULL AS VARCHAR) AS decode_error
FROM px
GROUP BY doc_id, fr
"""


@query("multimodal_y4m_frame_sample", oracle=_Y4M_ORACLE)
def multimodal_y4m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame-sampling path, no media libs needed: docs
    rendered into valid 4-frame Cmono y4m streams (mapInPandas), then
    ``sample_frames_decoded`` parses the container and emits every 2nd
    frame's timestamp, luma statistics and fingerprint. Exact-frame unit
    tests pin the codec; this query certifies the same path at corpus
    width, ORACLE-BACKED: the luma stats are exact-integer-moment
    formulas (one correctly rounded division/sqrt each) and the
    fingerprint hashes frame bytes the oracle rebuilds from the ASCII
    fixture text (see _Y4M_ORACLE). Deterministic doc subset via a key
    predicate, not LIMIT."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    media = docs.mapInPandas(_text_to_y4m_batch, _MEDIA_GEN_SCHEMA)
    return sample_frames_decoded(media, "content", "doc_id", every_n_frames=2)


# The wav feature math is exactly reconstructible in SQL because every
# intermediate is a dyadic rational below 2^53: samples are
# (byte-128)/128 (denominator 2^7), squares m/2^14 with <=400 terms
# (sum numerator < 2^23+lg400 < 2^53), so float addition is EXACT in any
# order — numpy's pairwise sum and DuckDB's sequential sum agree
# bit-for-bit — and the final avg/sqrt divisions are single correctly-
# rounded IEEE ops on identical inputs. (The PPM decode features are
# likewise certified via exact integer moments — see _PPM_DECODE_ORACLE
# — matching the Y4M note above.)
_WAV_ORACLE = """
WITH docs AS (
  SELECT doc_id, substr(text, 1, 400) AS t
  FROM documents WHERE doc_id < 200
),
samp AS (
  SELECT doc_id,
         k,
         CAST(ascii(substr(t, k, 1)) - 128 AS DOUBLE)
           / CAST(128 AS DOUBLE) AS x
  FROM docs, unnest(generate_series(1, length(t))) AS u(k)
),
lagged AS (
  SELECT doc_id, x,
         CASE WHEN x < 0 THEN 1 ELSE 0 END AS sb,
         lag(CASE WHEN x < 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY k) AS psb
  FROM samp
)
SELECT doc_id,
       CAST(44 + 2 * count(*) AS BIGINT) AS n_bytes,
       sqrt(avg(x * x)) AS f0,
       max(abs(x)) AS f1,
       CAST(sum(abs(sb - psb)) AS DOUBLE)
         / CAST(count(*) - 1 AS DOUBLE) AS f2,
       avg(x) AS f3,
       CAST((count(*) * 1000) // 8000 AS DOUBLE)
         / CAST(1000 AS DOUBLE) AS f4,
       CAST(1 AS DOUBLE) AS f5,
       CAST(8000 AS DOUBLE) / CAST(48000 AS DOUBLE) AS f6,
       CAST(count(*) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS f7,
       CAST(NULL AS VARCHAR) AS decode_error
FROM lagged
GROUP BY doc_id
"""


@query("multimodal_wav_real_decode", oracle=_WAV_ORACLE)
def multimodal_wav_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode path via the stdlib wave module: docs rendered
    into valid 16-bit PCM WAVs (44-byte header + one int16 sample per
    text byte), decoded back to RMS / peak / zero-crossing-rate / DC /
    duration features. Unit-tested exactly
    (`test_wav_decode_features_exact`) AND oracle-certified: the sample
    values (byte-128)/128 and their squares are dyadic rationals whose
    sums stay exact in float64, so DuckDB re-derives every feature
    bit-for-bit from the text bytes (see _WAV_ORACLE). Features publish
    as wide f0..f7 DOUBLE columns per the certification output-type
    rule; pipeline consumers take the array form from
    ``extract_features`` directly. Deterministic doc subset via a key
    predicate, not LIMIT. Fixture min text length is 44 chars, so the
    zero-crossing denominator n-1 is never 0."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    media = docs.mapInPandas(_text_to_wav_batch, _MEDIA_GEN_SCHEMA)
    feats = extract_features(media, "content", "doc_id", codec="wav")
    return feats.select(
        "doc_id",
        "n_bytes",
        *[F.col("features")[j].alias(f"f{j}") for j in range(8)],
        "decode_error",
    )


@query(
    "multimodal_ppm_resize_fingerprint",
    oracle="""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
),
px AS (
  SELECT doc_id,
         j,
         chr(ascii(substr(
           text,
           ((3 * (8 * ((j // 3 // 16) // 2) + ((j // 3) % 16) // 2)
             + j % 3) % length(text)) + 1,
           1
         ))) AS ch
  FROM docs, unnest(generate_series(0, 767)) AS u(j)
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(781 AS BIGINT) AS n_bytes,
       md5('P6' || chr(10) || '16 16' || chr(10) || '255' || chr(10)
           || string_agg(ch, '' ORDER BY j)) AS fp
FROM px
GROUP BY doc_id
""",
)
def multimodal_ppm_resize_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL image resize certified end-to-end at corpus width: docs
    render into valid 8x8 binary P6 PPMs, the numpy nearest-neighbor
    resample upscales to 16x16 (`resize_media(codec="ppm")`, the same
    path the exact-pixel unit tests pin), and the output publishes the
    new dimensions plus the md5 fingerprint of the RESIZED container
    bytes. Certifiable because every byte is deterministic integer
    arithmetic: output pixel (r, c) maps to source pixel
    (r*8//16, c*8//16), the source body is the doc's ASCII bytes
    repeated to 192, and the oracle rebuilds the full resized payload
    (header + 768 body bytes, all ASCII) with string_agg and hashes it
    — certifying the actual pixel bytes, not just counts. The sibling
    `multimodal_resize` certifies the generic fake-codec plumbing the
    same way (hex of the full resized payload). 100 TB shape: one
    Arrow-batched mapInPandas pass, no shuffle until the final tiny
    projection."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    media = docs.mapInPandas(_text_to_ppm_batch, _MEDIA_GEN_SCHEMA)
    resized = resize_media(media, target_w=16, target_h=16, codec="ppm")
    return resized.select(
        "doc_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        F.length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("fp"),
    )


# Image near-dup fixture: each doc renders TWO 8x8 PPMs — the original
# (image_id = 2*doc_id) and a copy with body byte 0 bumped by +1 mod 256
# (image_id = 2*doc_id + 1), a one-channel one-pixel perturbation that a
# perceptual hash should (mostly) see through. Pixel p channel c of the
# ORIGINAL is text byte (3p + c) mod len — the same rendering the PPM
# decode oracle replays.
_AHASH_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
),
px AS MATERIALIZED (
  SELECT doc_id * 2 + v AS image_id, p,
         1063 * (CASE WHEN v = 1 AND p = 0
                 THEN (ascii(substr(text, 1, 1)) + 1) % 256
                 ELSE ascii(substr(text, ((3 * p) % length(text)) + 1, 1))
                 END)
         + 3576 * ascii(substr(text, ((3 * p + 1) % length(text)) + 1, 1))
         + 361 * ascii(substr(text, ((3 * p + 2) % length(text)) + 1, 1))
           AS l
  FROM docs, unnest([0, 1]) AS vv(v), unnest(generate_series(0, 63)) AS u(p)
),
tot AS (SELECT image_id, SUM(l) AS t FROM px GROUP BY image_id),
bands AS MATERIALIZED (
  SELECT px.image_id, p // 16 AS k,
         CAST(SUM(CASE WHEN 64 * l > t THEN 1 ELSE 0 END
                  << (15 - (p % 16))) AS BIGINT) AS v
  FROM px JOIN tot ON px.image_id = tot.image_id
  GROUP BY px.image_id, p // 16
),
hashes AS (
  SELECT image_id,
         MAX(CASE WHEN k = 0 THEN v END) AS b0,
         MAX(CASE WHEN k = 1 THEN v END) AS b1,
         MAX(CASE WHEN k = 2 THEN v END) AS b2,
         MAX(CASE WHEN k = 3 THEN v END) AS b3
  FROM bands GROUP BY image_id
),
cand AS (
  SELECT DISTINCT x.image_id AS id_a, y.image_id AS id_b
  FROM bands x
  JOIN bands y ON x.k = y.k AND x.v = y.v AND x.image_id < y.image_id
)
SELECT * FROM (
  SELECT id_a, id_b,
         CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
            + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
           AS BIGINT) AS hamming
  FROM cand
  JOIN hashes ha ON cand.id_a = ha.image_id
  JOIN hashes hb ON cand.id_b = hb.image_id
)
WHERE hamming <= 6
"""


def _text_to_ppm_pair_batch(pdfs):
    """Render each doc into the original + perturbed 8x8 PPM pair (see
    _AHASH_ORACLE notes); ids are 2*doc_id and 2*doc_id + 1."""
    import pandas as pd

    for pdf in pdfs:
        ids: list[int] = []
        payloads: list[bytes] = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            b = t.encode("utf-8") or b"\x00"
            body = (b * (192 // len(b) + 1))[:192]
            ids.append(2 * int(d))
            payloads.append(b"P6\n8 8\n255\n" + body)
            ids.append(2 * int(d) + 1)
            payloads.append(
                b"P6\n8 8\n255\n" + bytes([(body[0] + 1) % 256]) + body[1:]
            )
        yield pd.DataFrame({"doc_id": ids, "content": payloads})


@query("image_near_dup_ahash", oracle=_AHASH_ORACLE)
def image_near_dup_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-DUPLICATE detection: average-hash perceptual
    fingerprints over the real P6 decode path, banded LSH blocking, and
    exact Hamming verification — MinHash-LSH dedup applied to the image
    modality. The corpus is each doc's rendered PPM plus a one-pixel
    perturbed copy; the perturbed twin survives the hash (few flipped
    bits) while unrelated images only pair when a 16-bit band truly
    collides. Everything is integer-exact (see ``ahash_bands``), so the
    oracle re-derives every band, candidate, and Hamming distance from
    the fixture bytes. 100 TB shape: one Arrow-batched hashing pass
    (zero shuffle), then the shuffle key is (band index, band value) —
    all-pairs comparison never happens; the verify join touches only
    colliding buckets, exactly like the text LSH path."""
    from stadvdb_olap_spark.operators.multimodal import (
        ahash_bands,
        near_dup_pairs_ahash,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    media = docs.mapInPandas(_text_to_ppm_pair_batch, _MEDIA_GEN_SCHEMA)
    hashes = ahash_bands(media, "content", "doc_id")
    return near_dup_pairs_ahash(hashes, max_hamming=6)


# Audio near-dup fixture: each doc renders TWO 400-sample 16-bit PCM
# WAVs — sample j is (text byte (j mod len) - 128) * 256, and the
# perturbed twin (clip_id = 2*doc_id + 1) bumps body byte 0 by +1 mod
# 256 — a one-sample amplitude nudge the energy-delta fingerprint
# should (mostly) see through.
_AUDIO_FP_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
),
en AS MATERIALIZED (
  SELECT doc_id * 2 + v AS clip_id, j // 16 AS f,
         SUM(abs(CASE WHEN v = 1 AND j = 0
                 THEN (ascii(substr(text, 1, 1)) + 1) % 256 - 128
                 ELSE ascii(substr(text, (j % length(text)) + 1, 1)) - 128
                 END) * 256) AS e
  FROM docs, unnest([0, 1]) AS vv(v), unnest(generate_series(0, 399)) AS u(j)
  GROUP BY doc_id * 2 + v, j // 16
),
bits AS (
  SELECT a.clip_id, a.f AS i, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM en a JOIN en b ON b.clip_id = a.clip_id AND b.f = a.f + 1
  WHERE a.f < 24
),
bands AS MATERIALIZED (
  SELECT clip_id, i // 6 AS k,
         CAST(SUM(bit << (5 - (i % 6))) AS BIGINT) AS v
  FROM bits GROUP BY clip_id, i // 6
),
hashes AS (
  SELECT clip_id,
         MAX(CASE WHEN k = 0 THEN v END) AS b0,
         MAX(CASE WHEN k = 1 THEN v END) AS b1,
         MAX(CASE WHEN k = 2 THEN v END) AS b2,
         MAX(CASE WHEN k = 3 THEN v END) AS b3
  FROM bands GROUP BY clip_id
),
cand AS (
  SELECT DISTINCT x.clip_id AS id_a, y.clip_id AS id_b
  FROM bands x
  JOIN bands y ON x.k = y.k AND x.v = y.v AND x.clip_id < y.clip_id
)
SELECT * FROM (
  SELECT id_a, id_b,
         CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
            + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
           AS BIGINT) AS hamming
  FROM cand
  JOIN hashes ha ON cand.id_a = ha.clip_id
  JOIN hashes hb ON cand.id_b = hb.clip_id
)
WHERE hamming <= 4
"""


def _text_to_wav_pair_batch(pdfs):
    """Render each doc into the original + perturbed fixed-length WAV
    pair (see _AUDIO_FP_ORACLE notes); ids are 2*doc_id and 2*doc_id+1."""
    import io
    import struct
    import wave

    import pandas as pd

    for pdf in pdfs:
        ids: list[int] = []
        payloads: list[bytes] = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            b = t.encode("utf-8") or b"\x00"
            body = (b * (400 // len(b) + 1))[:400]
            for v in (0, 1):
                body_v = (
                    bytes([(body[0] + 1) % 256]) + body[1:] if v else body
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(
                        b"".join(
                            struct.pack("<h", (x - 128) * 256) for x in body_v
                        )
                    )
                ids.append(2 * int(d) + v)
                payloads.append(buf.getvalue())
        yield pd.DataFrame({"doc_id": ids, "content": payloads})


@query("audio_near_dup_fingerprint", oracle=_AUDIO_FP_ORACLE)
def audio_near_dup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO NEAR-DUPLICATE detection: sign-of-delta frame-energy
    fingerprints over the real stdlib-wave decode path (the
    Shazam/chromaprint shape with its integer-exact core — see
    ``audio_energy_fingerprint``), then the SAME banded blocking +
    Hamming verify stage the image aHash path uses
    (``near_dup_pairs_ahash`` — the band contract is shared across
    modalities on purpose). The corpus is each doc's rendered 400-sample
    PCM clip plus a one-sample perturbed twin. Every frame energy, bit,
    band, candidate, and distance is re-derived by the DuckDB oracle
    from the fixture bytes. With text (MinHash/SimHash), images
    (aHash), and audio (energy deltas) certified, near-dup detection
    covers all three modalities end-to-end. 100 TB shape: one
    Arrow-batched fingerprint pass, then a (band index, band value)
    shuffle — never all-pairs."""
    from stadvdb_olap_spark.operators.multimodal import (
        audio_energy_fingerprint,
        near_dup_pairs_ahash,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    media = docs.mapInPandas(_text_to_wav_pair_batch, _MEDIA_GEN_SCHEMA)
    fps = audio_energy_fingerprint(media, "content", "doc_id")
    return near_dup_pairs_ahash(fps, max_hamming=4)
