"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
extracted by Arrow-batched ``mapInPandas`` stages. The container has no
image/audio codecs, so the *decode* step is stubbed (NotImplementedError or
a deterministic fake) — the Spark-side plumbing (schema, batching, UDF
signature, partition behavior) is real and tested.

``binary_meta`` is fully JVM-side and DuckDB-oracle-gated; ``fake_features``
exercises the mapInPandas path with a deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, fake_width int, fake_height int, checksum bigint"
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (here: the utf-8 text bytes standing
    in for an image payload)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "utf-8"))


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bytes, magic_hex): typed metadata off the binary column —
    byte length + leading-bytes magic, all JVM-side."""
    docs = with_payload(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return docs.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 4), "utf-8"))).alias(
            "magic_hex"
        ),
    )


def sql_binary_meta() -> str:
    return """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       upper(hex(encode(substring(text, 1, 4)))) AS magic_hex
FROM documents
"""


def decode_image(payload: bytes):
    """Real decoder entry point — image/audio libs are not available in this
    container; deploy environments plug a codec in here."""
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "container; use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: fake (width, height) derived from
    the payload bytes so tests are stable."""
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the binary column: Arrow batches
    in, one feature row per payload out. Decode is the deterministic fake."""
    docs = with_payload(spark.read.parquet(f"{sf_dir}/documents.parquet")).select(
        "doc_id", "payload"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                w, h = fake_decode(data)
                rows.append(
                    (int(doc_id), len(data), w, h, sum(data) % 1_000_003)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "fake_width", "fake_height", "checksum"],
            )

    return docs.mapInPandas(fn, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, width int, height int, new_width int, new_height int"
FRAME_SCHEMA = "doc_id bigint, n_frames int, stride int, sampled_idx string"
RESIZE_BOX = 224      # target bounding box (edge)
FAKE_FPS_MOD = 240    # fake frame count = n_bytes % FAKE_FPS_MOD + 1
FRAME_BUDGET = 8      # sample ~8 frames per clip


def fake_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing (mapInPandas): decode (deterministic fake) ->
    fit into a RESIZE_BOX square preserving aspect ratio. Pure integer
    arithmetic ((d*BOX) // max(w,h)) so the oracle is exact."""
    docs = with_payload(spark.read.parquet(f"{sf_dir}/documents.parquet")).select(
        "doc_id", "payload"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h = fake_decode(bytes(payload))
                m = max(w, h)
                rows.append(
                    (int(doc_id), w, h,
                     max(1, w * RESIZE_BOX // m), max(1, h * RESIZE_BOX // m))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "new_width", "new_height"],
            )

    return docs.mapInPandas(fn, RESIZE_SCHEMA)


def sql_fake_resize() -> str:
    w = "(octet_length(encode(text)) % 640 + 1)"
    h = "((octet_length(encode(text)) * 7) % 480 + 1)"
    m = f"greatest({w}, {h})"
    return f"""
SELECT doc_id,
       {w}::INT AS width,
       {h}::INT AS height,
       greatest(1, {w} * {RESIZE_BOX} // {m})::INT AS new_width,
       greatest(1, {h} * {RESIZE_BOX} // {m})::INT AS new_height
FROM documents
"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (mapInPandas): fake frame count from
    the payload, uniform-stride sample of ~FRAME_BUDGET frame indexes."""
    docs = with_payload(spark.read.parquet(f"{sf_dir}/documents.parquet")).select(
        "doc_id", "payload"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(bytes(payload)) % FAKE_FPS_MOD + 1
                stride = max(1, n_frames // FRAME_BUDGET)
                idxs = "|".join(str(i) for i in range(0, n_frames, stride))
                rows.append((int(doc_id), n_frames, stride, idxs))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "stride", "sampled_idx"]
            )

    return docs.mapInPandas(fn, FRAME_SCHEMA)


def sql_frame_sample() -> str:
    nf = f"(octet_length(encode(text)) % {FAKE_FPS_MOD} + 1)"
    st = f"greatest(1, {nf} // {FRAME_BUDGET})"
    return f"""
SELECT doc_id,
       {nf}::INT AS n_frames,
       {st}::INT AS stride,
       array_to_string(list_transform(range(0, {nf}, {st}), x -> x::VARCHAR),
                       '|') AS sampled_idx
FROM documents
"""


def sql_fake_features() -> str:
    """DuckDB oracle for ``fake_features``: the fake decode is pure
    arithmetic on the payload's byte length and byte sum, both expressible
    over the utf-8 encoding of ``text``. The testdata corpus is ASCII, so
    per-character code points equal the utf-8 bytes the Spark side sums."""
    return """
SELECT doc_id,
       octet_length(encode(text))::INT AS n_bytes,
       (octet_length(encode(text)) % 640 + 1)::INT AS fake_width,
       ((octet_length(encode(text)) * 7) % 480 + 1)::INT AS fake_height,
       (list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
        % 1000003)::BIGINT AS checksum
FROM documents
"""


# ---------------------------------------------------------------------------
# Perceptual hash (average-hash) near-dup bucketing over the binary column.
# ---------------------------------------------------------------------------

PHASH_CELLS = 64
PHASH_SCHEMA = "doc_id bigint, phash string"


def _phash_bits(data: bytes) -> str:
    """64-bit average-hash over the fake-decoded 'grayscale' grid: the
    payload is split into 64 equal byte chunks (the downsample stand-in),
    each cell is its byte sum, and bit_j = cell_j > mean — pure integer
    compares (cell*64 > total), no float."""
    n = len(data)
    cells = [
        sum(data[(j * n) // PHASH_CELLS:((j + 1) * n) // PHASH_CELLS])
        for j in range(PHASH_CELLS)
    ]
    total = sum(cells)
    return "".join(
        "1" if c * PHASH_CELLS > total else "0" for c in cells
    )


def phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash, n_bucket): perceptual-hash near-dup bucketing for
    image-like payloads — payloads whose 'pixel' energy distribution
    matches land in the same 64-bit bucket even when bytes differ
    slightly.  The hash runs in the Arrow-batched mapInPandas lane (the
    real decode slots into ``decode_image``); bucket sizes are one
    map-side-combinable count joined back by hash.  At 10^12 images the
    only shuffles are the count and the bucket join, both on the 64-bit
    hash key."""
    docs = with_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "payload")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), _phash_bits(bytes(p)))
                for d, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    hashed = docs.mapInPandas(fn, PHASH_SCHEMA)
    sizes = hashed.groupBy("phash").agg(F.count(F.lit(1)).alias("n_bucket"))
    return hashed.join(sizes, "phash").select("doc_id", "phash", "n_bucket")


def sql_phash_buckets() -> str:
    """The fake 'grid' is byte arithmetic over the ASCII payload, so the
    whole hash is expressible in DuckDB list comprehensions (same ASCII
    assumption as sql_fake_features)."""
    chars = "string_split(text, '')"
    cell = (
        f"COALESCE(list_sum([ascii(c) for c in "
        f"list_slice({chars}, (j * length(text)) // {PHASH_CELLS} + 1, "
        f"((j + 1) * length(text)) // {PHASH_CELLS})]), 0)"
    )
    return f"""
WITH cells AS (
  SELECT doc_id,
         [{cell} for j in generate_series(0, {PHASH_CELLS - 1})] AS cs
  FROM documents
),
hashed AS (
  SELECT doc_id,
         array_to_string(
           [CASE WHEN c * {PHASH_CELLS} > list_sum(cs) THEN '1' ELSE '0' END
            for c in cs], '') AS phash
  FROM cells
),
sizes AS (SELECT phash, COUNT(*) AS n_bucket FROM hashed GROUP BY phash)
SELECT h.doc_id, h.phash, s.n_bucket
FROM hashed h JOIN sizes s ON h.phash = s.phash
"""


# ---------------------------------------------------------------------------
# Voice-activity segmentation over fake decoded samples.
# ---------------------------------------------------------------------------

VAD_FRAME = 16     # samples (bytes) per frame
VAD_TH = 100       # active iff mean sample value >= VAD_TH (integer: sum >= TH*W)


def audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seg, start_frame, end_frame, n_frames): voice-activity
    segments over the payload treated as a PCM-ish sample stream (the
    deterministic fake-decode convention of this module: sample value =
    byte value; a real codec plugs in at the decode_image/fake_decode
    seam).  Frames of VAD_FRAME samples are active when their integer
    energy sum >= VAD_TH * VAD_FRAME; maximal runs of active frames are
    the segments — the silence-trimming pass an audio-corpus pipeline
    runs before transcription/feature extraction.

    Plan: the whole detection — framing, energy, run detection
    (gaps-and-islands INSIDE the row's frame array via start/end masks,
    not a window over exploded rows) — is row-local higher-order-function
    arithmetic, so a 10^12-clip pass is map-only with one explode of the
    (few) segments per clip at the very end.  Exact integer energy ->
    bit-identical oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # split-to-chars + ascii is ~7x faster than per-index substr (the
    # HOF re-enters the string per element; split materializes it once)
    codes = F.transform(
        F.filter(F.split(F.col("text"), ""), lambda c: c != ""),
        lambda c: F.ascii(c),
    )

    # each derived array (codes -> energy -> act) is BOUND as a lambda
    # variable before anything indexes into it: element_at over an
    # unmaterialized HOF expression re-evaluates it per access, turning
    # run detection O(frames^2 x frame) per row (measured 8.2s -> 1.1s
    # for the suite query at sf0.1)
    def runs_of(act):
        idx = F.sequence(F.lit(1), F.size(act))
        starts = F.filter(
            idx,
            lambda i: (F.element_at(act, i) == 1)
            & ((i == 1) | (F.element_at(act, i - 1) == 0)),
        )
        ends = F.filter(
            idx,
            lambda i: (F.element_at(act, i) == 1)
            & ((i == F.size(act)) | (F.element_at(act, i + 1) == 0)),
        )
        return F.zip_with(
            starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        )

    def of(cs):
        nf = F.floor((F.size(cs) - 1) / VAD_FRAME).cast("int") + 1
        energy = F.transform(
            F.sequence(F.lit(1), nf),
            lambda f: F.aggregate(
                F.slice(cs, (f - 1) * VAD_FRAME + 1, VAD_FRAME),
                F.lit(0),
                lambda acc, x: acc + x,
            ),
        )
        act = F.transform(
            energy,
            lambda e, i: (
                e
                >= F.lit(VAD_TH)
                * F.least(F.lit(VAD_FRAME), F.size(cs) - i * VAD_FRAME)
            ).cast("int"),
        )
        return F.element_at(F.transform(F.array(act), runs_of), 1)

    segs = F.element_at(F.transform(F.array(codes), of), 1)
    return (
        docs.select("doc_id", F.posexplode(segs).alias("seg0", "se"))
        .select(
            "doc_id",
            (F.col("seg0") + 1).alias("seg"),
            F.col("se.s").alias("start_frame"),
            F.col("se.e").alias("end_frame"),
            (F.col("se.e") - F.col("se.s") + 1).alias("n_frames"),
        )
    )


def sql_audio_vad_segments() -> str:
    codes = (
        "[ascii(substring(text, i, 1)) "
        "for i in generate_series(1, length(text))]"
    )
    return f"""
WITH c AS (SELECT doc_id, {codes} AS cs FROM documents),
e AS (
  SELECT doc_id, cs,
         [list_aggregate(cs[(f - 1) * {VAD_FRAME} + 1 :
                            (f - 1) * {VAD_FRAME} + {VAD_FRAME}], 'sum')
          for f in generate_series(1, (len(cs) - 1) // {VAD_FRAME} + 1)]
         AS energy
  FROM c
),
a AS (
  SELECT doc_id,
         [CASE WHEN energy[i] >= {VAD_TH} * least({VAD_FRAME},
                 len(cs) - i * {VAD_FRAME} + {VAD_FRAME})
               THEN 1 ELSE 0 END
          for i in generate_series(1, len(energy))] AS act
  FROM e
),
se AS (
  SELECT doc_id,
         [i for i in generate_series(1, len(act))
          if act[i] = 1 AND (i = 1 OR act[i - 1] = 0)] AS starts,
         [i for i in generate_series(1, len(act))
          if act[i] = 1 AND (i = len(act) OR act[i + 1] = 0)] AS ends
  FROM a
)
SELECT doc_id,
       CAST(k AS INTEGER) AS seg,
       starts[k] AS start_frame,
       ends[k] AS end_frame,
       ends[k] - starts[k] + 1 AS n_frames
FROM se, LATERAL unnest(generate_series(1, len(starts))) t(k)
"""


# ---------------------------------------------------------------------------
# pHash Hamming near-dup pairs (banded LSH over the 64-bit hash).
# ---------------------------------------------------------------------------

PHASH_BANDS = 4          # 4 bands x 16 bits
PHASH_HAM_MAX = 6        # emit pairs with hamming distance <= 6


def phash_pairs(
    spark: SparkSession,
    sf_dir: str,
    bands: int = PHASH_BANDS,
    ham_max: int = PHASH_HAM_MAX,
) -> DataFrame:
    """(doc_a, doc_b, hamming): image near-duplicate pairs — documents
    whose perceptual hashes agree on at least one of ``bands`` bit-bands
    AND are within ``ham_max`` Hamming bits overall.  The visual analogue
    of MinHash-LSH text dedup: banding makes candidate generation a
    bucket equi-join (never all-pairs), and the exact Hamming check
    prunes band-collision false positives.  A flip of <= 6 of 64 bits
    must leave one 16-bit band untouched whenever the flips cluster; like
    any LSH, recall below the guarantee radius (bands*ham... floor) is
    probabilistic and identical across engines by construction.

    Scale: hashes ride the Arrow mapInPandas lane once (shared shape with
    phash_buckets); candidates shuffle on (band_idx, band_bits) — the
    64-bit-key join LSH always pays — and the Hamming verify is an
    integer XOR popcount over the four 16-bit chunks, whole-stage
    codegen, no UDF."""
    docs = with_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "payload")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), _phash_bits(bytes(p)))
                for d, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    width = PHASH_CELLS // bands
    hashed = docs.mapInPandas(fn, PHASH_SCHEMA).select(
        "doc_id",
        *[
            F.conv(F.substring("phash", 1 + b * width, width), 2, 10)
            .cast("bigint")
            .alias(f"c{b}")
            for b in range(bands)
        ],
    ).persist()
    bandrows = hashed.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("b"), F.col(f"c{b}").alias("k"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.b").alias("b"), F.col("bk.k").alias("k"))
    cand = (
        bandrows.alias("x")
        .join(bandrows.alias("y"), ["b", "k"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = hashed.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"c{b}").alias(f"a{b}") for b in range(bands)],
    )
    bb = hashed.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"c{b}").alias(f"b{b}") for b in range(bands)],
    )
    ham = None
    for b in range(bands):
        t = F.bit_count(F.col(f"a{b}").bitwiseXOR(F.col(f"b{b}")))
        ham = t if ham is None else ham + t
    out = (
        cand.join(a, "doc_a")
        .join(bb, "doc_b")
        .select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .where(F.col("hamming") <= ham_max)
        .localCheckpoint(eager=True)
    )
    hashed.unpersist()
    return out


def sql_phash_pairs(
    bands: int = PHASH_BANDS, ham_max: int = PHASH_HAM_MAX
) -> str:
    width = PHASH_CELLS // bands

    def b2i(b: int) -> str:
        sub = f"substring(phash, {1 + b * width}, {width})"
        return (
            f"list_sum([CASE WHEN {sub}[i] = '1' THEN "
            f"(CAST(1 AS BIGINT) << ({width} - i)) ELSE 0 END "
            f"for i in generate_series(1, {width})])"
        )

    chunks = ", ".join(
        f"CAST({b2i(b)} AS BIGINT) AS c{b}" for b in range(bands)
    )
    band_union = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS b, c{b} AS k FROM hashed"
        for b in range(bands)
    )
    ham = " + ".join(f"bit_count(xor(a.c{b}, h.c{b}))" for b in range(bands))
    return f"""
WITH hb AS ({sql_phash_buckets()}),
hashed AS (SELECT doc_id, {chunks} FROM hb),
bandrows AS ({band_union}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bandrows x JOIN bandrows y ON x.b = y.b AND x.k = y.k
  WHERE x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b, CAST({ham} AS BIGINT) AS hamming
FROM cand c
JOIN hashed a ON a.doc_id = c.doc_a
JOIN hashed h ON h.doc_id = c.doc_b
WHERE {ham} <= {ham_max}
"""


# ---------------------------------------------------------------------------
# Modality rollup (storage accounting per payload type).
# ---------------------------------------------------------------------------

MODALITIES = ["text", "image", "audio", "video"]


def modality_col():
    """Deterministic modality tag off doc_id (the driver's synthetic corpus
    is text-only, so the 4-way split is reconstructed the same way as
    trainprep._tier_col's source tiers — row-local arithmetic both engines
    share)."""
    return (
        F.when(F.col("doc_id") % 4 == 0, "text")
        .when(F.col("doc_id") % 4 == 1, "image")
        .when(F.col("doc_id") % 4 == 2, "audio")
        .otherwise("video")
    )


def modality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(modality, n_items, total_bytes, avg_bytes, max_bytes,
    pct_bytes_ppm): storage accounting per modality over the opaque
    payload column — the capacity-planning rollup a multimodal lake needs
    before sizing decode fleets (image/video bytes dominate row counts by
    orders of magnitude, so row-count dashboards mislead).

    All BIGINT: avg via integer division, share in exact ppm against a
    1-row broadcast total.  Plan: one map-side-combinable groupBy over
    the payload scan; the modality universe is enum-sized."""
    docs = with_payload(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    per = docs.groupBy(modality_col().alias("modality")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.max(F.length("payload")).cast("bigint").alias("max_bytes"),
    )
    tot = per.agg(F.sum("total_bytes").cast("bigint").alias("all_bytes"))
    return per.crossJoin(F.broadcast(tot)).select(
        "modality",
        "n_items",
        "total_bytes",
        F.expr("total_bytes div n_items").cast("bigint").alias("avg_bytes"),
        "max_bytes",
        F.expr("total_bytes * 1000000 div all_bytes")
        .cast("bigint")
        .alias("pct_bytes_ppm"),
    )


def sql_modality_rollup() -> str:
    return """
WITH per AS (
  SELECT CASE WHEN doc_id % 4 = 0 THEN 'text'
              WHEN doc_id % 4 = 1 THEN 'image'
              WHEN doc_id % 4 = 2 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(SUM(total_bytes) AS BIGINT) AS all_bytes FROM per)
SELECT modality, n_items, total_bytes,
       CAST(total_bytes // n_items AS BIGINT) AS avg_bytes,
       max_bytes,
       CAST(total_bytes * 1000000 // all_bytes AS BIGINT) AS pct_bytes_ppm
FROM per CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Video near-duplicate pairs: sampled-frame perceptual-hash containment.
# ---------------------------------------------------------------------------

FR_CELLS = 16        # per-frame average-hash cells
FR_HOT_CAP = 32      # drop frame hashes seen in more than this many videos
FR_TAU_PPM = 500_000  # containment threshold
FR_MIN_FRAMES = 4     # ignore clips with fewer distinct frame hashes

FRAME_HASH_SCHEMA = "doc_id bigint, fh string"


def _frame_hash(data: bytes, i: int, nf: int) -> str:
    """FR_CELLS-bit average-hash of fake frame ``i`` of ``nf`` (the frame
    'pixels' are the payload's i-th length-L/nf byte slice — the decode
    stand-in shared with _phash_bits' grid)."""
    ln = len(data)
    s = data[(i * ln) // nf:((i + 1) * ln) // nf]
    m = len(s)
    cells = [
        sum(s[(j * m) // FR_CELLS:((j + 1) * m) // FR_CELLS])
        for j in range(FR_CELLS)
    ]
    total = sum(cells)
    return "".join("1" if c * FR_CELLS > total else "0" for c in cells)


def video_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, n_shared, na, nb, containment_ppm): near-duplicate VIDEO
    pairs by sampled-frame fingerprint containment — the multimodal
    sibling of dedup_containment: sample ~FRAME_BUDGET frames per clip
    (the frame_sample stride), perceptual-hash each frame, and call two
    clips near-dups when the smaller clip's distinct frame-hash set is
    >= FR_TAU_PPM contained in the other's.  Catches re-encodes, trims
    and resolution changes that byte-exact dedup misses.  Clips with
    fewer than FR_MIN_FRAMES distinct kept frame hashes are excluded
    (a 1-frame fingerprint matches by chance).

    Scale shape: candidates come ONLY from the frame-hash equi-join —
    never a clip-pair cross join; boilerplate frame hashes (test
    patterns, black frames) are dropped by the FR_HOT_CAP document-
    frequency cap on BOTH the numerator and the per-clip denominators
    (the dedup_containment recipe), so no hash bucket explodes.  The
    hashing itself rides the Arrow mapInPandas decode lane; real codecs
    slot into ``decode_image`` without changing the plan."""
    docs = with_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "payload")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                nf = len(data) % FAKE_FPS_MOD + 1
                st = max(1, nf // FRAME_BUDGET)
                for i in range(0, nf, st):
                    rows.append((int(doc_id), _frame_hash(data, i, nf)))
            yield pd.DataFrame(rows, columns=["doc_id", "fh"])

    fhs = docs.mapInPandas(fn, FRAME_HASH_SCHEMA).distinct()
    df_cap = (
        fhs.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") <= FR_HOT_CAP)
        .select("fh")
    )
    kept = fhs.join(F.broadcast(df_cap), "fh")
    sizes = (
        kept.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nsz"))
        .where(F.col("nsz") >= FR_MIN_FRAMES)
    )
    kept = kept.join(sizes.select("doc_id"), "doc_id")
    a = kept.select(F.col("doc_id").alias("a"), "fh")
    b = kept.select(F.col("doc_id").alias("b"), "fh")
    pairs = (
        a.join(b, "fh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        pairs.join(sizes.select(F.col("doc_id").alias("a"),
                                F.col("nsz").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"),
                           F.col("nsz").alias("nb")), "b")
        .where(
            F.expr(f"n_shared * 1000000 div least(na, nb) >= {FR_TAU_PPM}")
        )
        .select(
            "a", "b", "n_shared", "na", "nb",
            F.expr("n_shared * 1000000 div least(na, nb)")
            .cast("bigint")
            .alias("containment_ppm"),
        )
    )


def sql_video_neardup_pairs() -> str:
    ln = "length(text)"
    nf = f"({ln} % {FAKE_FPS_MOD} + 1)"
    st = f"greatest(1, {nf} // {FRAME_BUDGET})"
    # frame i slice bounds over the ASCII payload (1-based list_slice)
    sl = "list_slice(cs, (i * ln) // nf + 1, ((i + 1) * ln) // nf)"
    cell = (
        "COALESCE(list_sum([ascii(c) for c in "
        "list_slice(s, (j * len(s)) // 16 + 1, ((j + 1) * len(s)) // 16)]),"
        " 0)"
    )
    return f"""
WITH raw AS (
  SELECT doc_id, string_split(text, '') AS cs, {nf} AS nf, {st} AS st,
         {ln} AS ln
  FROM documents
),
frames AS (
  SELECT doc_id, {sl} AS s
  FROM raw, UNNEST(range(0, nf, st)) AS t(i)
),
cells AS (
  SELECT doc_id,
         [{cell} for j in generate_series(0, {FR_CELLS - 1})] AS cl
  FROM frames
),
fhs AS (
  SELECT DISTINCT doc_id,
         array_to_string(
           [CASE WHEN c * {FR_CELLS} > list_sum(cl) THEN '1' ELSE '0' END
            for c in cl], '') AS fh
  FROM cells
),
kept AS (
  SELECT f.doc_id, f.fh FROM fhs f
  JOIN (SELECT fh FROM fhs GROUP BY fh
        HAVING COUNT(*) <= {FR_HOT_CAP}) ok ON f.fh = ok.fh
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsz
          FROM kept GROUP BY 1
          HAVING COUNT(*) >= {FR_MIN_FRAMES}),
kept2 AS (SELECT k.* FROM kept k JOIN sizes s ON k.doc_id = s.doc_id),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM kept2 x JOIN kept2 y ON x.fh = y.fh AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT p.a, p.b, p.n_shared, sa.nsz AS na, sb.nsz AS nb,
       CAST(p.n_shared * 1000000 // LEAST(sa.nsz, sb.nsz) AS BIGINT)
         AS containment_ppm
FROM pairs p
JOIN sizes sa ON p.a = sa.doc_id
JOIN sizes sb ON p.b = sb.doc_id
WHERE p.n_shared * 1000000 // LEAST(sa.nsz, sb.nsz) >= {FR_TAU_PPM}
"""


# ---------------------------------------------------------------------------
# Audio fingerprint matching (landmark anchor-target pairs, Shazam-style).
# ---------------------------------------------------------------------------

AFP_FRAME = 16       # samples (bytes) per analysis frame
AFP_FANOUT = 3       # target frames paired with each anchor frame
AFP_MIN_SHARED = 4   # emit clip pairs sharing >= this many fingerprints
AFP_HOT_CAP = 64     # drop fingerprints present in more clips than this


def audio_fingerprint_pairs(
    spark: SparkSession,
    sf_dir: str,
    min_shared: int = AFP_MIN_SHARED,
    hot_cap: int = AFP_HOT_CAP,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): clip pairs sharing >= ``min_shared``
    landmark fingerprints — the constellation-map audio matcher
    (Wang 2003, the Shazam paper): each AFP_FRAME-sample frame's peak
    value is a landmark, and every (anchor_peak, target_peak, dt) triple
    for targets within AFP_FANOUT frames packs into one integer
    fingerprint.  Same fake-decode convention as the VAD op (sample value
    = byte value; real codecs plug in at the decode seam), so the whole
    matcher is exercised end to end on deterministic bytes.

    Plan: framing, peak extraction and fingerprint packing are row-local
    HOF arithmetic (map-only, the Arrow lane's JVM twin); per-clip
    fingerprints dedup BEFORE the join; candidates come ONLY from the
    fingerprint equi-join with a doc-frequency cap on hot fingerprints
    (same contract as containment_pairs' hot-shingle cap) — never
    all-pairs.  At 10^9 clips the fingerprint table is the only shuffle
    and each key's fan-out is bounded by hot_cap^2."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    codes = F.transform(
        F.filter(F.split(F.col("text"), ""), lambda c: c != ""),
        lambda c: F.ascii(c),
    )

    def fps_of(pk):
        idx = F.sequence(F.lit(1), F.size(pk))
        per_anchor = F.transform(
            idx,
            lambda i: F.when(
                F.size(pk) - i >= 1,
                F.transform(
                    F.sequence(
                        F.lit(1), F.least(F.lit(AFP_FANOUT), F.size(pk) - i)
                    ),
                    lambda dt: (
                        F.element_at(pk, i) * 2048
                        + F.element_at(pk, i + dt) * 8
                        + dt
                    ).cast("bigint"),
                ),
            ).otherwise(F.array().cast("array<bigint>")),
        )
        return F.flatten(per_anchor)

    def of(cs):
        nf = F.floor((F.size(cs) - 1) / AFP_FRAME).cast("int") + 1
        peaks = F.transform(
            F.sequence(F.lit(1), nf),
            lambda f: F.array_max(
                F.slice(cs, (f - 1) * AFP_FRAME + 1, AFP_FRAME)
            ),
        )
        return F.element_at(F.transform(F.array(peaks), fps_of), 1)

    fps = F.when(
        F.length(F.col("text")) >= 1,
        F.element_at(F.transform(F.array(codes), of), 1),
    ).otherwise(F.array().cast("array<bigint>"))
    ex = docs.select(
        "doc_id", F.explode(F.array_distinct(fps)).alias("fp")
    )
    ok = (
        ex.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .where(F.col("dfreq") <= hot_cap)
        .select("fp")
    )
    f2 = ex.join(ok, "fp", "left_semi")
    a = f2.select(F.col("fp").alias("fp"), F.col("doc_id").alias("doc_a"))
    b = f2.select(F.col("fp").alias("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def sql_audio_fingerprint_pairs(
    min_shared: int = AFP_MIN_SHARED, hot_cap: int = AFP_HOT_CAP
) -> str:
    codes = (
        "[ascii(substring(text, i, 1)) "
        "for i in generate_series(1, length(text))]"
    )
    return f"""
WITH c AS (SELECT doc_id, {codes} AS cs FROM documents
           WHERE length(text) >= 1),
p AS (
  SELECT doc_id,
         [list_max(cs[(f - 1) * {AFP_FRAME} + 1 :
                      (f - 1) * {AFP_FRAME} + {AFP_FRAME}])
          for f in generate_series(1, (len(cs) - 1) // {AFP_FRAME} + 1)]
         AS pk
  FROM c
),
fps AS (
  SELECT DISTINCT doc_id, CAST(u AS BIGINT) AS fp
  FROM p, LATERAL UNNEST(
    flatten([[pk[i] * 2048 + pk[i + dt] * 8 + dt
              for dt in generate_series(1, least({AFP_FANOUT}, len(pk) - i))]
             for i in generate_series(1, len(pk))])) t(u)
),
ok AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {hot_cap}),
f2 AS (SELECT f.doc_id, f.fp FROM fps f SEMI JOIN ok o ON f.fp = o.fp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
"""
