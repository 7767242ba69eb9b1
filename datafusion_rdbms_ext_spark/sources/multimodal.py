"""Multimodal column plumbing: opaque binary assets + typed metadata.

The reference is text/relational only; the driver brief extends the
engine to image/audio/video columns for training-data pipelines. The
container has no codec libraries (PIL/librosa/ffmpeg), so the DECODE
step is a clearly-marked deterministic fake (`_fake_decode`) behind
an import-try for the real library — but everything Spark-side is
real and tested: the asset schema (binary content + metadata
struct), the Arrow-batched ``mapInPandas`` signature, the per-batch
processing shape, and the downstream relational handling of
extracted features.

Assets are synthesized deterministically from the ``documents``
fixture (content = UTF-8 bytes of the text), which makes byte-level
features SQL-derivable — so even the binary path gets a DuckDB
oracle (ascii-sum over characters), keeping the multimodal operators
under the same differential gate as everything else.

Scale: binary payloads stay columnar in Arrow record batches end to
end; ``mapInPandas`` processes whole batches (no per-row Python
dispatch); feature outputs are tiny fixed-width rows, so the
post-extract shuffle carries features, never payloads. On a real
lake the content column would be Parquet BINARY (or file pointers
for >100 MB assets) with identical plumbing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.base import register

#: Feature schema produced by the extractor (kept integer/string so
#: the oracle comparison is exact; means are derived downstream).
_FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, byte_sum long, digest string, n_frames long"
)

_POOL_SCHEMA = "doc_id long, " + ", ".join(f"p{i} double" for i in range(16))

_FRAME_STRIDE = 16


def load_assets(spark: SparkSession) -> DataFrame:
    """Deterministic multimodal asset table derived from documents.

    Schema: (doc_id, modality, content: binary, meta: struct) — the
    engine's canonical multimodal layout. Metadata is typed per
    modality; content is an opaque byte payload."""
    d = spark.table("documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        F.lit("raw").alias("format"),
    )
    return d.select(
        "doc_id",
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        meta.alias("meta"),
    )


# Probe codec availability ONCE at import (informational: logged by
# callers that care; never changes behavior). A failed import is not
# cached by Python, so probing per row would re-scan sys.path inside
# the mapInPandas hot loop.
try:  # pragma: no cover - informational only
    import PIL.Image  # noqa: F401

    _HAS_CODEC = True
except ImportError:
    _HAS_CODEC = False


def _fake_decode(content: bytes) -> np.ndarray:
    """STUB decoder — deterministic stand-in for a real codec.

    Real pipelines would do ``PIL.Image.open(io.BytesIO(content))``
    / ``librosa.load`` here; the payload bytes themselves act as the
    decoded sample array. The contract this preserves: bytes in,
    uint8 ndarray out, deterministic — ALWAYS, even when a codec
    library happens to be importable (``_HAS_CODEC`` is informational
    only): the oracles are built against the deterministic stub, so
    output must not depend on installed packages."""
    return np.frombuffer(content, dtype=np.uint8)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    ``mapInPandas``: each call receives a pandas batch of assets and
    yields one batch of fixed-width features — byte count, byte sum,
    content digest, and a strided frame-sample count (the
    video-frame-sampling shape: every ``_FRAME_STRIDE``-th sample)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": [a.size for a in decoded],
                    "byte_sum": [int(a.sum(dtype=np.int64)) for a in decoded],
                    "digest": [hashlib.md5(bytes(c)) .hexdigest() for c in pdf["content"]],
                    "n_frames": [len(a[::_FRAME_STRIDE]) for a in decoded],
                }
            )

    return assets.mapInPandas(fn, _FEATURE_SCHEMA)


def resize_pool(assets: DataFrame) -> DataFrame:
    """'Resize' stub: average-pool the decoded sample array into a
    fixed 16-bin vector (the thumbnail/embedding-prep shape).

    Chunk i covers samples [floor(i*n/16), floor((i+1)*n/16)) — the
    deterministic adaptive pooling used when inputs vary in size."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": list(pdf["doc_id"].values)}
            pools: list[list[float]] = []
            for c in pdf["content"]:
                a = _fake_decode(c).astype(np.float64)
                n = a.size
                bounds = [(i * n) // 16 for i in range(17)]
                pools.append(
                    [
                        float(a[bounds[i] : bounds[i + 1]].mean()) if bounds[i + 1] > bounds[i] else 0.0
                        for i in range(16)
                    ]
                )
            for i in range(16):
                out[f"p{i}"] = [p[i] for p in pools]
            yield pd.DataFrame(out)

    return assets.mapInPandas(fn, _POOL_SCHEMA)


# ---------------------------------------------------------------------------
# Registered queries.
# ---------------------------------------------------------------------------
@register(
    "mm_binary_features",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(range(1, length(text) + 1),
                                        i -> ascii(substr(text, i, 1)))) AS BIGINT) AS byte_sum,
           md5(text) AS digest,
           CAST((length(text) + {_FRAME_STRIDE} - 1) // {_FRAME_STRIDE} AS BIGINT) AS n_frames
    FROM documents WHERE doc_id < 100
    ORDER BY doc_id
    """,
    doc="Multimodal feature extraction through mapInPandas over "
    "binary content; byte-level features re-derived in SQL by the "
    "oracle (content is deterministic UTF-8 of ASCII fixture text).",
    tags=("multimodal", "udf"),
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = load_assets(spark).filter(F.col("doc_id") < 100)
    return extract_features(assets).orderBy("doc_id")


@register(
    "mm_modality_rollup",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
             length(text) AS n_bytes,
             list_sum(list_transform(range(1, length(text) + 1),
                                     i -> ascii(substr(text, i, 1)))) AS byte_sum,
             md5(text) AS digest
      FROM documents
    )
    SELECT modality,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           ROUND(CAST(SUM(byte_sum) AS DOUBLE) / SUM(n_bytes), 6) AS mean_byte,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique
    FROM feat GROUP BY modality ORDER BY modality
    """,
    doc="Relational rollup over extracted multimodal features — "
    "binary ingest, UDF extract, then pure-SQL analytics (the "
    "training-pipeline composition).",
    tags=("multimodal",),
)
def mm_modality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the rollup happens on the tiny feature rows — payload
    bytes never cross a shuffle."""
    feats = extract_features(load_assets(spark))
    return (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(
                F.sum("byte_sum").cast("double") / F.sum("n_bytes"), 6
            ).alias("mean_byte"),
            F.countDistinct("digest").alias("n_unique"),
        )
        .orderBy("modality")
    )


# Exact oracle for the pooled means (VERDICT r5 next #2): the fixture
# text is pure ASCII, so byte i of the payload == ascii(char i), and
# each bin mean is sum/count of ≤~500k-bounded exact integers — both
# numpy (pairwise sum of exactly-representable values) and DuckDB
# (sequential sum) produce the identical correctly-rounded double, so
# the hash gate's bit-identical float compare holds (verified over all
# 50 docs at sf0.01 before landing).
_POOL_ORACLE = (
    "SELECT doc_id, "
    + ", ".join(
        f"CASE WHEN ((({i}+1)*length(text))//16) > (({i}*length(text))//16) "
        f"THEN list_avg(list_transform("
        f"range(({i}*length(text))//16 + 1, (({i}+1)*length(text))//16 + 1), "
        f"j -> ascii(substr(text, j, 1)))) "
        f"ELSE 0.0 END AS p{i}"
        for i in range(16)
    )
    + " FROM documents WHERE doc_id < 50 ORDER BY doc_id"
)


@register(
    "mm_resize_pool",
    oracle=_POOL_ORACLE,
    doc="Adaptive 16-bin average pooling of decoded samples (resize/"
    "thumbnail stub; decode is a deterministic fake — codec libs "
    "absent). Oracle re-derives the exact pooled means from the "
    "ASCII payload bytes in SQL.",
    tags=("multimodal", "udf"),
)
def mm_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = load_assets(spark).filter(F.col("doc_id") < 50)
    return resize_pool(assets).orderBy("doc_id")


# ---------------------------------------------------------------------------
# mapInArrow: the zero-copy batch surface. mapInPandas above converts
# every batch to pandas (object-boxing each binary payload);
# mapInArrow hands the raw Arrow RecordBatch to Python, so byte-level
# features come from vectorized numpy over the array's data/offset
# buffers — no per-row Python objects at all. The right shape for
# payload-heavy multimodal scans where pandas conversion dominates.
# ---------------------------------------------------------------------------
def extract_features_arrow(assets: DataFrame) -> DataFrame:
    """Byte-level features computed directly on Arrow buffers."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            arr = b.column(b.schema.get_field_index("content"))
            # Zero-length slices may carry a None offsets buffer, and a
            # null payload would fold its (undefined) data-buffer bytes
            # into byte_sum; neither occurs in the asset table, so skip
            # the former and refuse the latter rather than mis-sum.
            if len(arr) == 0:
                continue
            if arr.null_count:
                raise ValueError(
                    "extract_features_arrow: null content payloads "
                    "unsupported (validity bitmap not consulted)"
                )
            off_dtype = (
                np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            )
            # BinaryArray buffers: [validity, offsets, data]. Slice
            # offsets by arr.offset (batches can be array slices).
            offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
                arr.offset : arr.offset + len(arr) + 1
            ].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            csum = np.zeros(data.size + 1, dtype=np.int64)
            np.cumsum(data, out=csum[1:])
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    b.column(b.schema.get_field_index("modality")),
                    pa.array(offs[1:] - offs[:-1], pa.int64()),
                    pa.array(csum[offs[1:]] - csum[offs[:-1]], pa.int64()),
                ],
                ["doc_id", "modality", "n_bytes", "byte_sum"],
            )

    return assets.mapInArrow(fn, "doc_id long, modality string, n_bytes long, byte_sum long")


@register(
    "mm_arrow_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(range(1, length(text) + 1),
                                        i -> ascii(substr(text, i, 1)))) AS BIGINT) AS byte_sum
    FROM documents WHERE doc_id >= 100 AND doc_id < 220
    ORDER BY doc_id
    """,
    doc="Multimodal byte features through mapInArrow — the zero-copy "
    "Arrow batch API (vs mapInPandas' boxed payloads): cumulative-sum "
    "over the raw data buffer sliced by the offsets buffer, no "
    "per-row Python. Same deterministic UTF-8 payloads, same "
    "SQL-derivable oracle.",
    tags=("multimodal", "udf", "arrow"),
)
def mm_arrow_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = load_assets(spark).filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 220)
    )
    return extract_features_arrow(assets).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Frame sampling, 1:N UDF shape: one asset row fans out to one row
# PER FRAME inside mapInPandas (video decode yields frame batches in
# real pipelines; the deterministic byte payload stands in for the
# codec, the Spark-side fan-out/rollup plumbing is real). Frames are
# contiguous _FRAME_BYTES-byte slices; the oracle re-derives every
# frame's byte stats from the ASCII text in SQL.
# ---------------------------------------------------------------------------
_FRAME_BYTES = 16


def frame_features(assets: DataFrame) -> DataFrame:
    """Explode each asset into per-frame byte features (1:N)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            frames: list[int] = []
            fbytes: list[int] = []
            fsums: list[int] = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                a = _fake_decode(content)
                n = a.size
                for k in range((n + _FRAME_BYTES - 1) // _FRAME_BYTES):
                    chunk = a[k * _FRAME_BYTES : (k + 1) * _FRAME_BYTES]
                    ids.append(int(doc_id))
                    frames.append(k)
                    fbytes.append(int(chunk.size))
                    fsums.append(int(chunk.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_id": frames,
                    "f_bytes": fbytes,
                    "f_sum": fsums,
                }
            )

    return assets.mapInPandas(
        fn, "doc_id long, frame_id long, f_bytes long, f_sum long"
    )


@register(
    "mm_frame_features",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE doc_id % 3 = 2 AND doc_id < 60
    ),
    frames AS (
      SELECT doc_id, n, unnest(range(0, (n + {_FRAME_BYTES} - 1) // {_FRAME_BYTES})) AS k,
             text
      FROM v
    )
    SELECT doc_id, CAST(k AS BIGINT) AS frame_id,
           CAST(LEAST(n - k * {_FRAME_BYTES}, {_FRAME_BYTES}) AS BIGINT) AS f_bytes,
           CAST(list_sum(list_transform(
             range(k * {_FRAME_BYTES} + 1,
                   LEAST((k + 1) * {_FRAME_BYTES}, n) + 1),
             j -> ascii(substr(text, j, 1)))) AS BIGINT) AS f_sum
    FROM frames
    ORDER BY doc_id, frame_id
    """,
    doc="Per-frame feature extraction (video frame-sampling shape): "
    "one asset row fans out to one row per 16-byte frame inside "
    "mapInPandas — the 1:N UDF contract — with every frame's byte "
    "stats re-derived from the ASCII payload by the SQL oracle.",
    tags=("multimodal", "udf"),
)
def mm_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = load_assets(spark).filter(
        (F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 60)
    )
    return frame_features(assets).orderBy("doc_id", "frame_id")


# ---------------------------------------------------------------------------
# Perceptual-hash dedup over binary assets (round 7) — the multimodal
# member of the dedup family: an aHash-style 64-bit signature from
# the decoded sample stream (bit i = 1 iff chunk i's sample sum
# exceeds the asset mean, integer cross-multiplied so the bit is
# engine-exact), then the SimHash banding scheme (4 x 16-bit bands,
# pigeonhole: hamming<=3 pairs share a band) and an exact hamming
# verify. Decode is the deterministic stub; everything around it —
# Arrow-batched signature extraction, banded candidate join, XOR
# bit_count verify — is the real production plumbing.
# ---------------------------------------------------------------------------
_PHASH_BITS = 64
_PHASH_BANDS = 4
_PHASH_MAX_HAMMING = 12


def phash_signatures(assets: DataFrame) -> DataFrame:
    """(doc_id, sig): 64-bit aHash per asset via mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for c in pdf["content"]:
                a = _fake_decode(c)
                n = a.size
                # byte j (0-based) belongs to chunk (j*64)//n — the
                # same rule the SQL oracle applies to 1-based pos.
                idx = (np.arange(n, dtype=np.int64) * _PHASH_BITS) // n
                sums = np.zeros(_PHASH_BITS, dtype=np.int64)
                np.add.at(sums, idx, a.astype(np.int64))
                total = int(a.sum(dtype=np.int64))
                sig = 0
                for i in range(_PHASH_BITS):
                    # bit = chunk mean above asset mean, exact:
                    # sum_i / (n_i/n...) — cross-multiplied to ints.
                    if _PHASH_BITS * int(sums[i]) > total:
                        sig |= 1 << i
                # two's-complement into int64 (Spark/DuckDB BIGINT)
                sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "sig": pd.array(sigs, dtype="int64")}
            )

    return assets.mapInPandas(fn, "doc_id long, sig long")


@register(
    "mm_dedup_phash",
    oracle=f"""
    WITH img AS (
      SELECT doc_id, text, len(text) AS n FROM documents
      WHERE doc_id % 3 = 0 AND len(text) > 0
    ),
    bytes AS (
      SELECT doc_id, n, pos,
             ascii(substr(text, CAST(pos AS INTEGER), 1)) AS code,
             CAST(((pos - 1) * {_PHASH_BITS}) // n AS BIGINT) AS chunk
      FROM img, unnest(range(1, n + 1)) AS t(pos)
    ),
    chunks AS (
      SELECT doc_id, chunk, SUM(code) AS s,
             SUM(SUM(code)) OVER (PARTITION BY doc_id) AS total
      FROM bytes GROUP BY doc_id, chunk
    ),
    sigs AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN {_PHASH_BITS} * s > total
                           THEN CASE WHEN chunk = 63 THEN -9223372036854775808
                                     ELSE (CAST(1 AS BIGINT) << CAST(chunk AS INTEGER)) END
                           ELSE 0 END) AS BIGINT) AS sig
      FROM chunks GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {_PHASH_MAX_HAMMING}
      AND EXISTS (
        SELECT 1 FROM range({_PHASH_BANDS}) t(bd)
        WHERE ((a.sig >> CAST(bd * 16 AS INTEGER)) & 65535)
              = ((b.sig >> CAST(bd * 16 AS INTEGER)) & 65535)
      )
    ORDER BY doc_a, doc_b
    """,
    doc="Perceptual-hash (aHash) dedup over binary image assets: "
    "64-bit chunk-mean signature extracted Arrow-batched from the "
    "decoded sample stream, SimHash-style 4x16-bit banding bounds "
    "candidate pairs (the oracle's all-pairs join never appears in "
    f"the plan), exact XOR-popcount verify at hamming <= "
    f"{_PHASH_MAX_HAMMING}. The banding makes recall partial by "
    "design (pigeonhole-complete only to hamming 3); the oracle "
    "applies the identical band filter, so the check is exact.",
    tags=("multimodal", "dedup", "bench"),
)
def mm_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image-asset pairs by banded perceptual hash.

    Scale: signatures are 8 bytes/asset extracted in one Arrow pass
    (payloads never shuffle); candidates form per 16-bit band bucket
    exactly like SimHash text dedup; the verify is a popcount on the
    joined longs. At 100 TB the signature table is ~10^-6 of the
    asset bytes."""
    # Zero-byte assets carry no signal: the engine would emit sig=0
    # (no chunk mean exceeds an all-zero total) and pair every empty
    # asset with every all-zero-sig asset, while the oracle's
    # unnest(range(1, n+1)) yields no rows for n=0 so the doc is
    # absent entirely (ADVICE r7 #4). Drop them on both sides.
    img = load_assets(spark).filter(
        (F.col("modality") == "image") & (F.length(F.col("content")) > 0)
    )
    sigs = phash_signatures(img).localCheckpoint()
    cand = None
    for b in range(_PHASH_BANDS):
        band = (F.shiftrightunsigned(F.col("sig"), b * 16).bitwiseAND(F.lit(65535)))
        a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), band.alias("k"))
        bb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), band.alias("k"))
        c = (
            a.join(bb, "k")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b")
        )
        cand = c if cand is None else cand.unionByName(c)
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.distinct()
        .filter(hamming <= _PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Audio silence trimming (round 8) — the standard audio-preprocessing
# step before ASR/diarization in a training pipeline: frame the
# decoded sample stream, score per-frame energy, and trim the
# leading/trailing frames below the silence threshold. The decode is
# the same deterministic stub as the rest of the family
# (_fake_decode: payload bytes ARE the samples); everything Spark —
# Arrow batching, frame windowing, integer energy — is real and
# differentially proven.
# ---------------------------------------------------------------------------
_AUDIO_FRAME = 16  # samples per frame
_AUDIO_DC = 96  # stub DC offset (letter-range center)
_AUDIO_SILENCE_T = 12000  # frame energy threshold


def audio_frame_energy(assets: DataFrame) -> DataFrame:
    """(doc_id, frame, energy): integer per-frame energy — sum of
    squared deviation from the DC offset — via one Arrow pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, energies = [], [], []
            for doc_id, c in zip(pdf["doc_id"], pdf["content"]):
                a = _fake_decode(c).astype(np.int64)
                n = a.size
                if n == 0:
                    continue
                fr = np.arange(n) // _AUDIO_FRAME
                nf = int(fr[-1]) + 1
                dev = (a - _AUDIO_DC) ** 2
                e = np.zeros(nf, dtype=np.int64)
                np.add.at(e, fr, dev)
                ids.extend([doc_id] * nf)
                frames.extend(range(nf))
                energies.extend(int(x) for x in e)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame": pd.array(frames, dtype="int64"),
                    "energy": pd.array(energies, dtype="int64"),
                }
            )

    return assets.mapInPandas(fn, "doc_id long, frame long, energy long")


@register(
    "mm_silence_trim",
    oracle=f"""
    WITH audio AS (
      SELECT doc_id, text, len(text) AS n FROM documents
      WHERE doc_id % 3 = 1 AND len(text) > 0
    ),
    frames AS (
      SELECT doc_id, (pos - 1) // {_AUDIO_FRAME} AS frame,
             SUM((ascii(substr(text, CAST(pos AS INTEGER), 1)) - {_AUDIO_DC})
                 * (ascii(substr(text, CAST(pos AS INTEGER), 1)) - {_AUDIO_DC}))
               AS energy
      FROM audio, unnest(range(1, n + 1)) AS t(pos)
      GROUP BY doc_id, (pos - 1) // {_AUDIO_FRAME}
    ),
    spans AS (
      SELECT doc_id,
             COUNT(*) AS n_frames,
             MIN(CASE WHEN energy > {_AUDIO_SILENCE_T} THEN frame END)
               AS first_loud,
             MAX(CASE WHEN energy > {_AUDIO_SILENCE_T} THEN frame END)
               AS last_loud,
             SUM(energy) AS total_energy
      FROM frames GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(COALESCE(last_loud - first_loud + 1, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(first_loud, -1) AS BIGINT) AS first_loud,
           CAST(COALESCE(last_loud, -1) AS BIGINT) AS last_loud,
           CAST(total_energy AS BIGINT) AS total_energy
    FROM spans ORDER BY doc_id
    """,
    doc="Audio silence trimming: per-frame integer energy (sum of "
    "squared DC-offset deviation over 16-sample frames, one Arrow "
    "pass), leading/trailing frames at or below the threshold "
    "trimmed — the kept span per asset plus its exact energy total. "
    "All compared quantities are integers; the stub decode keeps "
    "the oracle able to replay the identical samples.",
    tags=("multimodal", "audio", "bench"),
)
def mm_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept-span report after trimming silent edge frames.

    Scale: payload bytes are consumed inside one mapInPandas pass and
    never shuffle; what aggregates is (doc_id, frame, energy) — a
    ~1/16 row-count reduction — and the per-doc rollup is five
    integer aggregates with map-side combine. A real codec swaps in
    behind _fake_decode without touching the plan."""
    audio = load_assets(spark).filter(
        (F.col("modality") == "audio") & (F.length(F.col("content")) > 0)
    )
    loud = F.when(
        F.col("energy") > _AUDIO_SILENCE_T, F.col("frame")
    )
    return (
        audio_frame_energy(audio)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min(loud).alias("_first"),
            F.max(loud).alias("_last"),
            F.sum("energy").alias("total_energy"),
        )
        .select(
            "doc_id",
            "n_frames",
            F.coalesce(
                F.col("_last") - F.col("_first") + 1, F.lit(0)
            ).cast("long").alias("n_kept"),
            F.coalesce(F.col("_first"), F.lit(-1)).cast("long").alias("first_loud"),
            F.coalesce(F.col("_last"), F.lit(-1)).cast("long").alias("last_loud"),
            "total_energy",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Scene-cut detection over the decoded frame stream (round 8): the
# video-pipeline operator that segments footage before sampling
# training clips — a cut is a frame whose feature delta vs the
# previous frame exceeds an ADAPTIVE per-asset threshold (2x the
# asset's mean absolute delta, cross-multiplied to stay in exact
# integer arithmetic: n_deltas * |d_k| > 2 * sum|d|). Decode is the
# deterministic stub (_fake_decode); the plumbing — per-frame fan-out
# via mapInPandas, per-asset lag window, per-asset threshold rollup,
# co-partitioned join back — is the real distributed shape.
# ---------------------------------------------------------------------------
@register(
    "mm_scene_cuts",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE doc_id % 3 = 2 AND doc_id < 90
    ),
    frames AS (
      SELECT doc_id,
             unnest(range(0, (n + {_FRAME_BYTES} - 1) // {_FRAME_BYTES})) AS k,
             text, n
      FROM v
    ),
    feat AS (
      SELECT doc_id, k,
             list_sum(list_transform(
               range(k * {_FRAME_BYTES} + 1,
                     LEAST((k + 1) * {_FRAME_BYTES}, n) + 1),
               j -> ascii(substr(text, j, 1)))) AS f_sum
      FROM frames
    ),
    deltas AS (
      SELECT doc_id, k,
             ABS(f_sum - LAG(f_sum) OVER (PARTITION BY doc_id ORDER BY k))
               AS d
      FROM feat
    ),
    thr AS (
      SELECT doc_id, COUNT(d) AS n_d, SUM(d) AS s_d
      FROM deltas GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(d.k AS BIGINT) AS frame_id,
           CAST(d.d AS BIGINT) AS delta_abs
    FROM deltas d JOIN thr t USING (doc_id)
    WHERE d.d IS NOT NULL AND t.n_d * d.d > 2 * t.s_d
    ORDER BY d.doc_id, frame_id
    """,
    doc="Scene-cut detection over stub-decoded frames: per-frame "
    f"features ({_FRAME_BYTES}-byte chunk sums) via mapInPandas, "
    "frame-to-frame absolute deltas by a per-asset lag window, and "
    "an adaptive per-asset threshold (delta > 2x mean |delta|, "
    "cross-multiplied so the cut decision is exact integer "
    "arithmetic). The segmentation step every video training "
    "pipeline runs before clip sampling.",
    tags=("multimodal", "udf", "bench"),
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frames flagged as scene cuts, per asset.

    Scale: frames never leave their asset's partition — the lag
    window, the threshold rollup and the join all key on doc_id, so
    the whole pipeline is one co-partitioned pass over the frame
    table (payload bytes are dropped at feature-extraction time;
    only 16-byte-chunk sums shuffle). The adaptive threshold is the
    standard practice (fixed thresholds break across codecs); its
    integer cross-multiplication keeps the decision bit-exact."""
    # modality == 'video' (doc_id % 3 == 2, the same fixture slice
    # mm_frame_features decodes) — ADVICE r8 #3: the operator is the
    # VIDEO-pipeline segmenter and must run on video assets.
    assets = load_assets(spark).filter(
        (F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 90)
    )
    feat = frame_features(assets).select("doc_id", "frame_id", "f_sum")
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    deltas = feat.select(
        "doc_id",
        "frame_id",
        F.abs(F.col("f_sum") - F.lag("f_sum").over(w)).alias("d"),
    )
    thr = deltas.groupBy("doc_id").agg(
        F.count("d").alias("n_d"), F.sum("d").alias("s_d")
    )
    return (
        deltas.join(thr, "doc_id")
        .filter(
            F.col("d").isNotNull()
            & (F.col("n_d") * F.col("d") > 2 * F.col("s_d"))
        )
        .select(
            "doc_id",
            F.col("frame_id").cast("long").alias("frame_id"),
            F.col("d").cast("long").alias("delta_abs"),
        )
        .orderBy("doc_id", "frame_id")
    )


# ---------------------------------------------------------------------------
# Clip sampling around scene cuts (round 9): the step after
# segmentation in every video training pipeline — materialize a
# fixed-radius clip of frames centered on each detected cut
# (clamped to the asset's frame range) and profile it. Overlapping
# clips are kept (each cut owns its clip); membership, clamping and
# the feature rollup are all exact integer arithmetic, so the
# composition scene-cuts -> clips is differential-provable
# end-to-end.
# ---------------------------------------------------------------------------
_CLIP_RADIUS = 2  # frames either side of the cut


@register(
    "mm_clip_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE doc_id % 3 = 2 AND doc_id < 90
    ),
    frames AS (
      SELECT doc_id,
             unnest(range(0, (n + {_FRAME_BYTES} - 1) // {_FRAME_BYTES})) AS k,
             text, n
      FROM v
    ),
    feat AS (
      SELECT doc_id, k,
             (n + {_FRAME_BYTES} - 1) // {_FRAME_BYTES} AS n_frames,
             list_sum(list_transform(
               range(k * {_FRAME_BYTES} + 1,
                     LEAST((k + 1) * {_FRAME_BYTES}, n) + 1),
               j -> ascii(substr(text, j, 1)))) AS f_sum
      FROM frames
    ),
    deltas AS (
      SELECT doc_id, k,
             ABS(f_sum - LAG(f_sum) OVER (PARTITION BY doc_id ORDER BY k))
               AS d
      FROM feat
    ),
    thr AS (
      SELECT doc_id, COUNT(d) AS n_d, SUM(d) AS s_d
      FROM deltas GROUP BY doc_id
    ),
    cuts AS (
      SELECT d.doc_id, d.k AS cut_frame
      FROM deltas d JOIN thr t USING (doc_id)
      WHERE d.d IS NOT NULL AND t.n_d * d.d > 2 * t.s_d
    ),
    clips AS (
      SELECT c.doc_id, c.cut_frame,
             GREATEST(c.cut_frame - {_CLIP_RADIUS}, 0) AS start_frame,
             LEAST(c.cut_frame + {_CLIP_RADIUS}, f.n_frames - 1) AS end_frame
      FROM cuts c JOIN (SELECT DISTINCT doc_id, n_frames FROM feat) f
        USING (doc_id)
    )
    SELECT cl.doc_id, CAST(cl.cut_frame AS BIGINT) AS cut_frame,
           CAST(cl.start_frame AS BIGINT) AS start_frame,
           CAST(cl.end_frame AS BIGINT) AS end_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(ft.f_sum) AS BIGINT) AS clip_feature_sum
    FROM clips cl JOIN feat ft
      ON ft.doc_id = cl.doc_id
     AND ft.k BETWEEN cl.start_frame AND cl.end_frame
    GROUP BY cl.doc_id, cl.cut_frame, cl.start_frame, cl.end_frame
    ORDER BY cl.doc_id, cut_frame
    """,
    doc="Clip sampling around scene cuts: each detected cut yields a "
    f"±{_CLIP_RADIUS}-frame clip (clamped to the asset), profiled "
    "with exact frame counts and feature sums — the segmentation -> "
    "clip-selection composition a video training pipeline runs "
    "before decode-heavy sampling, provable end-to-end because "
    "every step is integer arithmetic over the stub-decoded bytes.",
    tags=("multimodal", "udf", "bench"),
)
def mm_clip_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-radius clips centered on scene cuts, with exact profiles.

    Scale: everything keys on doc_id — features, deltas, thresholds,
    cuts and the clip-membership range join all happen inside one
    asset's partition (the range join is cut x ±R frames, bounded by
    the clip radius, never frames x frames). Payload bytes are gone
    after feature extraction; only 16-byte-chunk sums move."""
    assets = load_assets(spark).filter(
        (F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 90)
    )
    feat = frame_features(assets).select("doc_id", "frame_id", "f_sum")
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    deltas = feat.select(
        "doc_id",
        "frame_id",
        F.abs(F.col("f_sum") - F.lag("f_sum").over(w)).alias("d"),
    )
    thr = deltas.groupBy("doc_id").agg(
        F.count("d").alias("n_d"), F.sum("d").alias("s_d")
    )
    nfr = feat.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    cuts = (
        deltas.join(thr, "doc_id")
        .filter(
            F.col("d").isNotNull()
            & (F.col("n_d") * F.col("d") > 2 * F.col("s_d"))
        )
        .select("doc_id", F.col("frame_id").alias("cut_frame"))
    )
    clips = cuts.join(nfr, "doc_id").select(
        "doc_id",
        "cut_frame",
        F.greatest(F.col("cut_frame") - _CLIP_RADIUS, F.lit(0)).alias(
            "start_frame"
        ),
        F.least(
            F.col("cut_frame") + _CLIP_RADIUS, F.col("n_frames") - 1
        ).alias("end_frame"),
    )
    return (
        clips.join(
            feat,
            (feat["doc_id"] == clips["doc_id"])
            & feat["frame_id"].between(
                clips["start_frame"], clips["end_frame"]
            ),
        )
        .groupBy(
            clips["doc_id"].alias("doc_id"),
            "cut_frame",
            "start_frame",
            "end_frame",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("f_sum").cast("long").alias("clip_feature_sum"),
        )
        .orderBy("doc_id", "cut_frame")
    )
