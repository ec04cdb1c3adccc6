"""Multimodal column plumbing (north star): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, decoded / feature-extracted
via Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio libraries, so the decode step is a
DETERMINISTIC FAKE clearly marked below (``_fake_decode``) — the Spark-side
plumbing (binary schema, Arrow batch shape, UDF signature, partitioned
execution) is real and tested. Swap ``_fake_decode`` for a real
PIL/torchaudio call in production; the plan shape does not change.

Scale notes: payload bytes never pass through a shuffle here — metadata
extraction is narrow, and feature extraction is mapInPandas (one Arrow
batch at a time, bounded executor memory via
spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from petfinder_database_distributor_spark.util import ensure_parallelism


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Treat a text column's UTF-8 bytes as an opaque media payload with
    typed metadata — the schema pattern for image/audio/video columns:
    (id, payload binary, n_bytes, checksum, media_type)."""
    # NULL text ≡ zero-byte payload (the text family's NULL≡'' contract
    # carried to the media layer): metadata stays well-defined (n_bytes 0,
    # checksum sha2('')) and the Arrow kernels never see a None payload.
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
        F.lit("application/octet-stream").alias("media_type"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("byte_histogram", T.ArrayType(T.LongType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """DETERMINISTIC FAKE decode — stands in for PIL.Image.open /
    torchaudio.load (not installed in this container). Derives plausible
    media dimensions and a 16-bin byte histogram from the payload alone so
    results are reproducible and testable."""
    import numpy as np

    n = len(payload)
    width = 64 + n % 577
    height = 64 + n % 433
    n_frames = 1 + n % 30
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).tolist()
    return width, height, n_frames, hist


def decode_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow-batched,
    one pandas DataFrame per batch — the plumbing a real image/audio decode
    UDF uses (frame sampling, resize, spectrogram all share this shape).

    The UDF closure is deliberately self-contained (no module-level
    references): Python workers unpickle it by value, so the package need
    not be importable on executor nodes — matters when the driver process
    runs outside the repo directory or the package isn't shipped via
    --py-files."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            # Concatenate every payload in the Arrow batch into ONE byte
            # buffer, histogram it in a single C-speed bincount pass, and
            # split per-row counts back out via cumulative offsets — no
            # interpreted per-byte (or even per-row) Python loop.
            payloads = [bytes(p) for p in pdf[payload_col]]
            lengths = _np.array([len(p) for p in payloads], dtype=_np.int64)
            if len(payloads) and lengths.sum():
                flat = _np.frombuffer(b"".join(payloads), dtype=_np.uint8) >> 4
                # row index of every byte, then 2-D histogram via bincount
                # over (row * 16 + nibble)
                row_idx = _np.repeat(_np.arange(len(payloads)), lengths)
                hist2d = _np.bincount(
                    row_idx * 16 + flat, minlength=len(payloads) * 16
                ).reshape(len(payloads), 16)
            else:
                hist2d = _np.zeros((len(payloads), 16), dtype=_np.int64)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("Int64"),
                    "width": (64 + lengths % 577).astype("int32"),
                    "height": (64 + lengths % 433).astype("int32"),
                    "n_frames": (1 + lengths % 30).astype("int32"),
                    "byte_histogram": list(hist2d.tolist()),
                }
            )

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        extract, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("sampled_histogram", T.ArrayType(T.LongType())),
    ]
)


def resize_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target: int = 32,
    stride: int = 4,
) -> DataFrame:
    """Image-resize plumbing over opaque payloads: the DETERMINISTIC FAKE
    "resample" keeps every ``stride``-th byte (the strided-subsample shape a
    real nearest-neighbor resize has) and re-derives dimensions clamped to
    ``target`` — swap the kernel for PIL ``Image.resize`` in production; the
    Arrow-batched mapInPandas plan is identical. Output dims and sample
    count are pure functions of payload length, so the registered query is
    fully oracle-checkable; the resampled histogram (the "pixel data") is
    value-pinned in tests/test_multimodal.py."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            lengths = _np.array([len(p) for p in payloads], dtype=_np.int64)
            hists = []
            for p in payloads:
                arr = _np.frombuffer(p, dtype=_np.uint8)[::stride] >> 4
                hists.append(_np.bincount(arr, minlength=16).tolist())
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("Int64"),
                    "out_width": _np.minimum(64 + lengths % 577, target).astype(
                        "int32"
                    ),
                    "out_height": _np.minimum(64 + lengths % 433, target).astype(
                        "int32"
                    ),
                    "n_sampled": (-(-lengths // stride)).astype("int32"),
                    "sampled_histogram": hists,
                }
            )

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        resize, RESIZE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_feature", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    max_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling as a one-to-many mapInPandas (the UDTF
    shape): each payload expands to min(n_frames, max_frames) frame rows
    with a per-frame feature. Decode is the same DETERMINISTIC FAKE as
    decode_features (n_frames and features derive from payload length), so
    the whole fan-out is oracle-checkable; swap in a real
    cv2.VideoCapture/torchvision call without changing the plan."""

    def expand(batches):
        import pandas as _pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(bytes(payload))
                n_frames = min(1 + n % 30, max_frames)
                did = None if _pd.isna(doc_id) else int(doc_id)
                for idx in range(n_frames):
                    out.append((did, idx, (n * 31 + idx) % 997))
            yield _pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_feature"])

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        expand, FRAME_SCHEMA
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)

# 63-bit positional dHash: the payload is "resized" to a 64-strip gray
# thumbnail (strip i = exact byte-value sum of bytes k with
# (k*64) div n == i — the 8x8-grayscale step of the classic image dHash,
# on the deterministic fake decode), then bit j = gray[j] > gray[j+1]
# for j in 0..62. 63 bits keeps the hash below the BIGINT sign bit so
# xor/bit_count behave identically in Spark and DuckDB.
PHASH_BITS = 63
PHASH_STRIPS = 64


def phash_signatures(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual-hash signatures over decoded media payloads — the
    image-dedup dHash discipline on the same DETERMINISTIC FAKE decode
    as decode_features (production swaps the strip-sum for a real
    PIL 9x8-grayscale thumbnail; the banded-join plan downstream does
    not change): resample the payload to a 64-value gray strip by exact
    byte-value sums, then emit the 63 adjacent-gradient bits
    gray[j] > gray[j+1]. A first histogram-bin design was discarded as
    non-discriminative (natural text's nibble histograms all share one
    shape — 5 distinct hashes over 500 docs); positional strip sums are
    content-sensitive the way real thumbnails are (496/500 distinct).

    All integer compares over exact sums — bit-identical cross-engine.
    Arrow-batched mapInPandas, vectorized bincount (no per-row Python
    loop); payload bytes never pass through a shuffle — only the 8-byte
    hash does."""

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            lengths = _np.array([len(p) for p in payloads], dtype=_np.int64)
            n_rows = len(payloads)
            if n_rows and lengths.sum():
                flat = _np.frombuffer(b"".join(payloads), dtype=_np.uint8)
                row_idx = _np.repeat(_np.arange(n_rows), lengths)
                starts = _np.concatenate(([0], _np.cumsum(lengths)[:-1]))
                offs = _np.arange(lengths.sum()) - starts[row_idx]
                strip = (offs * PHASH_STRIPS) // lengths[row_idx]
                # bincount weights accumulate in float64 — exact for
                # integer sums below 2^53 (a >35 TB single payload would
                # be needed to break that)
                gray = (
                    _np.bincount(
                        row_idx * PHASH_STRIPS + strip,
                        weights=flat,
                        minlength=n_rows * PHASH_STRIPS,
                    )
                    .reshape(n_rows, PHASH_STRIPS)
                    .astype(_np.int64)
                )
            else:
                gray = _np.zeros((n_rows, PHASH_STRIPS), dtype=_np.int64)
            bits = gray[:, : PHASH_BITS] > gray[:, 1 : PHASH_BITS + 1]
            weights = _np.left_shift(
                _np.uint64(1), _np.arange(PHASH_BITS, dtype=_np.uint64)
            )
            phash = (bits.astype(_np.uint64) * weights).sum(axis=1).astype(
                _np.int64
            )
            yield _pd.DataFrame(
                {"doc_id": pdf[id_col].astype("Int64"), "phash": phash}
            )

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        sign, PHASH_SCHEMA
    )


def phash_bands(bits: int, n_bands: int) -> list[tuple[int, int]]:
    """(shift, width) band layout for a ``bits``-wide hash split into
    ``n_bands`` contiguous bands (leading bands take the extra bit when
    bits % n_bands != 0) — the pigeonhole guarantee: any pair within
    hamming distance n_bands - 1 agrees exactly on at least one band."""
    base, rem = divmod(bits, n_bands)
    out, shift = [], 0
    for b in range(n_bands):
        width = base + (1 if b < rem else 0)
        out.append((shift, width))
        shift += width
    return out


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Multimodal near-dup pairs over perceptual hashes — the image-corpus
    twin of the SimHash text path (dedup_fuzzy.simhash_neardup_pairs):
    dHash signatures from the decoded payloads, then the multi-index
    pigeonhole — the 63-bit hash splits into ``max_hamming + 1`` bands,
    any pair within distance ``max_hamming`` agrees exactly on one band,
    candidates are a band+key equi-join (NEVER all-pairs; ~n²/2^16
    random tail per band at the default d=3 / 16-bit keys), and exact
    bit_count(xor) verifies. Only the 8-byte hash is shuffled — payload
    bytes stay in the map side's Arrow batches."""
    sigs = phash_signatures(
        attach_binary_payload(df, id_col, text_col), id_col
    )
    blocks = sigs.select(
        F.col(id_col),
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # shiftright+mask, not float division: the hash is
                        # 63-bit, past double's 2^53 exact-integer range
                        F.shiftright(F.col("phash"), shift)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                        .alias("key"),
                    )
                    for b, (shift, width) in enumerate(
                        phash_bands(PHASH_BITS, max_hamming + 1)
                    )
                ]
            )
        ).alias("bk"),
    ).select(
        F.col(id_col), "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    left = blocks.select(
        F.col(id_col).alias("id_a"), F.col("phash").alias("ph_a"), "band", "key"
    )
    right = blocks.select(
        F.col(id_col).alias("id_b"), F.col("phash").alias("ph_b"), "band", "key"
    )
    cand = (
        left.join(right, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
