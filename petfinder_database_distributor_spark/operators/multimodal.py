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
