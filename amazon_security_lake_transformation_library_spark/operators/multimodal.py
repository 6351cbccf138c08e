"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas`` — the standard shape for decode / feature-extract /
resize / frame-sample stages in a training-data pipeline.

Container constraint: no image/audio codecs are installed, so the actual
decode is stubbed (:func:`fake_decode_meta` derives deterministic metadata
from the payload bytes; :func:`decode_image` raises ``NotImplementedError``
unless Pillow is importable). Everything Spark-side is real and tested:
schema, Arrow batch shape, partition-preserving plumbing, and the pattern
of keeping the big binary column OUT of the returned frame (decode emits
only small typed features, so the shuffle after a decode stage never
carries the raw bytes).

At 100 TB: ``mapInPandas`` streams Arrow record batches through one Python
worker per core with no shuffle; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary payloads should
live in their own parquet column chunk so column pruning skips them when
only metadata is queried.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DECODE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def _meta_from_bytes(n: int) -> tuple[int, int, int]:
    # Deterministic fake: metadata as a pure function of payload length so
    # the differential SQL oracle can recompute it engine-independently.
    return 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 8


def fake_decode_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """'Decode' each binary payload into typed metadata over Arrow batches.

    Stands in for a real image/audio decoder: same signature, same batch
    shape, same schema discipline (drops the binary column on output).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n,
                    "width": 64 + n % 512,
                    "height": 64 + (n * 7) % 512,
                    "n_frames": 1 + n % 8,
                }
            )

    return df.mapInPandas(decode, schema=DECODE_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_off", T.LongType()),
    ]
)


def fake_frame_sample(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """One-to-many 'frame sampling' over Arrow batches: each payload
    expands into its n_frames rows (stand-in for video frame extraction —
    the real decoder plugs into the same mapInPandas shape). Frame
    metadata is a pure function of (payload length, frame index) so the
    SQL oracle can recompute it."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = pdf[payload_col].map(len).to_numpy(dtype="int64")
            n_frames = 1 + n % 8
            doc_ids = pdf[id_col].to_numpy(dtype="int64")
            # Vectorized one-to-many expansion: repeat per-doc values,
            # ragged arange for frame_idx (global arange minus each row's
            # repeated segment start) — no Python loop in the batch body.
            total = int(n_frames.sum())
            starts = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_idx = np.arange(total, dtype="int64") - starts
            nb_rep = np.repeat(n, n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(doc_ids, n_frames),
                    "frame_idx": frame_idx,
                    "frame_off": (nb_rep * (frame_idx + 1)) % 997,
                }
            )

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def decode_image(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real image decode via Pillow when available (it is not in this
    container). The Spark-side plumbing is identical to
    :func:`fake_decode_meta`; only the per-batch body differs.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image decode requires Pillow; use fake_decode_meta for the "
            "plumbing-only path in codec-less environments"
        ) from exc

    import io

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        from PIL import Image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img = Image.open(io.BytesIO(payload))
                gray = img.convert("L")
                import numpy as np

                rows.append(
                    (int(doc_id), img.width, img.height, img.mode,
                     float(np.asarray(gray).mean()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mode", "mean_luma"]
            )

    return df.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)
