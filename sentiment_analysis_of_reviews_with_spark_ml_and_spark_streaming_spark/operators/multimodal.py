"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:
- payloads are ``binary`` columns (or parquet-external URIs for blobs
  too large to inline); metadata (mime, width, duration…) are typed
  sibling columns so filters/pruning never touch the payload bytes.
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` UDFs: one Python worker per partition, zero-copy
  Arrow batches, payload bytes never hit the driver.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image_meta`` ships a deterministic fake parser
(reads a header-like prefix) and ``decode_image_real`` raises
NotImplementedError with the intended Pillow/ffmpeg call documented.
The Spark-side plumbing — schema, batching, partition flow — is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BINARY_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hash", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def to_binary_docs(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Promote a text table to the multimodal layout: payload bytes +
    typed metadata. Used to exercise the binary plumbing with the
    driver's documents table."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
    )


def decode_image_meta(df: DataFrame, *, batch_hint: int | None = None) -> DataFrame:
    """Extract per-payload metadata via Arrow-batched mapInPandas.

    Deterministic FAKE decode: 'width'/'height' derive from payload
    bytes (so tests have stable expectations); a real deployment swaps
    ``_fake_parse`` for a Pillow/ffmpeg call with the same signature.
    """

    def _fake_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "header_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b[:16])).hexdigest()
                        if b is not None
                        else None
                    ),
                    # deterministic fake dimensions from the first bytes
                    "fake_width": payloads.map(
                        lambda b: 1 + (b[0] if b is not None and len(b) else 0) % 64
                    ).astype("int32"),
                    "fake_height": payloads.map(
                        lambda b: 1 + (b[-1] if b is not None and len(b) else 0) % 64
                    ).astype("int32"),
                }
            )
            yield out

    return df.mapInPandas(_fake_parse, schema=IMAGE_META_SCHEMA)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real image decode (Pillow) — NOT available in this container.

    Intended body (documented for deployment):
        from PIL import Image; import io
        w, h = Image.open(io.BytesIO(payload)).size
    """
    raise NotImplementedError(
        "image decode requires Pillow/ffmpeg, not present in this environment; "
        "use decode_image_meta (deterministic fake) for plumbing tests"
    )


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: emits (doc_id, frame_idx, frame
    bytes-slice) rows via mapInPandas — a deterministic stand-in that
    slices the payload instead of ffmpeg-decoding it. One input row
    fans out to ≤3 'frames'."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"] or b""
                for i in range(0, min(len(payload), 3 * every_n), every_n):
                    rows.append(
                        {
                            "doc_id": r["doc_id"],
                            "frame_idx": i // every_n,
                            "frame": bytes(payload[i : i + every_n]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(_sample, schema=schema)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_byte_histogram_features(
    df: DataFrame, *, n_bins: int = 64
) -> DataFrame:
    """REAL (not stubbed) feature extraction over binary payloads:
    L1-normalized byte-value histogram → fixed-length double vector.

    Byte histograms are genuine content features (format sniffing,
    corruption detection, near-dup blocking) and need no media libs, so
    this path is fully capability-tested — and its output plugs
    straight into the similarity operators (cosine_topk_*, ann_*),
    closing the binary → feature → ANN pipeline end-to-end.

    Vectorized inside the Arrow batch: one numpy bincount per payload,
    no per-byte Python. At scale the cost is a linear payload scan per
    partition; output is (id, n_bins×8 B) — tiny shuffle payloads.
    """
    import numpy as np

    assert 256 % n_bins == 0, "n_bins must divide 256"
    shrink = 256 // n_bins

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    feats.append([0.0] * n_bins)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8) // shrink
                hist = np.bincount(arr, minlength=n_bins).astype(np.float64)
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.mapInPandas(_features, schema=FEATURE_SCHEMA)


def resize_image_stub(
    df: DataFrame, *, target_width: int = 32, target_height: int = 32
) -> DataFrame:
    """Image resize plumbing: payload → resized payload + updated typed
    metadata, via mapInPandas. Deterministic stand-in: 'resizes' by
    nearest-neighbor sampling the BYTE stream to target_width×
    target_height bytes (a real deployment swaps the sampler for
    Pillow's Image.resize with the same signature/schema). Metadata
    columns are recomputed, payload never touches the driver."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    n_out = target_width * target_height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, sizes = [], []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    payloads.append(b"")
                    sizes.append(0)
                    continue
                src = np.frombuffer(bytes(b), dtype=np.uint8)
                idx = np.linspace(0, len(src) - 1, n_out).astype(np.int64)
                out = src[idx].tobytes()
                payloads.append(out)
                sizes.append(len(out))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": pdf["mime"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "width": pd.Series([target_width] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_height] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(_resize, schema=schema)


def png_signature_hex() -> str:
    """The 8-byte PNG signature, hex-encoded (public format constant)."""
    return "89504E470D0A1A0A"


def is_png(payload: str) -> F.Column:
    """Native PNG sniff: first 8 payload bytes == the PNG signature."""
    return F.hex(F.expr(f"substring({payload}, 1, 8)")) == F.lit(
        png_signature_hex()
    )


def png_dims(payload: str) -> tuple[F.Column, F.Column]:
    """REAL (non-stub) PNG dimension extraction with ZERO Python: the
    IHDR chunk is mandatory-first, so width/height are big-endian
    uint32 at fixed byte offsets 17-20 / 21-24 (1-based) of any valid
    PNG. Pure codegen — binary slice → hex → conv(16,10) — so at
    100 TB the metadata pass over image payloads never leaves the JVM
    (contrast decode_image_real, which needs Pillow for PIXELS; mere
    dimensions never did)."""
    w = F.conv(F.hex(F.expr(f"substring({payload}, 17, 4)")), 16, 10).cast(
        "int"
    )
    h = F.conv(F.hex(F.expr(f"substring({payload}, 21, 4)")), 16, 10).cast(
        "int"
    )
    return w, h


def gif_dims(payload: str) -> tuple[F.Column, F.Column]:
    """Native GIF logical-screen dimensions: little-endian uint16 at
    byte offsets 7-8 / 9-10 — byte order flipped by slicing the two
    bytes separately and hex-concatenating high-before-low. Zero
    Python, same contract as :func:`png_dims`."""
    w = F.conv(
        F.concat(
            F.hex(F.expr(f"substring({payload}, 8, 1)")),
            F.hex(F.expr(f"substring({payload}, 7, 1)")),
        ),
        16,
        10,
    ).cast("int")
    h = F.conv(
        F.concat(
            F.hex(F.expr(f"substring({payload}, 10, 1)")),
            F.hex(F.expr(f"substring({payload}, 9, 1)")),
        ),
        16,
        10,
    ).cast("int")
    return w, h
