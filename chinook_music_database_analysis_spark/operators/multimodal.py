"""Multimodal column plumbing: opaque binary media + typed metadata.

The pattern for image/audio/video at 100 TB: store payloads as
``binary`` columns (or object-store URIs) beside typed metadata, and
run decode / feature-extraction as Arrow-batched ``mapInPandas`` so
each executor processes whole record batches without JVM<->Python
per-row overhead.

The decode step itself is STUBBED — this container has no image/audio
libraries — with a deterministic fake (byte-length arithmetic) behind
the same signature a real decoder would have (see ``_decode_batch``).
Everything Spark-side (schema, batching, partitioning) is real and
oracle-checkable because the fake is a pure function of byte length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: PIL availability, resolved lazily once per worker process:
#: None = unprobed, False = absent, module = Image.
_PIL_IMAGE = None

#: Output schema of the decode stage.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def with_media(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + media metadata to each doc.

    Here the payload is the utf-8 text bytes standing in for an encoded
    image; in production this column comes straight from the source
    (parquet binary / object-store fetch)."""
    # NULL text maps to an EMPTY payload (not a NULL one): every
    # downstream kernel already handles zero-byte payloads (stub
    # decode (0,0,0,3), empty crop, zero frames), whereas a None
    # crossing the Arrow boundary crashed the whole job inside
    # mapInPandas (None.startswith / len(None) — r10 review).
    return docs.select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias(
            "media_bytes"
        ),
        F.lit("image/fake").alias("media_type"),
    )


def _parse_ppm(payload: bytes) -> tuple[int, int, int] | None:
    """Parse a binary-netpbm (``P6``) header — a REAL image decode that
    needs no third-party library.  Returns (width, height,
    raster_offset) only when the header is well-formed AND the raster
    length matches exactly (so arbitrary text bytes can never be
    misparsed as an image).  The raster offset rides along because the
    tokenizer already has it in hand — a second scanner that must stay
    byte-for-byte identical to this one was the r10 review's
    duplication finding."""
    if not payload.startswith(b"P6"):
        return None
    try:
        toks: list[int] = []
        i = 2
        while len(toks) < 3 and i < len(payload):
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment line
                i = payload.index(b"\n", i) + 1
                continue
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            if j == i:
                return None
            toks.append(int(payload[i:j]))
            i = j
        w, h, maxval = toks
        if maxval > 255 or i + 1 + w * h * 3 != len(payload):
            return None
        return w, h, i + 1
    except (ValueError, IndexError):
        return None


def resize_ppm(payload: bytes, width: int, height: int) -> bytes | None:
    """REAL image resize for binary-netpbm (P6) payloads: numpy
    nearest-neighbor sampling over the raster, re-encoded as P6.
    Returns None when the payload is not a valid P6 image (caller
    falls back to the stub).  This is the layered-kernel pattern of
    ``_decode_media`` applied to the transform stage: a genuine
    decode-transform-encode path with zero third-party dependencies,
    PIL-quality interpolation being a drop-in swap when available."""
    parsed = _parse_ppm(payload)
    if parsed is None:
        return None
    import numpy as np

    w0, h0, off = parsed
    # Degenerate-but-well-formed headers (e.g. b"P6\n0 2\n255\n") pass
    # the exact-length check with an empty raster; resampling from a
    # zero-sized axis would raise inside mapInPandas and fail the whole
    # job, so degrade to the caller's stub path instead.
    if w0 == 0 or h0 == 0:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, offset=off).reshape(h0, w0, 3)
    ys = np.arange(height) * h0 // height
    xs = np.arange(width) * w0 // width
    out = arr[ys][:, xs]
    return f"P6\n{width} {height}\n255\n".encode() + out.tobytes()


def _decode_media(payload: bytes) -> tuple[int, int, int, int]:
    """Media decode with a layered kernel:

    1. **PIL**, when importable — the production path (decodes any
       format Pillow knows).
    2. **Built-in PPM (P6) parser** — a real decoder with zero
       dependencies, so the pipeline exercises genuine image parsing
       even in this container.
    3. **Deterministic stub** (byte-length arithmetic) for payloads
       that are not images at all — which is every ``documents`` row,
       keeping the registered query oracle-checkable.

    The PIL probe is resolved once per process (module cache), not per
    payload — a per-row failed import costs an exception per record.
    """
    global _PIL_IMAGE
    if _PIL_IMAGE is None:
        try:
            from PIL import Image  # type: ignore[import-not-found]

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = False
    if _PIL_IMAGE:
        import io

        try:
            img = _PIL_IMAGE.open(io.BytesIO(payload))
            img.load()
            return len(payload), img.width, img.height, len(img.getbands())
        except Exception:
            pass  # not a PIL-decodable image — fall through
    ppm = _parse_ppm(payload)
    if ppm is not None:
        return len(payload), ppm[0], ppm[1], 3
    n = len(payload)
    return n, n % 512, (n * 7) % 512, 3


def _decode_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    import pandas as pd

    for pdf in batches:
        decoded = pdf["media_bytes"].map(_decode_media)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": decoded.map(lambda t: t[0]),
                "width": decoded.map(lambda t: t[1]),
                "height": decoded.map(lambda t: t[2]),
                "channels": decoded.map(lambda t: t[3]),
            }
        )


def media_features(docs: DataFrame) -> DataFrame:
    """Binary -> features via Arrow-batched mapInPandas (the real
    multimodal execution shape; only the innermost decode is faked).

    Repartitioned first: decode cost is per-row Python work, so it must
    fan out across workers — a single-file source would otherwise run
    the whole corpus through one Python worker (measured 2.7x slower).
    """
    media = with_media(docs.repartition("doc_id"))
    return media.mapInPandas(_decode_batch, schema=MEDIA_FEATURES_SCHEMA)


#: Output schema of the resize stage: resized payload + metadata.
RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("resized", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("cropped", BooleanType()),
    ]
)


def resize_media(docs: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize every media payload to ``width x height x 3`` via
    Arrow-batched mapInPandas — binary in, binary out, 1:1 rows.

    Layered kernel like ``_decode_media``: valid P6 images take the
    REAL numpy decode → nearest-neighbor resample → re-encode path
    (:func:`resize_ppm`); non-image payloads (every ``documents`` row)
    fall back to the deterministic byte-crop stub, keeping the
    registered query oracle-checkable.  The Spark shape — binary
    column through an Arrow batch iterator producing a new binary
    column plus typed metadata — is exactly the production one.
    """
    target = width * height * 3

    def _resize_one(b: bytes) -> tuple[bytes, int, bool]:
        real = resize_ppm(b, width, height)
        if real is not None:
            return real, len(real), False
        return bytes(b[:target]), min(len(b), target), len(b) > target

    def _resize_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            rs = pdf["media_bytes"].map(_resize_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": rs.map(lambda t: t[0]),
                    "width": width,
                    "height": height,
                    "n_bytes": rs.map(lambda t: t[1]),
                    "cropped": rs.map(lambda t: t[2]),
                }
            )

    media = with_media(docs.repartition("doc_id"))
    return media.mapInPandas(_resize_batch, schema=RESIZED_SCHEMA)


#: Output schema of the frame-sampling stage (1 -> N rows per doc).
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
    ]
)

#: Fixed fake frame size (bytes) for the frame-sampling stub.
FRAME_BYTES = 256


def sample_frames(
    docs: DataFrame, frame_bytes: int = FRAME_BYTES, every_n: int = 4
) -> DataFrame:
    """Sample every ``every_n``-th frame of each "video" payload via
    mapInPandas — the 1->N batch-output shape (one input row fans out
    to one row per sampled frame; empty payloads produce none).

    The STUB treats the payload as ``ceil(len/frame_bytes)`` fixed-size
    frames (a real implementation would run a container demuxer and
    return decoded keyframes); sampling arithmetic, schema, and the
    exploding batch iterator are the production shape.
    """

    def _sample_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            out_doc, out_idx, out_len = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
                n = len(payload)
                n_frames = (n + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_len.append(min(frame_bytes, n - i * frame_bytes))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_len": out_len}
            )

    media = with_media(docs.repartition("doc_id"))
    return media.mapInPandas(_sample_batch, schema=FRAME_SCHEMA)


def _decode_arrow(batches: "Iterator") -> "Iterator":
    """RecordBatch-level decode: identical kernel to ``_decode_batch``
    without the Arrow<->pandas conversion on either side of the
    boundary."""
    import pyarrow as pa

    for batch in batches:
        doc_ids = batch.column("doc_id")
        decoded = [_decode_media(p.as_py()) for p in batch.column("media_bytes")]
        yield pa.RecordBatch.from_arrays(
            [
                doc_ids,
                pa.array([d[0] for d in decoded], pa.int32()),
                pa.array([d[1] for d in decoded], pa.int32()),
                pa.array([d[2] for d in decoded], pa.int32()),
                pa.array([d[3] for d in decoded], pa.int32()),
            ],
            names=["doc_id", "n_bytes", "width", "height", "channels"],
        )


def media_features_arrow(docs: DataFrame) -> DataFrame:
    """``media_features`` over ``mapInArrow``: the same layered decode
    kernel fed raw Arrow RecordBatches, skipping the pandas
    materialization mapInPandas performs on both sides of the Python
    boundary.  For binary-heavy columns that conversion is a real copy
    (bytes objects in/out of BlockManager-backed frames), so the Arrow
    iterator is the lowest-overhead Python boundary Spark offers —
    the right default when the per-row kernel is cheap relative to the
    payload bytes.  Pinned row-identical to the pandas form in
    tests/test_multimodal.py."""
    media = with_media(docs.repartition("doc_id"))
    return media.mapInArrow(_decode_arrow, schema=MEDIA_FEATURES_SCHEMA)


#: Perceptual average-hash geometry: 48 bits (sign-safe int64 like
#: SimHash), banded 4 x 12 for candidate generation.  The pigeonhole
#: bound — two hashes within hamming distance 3 must agree on one of
#: the four bands — makes band-equality a recall-1.0 candidate filter
#: at the default threshold.
PHASH_BITS = 48
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS
PHASH_MAX_HAMMING = 3

PHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


def media_phash(docs: DataFrame) -> DataFrame:
    """Perceptual average-hash per media payload — the image near-dup
    signature (aHash: bit j = 1 iff block j's mean intensity exceeds
    the global mean), computed over the decoded pixel stream.  Here
    the "pixel stream" is the payload's code-point sequence (the
    container-safe stand-in the whole mm_* family uses), which keeps
    the hash an exact integer function of the string on BOTH engines:
    every comparison is the cross-multiplied integer form
    ``block_sum * n > total * block_len`` — no float means, no
    libm.

    Kernel shape: Arrow-batched mapInPandas with a numpy cumulative
    sum per payload (one pass per doc, 48 block sums read off the
    cumsum) — embarrassingly parallel, no shuffle.  A real deployment
    swaps the code-point array for the decoded luma plane and keeps
    everything downstream (banding, hamming verify, store) unchanged.
    """
    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np
        import pandas as pd

        for pdf in batches:
            hashes = []
            for text in pdf["text"]:
                if text is None:  # NULL text == empty payload (hash 0)
                    hashes.append(0)
                    continue
                cs = np.fromiter((ord(c) for c in text), dtype=np.int64)
                n = int(cs.size)
                if n == 0:
                    hashes.append(0)
                    continue
                total = int(cs.sum())
                cum = np.concatenate(([0], np.cumsum(cs)))
                bounds = (np.arange(PHASH_BITS + 1, dtype=np.int64) * n) // PHASH_BITS
                bsum = cum[bounds[1:]] - cum[bounds[:-1]]
                blen = bounds[1:] - bounds[:-1]
                bits = (bsum * n) > (total * blen)
                h = 0
                for j in np.nonzero(bits)[0]:
                    h |= 1 << int(j)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})

    return docs.select("doc_id", "text").mapInPandas(kernel, PHASH_SCHEMA)


def phash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Image near-dup pairs: hamming distance <= ``max_hamming`` on
    the 48-bit perceptual hash — the multimodal member of the dedup
    family (exact text dedup finds byte-identical copies; this finds
    lightly-edited media).

    Same candidate discipline as SimHash: 12-bit block banding
    (pigeonhole recall 1.0 at distance 3), so the self-join meets only
    within equal (band, nib) buckets, then the exact
    ``bit_count(a XOR b)`` verify.  Pass a cached/stored ``sig`` so
    the kernel runs once, not once per join side.

    The banding guarantee is a pigeonhole over PHASH_BANDS blocks: a
    pair at distance d shares an equal band only when d < PHASH_BANDS.
    A ``max_hamming`` at or past that bound would SILENTLY lose recall
    (two hashes differing one bit per band never collide), so it is
    refused loudly — the heavy_keys support_k guard's pattern.
    """
    if max_hamming >= PHASH_BANDS:
        raise ValueError(
            f"phash_near_dup_pairs: max_hamming={max_hamming} exceeds the "
            f"{PHASH_BANDS}-band pigeonhole recall guarantee (distance must "
            f"be < {PHASH_BANDS}); raise PHASH_BANDS or use an exact scan"
        )
    s = sig if sig is not None else media_phash(docs)
    mask = (1 << PHASH_BAND_BITS) - 1
    bands = s.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(phash >> {b * PHASH_BAND_BITS}) & {mask}"
                        ).alias("nib"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("bn"),
    ).select("doc_id", "phash", F.col("bn.band").alias("band"), F.col("bn.nib").alias("nib"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.nib") == F.col("b.nib"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.phash ^ b.phash)").cast("int").alias("hamming"),
        )
        # filter before the distinct (r8, same move as the simhash
        # pair path): hamming is a pure function of the pair, so the
        # dedup exchange carries only within-radius survivors instead
        # of every banded collision.
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
