"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Charter extension (SURVEY.md §7.1 step 10). Images/audio/video ride Spark
as `binary` columns with a metadata struct; decode / feature-extraction is
an Arrow-batched `mapInPandas` stage. The decode itself is STUBBED here
(no imaging/audio libs in this container — see `decode_image`), but the
Spark-side contract is real and tested: schema, batch iteration, partition
behavior, and the deterministic fake featurizer.

At 100 TB the payloads dominate IO: the schema keeps metadata in ordinary
columns so Catalyst can prune/filter WITHOUT touching the binary blob
(parquet column pruning skips the payload pages entirely when a query
only reads metadata).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("payload_bytes", LongType()),
        StructField("content_hash", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload column from text (the testdata has no
    real media); in production this is the raw bytes column as landed."""
    return docs.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias(
            "payload_bytes"
        ),
        F.md5(F.col(text_col)).alias("content_hash"),
    )


def decode_image(payload: bytes) -> object:
    """Declared-raster decode stub — what remains UNDECODED after round
    12: JPEG only (Huffman+DCT entropy coding — a codec library problem
    with no oracle payoff). Everything else decodes for real in
    ``decode_pixel_stats``: 24-bit BI_RGB BMP and binary PGM (raw
    rasters), PNG grayscale/truecolor at both non-palette depths
    (8-bit AND 16-bit big-endian), sequential AND Adam7-interlaced
    (stdlib zlib inflate + the five scanline filters + the seven-pass
    scatter), global/local-palette GIF both sequential AND interlaced
    (pure-Python GIF-variant LZW + the 4-pass row permutation), and
    BI_RLE8 BMP (run/absolute/EOL/EOB decode). HEADER metadata for ALL
    formats incl. JPEG is parsed for real by ``parse_image_header``."""
    raise NotImplementedError(
        "JPEG (Huffman+DCT) decode requires codec machinery out of "
        "this stats path's declared scope — headers are parsed by "
        "parse_image_header; BMP/PGM/PNG(8+16-bit)/GIF/RLE8 rasters "
        "by decode_pixel_stats"
    )


# PNG color type → sample channels (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_jpeg_sof(payload: bytes):
    """Walk the JPEG marker stream to the first SOFn frame header (pure
    byte arithmetic, no codec): segments are FF <marker> <u16 BE length
    incl. the 2 length bytes> <payload>; standalone markers (TEM, RSTn)
    carry no length; fill FF bytes may pad between segments. SOFn
    (C0–CF except DHT C4 / JPG C8 / DAC CC) holds precision u8, height
    u16 BE, width u16 BE, component count u8. Every read is
    bounds-checked — a truncated or malformed stream returns None
    instead of scanning past the buffer."""
    import struct

    n = len(payload)
    i = 2  # past SOI
    while i + 1 < n:
        if payload[i] != 0xFF:
            return None  # desynchronized marker stream
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte: resynchronize on the next FF
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # TEM/RSTn/SOI
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: no dims
            return None
        if i + 4 > n:
            return None  # length bytes would overrun
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if seglen < 2 or i + 2 + seglen > n:
            return None  # malformed / truncated segment
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seglen < 8:
                return None
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            ncomp = payload[i + 9]
            return ("jpeg", int(w), int(h), int(ncomp))
        i += 2 + seglen
    return None


def parse_image_header(payload: bytes):
    """REAL pure-Python image-header parse — no imaging libs needed:

    - PNG: 8-byte signature, then the IHDR chunk (length+type+13 fixed
      bytes): width/height big-endian u32 at offsets 16/20, bit depth at
      24, color type at 25 (channels per the spec's color-type table);
    - GIF: 'GIF87a'/'GIF89a', logical-screen width/height little-endian
      u16 at offsets 6/8; palette-indexed RGB → 3 channels;
    - BMP: 'BM', BITMAPINFOHEADER width s32 LE at 18, height s32 LE at
      22 (absolute value — negative = top-down rows), bit count u16 at
      28 → channels = max(bits // 8, 1);
    - JPEG: SOI then a marker WALK to the first SOFn segment (dims are
      not at a fixed offset — APPn/COM/DQT segments precede the frame
      header): height/width u16 BE at SOF+3/+5, channels = component
      count (`_parse_jpeg_sof`, overrun-guarded).

    Returns (format, width, height, channels) or None when the payload
    is not a recognized image — the reference pipeline treats those rows
    as non-image media and carries NULL dimensions."""
    import struct

    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        return _parse_jpeg_sof(payload)
    if (
        len(payload) >= 26
        and payload[:8] == b"\x89PNG\r\n\x1a\n"
        and payload[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        return ("png", int(w), int(h), _PNG_CHANNELS.get(color_type, 0))
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", int(w), int(h), 3)
    if (
        len(payload) >= 30
        and payload[:2] == b"BM"
        # 'BM' alone is two printable ASCII bytes — any text payload
        # starting with "BM..." would false-positive. Require a valid
        # INFO-family header size at offset 14 too (BITMAPINFOHEADER=40,
        # V2=52, V3=56, V4=108, V5=124 — the width/height/bitcount
        # offsets below are identical across the family).
        and struct.unpack("<I", payload[14:18])[0] in (40, 52, 56, 108, 124)
    ):
        w = struct.unpack("<i", payload[18:22])[0]
        h = struct.unpack("<i", payload[22:26])[0]
        bits = struct.unpack("<H", payload[28:30])[0]
        return ("bmp", int(w), abs(int(h)), max(bits // 8, 1))
    return None


def synth_image_payload(doc_id: int, text: str) -> bytes:
    """Deterministic PLANTED payloads for the header-decode oracle: real
    PNG/GIF/BMP/JPEG header bytes (correct signatures, byte order and
    offsets) whose dimensions derive from doc_id arithmetic the DuckDB
    oracle can replay — parse(synth(doc_id)) must invert the plant.
    doc_id % 5 == 4 plants a non-image payload (raw UTF-8 text). The
    JPEG plant puts APP0 and a VARIABLE-length COM segment before the
    SOF frame header, so the parser's marker walk (not a fixed offset)
    is what the oracle checks; SOF0/SOF2 and 1/3 components alternate."""
    import struct

    kind = doc_id % 5
    w = 16 + (doc_id * 7) % 2000
    h = 16 + (doc_id * 13) % 1200
    body = text.encode("utf-8")[:64]
    if kind == 0:
        color_type = (0, 2, 4, 6)[(doc_id // 4) % 4]
        ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + b"\x00\x00\x00\x00"
            + body
        )
    if kind == 1:
        return (
            b"GIF89a"
            + struct.pack("<HH", w % 65536, h % 65536)
            + b"\xf7\x00\x00"
            + body
        )
    if kind == 2:
        bits = (8, 24, 32)[(doc_id // 4) % 3]
        # negative height for every other BMP: top-down row order, the
        # parser must take the absolute value
        hh = -h if (doc_id // 8) % 2 else h
        header = (
            b"BM"
            + struct.pack("<IHHI", 0, 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, hh, 1, bits)
        )
        return header + body
    if kind == 3:
        sof_marker = 0xC0 if (doc_id // 5) % 2 == 0 else 0xC2
        ncomp = 3 if (doc_id // 10) % 2 == 0 else 1
        com_body = bytes((doc_id + k) % 256 for k in range(doc_id % 7))
        comps = b"".join(
            struct.pack(">BBB", c + 1, 0x11, 0) for c in range(ncomp)
        )
        return (
            b"\xff\xd8"  # SOI
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes(9)  # APP0, len 16 (14 payload bytes)
            + b"\xff\xfe" + struct.pack(">H", 2 + len(com_body))
            + com_body  # COM: variable length forces a real marker walk
            + bytes([0xFF, sof_marker])
            + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
            + comps
            + body
        )
    return text.encode("utf-8") or b"\x00"


def fake_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in featurizer: derives (width, height, n_frames)
    from payload bytes so tests are reproducible without codecs."""
    n = len(payload)
    return (64 + n % 512, 64 + (n * 7) % 512, 1 + n % 16)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `mapInPandas` streams record batches through Python once — the payload
    bytes never round-trip more than necessary, and partitions process
    independently (shard by any key upstream; no shuffle here).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload_bytes"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("payload_bytes", LongType()),
    ]
)


def attach_planted_payload(
    docs: DataFrame, text_col: str = "text", synth=None
) -> DataFrame:
    """Synthesize REAL media payloads from doc identity via ``synth``
    (default `synth_image_payload`; the audio plant passes
    `synth_audio_payload`) — the testdata carries no media, so the plant
    is the deterministic stand-in for the landed bytes column; in
    production this stage is the raw payload as ingested."""
    synth_fn = synth or synth_image_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                synth_fn(int(d), str(t))
                for d, t in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def extract_image_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL header decode over binary payloads: one
    `mapInPandas` pass parses PNG/GIF/BMP dimensions+channels from the
    fixed-offset header bytes (`parse_image_header`); unrecognized
    payloads emit NULL metadata. Same partition/batch shape as the full
    pixel-decode stage would use — at 100 TB the payload column streams
    through Arrow once, metadata-only consumers never touch it again."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [bytes(p) for p in pdf["payload"]]
            parsed = [parse_image_header(b) for b in bufs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed],
                        dtype="Int32",
                    ),
                    "channels": pd.array(
                        [p[3] if p else None for p in parsed],
                        dtype="Int32",
                    ),
                    "payload_bytes": [len(b) for b in bufs],
                }
            )

    return media.mapInPandas(run, schema=HEADER_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("scale_x1000", IntegerType()),
    ]
)


def resize_plan(features: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning (charter: image resize): computes the aspect-
    preserving target geometry from METADATA ONLY — the actual pixel
    resample would live inside the decode stub (`decode_image`), but the
    geometry math, schema and partition behavior are the real pipeline.
    Keeping this JVM-side means a 100 TB resize job prunes to metadata
    columns for planning and only streams payload bytes through the
    Arrow stage that materializes output images."""
    scale = F.least(
        F.lit(target) / F.col("width"), F.lit(target) / F.col("height")
    )
    return features.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale).cast("int").alias("target_h"),
        F.floor(scale * 1000).cast("int").alias("scale_x1000"),
    )


AUDIO_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("codec", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("data_bytes", LongType()),
        StructField("truncated", IntegerType()),
        StructField("payload_bytes", LongType()),
    ]
)

_WAV_RATES = (8000, 16000, 22050, 44100, 48000)
_WAV_BITS = (8, 16, 24, 32)


def parse_wav_header(payload: bytes):
    """REAL pure-Python WAV (RIFF) header parse — no audio libs: 'RIFF'
    <u32 LE riff size> 'WAVE', then a CHUNK WALK (chunks are not at fixed
    offsets — LIST/bext/JUNK may precede 'fmt '): each chunk is a 4-byte
    id + u32 LE size + payload, padded to even length (RIFF spec word
    alignment). 'fmt ' holds format tag u16, channels u16, sample rate
    u32, byte rate u32, block align u16, bits u16; WAVE_FORMAT_EXTENSIBLE
    (tag 0xFFFE, ≥40-byte fmt) carries the REAL format tag in the first
    u16 of the SubFormat GUID at fmt body offset 24. 'data' contributes
    its DECLARED size — a payload shorter than the declaration (tail not
    landed / headers-only scan) is reported with ``truncated=1`` rather
    than rejected, which is how duration comes from a header-only read
    at 100 TB. Every read is bounds-checked.

    Returns (codec, channels, sample_rate, bits, data_size, truncated)
    or None when the payload is not a parseable WAV (non-RIFF, missing
    fmt/data chunk, or a malformed chunk stream)."""
    import struct

    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    truncated = 0
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (csize,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = i + 8
        if cid == b"fmt ":
            if csize < 16 or body + 16 > n:
                return None
            tag, ch, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[body : body + 16]
            )
            codec = {1: "pcm", 3: "float"}.get(tag, "other")
            if tag == 0xFFFE:
                # extensible: real tag is the GUID's first u16
                if csize < 40 or body + 26 > n:
                    return None
                (real_tag,) = struct.unpack(
                    "<H", payload[body + 24 : body + 26]
                )
                codec = {1: "pcm-ext", 3: "float-ext"}.get(
                    real_tag, "other-ext"
                )
            fmt = (codec, int(ch), int(sr), int(bits))
        elif cid == b"data":
            data_size = int(csize)
            if body + csize > n:
                truncated = 1
                break  # declared data overruns the landed bytes: stop
        i = body + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    return (*fmt, data_size, truncated)


def synth_audio_payload(doc_id: int, text: str) -> bytes:
    """Deterministic PLANTED audio payloads for the header-decode oracle:
    real RIFF/WAVE byte layouts whose parameters derive from doc_id
    arithmetic the DuckDB oracle can replay — parse(synth(doc_id)) must
    invert the plant. doc_id % 4 picks the variant: 0 = canonical PCM
    WAV; 1 = an odd-length LIST chunk BEFORE 'fmt ' (forces the chunk
    walk + the word-alignment pad); 2 = WAVE_FORMAT_EXTENSIBLE (40-byte
    fmt, real tag inside the SubFormat GUID); 3 = a non-audio raw
    payload. The data chunk declares the full PCM size but lands at most
    64 body bytes — headers-only scans must still report duration, via
    the declared size + ``truncated``."""
    import struct

    kind = doc_id % 4
    if kind == 3:
        return text.encode("utf-8") or b"\x00"
    sr = _WAV_RATES[doc_id % 5]
    channels = 1 + (doc_id // 3) % 2
    bits = _WAV_BITS[(doc_id // 4) % 4]
    n_frames = 100 + (doc_id * 11) % 4000
    block_align = channels * bits // 8
    data_size = n_frames * block_align
    # land the full data body only when small (≤256 B): the census must
    # see BOTH truncated and complete payloads, on a data-derived split
    # the oracle replays as data_size > 256
    landed = data_size if data_size <= 256 else 64
    tb = text.encode("utf-8") or b"\x00"
    body = (tb * (landed // len(tb) + 1))[:landed]
    if kind == 2:
        fmt_body = struct.pack(
            "<HHIIHHHHI",
            0xFFFE,
            channels,
            sr,
            sr * block_align,
            block_align,
            bits,
            22,  # cbSize
            bits,  # valid bits
            (1 << channels) - 1,  # channel mask
        ) + struct.pack("<H", 1) + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    else:
        fmt_body = struct.pack(
            "<HHIIHH", 1, channels, sr, sr * block_align, block_align, bits
        )
    chunks = b""
    if kind == 1:
        # odd-size LIST chunk: the walker must skip size + 1 pad byte
        lst = b"INFO" + bytes((doc_id + k) % 256 for k in range(doc_id % 6))
        if len(lst) % 2 == 0:
            lst += b"\x00"  # force odd declared size
        chunks += b"LIST" + struct.pack("<I", len(lst)) + lst + b"\x00"
    chunks += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    # RIFF size declares the FULL file (as the writer intended), even
    # when the landed body is truncated — real headers-only scans see
    # exactly this shape
    riff_size = 4 + len(chunks) + 8 + data_size
    chunks += b"data" + struct.pack("<I", data_size) + body
    return b"RIFF" + struct.pack("<I", riff_size) + b"WAVE" + chunks


def attach_planted_audio_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Synthesize REAL WAV payloads (`synth_audio_payload`) from doc
    identity — the stand-in for the landed audio bytes column."""
    return attach_planted_payload(docs, text_col, synth=synth_audio_payload)


def extract_audio_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV header decode: one `mapInPandas` pass walks
    the RIFF chunk stream (`parse_wav_header`); non-audio payloads emit
    NULL metadata. Same shape as `extract_image_headers` — payload bytes
    stream through Arrow once, every census after is metadata-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [bytes(p) for p in pdf["payload"]]
            parsed = [parse_wav_header(b) for b in bufs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "codec": [p[0] if p else None for p in parsed],
                    "channels": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "bits": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int32"
                    ),
                    "data_bytes": pd.array(
                        [p[4] if p else None for p in parsed], dtype="Int64"
                    ),
                    "truncated": pd.array(
                        [p[5] if p else None for p in parsed], dtype="Int32"
                    ),
                    "payload_bytes": [len(b) for b in bufs],
                }
            )

    return media.mapInPandas(run, schema=AUDIO_HEADER_SCHEMA)


AUDIO_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("codec", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("sum_ch0", LongType()),
        StructField("sum_ch1", LongType()),
        StructField("peak_abs", LongType()),
    ]
)


def decode_wav_samples(payload: bytes):
    """REAL WAV PCM SAMPLE decode (round-11 directive #4 — the audio
    parity of the pixel path): the RIFF chunk walk of
    `parse_wav_header`, then the 'data' payload itself decoded with
    stdlib ``struct`` — interleaved frames, 8-bit unsigned or 16-bit
    signed little-endian, 1–2 channels, plain PCM (tag 1) or
    WAVE_FORMAT_EXTENSIBLE wrapping PCM. Truncated payloads (declared
    data overruns the landed bytes — the HEADER census's bread and
    butter) return None here: a sample census over half-landed clips
    would silently under-sum, so this path insists on complete bodies.

    Returns (codec, channels, sample_rate, bits, n_frames, sum_ch0,
    sum_ch1, peak_abs): per-channel RAW integer sample sums (unsigned
    byte values for 8-bit, signed for 16-bit; mono clips report
    sum_ch1 = 0) and peak amplitude = max |centered sample| (8-bit
    centers at 128; 16-bit is already signed) — all exact integers."""
    import struct

    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (csize,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = i + 8
        if cid == b"fmt ":
            if csize < 16 or body + 16 > n:
                return None
            tag, ch, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[body : body + 16]
            )
            codec = "pcm" if tag == 1 else None
            if tag == 0xFFFE:
                if csize < 40 or body + 26 > n:
                    return None
                (real_tag,) = struct.unpack(
                    "<H", payload[body + 24 : body + 26]
                )
                codec = "pcm-ext" if real_tag == 1 else None
            fmt = (codec, int(ch), int(sr), int(bits))
        elif cid == b"data":
            if body + csize > n:
                return None  # truncated body: no exact census possible
            data = payload[body : body + csize]
        i = body + csize + (csize & 1)
    if fmt is None or data is None:
        return None
    codec, ch, sr, bits = fmt
    if codec is None or ch not in (1, 2) or bits not in (8, 16):
        return None  # non-PCM / exotic layouts: header-census territory
    frame_bytes = ch * bits // 8
    if frame_bytes == 0 or len(data) % frame_bytes:
        return None  # partial trailing frame: malformed
    n_frames = len(data) // frame_bytes
    sums = [0, 0]
    peak = 0
    if bits == 8:
        for t in range(n_frames):
            base = t * ch
            for c in range(ch):
                v = data[base + c]
                sums[c] += v
                a = v - 128 if v >= 128 else 128 - v
                if a > peak:
                    peak = a
    else:
        vals = struct.unpack(f"<{n_frames * ch}h", data)
        for t in range(n_frames):
            base = t * ch
            for c in range(ch):
                v = vals[base + c]
                sums[c] += v
                a = -v if v < 0 else v
                if a > peak:
                    peak = a
    return (codec, ch, sr, bits, n_frames, sums[0], sums[1], peak)


def synth_audio_sample_payload(doc_id: int, text: str) -> bytes:
    """Deterministic COMPLETE-PCM plants for the sample-decode oracle
    (the audio analog of `synth_pixel_payload`): doc_id % 4 picks the
    variant — 0 = 8-bit unsigned PCM, 1 = 16-bit signed PCM,
    2 = WAVE_FORMAT_EXTENSIBLE wrapping 16-bit PCM (the real tag lives
    in the SubFormat GUID), 3 = raw non-audio text. channels =
    1 + (doc_id // 4) % 2 and sample_rate = _WAV_RATES[(doc_id // 8) %
    5] are DECOUPLED from the kind selector so every codec sweeps mono
    and stereo at every rate. Sample plant arithmetic the oracle replays:
    8-bit  s(t, c) = (doc_id*3 + t*5 + c*11) % 256,
    16-bit s(t, c) = ((doc_id*131 + t*17 + c*23) % 65536) - 32768,
    t = frame index, c = channel; n_frames = 40 + (doc_id * 7) % 120.
    The data chunk lands COMPLETE — decode(synth(doc_id)) must invert
    the interleaving and the signedness byte-for-byte."""
    import struct

    kind = doc_id % 4
    if kind == 3:
        return text.encode("utf-8") or b"\x00"
    channels = 1 + (doc_id // 4) % 2
    sr = _WAV_RATES[(doc_id // 8) % 5]
    bits = 8 if kind == 0 else 16
    n_frames = 40 + (doc_id * 7) % 120
    block_align = channels * bits // 8
    if bits == 8:
        data = bytes(
            (doc_id * 3 + t * 5 + c * 11) % 256
            for t in range(n_frames)
            for c in range(channels)
        )
    else:
        data = struct.pack(
            f"<{n_frames * channels}h",
            *(
                ((doc_id * 131 + t * 17 + c * 23) % 65536) - 32768
                for t in range(n_frames)
                for c in range(channels)
            ),
        )
    if kind == 2:
        fmt_body = struct.pack(
            "<HHIIHHHHI",
            0xFFFE,
            channels,
            sr,
            sr * block_align,
            block_align,
            bits,
            22,
            bits,
            (1 << channels) - 1,
        ) + struct.pack("<H", 1) + (
            b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        )
    else:
        fmt_body = struct.pack(
            "<HHIIHH", 1, channels, sr, sr * block_align, block_align, bits
        )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"  # word-alignment pad after an odd data chunk
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def attach_planted_audio_sample_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Synthesize COMPLETE-PCM WAV payloads
    (`synth_audio_sample_payload`) from doc identity."""
    return attach_planted_payload(
        docs, text_col, synth=synth_audio_sample_payload
    )


def extract_audio_samples(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL PCM sample decode: one `mapInPandas` pass
    walks every payload's data chunk (`decode_wav_samples`);
    non-decodable payloads emit NULL metrics. Integer sample sums (not
    float means) cross the Arrow boundary — the census downstream is
    exact-arithmetic, the same discipline as the pixel leg."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [decode_wav_samples(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "codec": [p[0] if p else None for p in parsed],
                    "sample_rate": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "bits": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [p[4] if p else None for p in parsed], dtype="Int64"
                    ),
                    "sum_ch0": pd.array(
                        [p[5] if p else None for p in parsed], dtype="Int64"
                    ),
                    "sum_ch1": pd.array(
                        [p[6] if p else None for p in parsed], dtype="Int64"
                    ),
                    "peak_abs": pd.array(
                        [p[7] if p else None for p in parsed], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(run, schema=AUDIO_SAMPLE_SCHEMA)


def sample_frames(features: DataFrame, k: int = 4) -> DataFrame:
    """Frame sampling (charter: video frame-sample): emit up to ``k``
    evenly-spaced frame indices per media row — `explode(sequence)` over
    metadata, one row in → k out, no payload touched until the decode
    stage consumes (doc_id, frame_idx) pairs."""
    n = F.col("n_frames")
    idx = F.explode(F.sequence(F.lit(0), F.least(n, F.lit(k)) - 1))
    return features.select("doc_id", "n_frames", idx.alias("sample_slot")).select(
        "doc_id",
        "n_frames",
        "sample_slot",
        F.floor(F.col("sample_slot") * n / F.least(n, F.lit(k)))
        .cast("int")
        .alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# REAL pixel decode — uncompressed formats need no codec library
# ---------------------------------------------------------------------------

PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("min_val", IntegerType()),
        StructField("max_val", IntegerType()),
        StructField("top_row_sum", LongType()),
    ]
)


def _pgm_header(payload: bytes):
    """Tokenize a binary-PGM (P5) header: whitespace-separated width /
    height / maxval tokens, '#' comments running to end-of-line, raster
    starting exactly ONE whitespace byte after the maxval token (PNM
    spec). Returns (w, h, maxval, data_offset) or None."""
    i, toks = 2, []
    n = len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i]
        if c in b" \t\r\n":
            i += 1
            continue
        if c == ord("#"):
            while i < n and payload[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < n and payload[j] not in b" \t\r\n":
            j += 1
        toks.append(payload[i:j])
        i = j
    if len(toks) < 3 or i >= n:
        return None
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval != 255:
        return None
    return w, h, maxval, i + 1  # one whitespace byte after maxval


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): pick whichever of left /
    up / upper-left is closest to p = a + b - c, ties broken
    left → up → upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    """One PNG chunk: u32 BE length, tag, body, CRC32 over tag+body."""
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


#: Adam7 pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, pos: int, w: int, h: int, bpp: int):
    """Unfilter ``h`` scanlines of ``w`` pixels starting at ``pos`` —
    the shared core of the sequential and per-Adam7-pass paths (each
    pass filters independently: its first scanline's prior is zeros).
    Returns (rows, new_pos) or None on a bad filter id / truncation."""
    stride = w * bpp
    if pos + (stride + 1) * h > len(raw):
        return None
    rows: list[bytes] = []
    prior = bytes(stride)
    for _y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for k in range(bpp, stride):
                line[k] = (line[k] + line[k - bpp]) & 255
        elif ftype == 2:  # Up
            for k in range(stride):
                line[k] = (line[k] + prior[k]) & 255
        elif ftype == 3:  # Average
            for k in range(stride):
                left = line[k - bpp] if k >= bpp else 0
                line[k] = (line[k] + ((left + prior[k]) >> 1)) & 255
        elif ftype == 4:  # Paeth
            for k in range(stride):
                left = line[k - bpp] if k >= bpp else 0
                ul = prior[k - bpp] if k >= bpp else 0
                line[k] = (line[k] + _paeth(left, prior[k], ul)) & 255
        else:
            return None  # unknown filter type
        prior = bytes(line)
        rows.append(prior)
    return rows, pos


def _png_decode(payload: bytes):
    """REAL PNG pixel decode for grayscale (color type 0) and truecolor
    (color type 2) at BOTH legal non-palette depths, 8 and 16 bits per
    sample — the one compressed format whose codec ships with Python:
    the IDAT stream is DEFLATE (stdlib ``zlib``), and the five scanline
    filters (None/Sub/Up/Average/Paeth, spec §9) are pure byte
    arithmetic. The filters operate on BYTES at distance bpp =
    channels · depth/8 regardless of sample width (spec §9: "the
    filter is applied to bytes, not to pixels"), so the shared
    `_png_unfilter` core covers 16-bit unchanged — only the sample
    reassembly (big-endian u16 pairs, spec §7.1) differs downstream.
    Chunk CRCs are verified (a corrupt chunk rejects the payload, it
    cannot silently skew a channel sum); truncated chunks, a missing
    IEND, bad IHDR geometry, palettes, and alpha all return None —
    out of this decoder's declared scope (palette indirection is the
    GIF/RLE8 path; alpha has no planted semantics here).

    Returns (format, w, h, raster_rows) with format 'png_rgb8',
    'png_gray8', 'png_rgb16' or 'png_gray16', or None; raster_rows
    stay raw filtered-out byte rows (16-bit rows hold big-endian
    sample pairs)."""
    import struct
    import zlib

    n = len(payload)
    if n < 8 or payload[:8] != _PNG_SIG:
        return None
    i = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while i + 12 <= n:
        ln = struct.unpack(">I", payload[i : i + 4])[0]
        if i + 12 + ln > n:
            return None  # truncated chunk
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + ln]
        crc = struct.unpack(">I", payload[i + 8 + ln : i + 12 + ln])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            return None  # corrupt chunk: reject, never skew sums
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_iend = True
            break
        i += 12 + ln
    if ihdr is None or len(ihdr) != 13 or not seen_iend or not idat:
        return None
    w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", ihdr)
    if (
        depth not in (8, 16)
        or ctype not in (0, 2)
        or comp != 0
        or filt != 0
        or inter not in (0, 1)
        or w <= 0
        or h <= 0
        # Decompression-bomb guard: IHDR w/h are u32 (up to ~4e9 each)
        # and a crafted payload in an untrusted corpus could otherwise
        # force multi-GB allocations inside the Arrow worker. This
        # stats path has no business decoding beyond a few megapixels.
        or w * h > 16_000_000
    ):
        return None
    bpp = (3 if ctype == 2 else 1) * (depth // 8)
    stride = w * bpp
    # expected inflated size from the IHDR geometry: one filter byte
    # per scanline — sequentially h scanlines of w pixels; interlaced
    # (Adam7, round-12) the per-pass reduced images' scanlines, empty
    # passes contributing nothing (spec §8.2)
    if inter == 0:
        expect = (stride + 1) * h
    else:
        expect = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw and ph:
                expect += (pw * bpp + 1) * ph
    # Bounded inflate: never allocate more than the geometry implies
    # (+1 sentinel byte to detect oversized streams), and reject any
    # stream with unconsumed input or a trailing tail — the inflated
    # size must match the IHDR geometry exactly.
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expect + 1)
    except zlib.error:
        return None
    if len(raw) != expect or d.unconsumed_tail or not d.eof or d.unused_data:
        return None
    fmt = ("png_rgb%d" if ctype == 2 else "png_gray%d") % depth
    if inter == 0:
        got = _png_unfilter(raw, 0, w, h, bpp)
        if got is None:
            return None
        return (fmt, w, h, got[0])
    # Adam7: unfilter each pass's reduced image independently (its
    # first scanline's prior is zeros), then scatter pixels to their
    # (x0 + i·dx, y0 + j·dy) logical positions
    out = [bytearray(stride) for _ in range(h)]
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if not pw or not ph:
            continue
        got = _png_unfilter(raw, pos, pw, ph, bpp)
        if got is None:
            return None
        prows, pos = got
        for j, prow in enumerate(prows):
            y = y0 + j * dy
            for i in range(pw):
                x = x0 + i * dx
                out[y][x * bpp : (x + 1) * bpp] = prow[
                    i * bpp : (i + 1) * bpp
                ]
    return (fmt, w, h, [bytes(r) for r in out])


def _gif_lzw_decode(mcs: int, data: bytes):
    """GIF-variant LZW decompression (GIF89a spec Appendix F) — pure
    stdlib bit arithmetic, the second compressed codec this module
    decodes for real (DEFLATE via zlib being the first).

    Variable-width codes, LSB-first bit packing: width starts at
    ``mcs + 1`` and bumps to at most 12 as the table grows. The width
    bump fires when ``next_code`` reaches ``1 << width`` (after the
    table gains entry ``(1 << width) - 1`` the encoder may emit the
    KwKwK code == next_code, which needs the wider field) — the
    convention real encoders use, validated in tests against GIFs this
    repo did not produce (the stdlib idlelib icons). Handles clear
    codes, the KwKwK case (code == next_code), a full table (4096:
    stop adding, keep decoding — deferred clear), and rejects
    out-of-range codes / truncation by returning None.

    Returns (indices, max_width_used) or None."""
    clear = 1 << mcs
    eoi = clear + 1
    nbits = len(data) * 8
    out = bytearray()
    bitpos = 0
    max_width = mcs + 1

    table: list[bytes] = []
    next_code = 0
    width = 0
    prefix = b""

    def reset() -> None:
        nonlocal table, next_code, width, prefix
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        next_code = clear + 2
        width = mcs + 1
        prefix = b""

    reset()
    while True:
        if bitpos + width > nbits:
            return None  # ran out of bits before EOI
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        max_width = max(max_width, width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            return list(out), max_width
        if not prefix:  # first code after (re)set must be a root
            if code >= clear:
                return None
            entry = table[code]
        else:
            if code < next_code:
                entry = table[code]
                addition = prefix + entry[:1]
            elif code == next_code:  # KwKwK
                entry = addition = prefix + prefix[:1]
            else:
                return None  # desynchronized stream
            if next_code < 4096:
                table.append(addition)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out += entry
        prefix = entry


def _gif_lzw_encode(mcs: int, indices: bytes) -> bytes:
    """GIF-variant LZW compression — the plant-side inverse of
    `_gif_lzw_decode`. Width bumps one table entry EARLIER than the
    decoder's rule (after adding entry ``1 << width``): the decoder
    learns each table entry one code later than the encoder creates it,
    so the conventions land both sides on the same bit boundaries (the
    giflib pairing, re-derived in the round-12 notes)."""
    clear = 1 << mcs
    eoi = clear + 1

    out = bytearray()
    acc = 0
    acc_bits = 0
    width = mcs + 1

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    book = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    emit(clear)
    w = bytes([indices[0]])
    for k in indices[1:]:
        wk = w + bytes([k])
        if wk in book:
            w = wk
            continue
        emit(book[w])
        if next_code < 4096:
            book[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        w = bytes([k])
    emit(book[w])
    emit(eoi)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_decode(payload: bytes):
    """REAL GIF pixel decode — global/local color table, sequential OR
    interlaced (round-11 directive #3 + the round-12 interlace leg):
    header + logical-screen descriptor walk, extension blocks skipped
    by their sub-block framing, image descriptor, then the
    LZW-compressed index stream (`_gif_lzw_decode`) mapped through the
    active color table; interlaced streams carry the same LZW content
    with rows permuted by the 4-pass order (`_gif_row_order`), inverted
    here. Multi-image animations beyond the first frame and
    malformed/truncated streams return None (the stats path declares
    them, never guesses).

    Returns (w, h, rows-of-index-bytes, palette) with palette a list of
    (r, g, b) tuples, or None."""
    import struct

    n = len(payload)
    if n < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    i = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 7)
        if i + 3 * size > n:
            return None
        gct = [
            (payload[i + 3 * k], payload[i + 3 * k + 1], payload[i + 3 * k + 2])
            for k in range(size)
        ]
        i += 3 * size
    if w <= 0 or h <= 0 or w * h > 16_000_000:  # same bomb guard as PNG
        return None
    while i < n:
        block = payload[i]
        i += 1
        if block == 0x3B:  # trailer before any image
            return None
        if block == 0x21:  # extension: label + sub-blocks
            if i >= n:
                return None
            i += 1
            while i < n and payload[i] != 0:
                i += 1 + payload[i]
            i += 1  # the 0 terminator
            continue
        if block != 0x2C:
            return None  # unknown block type
        if i + 9 > n:
            return None
        left, top, iw, ih = struct.unpack("<HHHH", payload[i : i + 8])
        ipacked = payload[i + 8]
        i += 9
        interlaced = bool(ipacked & 0x40)
        palette = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 7)
            if i + 3 * size > n:
                return None
            palette = [
                (
                    payload[i + 3 * k],
                    payload[i + 3 * k + 1],
                    payload[i + 3 * k + 2],
                )
                for k in range(size)
            ]
            i += 3 * size
        if palette is None or i >= n:
            return None
        mcs = payload[i]
        i += 1
        if not 2 <= mcs <= 8:
            return None
        lzw = bytearray()
        while i < n and payload[i] != 0:
            ln = payload[i]
            if i + 1 + ln > n:
                return None
            lzw += payload[i + 1 : i + 1 + ln]
            i += 1 + ln
        if i >= n:
            return None
        i += 1  # data terminator
        decoded = _gif_lzw_decode(mcs, bytes(lzw))
        if decoded is None:
            return None
        indices, _ = decoded
        if len(indices) != iw * ih or left or top or (iw, ih) != (w, h):
            # stats scope: one full-screen frame (the plant shape); a
            # sub-rectangle frame would need compositing semantics
            return None
        if any(ix >= len(palette) for ix in indices):
            return None
        rows = [
            bytes(indices[y * iw : (y + 1) * iw]) for y in range(ih)
        ]
        if interlaced:
            # GIF interlacing (spec appendix E) permutes ROWS only —
            # the LZW stream is identical; stream row r belongs at
            # logical row _GIF_ROW_ORDER(ih)[r] (round 12)
            logical = [None] * ih
            for r, y in enumerate(_gif_row_order(ih)):
                logical[y] = rows[r]
            rows = logical
        return (w, h, rows, palette)
    return None


def _gif_row_order(h: int) -> list[int]:
    """The four-pass GIF interlace row sequence (GIF89a appendix E):
    rows 0,8,16,... then 4,12,..., then 2,6,10,..., then 1,3,5,... —
    the order interlaced stream rows map to logical rows."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def synth_gif_payload(
    doc_id: int, w: int, h: int, interlace: bool = False
) -> bytes:
    """Plant encoder: a real GIF89a — 256-entry global color table
    palette[i] = (i, (i+5)%256, (i+10)%256), pixel INDEX(x, y) =
    (doc_id*7 + 31y + 13x) % 256, LZW-compressed by `_gif_lzw_encode`
    and framed in ≤255-byte sub-blocks. Because the palette maps index
    i to channels (i, i+5, i+10) mod 256, the decoded channel values
    equal the truecolor plant arithmetic exactly — one oracle replays
    both. The decoder must invert the LZW stream, the sub-block
    framing, AND the palette indirection byte-for-byte."""
    import struct

    gct = bytearray()
    for k in range(256):
        gct += bytes((k, (k + 5) % 256, (k + 10) % 256))
    ys = _gif_row_order(h) if interlace else range(h)
    indices = bytes(
        (doc_id * 7 + y * 31 + x * 13) % 256
        for y in ys
        for x in range(w)
    )
    lzw = _gif_lzw_encode(8, indices)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes((0xF7, 0, 0))  # GCT present, 256 entries
        + gct
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, w, h)
        + (b"\x40" if interlace else b"\x00")  # no LCT; interlace bit
        + bytes([8])  # LZW min code size
        + blocks
        + b"\x3b"
    )


def _bmp_rle8_decode(payload: bytes):
    """REAL RLE8 BMP pixel decode (round-11 directive #3's ~30-line
    sibling): 8-bit palette-indexed raster, BI_RLE8 compression —
    encoded runs (count, index), absolute mode (00, n>=3, n indices,
    word-aligned pad), end-of-line (00 00) and end-of-bitmap (00 01)
    escapes. The delta escape (00 02) leaves pixels undefined, so a
    payload using it returns None rather than guessing. RLE8 bitmaps
    are bottom-up by spec (top-down RLE is invalid); rows are returned
    in LOGICAL order (top first).

    Returns (w, h, rows-of-index-bytes, palette) or None."""
    import struct

    n = len(payload)
    if n < 54 or payload[:2] != b"BM":
        return None
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size not in (40, 52, 56, 108, 124):
        return None
    offset = struct.unpack("<I", payload[10:14])[0]
    w = struct.unpack("<i", payload[18:22])[0]
    h = struct.unpack("<i", payload[22:26])[0]
    bits = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    clr_used = struct.unpack("<I", payload[46:50])[0] if n >= 50 else 0
    if bits != 8 or comp != 1 or w <= 0 or h <= 0:
        return None  # RLE8 is 8-bit and bottom-up (positive height) only
    n_colors = clr_used or 256
    pal_off = 14 + hdr_size
    if pal_off + 4 * n_colors > n:
        return None
    palette = [
        (
            payload[pal_off + 4 * k + 2],  # R (stored B,G,R,reserved)
            payload[pal_off + 4 * k + 1],
            payload[pal_off + 4 * k],
        )
        for k in range(n_colors)
    ]
    rows = [bytearray(w) for _ in range(h)]
    i = offset
    x, file_row = 0, 0  # file rows run bottom-up
    while True:
        if i + 2 > n:
            return None  # truncated before end-of-bitmap
        b0, b1 = payload[i], payload[i + 1]
        i += 2
        if b0:  # encoded run
            if x + b0 > w or file_row >= h:
                return None
            rows[h - 1 - file_row][x : x + b0] = bytes([b1]) * b0
            x += b0
            continue
        if b1 == 0:  # end of line
            file_row += 1
            x = 0
            continue
        if b1 == 1:  # end of bitmap
            break
        if b1 == 2:  # delta: undefined pixels — declared out
            return None
        # absolute mode, count b1 >= 3
        if x + b1 > w or i + b1 > n or file_row >= h:
            return None
        rows[h - 1 - file_row][x : x + b1] = payload[i : i + b1]
        x += b1
        i += b1 + (b1 & 1)  # word-aligned pad
    if any(ix >= n_colors for row in rows for ix in row):
        return None
    return (w, h, [bytes(r) for r in rows], palette)


def synth_rle8_payload(doc_id: int, w: int, h: int) -> bytes:
    """Plant encoder: a real BI_RLE8 BMP with the 256-entry palette
    palette[i] = (i, (i+5)%256, (i+10)%256). EVEN logical rows are one
    encoded RUN of the row-constant index (doc_id*7 + 31y) % 256 — the
    multi-pixel run path; ODD rows use ABSOLUTE mode with per-pixel
    index (doc_id*7 + 31y + 13x) % 256 (word-aligned pad when w is
    odd) — so both RLE modes are exercised in every plant. Rows are
    stored bottom-up with EOL escapes and a final EOB."""
    import struct

    pal = bytearray()
    for k in range(256):
        pal += bytes(((k + 10) % 256, (k + 5) % 256, k, 0))  # B,G,R,0
    data = bytearray()
    for file_row in range(h):  # bottom-up: file row 0 = logical h-1
        y = h - 1 - file_row
        if y % 2 == 0:
            data += bytes((w, (doc_id * 7 + y * 31) % 256))
        else:
            data.append(0)
            data.append(w)  # absolute mode needs w >= 3 (plants: w >= 3)
            data += bytes(
                (doc_id * 7 + y * 31 + x * 13) % 256 for x in range(w)
            )
            if w & 1:
                data.append(0)  # word-aligned pad
        data += b"\x00\x00"  # end of line
    data += b"\x00\x01"  # end of bitmap
    offset = 14 + 40 + len(pal)
    return (
        b"BM"
        + struct.pack("<IHHI", offset + len(data), 0, 0, offset)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835, 256, 0
        )
        + pal
        + data
    )


def _png_forward_filter(
    raws: list[bytes], bpp: int, fsel
) -> bytearray:
    """FORWARD-filter scanlines before compression: ``fsel(j)`` picks
    the filter id for scanline j; the prior row resets to zeros at the
    start (callers invoke this once per Adam7 pass, matching the
    decoder's per-pass prior reset)."""
    stride = len(raws[0]) if raws else 0
    filtered = bytearray()
    prior = bytes(stride)
    for j, raw in enumerate(raws):
        f = fsel(j)
        filtered.append(f)
        if f == 0:
            filtered += raw
        elif f == 1:
            filtered += bytes(
                (raw[k] - (raw[k - bpp] if k >= bpp else 0)) & 255
                for k in range(stride)
            )
        elif f == 2:
            filtered += bytes(
                (raw[k] - prior[k]) & 255 for k in range(stride)
            )
        elif f == 3:
            filtered += bytes(
                (
                    raw[k]
                    - (((raw[k - bpp] if k >= bpp else 0) + prior[k]) >> 1)
                )
                & 255
                for k in range(stride)
            )
        else:
            filtered += bytes(
                (
                    raw[k]
                    - _paeth(
                        raw[k - bpp] if k >= bpp else 0,
                        prior[k],
                        prior[k - bpp] if k >= bpp else 0,
                    )
                )
                & 255
                for k in range(stride)
            )
        prior = raw
    return filtered


def synth_png_payload(
    doc_id: int,
    w: int,
    h: int,
    gray: bool,
    filter_heavy: bool,
    interlace: bool = False,
    depth16: bool = False,
) -> bytes:
    """Encode the plant value(x,y,c) = (doc_id*7 + 31y + 13x + 5c) % 256
    as a real PNG: IHDR + one DEFLATE IDAT + IEND, scanlines FORWARD-
    filtered before compression — filter id (doc_id + y) % 5 when
    ``filter_heavy`` (every decode-side unfilter path exercised within
    one plant period), filter 0 everywhere otherwise. With
    ``interlace`` the image is stored ADAM7 (round 12): the seven
    reduced pass images are extracted, each pass filtered independently
    (filter id (doc_id + pass + j) % 5 when filter_heavy), and the
    decoder must additionally invert the pass structure and the pixel
    scatter — tiny plants exercise the empty-pass edge cases (several
    passes are empty below 8x8). With ``depth16`` samples are 16-bit
    value16(x,y,c) = (doc_id*4099 + 977y + 313x + 101c) % 65536 stored
    as big-endian pairs (spec §7.1), and the scanline filters apply to
    the BYTES at distance bpp = channels·2 (spec §9) — a deliberately
    different modulus so an 8-bit decoder misreading a 16-bit stream
    can never land the right sums by accident. The logical pixel
    VALUES are storage-order-independent, so the census oracle is
    untouched by filter/interlace choices."""
    import struct
    import zlib

    ch = 1 if gray else 3
    bpp = ch * (2 if depth16 else 1)

    def val(x: int, y: int, c: int) -> int:
        return (doc_id * 7 + y * 31 + x * 13 + c * 5) % 256

    def val16(x: int, y: int, c: int) -> int:
        return (doc_id * 4099 + y * 977 + x * 313 + c * 101) % 65536

    def row_bytes(xs: list[int], y: int) -> bytes:
        if depth16:
            return b"".join(
                struct.pack(">H", val16(x, y, c))
                for x in xs
                for c in range(ch)
            )
        return bytes(val(x, y, c) for x in xs for c in range(ch))

    if not interlace:
        raws = [row_bytes(list(range(w)), y) for y in range(h)]
        filtered = _png_forward_filter(
            raws, bpp, (lambda j: (doc_id + j) % 5 if filter_heavy else 0)
        )
    else:
        filtered = bytearray()
        for pno, (x0, y0, dx, dy) in enumerate(_ADAM7):
            xs = list(range(x0, w, dx))
            ys = list(range(y0, h, dy))
            if not xs or not ys:
                continue
            raws = [row_bytes(xs, y) for y in ys]
            filtered += _png_forward_filter(
                raws,
                bpp,
                (
                    lambda j, _p=pno: (doc_id + _p + j) % 5
                    if filter_heavy
                    else 0
                ),
            )
    ihdr = struct.pack(
        ">IIBBBBB",
        w,
        h,
        16 if depth16 else 8,
        0 if gray else 2,
        0,
        0,
        1 if interlace else 0,
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + _png_chunk(b"IEND", b"")
    )


def decode_pixel_stats(payload: bytes):
    """REAL pixel decode for the uncompressed raster formats — no codec
    library needed, a pure-Python row-stride walk:

    - BMP, 24-bit uncompressed (BI_RGB): pixel-array offset from the
      file header (u32 LE at 10), rows padded to 4-byte multiples
      (stride = ceil(3w/4)*4), stored bottom-up when the
      BITMAPINFOHEADER height is positive and top-down when negative,
      B,G,R byte order within a pixel;
    - PGM (P5): tokenized header (comments allowed), 8-bit raster;
    - PNG, grayscale/truecolor at BOTH non-palette depths (8-bit and
      16-bit big-endian, round 12), sequential AND Adam7-interlaced:
      IDAT inflated with stdlib ``zlib``, the five scanline filters
      unapplied per pass (byte-wise at distance channels·depth/8,
      spec §9), interlaced pixels scattered back to their logical
      positions by `_png_decode`;
    - GIF, sequential or interlaced, global or local color table: the
      LZW stream decoded by the pure-Python `_gif_lzw_decode`
      (round-11 directive #3), indices mapped through the palette,
      interlaced rows un-permuted (round 12);
    - BMP, 8-bit BI_RLE8: run/absolute/EOL/EOB decode by
      `_bmp_rle8_decode` (same directive).

    Only JPEG (Huffman+DCT) stays declared in `decode_image`; headers
    are still parsed for real by `parse_image_header`.

    Returns (format, w, h, n_pixels, sum_r, sum_g, sum_b, min_val,
    max_val, top_row_sum) or None when the payload is not a decodable
    uncompressed raster. ``top_row_sum`` (channel sum over the TOP
    logical row, y=0) is deliberately row-order-sensitive: a decoder
    that ignored the bottom-up/top-down distinction would still get
    order-invariant sums right and THIS column wrong."""
    import struct

    def _palette_stats(fmt, w, h, rows, palette):
        """Shared census over palette-indexed rows (GIF / RLE8 BMP)."""
        sr = sg = sb = 0
        mn, mx = 255, 0
        top_row_sum = 0
        for y in range(h):
            row = rows[y]
            row_sum = 0
            for x in range(w):
                r, g, b = palette[row[x]]
                sr += r
                sg += g
                sb += b
                lo = min(r, g, b)
                hi = max(r, g, b)
                if lo < mn:
                    mn = lo
                if hi > mx:
                    mx = hi
                row_sum += r + g + b
            if y == 0:
                top_row_sum = row_sum
        return (fmt, w, h, w * h, sr, sg, sb, mn, mx, top_row_sum)

    gif = _gif_decode(payload)
    if gif is not None:
        w, h, rows, palette = gif
        return _palette_stats("gif_lzw8", w, h, rows, palette)
    rle = _bmp_rle8_decode(payload)
    if rle is not None:
        w, h, rows, palette = rle
        return _palette_stats("bmp_rle8", w, h, rows, palette)
    png = _png_decode(payload)
    if png is not None:
        fmt, w, h, rows = png
        # 16-bit rows hold big-endian u16 sample PAIRS (PNG spec §7.1);
        # the census runs over sample VALUES, so reassemble here — the
        # filter algebra upstream stayed byte-wise either way
        wide = fmt.endswith("16")
        full = 65535 if wide else 255

        def sample(row: bytes, i: int) -> int:
            return (row[2 * i] << 8) | row[2 * i + 1] if wide else row[i]

        if fmt.startswith("png_rgb"):
            sr = sg = sb = 0
            mn, mx = full, 0
            top_row_sum = 0
            for y in range(h):
                row = rows[y]
                row_sum = 0
                for x in range(w):
                    r = sample(row, 3 * x)
                    g = sample(row, 3 * x + 1)
                    b = sample(row, 3 * x + 2)
                    sr += r
                    sg += g
                    sb += b
                    lo = min(r, g, b)
                    hi = max(r, g, b)
                    if lo < mn:
                        mn = lo
                    if hi > mx:
                        mx = hi
                    row_sum += r + g + b
                if y == 0:
                    top_row_sum = row_sum
            return (fmt, w, h, w * h, sr, sg, sb, mn, mx, top_row_sum)
        s = 0
        mn, mx = full, 0
        top_row_sum = 0
        for y in range(h):
            row = rows[y]
            row_sum = 0
            for x in range(w):
                v = sample(row, x)
                s += v
                if v < mn:
                    mn = v
                if v > mx:
                    mx = v
                row_sum += v
            if y == 0:
                top_row_sum = row_sum
        return (fmt, w, h, w * h, s, s, s, mn, mx, top_row_sum)
    n = len(payload)
    if (
        n >= 54
        and payload[:2] == b"BM"
        and struct.unpack("<I", payload[14:18])[0]
        in (40, 52, 56, 108, 124)
    ):
        offset = struct.unpack("<I", payload[10:14])[0]
        w = struct.unpack("<i", payload[18:22])[0]
        h_signed = struct.unpack("<i", payload[22:26])[0]
        bits = struct.unpack("<H", payload[28:30])[0]
        comp = struct.unpack("<I", payload[30:34])[0]
        if bits != 24 or comp != 0 or w <= 0 or h_signed == 0:
            return None  # paletted/RLE/odd geometry: not this decoder
        h = abs(h_signed)
        stride = (3 * w + 3) // 4 * 4
        if offset + stride * h > n:
            return None  # truncated raster
        sr = sg = sb = 0
        mn, mx = 255, 0
        top_row_sum = 0
        for row in range(h):
            # logical y: bottom-up files store the top row LAST
            y = (h - 1 - row) if h_signed > 0 else row
            base = offset + row * stride
            row_sum = 0
            for x in range(w):
                b = payload[base + 3 * x]
                g = payload[base + 3 * x + 1]
                r = payload[base + 3 * x + 2]
                sr += r
                sg += g
                sb += b
                lo = min(r, g, b)
                hi = max(r, g, b)
                if lo < mn:
                    mn = lo
                if hi > mx:
                    mx = hi
                row_sum += r + g + b
            if y == 0:
                top_row_sum = row_sum
        return ("bmp24", w, h, w * h, sr, sg, sb, mn, mx, top_row_sum)
    if payload[:2] == b"P5":
        hdr = _pgm_header(payload)
        if hdr is None:
            return None
        w, h, _maxval, off = hdr
        if off + w * h > n:
            return None
        s = 0
        mn, mx = 255, 0
        top_row_sum = 0
        for y in range(h):
            base = off + y * w
            row_sum = 0
            for x in range(w):
                v = payload[base + x]
                s += v
                if v < mn:
                    mn = v
                if v > mx:
                    mx = v
                row_sum += v
            if y == 0:
                top_row_sum = row_sum
        return ("pgm", w, h, w * h, s, s, s, mn, mx, top_row_sum)
    return None


def synth_pixel_payload(doc_id: int, text: str) -> bytes:
    """Deterministic COMPLETE-raster plants for the pixel-decode oracle:
    value(x, y, c) = (doc_id*7 + y*31 + x*13 + c*5) % 256 with c = 0/1/2
    for R/G/B (grayscale formats use c=0), y counted from the TOP row.
    doc_id % 8 picks the variant: 0 = 24-bit BMP bottom-up (file rows
    reversed, stride-padded), 1 = 24-bit BMP top-down (negative height),
    2 = PGM P5 with a comment line (forces real header tokenization),
    3 = raw non-image text, 4 = PNG truecolor with per-row
    CYCLING scanline filters ((doc_id+y) % 5 — every unfilter path),
    ADAM7-interlaced every third plant period (round 12) and 16-BIT
    (big-endian sample pairs, value16 = (doc_id*4099 + 977y + 313x
    + 101c) % 65536) every seventh (round-12 close-out — q%7 is
    coprime with every other period stride, so depth sweeps all
    geometries and both storage orders),
    5 = PNG grayscale, alternating all-filter-0 / filter-heavy by
    plant period (round-10 directive #1: filter-0 AND filter-heavy),
    Adam7-interlaced and 16-bit on offset period strides,
    6 = GIF89a, 256-entry global palette[i] = (i, i+5, i+10) mod 256
    with pixel index = the c=0 value, LZW-compressed — the palette
    indirection makes decoded channels equal the truecolor arithmetic
    (round-11 directive #3), 7 = BI_RLE8 BMP with the same palette:
    even logical rows one encoded RUN of the row-constant index (the
    x*13 term dropped), odd rows ABSOLUTE mode per-pixel — both RLE
    modes in every plant. Dimensions derive from q = doc_id // 8
    (w = 3 + q%6, h = 2 + q%5) — DECOUPLED from the kind selector so
    each variant still sweeps every stride-padding remainder
    (3w % 4 ∈ {0,1,2,3}) and every filter id. decode(synth(doc_id))
    must invert the plant byte-for-byte — the decoder's stride/
    row-order/channel/filter/LZW/RLE walk is what the oracle checks."""
    import struct

    kind = doc_id % 8
    if kind == 3:
        return text.encode("utf-8") or b"\x00"
    q = doc_id // 8
    w = 3 + q % 6
    h = 2 + q % 5

    def val(x: int, y: int, c: int) -> int:
        return (doc_id * 7 + y * 31 + x * 13 + c * 5) % 256

    if kind == 4:
        # every third truecolor plant stores ADAM7-interlaced (round
        # 12): same logical pixels, different storage order — the
        # oracle arithmetic is unchanged, only the decoder's pass walk
        # is on trial; every seventh plant period stores 16-BIT samples
        # (round 12 close-out: the q%7 stride is coprime with the w/h/
        # interlace/filter periods, so 16-bit sweeps every geometry AND
        # both storage orders) with its own mod-65536 arithmetic
        return synth_png_payload(
            doc_id, w, h, gray=False, filter_heavy=True,
            interlace=q % 3 == 2, depth16=q % 7 == 3,
        )
    if kind == 5:
        return synth_png_payload(
            doc_id, w, h, gray=True, filter_heavy=q % 2 == 1,
            interlace=q % 3 == 1, depth16=q % 7 == 2,
        )
    if kind == 6:
        # every third GIF plant period stores INTERLACED (round 12):
        # same LZW stream content, rows permuted by the 4-pass order
        return synth_gif_payload(doc_id, w, h, interlace=q % 3 == 2)
    if kind == 7:
        return synth_rle8_payload(doc_id, w, h)
    if kind == 2:
        header = b"P5\n# plant %d\n%d %d\n255\n" % (doc_id, w, h)
        data = bytes(val(x, y, 0) for y in range(h) for x in range(w))
        return header + data
    topdown = kind == 1
    stride = (3 * w + 3) // 4 * 4
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row += bytes((val(x, y, 2), val(x, y, 1), val(x, y, 0)))  # BGR
        row += b"\x00" * (stride - 3 * w)
        rows.append(bytes(row))
    if not topdown:
        rows.reverse()  # bottom-up: bottom logical row stored first
    raster = b"".join(rows)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII",
            40,
            w,
            -h if topdown else h,
            1,
            24,
            0,  # BI_RGB
            len(raster),
            2835,
            2835,
            0,
            0,
        )
    )
    return header + raster


def attach_planted_pixel_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Synthesize COMPLETE uncompressed rasters (`synth_pixel_payload`)
    from doc identity — the stand-in for the landed image bytes."""
    return attach_planted_payload(docs, text_col, synth=synth_pixel_payload)


def extract_pixel_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL pixel decode: one `mapInPandas` pass walks the
    raster bytes of every uncompressed payload (`decode_pixel_stats`);
    non-decodable payloads emit NULL metrics. Integer channel sums (not
    float means) cross the Arrow boundary so the downstream census is
    exact-arithmetic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [decode_pixel_stats(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "n_pixels": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int64"
                    ),
                    "sum_r": pd.array(
                        [p[4] if p else None for p in parsed], dtype="Int64"
                    ),
                    "sum_g": pd.array(
                        [p[5] if p else None for p in parsed], dtype="Int64"
                    ),
                    "sum_b": pd.array(
                        [p[6] if p else None for p in parsed], dtype="Int64"
                    ),
                    "min_val": pd.array(
                        [p[7] if p else None for p in parsed], dtype="Int32"
                    ),
                    "max_val": pd.array(
                        [p[8] if p else None for p in parsed], dtype="Int32"
                    ),
                    "top_row_sum": pd.array(
                        [p[9] if p else None for p in parsed], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(run, schema=PIXEL_SCHEMA)
