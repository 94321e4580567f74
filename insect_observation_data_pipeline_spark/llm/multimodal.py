"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing (schemas, batch iteration via
``mapInPandas``, partition sizing) is real and tested. ``DECODERS`` is
the feature-extraction registry: ``image`` is a real stdlib-only PNG
structural decoder (signature + IHDR dimensions + CRC) and ``audio`` a
real WAV RIFF-chunk decoder (fmt + data: rate/channels/frames).
``PIXEL_DECODERS['image']`` goes all the way to pixels — IDAT inflate +
scanline unfiltering (filters 0-4) for 8/16-bit gray/RGB/alpha and
8-bit paletted (PLTE + tRNS) PNGs, sequential or Adam7-interlaced,
with ``png_encode_pixels`` / ``png_encode_paletted`` as the re-encode
half — so ``resize_images`` with ``decoder='image'`` is a
genuine resample, stdlib+numpy only. The audio
path likewise goes to CONTENT: ``wav_decode_samples`` decodes
8/16/24-bit integer PCM, float32, IMA ADPCM, MS ADPCM, and G.711
a-law/mu-law frames — in classic or WAVE_FORMAT_EXTENSIBLE (0xFFFE)
containers, resolved via the SubFormat GUID — (the ``wav_encode_*``
family are the round-trip partners) and the feature decoder emits
exact-integer peak/RMS amplitudes. The video path decodes real frames
too: ``avi_decode_frames`` walks an uncompressed RIFF AVI (BI_RGB
24-bit 'DIB ' stream — bottom-up BGR rows, 4-byte stride padding, per
the public RIFF/BITMAPINFOHEADER spec) into an (n_frames, h, w, 3)
array, ``avi_encode_frames`` is the round-trip partner, and
``sample_frames(decoder='video')`` emits every k-th REAL frame
re-encoded as PNG. Richer codecs (JPEG, compressed video) are
where an imaging/av library would slot in — swap the registry
entry without touching the pipeline; a structurally-valid
AVI in a compressed fourcc still gets header features with null
amplitudes (as does a WAV in an undecoded codec).

Scale notes: binary blobs ride in the same parquet row groups as their
metadata; ``spark.sql.files.maxPartitionBytes`` bounds executor memory per
task. Decode runs in ``mapInPandas`` so bytes cross to Python once per
Arrow batch, not per row; metadata-only queries never touch the bytes
(column pruning drops the binary column at the scan).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("sha256", StringType(), True),
        StructField("feature_kind", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("peak_amp", IntegerType(), True),
        StructField("rms_amp", IntegerType(), True),
    ]
)


def _decode_image_png(payload: bytes) -> dict:
    """Real (stdlib-only) PNG structural decode: validates the 8-byte
    signature, parses the IHDR chunk for dimensions / bit depth / color
    type, and CRC-checks IHDR. No imaging library needed — this is the
    header layer every PNG tool agrees on; pixel decode (IDAT inflate +
    unfiltering) is where a real imaging dependency would slot in."""
    import struct
    import zlib

    b = bytes(payload or b"")
    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    (length,) = struct.unpack(">I", b[8:12])
    if b[12:16] != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    w, h, bit_depth, color_type = struct.unpack(">IIBB", b[16:26])
    (crc,) = struct.unpack(">I", b[29:33])
    if zlib.crc32(b[12:29]) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    if w == 0 or h == 0:
        raise ValueError("PNG: zero dimension")
    return {
        "n_bytes": len(b),
        "feature_kind": "png",
        "width": w,
        "height": h,
        "bit_depth": bit_depth,
        "color_type": color_type,
    }


# GUID bytes 4..16 of every KSDATAFORMAT_SUBTYPE_* audio subformat
# ({tag:08x}-0000-0010-8000-00AA00389B71, public Microsoft media-type
# constant): Data2=0x0000, Data3=0x0010, Data4=80 00 00 AA 00 38 9B 71.
# Data1 (the first 4 little-endian bytes) carries the classic format tag.
_WAVE_SUBFORMAT_TAIL = bytes.fromhex("000010008000" "00aa00389b71")


def _wav_chunks(b: bytes) -> tuple[tuple, bytes]:
    """RIFF/WAVE container walk: (fmt tuple, data-chunk bytes). The
    shared parse under both the structural decode and the PCM sample
    decode — the header layer every WAV tool agrees on.

    WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE, the required container for >2
    channels or >16 valid bits since WinME) is resolved HERE: the
    effective codec is the classic tag carried in the SubFormat GUID's
    Data1 field, so both callers (feature decode, sample decode) gain
    extensible support through the one shared parse. The returned fmt
    tuple carries the effective tag; an extensible header whose
    SubFormat is not a KSDATAFORMAT audio GUID keeps 0xFFFE and falls
    through to the callers' unsupported-encoding path. Container bits
    stay as-is — samples are stored at the container width regardless
    of wValidBitsPerSample, which every decoder reads this way."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, csize = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and csize >= 16:
            # a declared csize can exceed the surviving bytes (truncated
            # payload); unpacking a short slice raises struct.error, which
            # is NOT a ValueError and would escape the corrupt-quarantine
            # path — validate lengths and raise ValueError ourselves
            if len(body) < 16:
                raise ValueError("WAV: truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] == 0xFFFE and csize >= 40 and len(body) >= 40:
                cb = struct.unpack("<H", body[16:18])[0]
                sub = body[24:40]
                if cb >= 22 and sub[4:16] == _WAVE_SUBFORMAT_TAIL:
                    eff = struct.unpack("<I", sub[:4])[0]
                    fmt = (eff, *fmt[1:])
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    return fmt, data


def wav_decode_samples(payload: bytes):
    """Full sample decode, stdlib+numpy only: the audio twin of
    :func:`png_decode_pixels`. Returns an int32 ndarray of shape
    (n_frames, n_channels), zero-centered. Handles integer PCM (format
    tag 1) at 8/16/24 bits (8-bit unsigned shifted by -128; 16/24-bit
    already signed little-endian), IEEE float32 (format tag 3) —
    float samples are mapped onto the 16-bit integer grid
    (round-half-even of x*32767, clipped to [-32768, 32767]) so every
    downstream amplitude feature stays exact integer arithmetic — and
    IMA/DVI ADPCM (format tag 17, the common 4-bit lossy WAV codec)
    via :func:`_ima_adpcm_decode`, and the G.711 telephony compandings
    — a-law (tag 6) and mu-law (tag 7), 8-bit log-companded samples
    expanded through the canonical CCITT segment tables
    (:func:`g711_decode_table`). WAVE_FORMAT_EXTENSIBLE containers
    (tag 0xFFFE) are resolved to their effective codec by
    :func:`_wav_chunks` before dispatch, so extensible
    PCM/float/ADPCM/G.711 decode identically to their classic-tag
    forms, and MS ADPCM (tag 2, the 7-coefficient block-predictor
    codec) via :func:`_ms_adpcm_decode`."""
    import numpy as np

    fmt, data = _wav_chunks(bytes(payload or b""))
    audio_format, n_channels, _, _, block_align, bits = fmt
    if n_channels == 0 or block_align == 0:
        raise ValueError("WAV: zero channels/block align")
    if audio_format == 17 and bits == 4:
        return _ima_adpcm_decode(data, n_channels, block_align)
    if audio_format == 2 and bits == 4:
        return _ms_adpcm_decode(data, n_channels, block_align)
    whole = data[: len(data) // block_align * block_align]
    if audio_format in (6, 7) and bits == 8:
        table = g711_decode_table("alaw" if audio_format == 6 else "ulaw")
        arr = table[np.frombuffer(whole, dtype=np.uint8)].astype(np.int32)
    elif audio_format == 1 and bits == 16:
        arr = np.frombuffer(whole, dtype="<i2").astype(np.int32)
    elif audio_format == 1 and bits == 8:
        arr = np.frombuffer(whole, dtype=np.uint8).astype(np.int32) - 128
    elif audio_format == 1 and bits == 24:
        u = (
            np.frombuffer(whole, dtype=np.uint8)
            .reshape(-1, 3)
            .astype(np.int32)
        )
        x = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        arr = (x ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
    elif audio_format == 3 and bits == 32:
        f = np.frombuffer(whole, dtype="<f4").astype(np.float64)
        arr = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(np.int32)
    else:
        raise ValueError(
            f"WAV: unsupported encoding (format tag {audio_format}, "
            f"{bits}-bit)"
        )
    return arr.reshape(-1, n_channels)


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    """One RIFF chunk: id + little-endian size + body, padded to even
    length (the stored size excludes the pad byte). Single spelling of
    the even-padding rule (round-12 review: six local copies across the
    WAV/AVI encoders could drift on a padding fix)."""
    import struct

    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def wav_encode_pcm16(samples, sample_rate: int) -> bytes:
    """Minimal valid 16-bit PCM WAV encoder for an int array of shape
    (n_frames, n_channels) — the round-trip partner that pins
    :func:`wav_decode_samples` in tests (the png_encode_pixels analog)."""
    import numpy as np

    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    # byte-for-byte the plain-PCM container (fmt tag 1, 16-bit) — a
    # parallel RIFF layout here could miss a _wav_container fix
    # (round-12 review)
    return _wav_container(1, sample_rate, n_channels, 16, arr.tobytes())


def _wav_container(fmt_tag: int, sample_rate: int, n_channels: int,
                   bits: int, data: bytes) -> bytes:
    import struct

    bytes_per = bits // 8
    fmt_body = struct.pack(
        "<HHIIHH", fmt_tag, n_channels, sample_rate,
        sample_rate * n_channels * bytes_per, n_channels * bytes_per, bits,
    )

    body = b"WAVE" + _riff_chunk(b"fmt ", fmt_body) + _riff_chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_extensible_pcm16(
    samples, sample_rate: int, *, channel_mask: int = 0
) -> bytes:
    """16-bit PCM wrapped in a WAVE_FORMAT_EXTENSIBLE container (fmt
    tag 0xFFFE + KSDATAFORMAT_SUBTYPE_PCM SubFormat GUID) — the
    round-trip partner pinning `_wav_chunks`' extensible resolution:
    decode(extensible(x)) must equal decode(plain_pcm16(x)) exactly."""
    import struct

    import numpy as np

    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    sub = struct.pack("<I", 1) + _WAVE_SUBFORMAT_TAIL
    fmt_body = struct.pack(
        "<HHIIHHHHI", 0xFFFE, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
        22, 16, channel_mask,
    ) + sub

    body = b"WAVE" + _riff_chunk(b"fmt ", fmt_body) + _riff_chunk(b"data", arr.tobytes())
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_pcm24(samples, sample_rate: int) -> bytes:
    """24-bit integer PCM WAV encoder (round-trip partner for the
    24-bit branch of :func:`wav_decode_samples`). ``samples`` is an
    int array of shape (n_frames, n_channels) in [-2^23, 2^23)."""
    import numpy as np

    arr = np.ascontiguousarray(samples, dtype="<i4")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    # little-endian int32 view: first 3 bytes per sample are the LSBs,
    # two's complement carries the sign
    data = arr.reshape(-1).view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    return _wav_container(1, sample_rate, n_channels, 24, data)


# IMA/DVI ADPCM tables (public spec: IMA Digital Audio Compression
# Standard; the same tables every WAV tool ships)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


#: MS ADPCM predictor coefficient pairs and delta adaptation table —
#: the 7 standard pairs every encoder writes and the public WAVE spec
#: defines; block preambles index into this table.
_MS_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)


def _ms_adpcm_decode(data: bytes, n_channels: int, block_align: int):
    """MS ADPCM (format tag 2) 'data' chunk -> int32 (n_frames,
    n_channels). Block layout per the public WAVE spec: per channel a
    1-byte predictor index into the 7 standard coefficient pairs, an
    int16 initial delta, int16 sample1 and sample2 (sample2 is the
    EARLIER sample and is emitted first); then 4-bit codes, high
    nibble first, alternating channels per nibble for stereo. Each
    code: predictor = ((s1*c1 + s2*c2) >> 8) + signed_code * delta,
    clamped to int16; delta = max(16, (ADAPT[code] * delta) >> 8).
    Shifts are arithmetic (floor) — the semantics every reference
    decoder uses."""
    import struct

    import numpy as np

    n = n_channels
    if block_align <= 7 * n:
        raise ValueError("MS ADPCM: block align too small")
    chans: list[list[int]] = [[] for _ in range(n)]
    for base in range(0, len(data) // block_align * block_align, block_align):
        block = data[base : base + block_align]
        preds = list(block[:n])
        if any(p >= len(_MS_COEFS) for p in preds):
            raise ValueError("MS ADPCM: predictor index out of range")
        delta = list(struct.unpack_from(f"<{n}h", block, n))
        s1 = list(struct.unpack_from(f"<{n}h", block, 3 * n))
        s2 = list(struct.unpack_from(f"<{n}h", block, 5 * n))
        for c in range(n):
            chans[c].append(s2[c])
            chans[c].append(s1[c])
        ch = 0
        for byte in block[7 * n :]:
            for code in (byte >> 4, byte & 0xF):
                c = ch % n
                ch += 1
                c1, c2 = _MS_COEFS[preds[c]]
                pred = (s1[c] * c1 + s2[c] * c2) >> 8
                signed = code - 16 if code >= 8 else code
                pred = max(-32768, min(32767, pred + signed * delta[c]))
                s2[c], s1[c] = s1[c], pred
                delta[c] = max(16, (_MS_ADAPT[code] * delta[c]) >> 8)
                chans[c].append(pred)
    frames = min(len(x) for x in chans) if chans else 0
    out = np.zeros((frames, n), dtype=np.int32)
    for c in range(n):
        out[:, c] = chans[c][:frames]
    return out


def wav_encode_ms_adpcm(samples, sample_rate: int) -> bytes:
    """MS ADPCM WAV encoder (format tag 2; round-trip partner pinning
    :func:`_ms_adpcm_decode`). ``samples`` is an int16-range array of
    shape (n_frames, n_channels). Canonical greedy quantizer with
    per-block predictor selection: each of the 7 standard coefficient
    pairs trial-encodes the block and the least-squared-error one
    wins; codes are nearest-level (round(err / delta)) clamped to
    [-8, 7], with the encoder state advanced through the decoder's own
    update so quantization error feeds back. Writes the spec's fmt
    extension (wSamplesPerBlock, the 7 coefficient pairs). Lossy by
    construction — tests assert bounded reconstruction error."""
    import struct

    import numpy as np

    arr = np.ascontiguousarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    if n_frames < 2:
        raise ValueError("MS ADPCM: need at least 2 frames")
    block_align = 256 * n_channels
    spb = (block_align - 7 * n_channels) * 2 // n_channels + 2

    def trial(x: list[int], coef: tuple[int, int], d0: int):
        c1, c2 = coef
        s2, s1, delta = x[0], x[1], d0
        codes, err = [], 0
        for target in x[2:]:
            pred = (s1 * c1 + s2 * c2) >> 8
            code_s = max(-8, min(7, round((target - pred) / delta)))
            recon = max(-32768, min(32767, pred + code_s * delta))
            code = code_s + 16 if code_s < 0 else code_s
            s2, s1 = s1, recon
            delta = max(16, (_MS_ADAPT[code] * delta) >> 8)
            codes.append(code)
            err += (recon - target) ** 2
        return err, codes

    out = bytearray()
    for start in range(0, n_frames, spb):
        blk = arr[start : start + spb]
        if len(blk) < spb:  # pad the tail block with its last frame
            blk = np.vstack([blk] + [blk[-1:]] * (spb - len(blk)))
        preds, deltas, s1s, s2s, codes_per = [], [], [], [], []
        for c in range(n_channels):
            x = [int(v) for v in blk[:, c]]
            d0 = max(16, int(np.abs(np.diff(blk[:, c])).mean()) // 4)
            best = min(
                (trial(x, coef, d0) + (k,) for k, coef in enumerate(_MS_COEFS)),
                key=lambda t: (t[0], t[2]),
            )
            preds.append(best[2])
            deltas.append(d0)
            s2s.append(x[0])
            s1s.append(x[1])
            codes_per.append(best[1])
        out += bytes(preds)
        out += struct.pack(f"<{n_channels}h", *deltas)
        out += struct.pack(f"<{n_channels}h", *s1s)
        out += struct.pack(f"<{n_channels}h", *s2s)
        flat: list[int] = []
        for i in range(spb - 2):
            for c in range(n_channels):
                flat.append(codes_per[c][i])
        for i in range(0, len(flat), 2):
            out.append((flat[i] << 4) | flat[i + 1])
    byte_rate = sample_rate * block_align // spb
    fmt_body = struct.pack(
        "<HHIIHHHHH", 2, n_channels, sample_rate, byte_rate,
        block_align, 4, 32, spb, len(_MS_COEFS),
    ) + b"".join(struct.pack("<hh", *c) for c in _MS_COEFS)

    body = b"WAVE" + _riff_chunk(b"fmt ", fmt_body) + _riff_chunk(b"data", bytes(out))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def g711_decode_table(law: str):
    """The 256-entry G.711 expansion table for ``'alaw'`` or
    ``'ulaw'`` — the canonical CCITT segment decode (sign bit, 3-bit
    segment, 4-bit mantissa) every telephony stack shares: mu-law is
    bias-132 with a bitwise complement, a-law is the 0x55-XOR'd
    variant with the seg-0/1 special cases. int16 linear output
    (mu-law spans +/-32124, a-law +/-32256)."""
    import numpy as np

    out = np.zeros(256, dtype=np.int16)
    for byte in range(256):
        if law == "ulaw":
            u = ~byte & 0xFF
            t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
            out[byte] = (0x84 - t) if (u & 0x80) else (t - 0x84)
        else:
            a = byte ^ 0x55
            t = (a & 0x0F) << 4
            seg = (a & 0x70) >> 4
            if seg == 0:
                t += 8
            elif seg == 1:
                t += 0x108
            else:
                t = (t + 0x108) << (seg - 1)
            out[byte] = t if (a & 0x80) else -t
    return out


def _g711_encode_bytes(samples, law: str):
    """int16 linear -> G.711 bytes by nearest-representable-level
    quantization against :func:`g711_decode_table` (ties to the lower
    level, deterministic) — correct by construction: decode(encode(x))
    is the closest companded level to x, and encode is the exact
    inverse of decode on representable values."""
    import numpy as np

    table = g711_decode_table(law)
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int32)
    x = np.asarray(samples, dtype=np.int32).ravel()
    idx = np.searchsorted(levels, x)
    idx = np.clip(idx, 1, len(levels) - 1)
    lo, hi = levels[idx - 1], levels[idx]
    pick = np.where((x - lo) <= (hi - x), idx - 1, idx)
    return order[pick].astype(np.uint8)


def wav_encode_g711(samples, sample_rate: int, *, law: str) -> bytes:
    """G.711 WAV encoder (format tag 6 = a-law, 7 = mu-law) from an
    int16-range array of shape (n_frames, n_channels) — the round-trip
    partner pinning the G.711 branch of :func:`wav_decode_samples`."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr[:, None]
    tag = 6 if law == "alaw" else 7
    body = _g711_encode_bytes(arr, law).tobytes()
    return _wav_container(tag, sample_rate, arr.shape[1], 8, body)


def _ima_step(pred: int, index: int, code: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: (predictor, step index) after
    consuming one 4-bit code. Shared verbatim by decoder and encoder —
    the encoder MUST track the decoder's reconstruction or the error
    feedback loop diverges."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[code & 7]))
    return pred, index


def _ima_adpcm_decode(data: bytes, n_channels: int, block_align: int):
    """IMA ADPCM 'data' chunk -> int32 (n_frames, n_channels). Block
    layout per the WAV spec: per channel a 4-byte header (int16 seed
    predictor, uint8 step index, pad), then the 4-bit codes in 4-byte
    per-channel groups, low nibble first. The nibble loop is scalar
    Python — ADPCM is a per-sample feedback recurrence with no closed
    form, so there is nothing to vectorize without a native codec;
    inside ``mapInPandas`` the parallel axis is rows (payloads), not
    samples, so the scalar loop bounds one payload, not the corpus."""
    import struct

    import numpy as np

    header = 4 * n_channels
    if block_align <= header or (block_align - header) % (4 * n_channels):
        raise ValueError("WAV: bad IMA ADPCM block align")
    chans: list[list[int]] = [[] for _ in range(n_channels)]
    for base in range(0, len(data) - header + 1, block_align):
        block = data[base : base + block_align]
        pred, idx = [], []
        for c in range(n_channels):
            pred.append(struct.unpack_from("<h", block, 4 * c)[0])
            idx.append(min(88, block[4 * c + 2]))
            chans[c].append(pred[c])
        for group in range(header, len(block) - 4 * n_channels + 1,
                           4 * n_channels):
            for c in range(n_channels):
                for byte in block[group + 4 * c : group + 4 * c + 4]:
                    for code in (byte & 0xF, byte >> 4):
                        pred[c], idx[c] = _ima_step(pred[c], idx[c], code)
                        chans[c].append(pred[c])
    n = min(len(ch) for ch in chans) if chans else 0
    out = np.empty((n, n_channels), dtype=np.int32)
    for c in range(n_channels):
        out[:, c] = chans[c][:n]
    return out


def wav_encode_ima_adpcm(samples, sample_rate: int) -> bytes:
    """IMA ADPCM WAV encoder (format tag 17; round-trip partner for the
    ADPCM branch of :func:`wav_decode_samples`). ``samples`` is an
    int16-range array of shape (n_frames, n_channels). Standard greedy
    quantizer: each code is chosen bit-by-bit against the current step,
    then the ENCODER state advances through the decoder's own
    transition (:func:`_ima_step`) so quantization error feeds back
    instead of accumulating. Lossy by construction — tests assert
    bounded reconstruction error, not bit equality."""
    import struct

    import numpy as np

    arr = np.ascontiguousarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    block_align = 256 * n_channels
    samples_per_block = (block_align - 4 * n_channels) * 2 // n_channels + 1
    out = bytearray()
    # warm-start the step index per channel: a cold index of 0 (step 7)
    # takes dozens of samples to climb to a fast signal's slope, putting
    # a large attack transient at the head of the stream; seed with the
    # smallest step >= the mean absolute first-difference instead (the
    # header stores the index, so decoders follow automatically)
    import bisect

    idx = []
    for c in range(n_channels):
        est = (
            float(np.abs(np.diff(arr[: samples_per_block, c])).mean())
            if n_frames > 1
            else 0.0
        )
        idx.append(min(88, bisect.bisect_left(_IMA_STEPS, est)))
    for start in range(0, n_frames, samples_per_block):
        chunk_arr = arr[start : start + samples_per_block]
        pred = [int(chunk_arr[0, c]) for c in range(n_channels)]
        for c in range(n_channels):
            out += struct.pack("<hBB", pred[c], idx[c], 0)
        nib_count = samples_per_block - 1
        codes: list[list[int]] = [[] for _ in range(n_channels)]
        for c in range(n_channels):
            for s in range(1, len(chunk_arr)):
                target = int(chunk_arr[s, c])
                step = _IMA_STEPS[idx[c]]
                diff = target - pred[c]
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                codes[c].append(code)
                pred[c], idx[c] = _ima_step(pred[c], idx[c], code)
            codes[c] += [0] * (nib_count - len(codes[c]))  # pad last block
        for group in range(0, nib_count, 8):
            for c in range(n_channels):
                for k in range(group, group + 8, 2):
                    out.append(codes[c][k] | (codes[c][k + 1] << 4))
    # _wav_container derives block_align from bits//8 — meaningless for
    # a 4-bit block codec, so build the fmt chunk directly: block-based
    # block_align plus the cbSize=2 samples-per-block extension the
    # ADPCM fmt spec requires
    byte_rate = sample_rate * block_align // samples_per_block
    fmt_body = struct.pack(
        "<HHIIHHHH", 17, n_channels, sample_rate, byte_rate,
        block_align, 4, 2, samples_per_block,
    )

    body = b"WAVE" + _riff_chunk(b"fmt ", fmt_body) + _riff_chunk(b"data", bytes(out))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_float32(samples, sample_rate: int) -> bytes:
    """IEEE float32 WAV encoder (format tag 3; round-trip partner for
    the float branch of :func:`wav_decode_samples`). ``samples`` is a
    float array of shape (n_frames, n_channels), nominally [-1, 1]."""
    import numpy as np

    arr = np.ascontiguousarray(samples, dtype="<f4")
    if arr.ndim == 1:
        arr = arr[:, None]
    return _wav_container(3, sample_rate, arr.shape[1], 32, arr.tobytes())


def _decode_audio_wav(payload: bytes) -> dict:
    """WAV decode: RIFF/WAVE structural walk (rate/channels/frames from
    the fmt and data chunks) plus CONTENT-dependent amplitude features
    for integer-PCM payloads — peak (max |sample|) and RMS (integer
    isqrt of the mean square: exact arithmetic, engine-portable) for
    8/16/24-bit integer PCM, float32, and IMA ADPCM payloads (each in
    classic or WAVE_FORMAT_EXTENSIBLE containers). A structurally-valid
    WAV in a remaining unsupported encoding (e.g. a compressed codec)
    still gets the header features with null amplitudes. ``n_frames`` comes from the decoded sample count
    when decode succeeds (for ADPCM the header-derived
    ``len(data)//block_align`` would be the BLOCK count); the header
    estimate is kept only on the header-only path."""
    import math

    b = bytes(payload or b"")
    fmt, data = _wav_chunks(b)
    _, n_channels, sample_rate, _, block_align, _ = fmt
    if n_channels == 0 or sample_rate == 0 or block_align == 0:
        raise ValueError("WAV: zero channels/rate/block align")
    feats = {
        "n_bytes": len(b),
        "feature_kind": "wav",
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": len(data) // block_align,
    }
    try:
        arr = wav_decode_samples(b)
    except ValueError:
        return feats  # header-only for unsupported encodings
    feats["n_frames"] = int(arr.shape[0])
    if arr.size:
        sq_sum = int((arr.astype("int64") ** 2).sum())
        feats["peak_amp"] = int(abs(arr).max())
        feats["rms_amp"] = math.isqrt(sq_sum // arr.size)
    else:
        feats["peak_amp"] = 0
        feats["rms_amp"] = 0
    return feats


def _dib_stride(width: int) -> int:
    """Bytes per DIB row: 3 bytes/pixel padded up to a 4-byte boundary
    (the BITMAPINFOHEADER convention every BI_RGB consumer shares)."""
    return (width * 3 + 3) & ~3


def avi_encode_frames(frames, fps: int = 25) -> bytes:
    """Uncompressed RIFF AVI encoder — the round-trip partner that pins
    :func:`avi_decode_frames`. ``frames`` is a uint8 array of shape
    (n_frames, height, width, 3) in RGB; the container is the classic
    'vids'/'DIB ' stream: BI_RGB 24-bit frames as '00db' chunks in the
    'movi' LIST, rows bottom-up in BGR with 4-byte stride padding, per
    the public RIFF / MainAVIHeader / BITMAPINFOHEADER layouts."""
    import struct

    import numpy as np

    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w, _ = arr.shape
    stride = _dib_stride(w)
    frame_bytes = []
    for f in arr:
        rows = f[::-1, :, ::-1]  # bottom-up, RGB -> BGR
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, : w * 3] = rows.reshape(h, w * 3)
        frame_bytes.append(body.tobytes())

    def lst(ltype: bytes, body: bytes) -> bytes:
        return _riff_chunk(b"LIST", ltype + body)

    size_image = stride * h
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # microseconds per frame
        size_image * fps,          # max bytes/sec
        0,                          # padding granularity
        0,                          # flags: no idx1 written, so no AVIF_HASINDEX claim
        n, 0, 1, size_image, w, h,
        0, 0, 0, 0,                # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, max(fps, 1), 0, n, size_image, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        _riff_chunk(b"avih", avih) + lst(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(_riff_chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_walk(b: bytes):
    """(avih tuple, strf tuple, ['00db'/'00dc' frame bodies]) from a
    RIFF AVI byte string; raises ValueError on structural problems."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI")
    avih = strf = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal avih, strf
        pos = lo
        while pos + 8 <= hi:
            cid = b[pos : pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            body_lo = pos + 8
            body_hi = min(body_lo + size, hi)
            if cid == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list type fourcc
            elif cid == b"avih":
                if body_lo + 40 > len(b):  # truncated header chunk:
                    raise ValueError("AVI: truncated avih chunk")
                avih = struct.unpack("<IIIIIIIIII", b[body_lo : body_lo + 40])
            elif cid == b"strf":
                if body_lo + 24 > len(b):
                    raise ValueError("AVI: truncated strf chunk")
                strf = struct.unpack("<IiiHHII", b[body_lo : body_lo + 24])
            elif cid[2:] in (b"db", b"dc"):
                frames.append(b[body_lo:body_hi])
            pos = body_hi + (size % 2)  # RIFF chunks pad to even

    walk(12, min(12 + struct.unpack("<I", b[4:8])[0], len(b)) if len(b) >= 8 else len(b))
    if avih is None or strf is None:
        raise ValueError("AVI: missing avih/strf header")
    return avih, strf, frames


def avi_decode_frames(payload: bytes):
    """Full frame-level decode of an uncompressed 24-bit BI_RGB AVI:
    returns a uint8 ndarray of shape (n_frames, height, width, 3) in
    RGB (undoing the BGR padded-stride DIB layout; a positive
    BITMAPINFOHEADER height means bottom-up rows — the common case —
    and a negative height means the rows are stored top-down already,
    so only the positive form vertically flips). Raises ValueError for
    compressed fourccs / other bit depths — callers keep the header
    features (the WAV unsupported-encoding path)."""
    import numpy as np

    b = bytes(payload or b"")
    _avih, strf, frames = _avi_walk(b)
    _, w, h_signed, _planes, bitcount, compression, _ = strf
    if bitcount != 24 or compression != 0:
        raise ValueError("AVI: only uncompressed 24-bit BI_RGB decoded")
    h = abs(h_signed)
    stride = _dib_stride(w)
    out = np.zeros((len(frames), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames):
        if len(fb) < stride * h:
            raise ValueError("AVI: truncated frame")
        rows = np.frombuffer(fb[: stride * h], dtype=np.uint8).reshape(h, stride)
        px = rows[:, : w * 3].reshape(h, w, 3)
        if h_signed > 0:
            px = px[::-1]  # bottom-up -> top-down
        out[i] = px[:, :, ::-1]  # BGR -> RGB
    return out


def _decode_video_avi(payload: bytes) -> dict:
    """AVI decode: structural walk (dimensions/frame count from the
    avih header) plus CONTENT-dependent luma features when the stream
    is uncompressed 24-bit BI_RGB — peak (max ITU-R BT.601 integer
    luma: (299 R + 587 G + 114 B) // 1000) and RMS (integer isqrt of
    the mean squared luma; exact arithmetic, engine-portable) over
    every pixel of every frame. Compressed fourccs keep the header
    features with null amplitudes — the WAV precedent."""
    import math

    b = bytes(payload or b"")
    avih, strf, _frames = _avi_walk(b)
    feats = {
        "n_bytes": len(b),
        "feature_kind": "avi",
        "width": strf[1],
        "height": abs(strf[2]),
        "n_frames": avih[4],
    }
    try:
        arr = avi_decode_frames(b)
    except ValueError:
        return feats  # header-only for compressed streams
    feats["n_frames"] = int(arr.shape[0])
    if arr.size:
        r = arr[..., 0].astype("int64")
        g = arr[..., 1].astype("int64")
        bl = arr[..., 2].astype("int64")
        luma = (299 * r + 587 * g + 114 * bl) // 1000
        feats["peak_amp"] = int(luma.max())
        feats["rms_amp"] = math.isqrt(int((luma**2).sum()) // luma.size)
    else:
        feats["peak_amp"] = 0
        feats["rms_amp"] = 0
    return feats


def _fake_deterministic_decode(payload: bytes) -> dict:
    """Deterministic fake decoder for tests: derives 'features' from bytes."""
    return {"n_bytes": len(payload or b""), "feature_kind": "fake"}


def _sniff_decode(payload: bytes) -> dict:
    """Magic-byte dispatch for MIXED media columns — a real corpus's
    binary column carries PNGs next to WAVs next to AVIs with no
    per-row decoder label, so ``extract_features(decoder='auto')``
    routes each payload by its container signature (PNG 8-byte magic;
    RIFF + WAVE / 'AVI ' form type). Unrecognized payloads get the
    metadata-only fake features, and a payload whose magic matches but
    whose body fails to decode (truncated, malformed) degrades to the
    same metadata with ``feature_kind='corrupt'`` — at corpus scale a
    poison blob must quarantine, not kill the stage, in both forms.
    ``struct.error`` is caught alongside ``ValueError`` as a backstop:
    the decoders length-check before unpacking, but a missed slice on a
    truncated container must still quarantine, never kill the stage."""
    import struct

    b = bytes(payload or b"")
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_image_png(b)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _decode_audio_wav(b)
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            return _decode_video_avi(b)
    except (ValueError, struct.error):
        return {"n_bytes": len(b), "feature_kind": "corrupt"}
    return _fake_deterministic_decode(b)


DECODERS: dict[str, Callable[[bytes], Any]] = {
    "image": _decode_image_png,
    "audio": _decode_audio_wav,
    "video": _decode_video_avi,
    "auto": _sniff_decode,
    "fake": _fake_deterministic_decode,
}

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


#: Adam7 interlace pass grid: (x_start, y_start, x_step, y_step) per
#: the PNG spec's fixed 8x8 pattern.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, h: int, w: int, ch: int, sample_bytes: int = 1):
    """Scanline unfilter (filters 0-4 incl. Paeth) for one filtered
    (sub-)image region of ``h`` rows x ``w`` pixels x ``ch`` channels
    of ``sample_bytes``-wide samples — the shared core under both the
    sequential and each Adam7 pass decode. PNG filters operate on
    BYTES with the left neighbor ``bpp = ch * sample_bytes`` bytes
    back, which is why one byte-level core serves 8- and 16-bit
    depths. Unfiltering is inherently sequential across scanlines
    (each row's reconstruction feeds the next row's predictors), so
    rows loop in Python with numpy vector ops within the row — fine
    inside ``mapInPandas`` where the parallelism axis is
    rows-of-the-DataFrame, not pixels."""
    import numpy as np

    bpp = ch * sample_bytes
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: filtered data does not match dimensions")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, cur = int(filters[y]), rows[y].copy()
        if f == 0:
            line = cur
        elif f == 2:  # Up: previous row only — whole-row vector add
            line = (cur + prev) & 0xFF
        else:  # Sub/Average/Paeth need the left neighbor: walk in
            # bpp-sized steps, vectorized over the step's channels
            line = cur
            for x in range(0, stride, bpp):
                a = line[x - bpp : x] if x else np.zeros(bpp, dtype=np.int32)
                bb = prev[x : x + bpp]
                if f == 1:
                    line[x : x + bpp] = (line[x : x + bpp] + a) & 0xFF
                elif f == 3:
                    line[x : x + bpp] = (line[x : x + bpp] + (a + bb) // 2) & 0xFF
                elif f == 4:
                    c = prev[x - bpp : x] if x else np.zeros(bpp, dtype=np.int32)
                    p = a + bb - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - bb), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, bb, c)
                    )
                    line[x : x + bpp] = (line[x : x + bpp] + pred) & 0xFF
                else:
                    raise ValueError(f"PNG: bad filter byte {f}")
        recon[y] = line
        prev = recon[y]
    return recon.astype(np.uint8)


def png_decode_pixels(payload: bytes):
    """Full pixel-level PNG decode, stdlib+numpy only: IDAT zlib inflate
    plus scanline unfiltering (filters 0-4 incl. Paeth) for 8- and
    16-bit images in all four common color types (gray, RGB,
    gray+alpha, RGBA) plus 8-bit indexed color (PLTE, optional tRNS
    alpha), sequential OR Adam7-interlaced (each of the 7 passes is its
    own filtered sub-image, unfiltered independently and scattered
    back onto the full-resolution grid per the spec's fixed 8x8
    pattern). Returns a uint8 ndarray of shape (h, w, channels)."""
    import struct
    import zlib

    import numpy as np

    meta = _decode_image_png(payload)  # signature/IHDR/CRC validation
    paletted = meta["color_type"] == 3
    if meta["bit_depth"] not in ((8,) if paletted else (8, 16)):
        raise ValueError(f"PNG: unsupported bit depth {meta['bit_depth']}")
    if not paletted and meta["color_type"] not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unsupported color type {meta['color_type']}")
    b = bytes(payload)
    interlace = b[28]
    if interlace not in (0, 1):
        raise ValueError(f"PNG: bad interlace method {interlace}")
    w, h = meta["width"], meta["height"]
    ch = 1 if paletted else _PNG_CHANNELS[meta["color_type"]]
    sb = meta["bit_depth"] // 8  # bytes per sample (big-endian at 16)

    idat = bytearray()
    plte = trns = None
    pos = 33  # first chunk after IHDR
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        cid = b[pos + 4 : pos + 8]
        if cid == b"IDAT":
            idat += b[pos + 8 : pos + 8 + length]
        elif cid == b"PLTE":
            plte = b[pos + 8 : pos + 8 + length]
        elif cid == b"tRNS":
            trns = b[pos + 8 : pos + 8 + length]
        if cid == b"IEND":
            break
        pos += 12 + length  # len + id + body + crc
    raw = zlib.decompress(bytes(idat))

    def to_samples(flat, rows, cols):
        px = flat.reshape(rows, cols, ch, sb)
        if sb == 1:
            return px[..., 0]
        # 16-bit samples are big-endian per the PNG spec
        return (px[..., 0].astype(np.uint16) << 8) | px[..., 1]

    if interlace == 0:
        out = to_samples(_png_unfilter(raw, h, w, ch, sb), h, w)
    else:
        out = np.zeros((h, w, ch), dtype=np.uint8 if sb == 1 else np.uint16)
        at = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # pass is empty at this image size: zero bytes
            size = ph * (pw * ch * sb + 1)
            sub = _png_unfilter(raw[at : at + size], ph, pw, ch, sb)
            at += size
            out[y0::dy, x0::dx] = to_samples(sub, ph, pw)
        if at != len(raw):
            raise ValueError("PNG: interlaced data does not match dimensions")
    if not paletted:
        return out
    # indexed-color expansion: PLTE holds up to 256 RGB triples; an
    # optional tRNS carries per-entry alpha (shorter than the palette =
    # remaining entries opaque), upgrading the output to RGBA
    if plte is None or len(plte) % 3:
        raise ValueError("PNG: paletted image missing/odd PLTE")
    palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = out.reshape(h, w)
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("PNG: palette index out of range")
    rgb = palette[idx]
    if trns is None:
        return rgb
    alpha_lut = np.full(len(palette), 255, dtype=np.uint8)
    alpha_lut[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
    return np.concatenate([rgb, alpha_lut[idx][:, :, None]], axis=2)


def png_encode_pixels(pixels, *, interlace: bool = False) -> bytes:
    """Minimal valid PNG encoder (filter 0 every scanline, one zlib
    IDAT) for a uint8 — or uint16, written as a 16-bit-depth file with
    big-endian samples — array of shape (h, w, channels): the
    re-encode half of the resize path, and the round-trip partner that
    pins :func:`png_decode_pixels` in tests. ``interlace=True`` writes the
    Adam7 layout (the 7 passes' sub-images concatenated, each scanline
    filter-0), the round-trip partner for the interlaced decode."""
    import struct
    import zlib

    import numpy as np

    pixels = np.asarray(pixels)
    depth16 = pixels.dtype == np.uint16
    arr = np.ascontiguousarray(
        pixels, dtype=np.dtype(">u2") if depth16 else np.uint8
    )
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(cid: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(cid + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", crc)

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 16 if depth16 else 8, color_type, 0, 0, int(interlace)
    )
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass contributes zero bytes
            parts += [b"\x00" + sub[y].tobytes() for y in range(sub.shape[0])]
        scanlines = b"".join(parts)
    else:
        scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def png_encode_paletted(indices, palette, trns=None) -> bytes:
    """Indexed-color PNG encoder (color type 3, filter 0, one IDAT) —
    the round-trip partner pinning the PLTE/tRNS expansion branch of
    :func:`png_decode_pixels`. ``indices`` is (h, w) uint8 into
    ``palette`` (n, 3) uint8; ``trns`` is an optional per-entry alpha
    list (shorter than the palette = remaining entries opaque)."""
    import struct
    import zlib

    import numpy as np

    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("indices must be (h, w), palette (n, 3)")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")
    h, w = idx.shape

    def chunk(cid: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(cid + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    scanlines = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += chunk(b"tRNS", bytes(bytearray(trns)))
    return out + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")


PIXEL_DECODERS: dict[str, Callable[[bytes], Any]] = {
    "image": png_decode_pixels,
}


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata pass that never leaves the JVM: size + digest per blob."""
    return df.select(
        "media_id",
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched decode via mapInPandas (one Python hop per batch)."""
    import pandas as pd  # local import: executor-side dependency
    import hashlib

    decode = DECODERS[decoder]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                feats = decode(payload)
                out.append(
                    {
                        "media_id": media_id,
                        "n_bytes": feats.get("n_bytes"),
                        "sha256": hashlib.sha256(payload or b"").hexdigest(),
                        "feature_kind": feats.get("feature_kind"),
                        "width": feats.get("width"),
                        "height": feats.get("height"),
                        "sample_rate": feats.get("sample_rate"),
                        "n_channels": feats.get("n_channels"),
                        "n_frames": feats.get("n_frames"),
                        "peak_amp": feats.get("peak_amp"),
                        "rms_amp": feats.get("rms_amp"),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, *, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Resize: one Arrow hop, 1 row in -> 1 row out.

    ``decoder='image'`` is a REAL resize for 8-bit PNGs: pixel decode
    (:func:`png_decode_pixels`), nearest-neighbor resample to
    (height, width) via numpy index maps, PNG re-encode — stdlib+numpy
    only, no imaging library. ``decoder='fake'`` keeps the deterministic
    byte truncation/padding so plumbing tests stay payload-agnostic.
    Either way the Spark side (schema, mapInPandas batching, binary
    transport) is identical.

    Poison payloads (truncated IDAT, bad filter byte, not a PNG) emit
    NO output row instead of failing the stage — the module's
    quarantine doctrine, same as :func:`sample_frames`'s undecodable-
    video skip (round-12 review: one malformed blob previously killed
    the whole job, losing every healthy row's resize).
    """
    import pandas as pd

    if decoder not in ("fake", *PIXEL_DECODERS):
        raise KeyError(decoder)

    target = width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct
        import zlib

        import numpy as np

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                if decoder == "fake":
                    resized = (raw * (target // max(len(raw), 1) + 1))[:target]
                else:
                    try:
                        px = PIXEL_DECODERS[decoder](raw)
                    except (ValueError, struct.error, zlib.error, IndexError):
                        continue  # quarantine, never kill the stage
                    h0, w0 = px.shape[:2]
                    ys = np.minimum((np.arange(height) * h0) // height, h0 - 1)
                    xs = np.minimum((np.arange(width) * w0) // width, w0 - 1)
                    resized = png_encode_pixels(px[ys][:, xs])
                out.append(
                    {
                        "media_id": media_id,
                        "payload": resized,
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, *, every_nth: int = 10, max_frames: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Frame-sampling: 1 video row in -> N frame rows out.

    Row-expanding mapInPandas (the shape a real video decoder needs:
    output rows != input rows). ``decoder='video'`` is a REAL sample
    for uncompressed 24-bit AVIs: :func:`avi_decode_frames` to pixels,
    then every ``every_nth``-th frame (capped at ``max_frames``)
    re-encoded as a standalone PNG via :func:`png_encode_pixels` — the
    standard "sample frames for a vision encoder" pre-processing step,
    stdlib+numpy only. ``decoder='fake'`` keeps the deterministic byte
    slices keyed by frame index (``n_frames`` metadata bounds the
    sample without touching payload bytes) so plumbing tests stay
    payload-agnostic. Either way the Spark side — schema, Arrow
    batching, row expansion — is identical.
    """
    import pandas as pd

    if decoder not in ("fake", "video"):
        raise KeyError(decoder)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for media_id, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                raw = bytes(payload or b"")
                if decoder == "video":
                    try:
                        frames = avi_decode_frames(raw)
                    except ValueError:
                        # undecodable row (compressed fourcc, truncated,
                        # not an AVI): emit no frames for it rather than
                        # failing the stage — one poison video must not
                        # lose every other row's frames
                        continue
                    picked = list(range(0, frames.shape[0], every_nth))[:max_frames]
                    for idx in picked:
                        out.append(
                            {
                                "media_id": media_id,
                                "frame_idx": idx,
                                "payload": png_encode_pixels(frames[idx]),
                            }
                        )
                    continue
                total = int(n_frames) if n_frames is not None and n_frames == n_frames else 0
                picked = list(range(0, total, every_nth))[:max_frames]
                for idx in picked:
                    lo = idx % max(len(raw), 1)
                    out.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "payload": raw[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select("media_id", "payload", "n_frames").mapInPandas(run, FRAME_SCHEMA)
