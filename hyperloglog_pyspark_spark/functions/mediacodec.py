"""Codec-free media containers: BMP and WAV synthesis + header decode in
pure Python (struct only — no PIL/ffmpeg, which this environment lacks).

These are the two mainstream container formats whose metadata lives in a
fixed uncompressed header, so a real decode path — magic-byte sniffing,
field extraction, integrity checks against the byte stream — is possible
without codec libraries. Compressed codecs (JPEG/MP4/FLAC) would slot in
behind the same ``decode_media`` dispatcher via PIL/ffmpeg in a real
deployment; see ``operators/multimodal.py``.

Layouts implemented (public file-format specifications):
- BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER (BI_RGB,
  24bpp), rows padded to 4 bytes.
- WAV: RIFF header + PCM ``fmt `` chunk (16 bytes) + ``data`` chunk.
- PNG: the one COMPRESSED mainstream format decodable with the stdlib
  alone — chunk stream (length/type/data/CRC32), IHDR field extraction,
  zlib-INFLATE of the IDAT stream, and scanline-length validation
  (RFC 2083; 8-bit truecolor, filter 0).
"""

from __future__ import annotations

import struct
import zlib

BMP_HEADER_LEN = 54  # 14 file header + 40 info header
WAV_HEADER_LEN = 44  # RIFF(12) + fmt(24) + data header(8)


def bmp_row_stride(width: int) -> int:
    """Bytes per pixel row: 3 bytes/px (24bpp) padded up to 4 bytes."""
    return (3 * width + 3) // 4 * 4


def synth_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A valid 24bpp uncompressed BMP with deterministic pixel bytes."""
    stride = bmp_row_stride(width)
    size = BMP_HEADER_LEN + stride * height
    file_header = struct.pack("<2sIHHI", b"BM", size, 0, 0, BMP_HEADER_LEN)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, stride * height, 2835, 2835, 0, 0,
    )
    pixels = bytes((seed + i) % 256 for i in range(stride * height))
    return file_header + info_header + pixels


def decode_bmp(payload: bytes) -> dict:
    """Parse + validate a BMP header; raises ValueError on a lying header."""
    if len(payload) < BMP_HEADER_LEN:
        raise ValueError("BMP truncated before header end")
    magic, size, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (bisize, width, height, planes, bpp, compression, img_size,
     _, _, _, _) = struct.unpack_from("<IiiHHIIiiII", payload, 14)
    if bisize != 40 or planes != 1 or compression != 0:
        raise ValueError("unsupported BMP variant")
    if size != len(payload):
        raise ValueError(f"BMP header size {size} != payload {len(payload)}")
    if offset + bmp_row_stride(width) * abs(height) > len(payload):
        raise ValueError("BMP pixel array exceeds payload")
    return {
        "media_type": "bmp",
        "width": width,
        "height": abs(height),  # negative height = top-down row order
        "bpp": bpp,
        "n_bytes": len(payload),
    }


def synth_wav(sample_rate: int, n_samples: int, channels: int = 1) -> bytes:
    """A valid 16-bit PCM WAV with deterministic sample bytes."""
    data_len = n_samples * channels * 2
    byte_rate = sample_rate * channels * 2
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_len, b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16,
        b"data", data_len,
    )
    samples = bytes(i % 256 for i in range(data_len))
    return header + samples


def decode_wav(payload: bytes) -> dict:
    """Parse + validate a PCM WAV header; raises ValueError on mismatch."""
    if len(payload) < WAV_HEADER_LEN:
        raise ValueError("WAV truncated before header end")
    (riff, riff_len, wave, fmt, fmt_len, audio_fmt, channels, sample_rate,
     _, _, bits, data, data_len) = struct.unpack_from("<4sI4s4sIHHIIHH4sI", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE" or fmt != b"fmt ":
        raise ValueError("not a RIFF/WAVE payload")
    if audio_fmt != 1 or fmt_len != 16:
        raise ValueError("unsupported WAV encoding (non-PCM)")
    if riff_len + 8 != len(payload) or data != b"data":
        raise ValueError("WAV chunk sizes disagree with payload")
    if WAV_HEADER_LEN + data_len > len(payload):
        raise ValueError("WAV data chunk exceeds payload")
    n_samples = data_len // (channels * 2)
    return {
        "media_type": "wav",
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "duration_ms": n_samples * 1000 // sample_rate,
        "n_bytes": len(payload),
    }


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    """One PNG chunk: length, type, data, CRC32 over type+data."""
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def synth_png(width: int, height: int, seed: int = 0) -> bytes:
    """A valid 8-bit truecolor PNG (color type 2, filter 0 scanlines,
    no interlace) with deterministic pixel bytes, DEFLATE-compressed."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # per-scanline filter byte: None
        raw.extend((seed + y * 31 + x) % 256 for x in range(3 * width))
    idat = zlib.compress(bytes(raw), 6)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Parse + validate a PNG: signature, per-chunk CRC32, IHDR fields,
    zlib-inflate of the concatenated IDAT stream, and the scanline-length
    identity height*(1 + 3*width) for 8-bit truecolor, plus RFC 2083
    structural ordering: IHDR must be the first and only header chunk,
    nothing may follow IEND, and every scanline filter byte must be a
    defined method (0-4). Raises ValueError on any corruption — a flipped
    bit anywhere surfaces as a CRC or inflate failure, which is the
    integrity property a media lakehouse audits on ingest."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, saw_iend = 8, None, bytearray(), False
    while pos < len(payload):
        if saw_iend:  # RFC 2083 §3.2: IEND must be the final chunk
            raise ValueError("PNG chunk after IEND")
        if pos + 8 > len(payload):
            raise ValueError("PNG truncated mid chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("PNG chunk exceeds payload")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            if ihdr is not None:
                raise ValueError("PNG duplicate IHDR")
            if pos != 8:  # RFC 2083 §3.1: IHDR must appear first
                raise ValueError("PNG IHDR not first chunk")
            if length != 13:  # CRC-consistent but malformed header chunk
                raise ValueError("PNG IHDR length != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            saw_iend = True
        if ihdr is None:  # any chunk before IHDR (including unknown types)
            raise ValueError("PNG chunk precedes IHDR")
        pos += 12 + length
    if ihdr is None or not saw_iend or pos != len(payload):
        raise ValueError("PNG chunk stream malformed")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or color_type != 2 or comp != 0 or interlace != 0:
        raise ValueError("unsupported PNG variant")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # CRC-consistent chunks, non-zlib stream
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != height * (1 + 3 * width):
        raise ValueError("PNG inflated size disagrees with IHDR dims")
    stride = 1 + 3 * width
    # every row's first byte is its filter method; 0-4 are the spec's set
    if raw and max(raw[0::stride]) > 4:
        raise ValueError("PNG scanline filter byte out of range")
    return {
        "media_type": "png",
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "raw_len": len(raw),
        "n_bytes": len(payload),
    }


def decode_media(payload: bytes) -> dict:
    """Dispatch on magic bytes — the real decode entry point.

    Uncompressed containers (BMP, WAV) and zlib-compressed PNG decode
    here in pure Python; other compressed codecs (JPEG/MP4) raise, since
    this environment has no codec libraries — a deployment would route
    those to PIL/ffmpeg through this same dispatcher.
    """
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    raise ValueError("unsupported container (JPEG/MP4 codecs need PIL/ffmpeg)")
