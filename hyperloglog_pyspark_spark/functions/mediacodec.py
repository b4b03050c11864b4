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
- PNG: a COMPRESSED mainstream format decodable with the stdlib
  alone — chunk stream (length/type/data/CRC32), IHDR field extraction,
  zlib-INFLATE of the IDAT stream, and scanline-length validation
  (RFC 2083; 8-bit truecolor, filter 0).
- GIF: the second compressed format, with a HAND-WRITTEN entropy coder —
  variable-code-width LSB-first LZW (GIF89a Appendix F), logical screen
  descriptor + global color table + extension blocks + image descriptors,
  sub-block framing, and trailer-is-last validation.
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
    pixels = bytes((seed + i) % 256 for i in range(stride * height))
    return bmp_headers(width, height) + pixels


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


def wav_headers(sample_rate: int, n_samples: int, channels: int = 1) -> bytes:
    """The 44-byte RIFF/fmt/data header triple for 16-bit PCM — the
    single copy of the '<4sI4s4sIHHIIHH4sI' layout shared by
    ``synth_wav`` and ``synth_wav_pcm`` (validated by ``decode_wav``)."""
    data_len = n_samples * channels * 2
    byte_rate = sample_rate * channels * 2
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_len, b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16,
        b"data", data_len,
    )


def synth_wav(sample_rate: int, n_samples: int, channels: int = 1) -> bytes:
    """A valid 16-bit PCM WAV with deterministic sample bytes."""
    data_len = n_samples * channels * 2
    samples = bytes(i % 256 for i in range(data_len))
    return wav_headers(sample_rate, n_samples, channels) + samples


def synth_wav_pcm(sample_rate: int, samples: list[int]) -> bytes:
    """A valid mono 16-bit PCM WAV carrying exactly ``samples``
    (signed 16-bit values)."""
    return wav_headers(sample_rate, len(samples)) + struct.pack(
        f"<{len(samples)}h", *samples
    )


def wav_pcm_samples(payload: bytes) -> list[int]:
    """REAL sample decode: validate the container via ``decode_wav``,
    then extract the mono 16-bit PCM samples from the data chunk —
    sized by the validated header's data_len, NOT the payload tail
    (decode_wav accepts data_len <= remaining bytes; trailing non-audio
    bytes must never decode as samples)."""
    meta = decode_wav(payload)
    if meta["channels"] != 1 or meta["bits"] != 16:
        raise ValueError("wav_pcm_samples expects mono 16-bit PCM")
    data_len = struct.unpack_from("<I", payload, 40)[0]
    if data_len % 2 != 0:
        # an odd data chunk cannot hold whole 16-bit samples; silently
        # dropping the trailing byte would break the validate-then-decode
        # contract (r9 advice)
        raise ValueError(f"WAV data chunk length {data_len} is odd for 16-bit PCM")
    return list(struct.unpack_from(f"<{data_len // 2}h", payload, WAV_HEADER_LEN))


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


GIF_MAGICS = (b"GIF87a", b"GIF89a")
_LZW_MAX = 4096  # 12-bit code space cap (GIF89a Appendix F)


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    LSB-first bit packing, leading CLEAR code, trailing EOI. The width
    bump fires when the pre-add code count reaches 2**code_size — the
    GIFCOMPR.C convention (check in output() sees free_ent before the
    current step's table add), which is what stock decoders expect. At
    4096 codes the table freezes (deferred clear: no reset emitted)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("GIF LZW min code size out of range")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    bitbuf = bitlen = 0
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1

    def put(code: int) -> None:
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += code_size
        while bitlen >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    def emit(code: int) -> None:
        # width check AFTER the emit, BEFORE this step's add — keeps the
        # encoder's code_size in lockstep with the decoder, which bumps
        # after adding its (one-step-lagged) table entry.
        nonlocal code_size
        put(code)
        if next_code >= (1 << code_size) and code_size < 12:
            code_size += 1

    put(clear)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < _LZW_MAX:
            table[wc] = next_code
            next_code += 1
        w = bytes([b])
    if w:
        emit(table[w])
    put(eoi)
    if bitlen:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, max_len: int) -> bytes:
    """Inverse of ``lzw_encode``; validates the stream hard: rejects a
    first-after-clear code that isn't a literal, any code beyond the
    current table, output longer than ``max_len`` (the pixel count the
    image descriptor promised), and a stream that ends without EOI."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("GIF LZW min code size out of range")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]  # clear/eoi slots
    table = list(base)
    code_size = min_code_size + 1
    next_code = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    bitbuf = bitlen = pos = 0
    while True:
        while bitlen < code_size:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended before EOI")
            bitbuf |= data[pos] << bitlen
            pos += 1
            bitlen += 8
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bitlen -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            # After EOI only byte-alignment padding may remain. THIS
            # framework's encoder (tests/ fixtures) never emits a whole
            # unconsumed byte there, so for the self-encoded corpus any
            # such byte is trailing garbage — rejecting it keeps a
            # flipped bit from hiding inside the image-data sub-blocks
            # (the trailer/after-IEND legs of the ingest audit check
            # the other container positions). The GIF spec itself does
            # NOT forbid post-EOI padding inside sub-blocks and some
            # foreign encoders emit zero-byte padding; if foreign GIFs
            # are ever ingested, relax this to tolerate trailing zero
            # bytes while still rejecting nonzero residue.
            if pos < len(data):
                raise ValueError("GIF LZW data continues after EOI")
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW first code not a literal")
            entry = table[code]
        else:
            if code < next_code:
                entry = table[code]
            elif code == next_code and next_code < _LZW_MAX:
                entry = prev + prev[:1]  # the KwKwK self-reference case
            else:
                raise ValueError("GIF LZW code out of range")
            if next_code < _LZW_MAX:
                table.append(prev + entry[:1])
                next_code += 1
            if next_code >= (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        if len(out) > max_len:
            raise ValueError("GIF pixel data exceeds image dimensions")
        prev = entry


def synth_gif(width: int, height: int, seed: int = 0) -> bytes:
    """A valid single-frame GIF89a: logical screen descriptor, 256-entry
    global color table, graphic control extension, one image descriptor,
    LZW-compressed deterministic pixel indices in ≤255-byte sub-blocks,
    trailer. Same pixel formula as ``synth_png`` for cross-format tests."""
    lsd = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 2^8 colors
    gct = bytes((seed + i) % 256 for i in range(768))
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # no transparency, 0 delay
    imgdesc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    pixels = bytes(
        (seed + y * 31 + x) % 256 for y in range(height) for x in range(width)
    )
    lzw = lzw_encode(pixels, 8)
    blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return b"GIF89a" + lsd + gct + gce + imgdesc + b"\x08" + blocks + b"\x00\x3b"


def decode_gif(payload: bytes) -> dict:
    """Parse + validate a GIF: magic, logical screen descriptor, color
    tables, block walk (extensions only in 89a, sub-block framing, image
    descriptors inside screen bounds), full LZW decode of every frame with
    the pixel-count identity width*height, palette-bounds check on every
    pixel index, and trailer-must-be-last. Raises ValueError on any
    corruption — the ingest-audit contract shared with ``decode_png``."""
    version = payload[:6]
    if version not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    screen_w, screen_h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    n_colors = 0
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        pos += 3 * n_colors
        if pos > len(payload):
            raise ValueError("GIF global color table exceeds payload")

    def sub_blocks(p: int) -> tuple[bytes, int]:
        buf = bytearray()
        while True:
            if p >= len(payload):
                raise ValueError("GIF sub-blocks missing terminator")
            n = payload[p]
            p += 1
            if n == 0:
                return bytes(buf), p
            if p + n > len(payload):
                raise ValueError("GIF sub-block exceeds payload")
            buf.extend(payload[p : p + n])
            p += n

    n_frames = pixel_count = 0
    saw_trailer = False
    while pos < len(payload):
        intro = payload[pos]
        pos += 1
        if intro == 0x3B:  # trailer — must be the final byte
            saw_trailer = True
            if pos != len(payload):
                raise ValueError("GIF data after trailer")
            break
        if intro == 0x21:  # extension block
            if version == b"GIF87a":
                raise ValueError("GIF87a stream contains an extension block")
            if pos >= len(payload):
                raise ValueError("GIF truncated in extension header")
            pos += 1  # label byte; payload is opaque sub-blocks
            _, pos = sub_blocks(pos)
            continue
        if intro != 0x2C:
            raise ValueError(f"GIF unknown block introducer 0x{intro:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF truncated in image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > screen_w or top + h > screen_h:
            raise ValueError("GIF frame outside logical screen")
        palette = n_colors
        if ipacked & 0x80:  # local color table overrides for this frame
            palette = 2 << (ipacked & 0x07)
            pos += 3 * palette
            if pos > len(payload):
                raise ValueError("GIF local color table exceeds payload")
        if palette == 0:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("GIF truncated before LZW code size")
        min_code_size = payload[pos]
        pos += 1
        lzw, pos = sub_blocks(pos)
        pixels = lzw_decode(lzw, min_code_size, w * h)
        if len(pixels) != w * h:
            raise ValueError("GIF pixel data disagrees with image descriptor")
        if pixels and max(pixels) >= palette:
            raise ValueError("GIF pixel index outside color table")
        n_frames += 1
        pixel_count += w * h
    if not saw_trailer:
        raise ValueError("GIF missing trailer")
    if n_frames == 0:
        raise ValueError("GIF contains no image data")
    return {
        "media_type": "gif",
        "width": screen_w,
        "height": screen_h,
        "n_frames": n_frames,
        "n_colors": n_colors,
        "pixel_count": pixel_count,
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
    if payload[:6] in GIF_MAGICS:
        return decode_gif(payload)
    raise ValueError("unsupported container (JPEG/MP4 codecs need PIL/ffmpeg)")


def bmp_headers(width: int, height: int) -> bytes:
    """The 54-byte BMP file+info header pair for a 24bpp bottom-up image
    — the single copy of the '<2sIHHI'/'<IiiHHIIiiII' layout shared by
    ``synth_bmp`` and ``synth_bmp_gray`` (and validated by
    ``decode_bmp``)."""
    stride = bmp_row_stride(width)
    size = BMP_HEADER_LEN + stride * height
    file_header = struct.pack("<2sIHHI", b"BM", size, 0, 0, BMP_HEADER_LEN)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, stride * height, 2835, 2835, 0, 0,
    )
    return file_header + info_header


def synth_bmp_gray(grid: list[list[int]]) -> bytes:
    """A valid 24bpp BMP whose pixels are the gray levels in ``grid``
    (``grid[0]`` is the TOP row; BMP stores rows bottom-up, positive
    height). Each gray level v becomes the BGR triple (v, v, v)."""
    height, width = len(grid), len(grid[0])
    stride = bmp_row_stride(width)
    rows = []
    for r in range(height - 1, -1, -1):
        row = bytearray()
        for v in grid[r]:
            row += bytes((v, v, v))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    return bmp_headers(width, height) + b"".join(rows)


def bmp_gray_grid(payload: bytes) -> list[list[float]]:
    """REAL pixel decode: validate the container via ``decode_bmp``, then
    extract the pixel array as a top-down grayscale grid (mean of the
    B, G, R channels per pixel).

    Honors the two legal header variants ``decode_bmp`` accepts that a
    naive reader silently misdecodes: a NEGATIVE info-header height
    means top-down row order (no flip), and the file header's
    pixel-array offset may exceed 54 (palette/gap bytes before the
    pixels)."""
    meta = decode_bmp(payload)
    if meta["bpp"] != 24:
        raise ValueError(f"bmp_gray_grid expects 24bpp, got {meta['bpp']}")
    w, h = meta["width"], meta["height"]
    # re-read the fields decode_bmp normalizes away: the pixel-array
    # offset and the height SIGN (negative = top-down row order)
    (_, _, _, _, pix_offset) = struct.unpack_from("<2sIHHI", payload, 0)
    raw_height = struct.unpack_from("<i", payload, 22)[0]
    top_down = raw_height < 0
    stride = bmp_row_stride(w)
    grid: list[list[float]] = []
    for r in range(h):
        src_row = r if top_down else h - 1 - r
        off = pix_offset + src_row * stride
        row = payload[off : off + 3 * w]
        grid.append(
            [(row[3 * c] + row[3 * c + 1] + row[3 * c + 2]) / 3.0 for c in range(w)]
        )
    return grid


def dhash_bands(gray: list[list[float]]) -> tuple[int, int, int, int]:
    """64-bit perceptual difference hash (dHash) of a grayscale grid,
    returned as four 16-bit band integers (the LSH bucket keys).

    Classic dHash: average-pool the image to 8 rows x 9 columns (block
    means over index buckets), then bit(r, c) = pooled[r][c+1] >
    pooled[r][c] for c in 0..7 — 64 gradient-sign bits, invariant to
    uniform brightness/contrast shifts. Band b packs bits
    [16b, 16b+16) LSB-first: band_b = sum(bit_i << (i - 16b)) with
    i = 8*r + c."""
    h, w = len(gray), len(gray[0])
    if h < 8 or w < 9:
        raise ValueError(f"dhash needs >= 9x8 pixels, got {w}x{h}")
    row_edges = [r * h // 8 for r in range(9)]
    col_edges = [c * w // 9 for c in range(10)]
    pooled = [
        [
            sum(
                gray[rr][cc]
                for rr in range(row_edges[r], row_edges[r + 1])
                for cc in range(col_edges[c], col_edges[c + 1])
            )
            / ((row_edges[r + 1] - row_edges[r]) * (col_edges[c + 1] - col_edges[c]))
            for c in range(9)
        ]
        for r in range(8)
    ]
    bands = [0, 0, 0, 0]
    for r in range(8):
        for c in range(8):
            i = 8 * r + c
            if pooled[r][c + 1] > pooled[r][c]:
                bands[i // 16] |= 1 << (i % 16)
    return tuple(bands)


def energy_delta_bands(samples: list[int], frame: int) -> tuple[int, int, int, int]:
    """64-bit perceptual audio fingerprint as four 16-bit band integers
    (the LSH bucket keys) — the audio twin of ``dhash_bands``.

    Chromaprint-style energy-delta hash, integer-exact: partition the
    PCM stream's PREFIX into consecutive ``frame``-sample frames,
    compute each frame's energy E_f = sum(s^2) (exact int — no float
    RMS), then bit f = E_{f+1} > E_f for f in 0..63 — 64
    loudness-gradient signs, invariant to uniform gain scaling and
    phase/sign flips. Requires at least 65 full frames, and covers
    EXACTLY the first 65: audio beyond 65*frame samples never affects
    the fingerprint (two clips identical in that prefix collide by
    design — the prefix-window convention real audio fingerprinters use
    for their first query window; index more windows per clip to
    discriminate longer audio). Band packing matches dhash_bands:
    band b = sum(bit_i << (i - 16b))."""
    n_frames = len(samples) // frame
    if n_frames < 65:
        raise ValueError(f"need >= 65 full frames, got {n_frames}")
    energies = [
        sum(s * s for s in samples[f * frame : (f + 1) * frame])
        for f in range(65)
    ]
    bands = [0, 0, 0, 0]
    for i in range(64):
        if energies[i + 1] > energies[i]:
            bands[i // 16] |= 1 << (i % 16)
    return tuple(bands)
