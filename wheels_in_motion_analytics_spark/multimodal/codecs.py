"""Real pure-Python codecs for public media formats (PPM, BMP, WAV).

No PIL/ffmpeg exists in this container, but these three formats are simple
enough to parse with the stdlib — so the decode half of the multimodal
pipeline runs on REAL bytes in real container formats, not deterministic
fakes: binary netpbm (P6) images, 24-bit uncompressed BMP (bottom-up BGR
rows, 4-byte row padding), and 16-bit PCM WAV (stdlib ``wave``).

The synthetic fixtures are generated JVM-side (md5 → unhex → concat around
literal format headers), which makes every decoded property reconstructable
in DuckDB SQL — the digest-oracle pattern, now over real codec output.
"""

from __future__ import annotations

import io
import struct
import wave

# Fixture geometry — small on purpose: the point is real parsing, not volume.
IMG_W = 8
IMG_H = 8
VIDEO_FRAMES = 4
FRAME_SAMPLE_EVERY = 2  # keep frames 0, 2 — sampling, not enumeration
WAV_SAMPLES = 256
WAV_RATE = 8000

PPM_HEADER = f"P6\n{IMG_W} {IMG_H}\n255\n".encode()
PPM_PIXEL_BYTES = IMG_W * IMG_H * 3  # 192 = 12 md5 blocks
PPM_FRAME_BYTES = len(PPM_HEADER) + PPM_PIXEL_BYTES


# --- PPM (netpbm P6) --------------------------------------------------------


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary P6 image: returns (width, height, rgb_bytes).

    Real header parsing — whitespace-separated tokens, maxval check — not a
    fixed-offset slice, so any conformant P6 payload decodes."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 ppm payload")
    # header = magic, width, height, maxval tokens, each ended by whitespace
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = payload[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated raster")
    return w, h, raster


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError("raster size mismatch")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def resize_ppm_nearest(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of a real P6 image, re-encoded as P6.
    Integer source indexing (floor(out * in / out_dim)) — deterministic."""
    w, h, raster = decode_ppm(payload)
    out = bytearray()
    for r in range(out_h):
        sr = r * h // out_h
        for c in range(out_w):
            sc = c * w // out_w
            off = (sr * w + sc) * 3
            out += raster[off : off + 3]
    return encode_ppm(out_w, out_h, bytes(out))


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated P6 stream (ffmpeg's image2pipe/ppm_pipe shape)
    into frames by parsing each header and computing the frame length."""
    frames = []
    i = 0
    while i < len(payload):
        w, h, _ = decode_ppm(payload[i:])
        # raster starts right after the "\n255\n" maxval terminator
        header_len = payload[i:].index(b"\n255\n") + 5
        flen = header_len + w * h * 3
        frames.append(payload[i : i + flen])
        i += flen
    return frames


# --- BMP (24-bit uncompressed) ----------------------------------------------

BMP_HEADER_BYTES = 54


def bmp_header(width: int, height: int) -> bytes:
    """Standard BITMAPFILEHEADER + BITMAPINFOHEADER for 24-bit bottom-up."""
    row = (width * 3 + 3) // 4 * 4
    image_size = row * height
    return (
        struct.pack("<2sIHHI", b"BM", BMP_HEADER_BYTES + image_size, 0, 0, BMP_HEADER_BYTES)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    )


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse 24-bit uncompressed BMP: returns (width, height, rgb_bytes)
    in TOP-DOWN RGB order — i.e. the decoder undoes the format's bottom-up
    row order and BGR channel order, and strips row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    row = (width * 3 + 3) // 4 * 4
    out = bytearray()
    for r in range(height):  # top-down output row r = stored row height-1-r
        src = data_offset + (height - 1 - r) * row
        for c in range(width):
            b, g, rr = payload[src + c * 3 : src + c * 3 + 3]
            out += bytes((rr, g, b))
    return width, height, bytes(out)


# --- WAV (16-bit PCM, stdlib wave) ------------------------------------------


def wav_header(n_samples: int = WAV_SAMPLES, rate: int = WAV_RATE) -> bytes:
    """Canonical 44-byte PCM header (mono, 16-bit) for a fixed sample count —
    constant per geometry, so it can ride into the plan as a hex literal."""
    data = n_samples * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + data, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", data)
    )


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode PCM WAV via the stdlib wave module: returns
    (sample_rate, n_samples, samples as signed ints)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("only mono 16-bit PCM supported")
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    samples = list(struct.unpack(f"<{n}h", raw))
    return rate, n, samples
