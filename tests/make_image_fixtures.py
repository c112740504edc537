"""Generate the committed corpus of GENUINE tiny image files under
``tests/fixtures/images/`` — real byte-level encodings produced with
pure Python (zlib + struct), no codec library.

Run once (``python tests/make_image_fixtures.py``) and commit the
outputs; ``test_multimodal.py::test_real_header_parser_on_real_files``
loads them from disk. Formats and the spec features they exercise:

- PNG: fully valid (correct CRCs, zlib IDAT) — IHDR parse.
- GIF89a/GIF87a: fully valid incl. a correct minimal LZW stream —
  little-endian screen descriptor.
- JPEG baseline (SOF0) and progressive (SOF2): structurally complete
  files with self-defined single-code Huffman tables (DHT defines the
  tables, so a 1-bit DC-cat-0 code and a 1-bit EOB are legal) and a
  real entropy-coded scan — exercises the SOF scan across APP0/COM/
  DQT/DHT segments of varying lengths, plus fill bytes.
- WEBP VP8 (lossy sync-code + 14-bit dims), VP8L (0x2F signature +
  14-bit w-1/h-1 bitfield), VP8X (24-bit canvas fields): container-
  and header-accurate per the public WebP container/bitstream specs
  (the VP8/VP8L payload tails are truncated — dims live entirely in
  the parsed header region).

Reference parity target: the reference reads these via PIL
(``operators/refiners/image_metadata.py:38-62``); our parser
(``operators/multimodal.py::parse_real_header``) must agree with PIL
on every file, checked in the gated branch of the test when PIL is
available.
"""

from __future__ import annotations

import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "images")


def png(w: int, h: int) -> bytes:
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes((x * 40 + y * 11) % 256 for x in range(w)) for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def gif(w: int, h: int, version: bytes = b"89a") -> bytes:
    # global color table: 2 entries (black, white); LZW min code size 2:
    # clear=4, eoi=5, pixel codes 3 bits wide. All-zero pixels.
    npix = w * h
    codes = [4] + [0] * npix + [5]
    bits = 0
    acc = 0
    outb = bytearray()
    for c in codes:
        acc |= c << bits
        bits += 3
        while bits >= 8:
            outb.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        outb.append(acc & 0xFF)
    lzw = bytes(outb)
    return (
        b"GIF" + version
        + struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # GCT flag, 2 colors
        + b"\x00\x00\x00\xff\xff\xff"
        + b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([2, len(lzw)]) + lzw + b"\x00"
        + b";"
    )


def _jpeg_segments(w: int, h: int, sof_marker: int) -> bytes:
    # DQT: table 0, all-ones (identity quantization)
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    # DHT: DC table 0 — one code of length 1 for category 0
    dht_dc = b"\xff\xc4" + struct.pack(">H", 20) + b"\x00" + bytes(
        [1] + [0] * 15
    ) + b"\x00"
    # DHT: AC table 0 — one code of length 1 for EOB (run/size 0x00)
    dht_ac = b"\xff\xc4" + struct.pack(">H", 20) + b"\x10" + bytes(
        [1] + [0] * 15
    ) + b"\x00"
    # SOF: 8-bit precision, 1 component (grayscale), 1x1 sampling, q-table 0
    sof = bytes([0xFF, sof_marker]) + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 2 + 24) + b"tiny fixture for parsing"
    # fill bytes (repeated 0xFF ahead of a marker — legal padding, ITU
    # T.81 B.1.1.2) between segments: the SOF scan must skip them
    return app0 + com + b"\xff" + dqt + dht_dc + b"\xff\xff" + dht_ac + sof


def jpeg_baseline(w: int = 8, h: int = 8) -> bytes:
    """Baseline SOF0, one 8x8 grayscale MCU per 8x8 tile: each MCU is
    DC cat 0 ('0') + EOB ('0') = 2 bits with the self-defined tables."""
    mcus = ((w + 7) // 8) * ((h + 7) // 8)
    nbits = 2 * mcus
    nbytes = (nbits + 7) // 8
    # bits are all zero; pad remaining bits with 1s per the spec
    pad = nbytes * 8 - nbits
    scan_val = (1 << pad) - 1
    scan = scan_val.to_bytes(nbytes, "big")
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    return b"\xff\xd8" + _jpeg_segments(w, h, 0xC0) + sos + scan + b"\xff\xd9"


def jpeg_progressive(w: int = 16, h: int = 8) -> bytes:
    """Progressive SOF2 with a first DC scan (Ss=0 Se=0 Ah=0 Al=1)."""
    mcus = ((w + 7) // 8) * ((h + 7) // 8)
    nbits = mcus  # DC cat 0 = '0' per MCU in the DC-only scan
    nbytes = (nbits + 7) // 8
    pad = nbytes * 8 - nbits
    scan = ((1 << pad) - 1).to_bytes(nbytes, "big")
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x00\x01"
    return b"\xff\xd8" + _jpeg_segments(w, h, 0xC2) + sos + scan + b"\xff\xd9"


def webp_vp8(w: int, h: int) -> bytes:
    # frame tag: keyframe(0), version 0, show_frame 1, part size 0x13
    tag = (0x13 << 5) | (1 << 4) | 0
    payload = (
        struct.pack("<I", tag)[:3]
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF)
        + b"\x00" * 14  # truncated coefficient data
    )
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" + b"VP8 " + struct.pack("<I", len(payload)) + payload


def webp_vp8l(w: int, h: int) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)  # then alpha(1) + version(3) = 0
    payload = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 6
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload


def webp_vp8x(w: int, h: int) -> bytes:
    canvas = struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00" + canvas
    return b"RIFF" + struct.pack("<I", 4 + len(vp8x)) + b"WEBP" + vp8x


# name -> (builder result, expected (w, h, fmt))
FIXTURES = {
    "tiny_3x2.png": (png(3, 2), (3, 2, "PNG")),
    "tiny_2x1_89a.gif": (gif(2, 1, b"89a"), (2, 1, "GIF")),
    "tiny_4x3_87a.gif": (gif(4, 3, b"87a"), (4, 3, "GIF")),
    "tiny_8x8_baseline.jpg": (jpeg_baseline(8, 8), (8, 8, "JPEG")),
    "tiny_16x8_progressive.jpg": (jpeg_progressive(16, 8), (16, 8, "JPEG")),
    "tiny_5x7_vp8.webp": (webp_vp8(5, 7), (5, 7, "WEBP")),
    "tiny_6x4_vp8l.webp": (webp_vp8l(6, 4), (6, 4, "WEBP")),
    "tiny_9x11_vp8x.webp": (webp_vp8x(9, 11), (9, 11, "WEBP")),
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, (data, dims) in FIXTURES.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes, expect {dims}")


if __name__ == "__main__":
    main()
