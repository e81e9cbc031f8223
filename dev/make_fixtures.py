#!/usr/bin/env python3
"""Generate FOREIGN media fixtures for MultimodalKernelSpec.

The m5/m6 kernels were originally tested roundtrip-only (decode what
encodePng/encodeWav produced), which is blind to symmetric encode/decode
bugs — e.g. both sides agreeing on a wrong stride. These fixtures are
produced by an INDEPENDENT implementation (pure-python zlib PNG writer +
the stdlib `wave` module — no code shared with the Scala kernels), with
expected (width, height, checksum) / (rate, channels, frames, checksum)
printed for pinning in the spec.

Deterministic: fixed pixel/sample formulas, zlib level 9, no timestamps.
Run from the repo root:  python3 dev/make_fixtures.py
"""
import os
import struct
import wave
import zlib

P = 1000000007
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "fixtures")


def png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def png_gray(w: int, h: int, pixel) -> tuple[bytes, int]:
    """8-bit grayscale PNG (color type 0, no interlace) + pixel sum mod P."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    rows = [[pixel(x, y) for x in range(w)] for y in range(h)]
    raw = b"".join(b"\x00" + bytes(r) for r in rows)  # filter 0 per row
    body = png_chunk(b"IHDR", ihdr) + png_chunk(b"IDAT", zlib.compress(raw, 9)) + png_chunk(b"IEND", b"")
    return sig + body, sum(sum(r) for r in rows) % P


def wav_u8(rate: int, samples: list[int]) -> bytes:
    """8-bit unsigned mono PCM WAV via the stdlib wave module."""
    import io
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(1)
    w.setframerate(rate)
    w.writeframes(bytes(samples))
    w.close()
    return buf.getvalue()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    fixtures = {
        # small odd-sized image: catches width/height swaps and stride bugs
        "foreign_5x3.png": png_gray(5, 3, lambda x, y: (7 * x + 13 * y + 3) % 256),
        # width matching the Scala encoder's 32 so a hardcoded-width bug can't hide
        "foreign_32x2.png": png_gray(32, 2, lambda x, y: (x * y + 251 * y + x) % 256),
    }
    for name, (data, px_sum) in fixtures.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        w, h = struct.unpack(">II", data[16:24])
        print(f"{name}: width={w} height={h} px_sum={px_sum}")

    wavs = {
        # includes 0 and 255 extremes: catches signed/unsigned confusion
        "foreign_8k.wav": (8000, [0, 255] + [(11 * i + 5) % 256 for i in range(37)]),
        # different rate: proves the rate is READ from the header, not assumed
        "foreign_16k.wav": (16000, [(3 * i * i + 1) % 256 for i in range(101)]),
    }
    for name, (rate, samples) in wavs.items():
        data = wav_u8(rate, samples)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"{name}: rate={rate} channels=1 n_samples={len(samples)} "
              f"sample_sum={sum(samples) % P}")


if __name__ == "__main__":
    main()
