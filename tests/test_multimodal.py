"""Multimodal decode: REAL bytes through the real decoders.

Generates actual PNG files (stdlib zlib/struct, known pixel values,
every filter type exercised by round-tripping through the decoder) and
actual WAV files (stdlib wave), feeds them through the Arrow-batched
extract_features stage, and checks the decoded metadata exactly.
Payloads nothing can decode must fall back to the deterministic fake
(codec='fake') with unchanged values — stub parity.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from gpu_database_spark.llm import multimodal as mm


def make_png(width: int, height: int, pixel: int, color_type: int = 0) -> bytes:
    """Minimal valid non-interlaced 8-bit PNG, constant pixel value."""
    channels = {0: 1, 2: 3, 6: 4}[color_type]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    row = b"\x00" + bytes([pixel]) * (width * channels)  # filter 0 per row
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_wav(n_frames: int, amplitude: int, rate: int = 8000, channels: int = 1) -> bytes:
    """PCM-16 WAV with a constant-amplitude square wave."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = [amplitude if i % 2 == 0 else -amplitude for i in range(n_frames * channels)]
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_png_decode_exact():
    w, h, n, mean = mm._decode_png(make_png(17, 9, 200))
    assert (w, h, n) == (17, 9, 1)
    assert mean == pytest.approx(200 / 255.0)
    # RGB and RGBA layouts too
    for ct in (2, 6):
        w, h, n, mean = mm._decode_png(make_png(5, 4, 64, color_type=ct))
        assert (w, h, n) == (5, 4, 1)
        assert mean == pytest.approx(64 / 255.0)


def test_png_filters_roundtrip():
    """A PNG whose rows use Sub/Up/Average/Paeth filters defilters back
    to the original gradient."""
    width, height = 8, 5
    rows = [bytes((x * 7 + y * 13) & 255 for x in range(width)) for y in range(height)]

    def filt_sub(line, prev):
        return bytes((line[x] - (line[x - 1] if x else 0)) & 255 for x in range(width))

    def filt_up(line, prev):
        return bytes((line[x] - prev[x]) & 255 for x in range(width))

    def filt_avg(line, prev):
        out = []
        for x in range(width):
            a = line[x - 1] if x else 0
            out.append((line[x] - ((a + prev[x]) >> 1)) & 255)
        return bytes(out)

    def filt_paeth(line, prev):
        out = []
        for x in range(width):
            a = line[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((line[x] - pred) & 255)
        return bytes(out)

    filters = [(0, None), (1, filt_sub), (2, filt_up), (3, filt_avg), (4, filt_paeth)]
    raw = b""
    prev = bytes(width)
    for y, (ftype, ffn) in zip(range(height), filters):
        line = rows[y]
        raw += bytes([ftype]) + (line if ffn is None else ffn(line, prev))
        prev = line

    def chunk(typ, payload):
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, n, mean = mm._decode_png(png)
    want = sum(sum(r) for r in rows) / (width * height) / 255.0
    assert (w, h, n) == (width, height, 1)
    assert mean == pytest.approx(want)


def test_wav_decode_exact():
    w, hgt, n, mean = mm._decode_wav(make_wav(100, 16384, rate=8000, channels=2))
    assert (w, hgt, n) == (2, 8000, 100)
    assert mean == pytest.approx(16384 / 32768.0)


def test_decode_router_and_fake_fallback():
    png = make_png(3, 3, 10)
    wav = make_wav(10, 100)
    text = b"just some text payload"
    assert mm._decode(png, "image")[4] == "png"
    assert mm._decode(wav, "audio")[4] == "wav"
    got = mm._decode(text, "image")
    assert got[4] == "fake"
    assert got[:4] == mm._fake_decode(text, "image")
    # corrupt PNG falls through to fake, never raises
    assert mm._decode(png[:20], "image")[4] == "fake"


@pytest.mark.skipif(
    mm._try_pil_decode(b"") is None and mm._PIL_IMAGE is False,
    reason="PIL not installed",
)
def test_pil_decode_when_available():
    from PIL import Image  # noqa: F401

    buf = io.BytesIO()
    Image.new("L", (6, 4), color=77).save(buf, format="BMP")
    w, h, n, mean = mm._try_pil_decode(buf.getvalue())
    assert (w, h, n) == (6, 4, 1)
    assert mean == pytest.approx(77 / 255.0)


def test_extract_features_real_bytes_through_spark(spark):
    """The full Arrow-batched stage over a mixed binary table: real PNG,
    real WAV, undecodable text — one pass, per-row codec audit."""
    png = make_png(12, 8, 100)
    wav = make_wav(50, 8192)
    text = b"not media at all"
    media = spark.createDataFrame(
        [
            (1, bytearray(png), "image", len(png)),
            (2, bytearray(wav), "audio", len(wav)),
            (3, bytearray(text), "video", len(text)),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert rows[1].codec == "png" and (rows[1].width, rows[1].height) == (12, 8)
    assert rows[1].mean_intensity == pytest.approx(100 / 255.0)
    assert rows[2].codec == "wav" and rows[2].n_frames == 50
    assert rows[2].mean_intensity == pytest.approx(8192 / 32768.0)
    assert rows[3].codec == "fake"
    assert (rows[3].width, rows[3].height, rows[3].n_frames, rows[3].mean_intensity) == (
        *mm._fake_decode(text, "video")[:3],
        pytest.approx(mm._fake_decode(text, "video")[3]),
    )


def make_png_pixels(pixels: list[list[int]]) -> bytes:
    """Minimal grayscale PNG from an explicit pixel grid."""
    height, width = len(pixels), len(pixels[0])

    def chunk(typ: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_phash_finds_near_dup_pngs(spark):
    """A few-pixel variant of an image must land within the Hamming
    ball of the original through the FULL banded pipeline (hash ->
    band blocking -> exact Hamming), while a structurally different
    image must not."""
    import random

    from pyspark.sql import functions as F

    from gpu_database_spark.llm import multimodal as mm

    rng = random.Random(7)
    base = [[rng.randrange(256) for _ in range(36)] for _ in range(36)]
    variant = [row[:] for row in base]
    for _ in range(4):  # a tiny watermark-sized patch
        y, x = rng.randrange(36), rng.randrange(36)
        variant[y][x] = (variant[y][x] + 80) % 256
    distinct = [[rng.randrange(256) for _ in range(36)] for _ in range(36)]

    media = spark.createDataFrame(
        [
            (1, bytearray(make_png_pixels(base)), "image", 0),
            (2, bytearray(make_png_pixels(variant)), "image", 0),
            (3, bytearray(make_png_pixels(distinct)), "image", 0),
        ],
        mm.MEDIA_SCHEMA,
    )
    hashed = mm.phash_table(media).collect()
    assert {r.codec for r in hashed} == {"png"}
    h = {r.media_id: r.phash for r in hashed}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(h[1], h[2]) <= mm.PHASH_MAX_HAMMING
    assert ham(h[1], h[3]) > mm.PHASH_MAX_HAMMING

    # full pipeline: the SAME banded-candidate + exact-Hamming helper
    # the registered query runs (no private copy to drift)
    hashed_df = spark.createDataFrame(
        [(r.media_id, r.phash, r.codec) for r in hashed], mm.PHASH_SCHEMA
    )
    pairs = mm.phash_pairs(hashed_df).collect()
    assert {(p.id1, p.id2) for p in pairs} == {(1, 2)}

    # the registered query's census semantics over the same table:
    # the true near-dup pair must be counted as confirmed
    cand = mm.phash_candidates(hashed_df).collect()
    n_confirmed = sum(1 for c in cand if c.hamming <= mm.PHASH_MAX_HAMMING)
    assert n_confirmed == 1
    assert len(cand) >= 1


def test_phash_query_census_on_fixture(spark, sf_dir):
    """The registered query returns exactly ONE census row on any
    corpus — non-vacuous for the driver's rows-only check even on the
    text-payload fixture, which has no near-dups by construction."""
    from gpu_database_spark.llm.multimodal import mm_image_phash

    df = mm_image_phash(spark, sf_dir)
    assert df.columns == [
        "n_media",
        "n_png_decoded",
        "n_candidate_pairs",
        "n_confirmed_pairs",
    ]
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_media > 0
    # the three SEEDED_PNGS (doc_ids 0/3/6) take the real decode path;
    # every other text payload takes the fake-grid stand-in
    assert r.n_png_decoded == 3
    assert r.n_confirmed_pairs <= r.n_candidate_pairs
    # exactly the seeded near-dup pair (0, 3) confirms; the text
    # fixture itself has no near-dups by construction
    assert r.n_confirmed_pairs == 1


def test_audio_energy_census_decodes_seeded_wavs(spark, sf_dir):
    """Driver-scale twin of the PNG census test: the SEEDED_WAVS at
    doc_ids 1/4/7 take the REAL stdlib-wave decode path inside
    mm_audio_energy, one exemplar per decoder branch — 16-bit mono
    with a deliberately silent middle window (silence_ratio exactly
    1/3), 16-bit stereo whose downmix clears the silence gate, and
    8-bit unsigned mono."""
    from pyspark.sql import functions as F

    from gpu_database_spark.llm.multimodal import (
        audio_energy_windows,
        media_table,
        mm_audio_energy,
    )

    per = {
        r.media_id: r
        for r in audio_energy_windows(
            media_table(spark, sf_dir).filter(F.col("media_type") == "audio")
        )
        .filter(F.col("codec") != "fake-pcm8")
        .collect()
    }
    assert set(per) == {1, 4, 7}
    assert per[1].codec == "wav" and per[1].n_windows == 3
    assert per[1].silence_ratio == pytest.approx(1 / 3, abs=1e-6)
    assert per[4].codec == "wav-ch2" and per[4].silence_ratio == 0.0
    assert per[4].mean_energy > mm.AUDIO_SILENCE  # downmix is audible
    assert per[7].codec == "wav" and per[7].silence_ratio == 0.0

    by_codec = {r.codec: r for r in mm_audio_energy(spark, sf_dir).collect()}
    assert by_codec["wav"].n_media == 2
    assert by_codec["wav"].total_windows == 5
    assert by_codec["wav-ch2"].n_media == 1
    assert by_codec["fake-pcm8"].n_media >= 1  # the text stand-ins remain
