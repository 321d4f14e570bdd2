"""Container-header parsing: real byte-offset reads, no codecs.

The parser is validated against INDEPENDENTLY constructed files (Python
struct packing here vs the operator's JVM hex synthesis) and against
malformed payloads for every refusal branch; the gate-facing operator is
oracled closed-form in __spark_entry__ (driver-checked).
"""

import struct

from readability_spark.ops.multimodal import (
    media_header_meta,
    parse_media_header,
    synth_container_media,
)


def make_png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
            + b"\x00\x00\x00\x00")


def make_gif(w, h, version=b"89a"):
    return b"GIF" + version + struct.pack("<HH", w, h) + b"\x00"


def make_wav(rate, channels, bits, data_len):
    byterate = rate * channels * (bits // 8)
    block = channels * (bits // 8)
    return (b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    byterate, block, bits)
            + b"data" + struct.pack("<I", data_len))


def test_png_header():
    assert parse_media_header(make_png(640, 480)) == (
        "png", 640, 480, None, None, None, True)
    assert parse_media_header(make_png(1, 1))[1:3] == (1, 1)


def test_gif_header_both_versions():
    assert parse_media_header(make_gif(320, 200)) == (
        "gif", 320, 200, None, None, None, True)
    assert parse_media_header(make_gif(7, 9, b"87a"))[0:3] == ("gif", 7, 9)


def test_wav_header_duration():
    b = make_wav(44100, 2, 16, 44100 * 2 * 2)   # exactly one second
    assert parse_media_header(b) == (
        "wav", None, None, 44100, 2, 1000, True)
    b = make_wav(8000, 1, 16, 4000)             # 250 ms
    assert parse_media_header(b)[5] == 250


def test_malformed_payloads_refuse():
    cases = [
        None,
        b"",
        b"tiny",
        b"\x89PNG\r\n\x1a\n" + b"short",          # PNG magic, no IHDR
        b"GIF99a" + b"\x01\x00\x01\x00\x00",      # wrong GIF version
        b"RIFF" + b"\x00" * 40,                   # RIFF but not WAVE layout
        make_png(1, 1)[:-10],                     # truncated IHDR
        b"\x00" * 64,
    ]
    for b in cases:
        out = parse_media_header(b)
        # uniform refusal shape: container 'unknown', every field None
        assert out == ("unknown", None, None, None, None, None, False), \
            (b, out)


def test_wav_zero_denominator_refuses():
    b = bytearray(make_wav(0, 1, 16, 100))
    # zero denominator takes the same uniform refusal shape as every
    # other malformed payload (no half-parsed 'wav' row)
    assert parse_media_header(bytes(b)) == (
        "unknown", None, None, None, None, None, False)


def test_synth_bytes_parse_as_real_files(spark):
    """The JVM hex synthesis must produce bytes the independent Python
    constructors agree with, container for container."""
    rows = synth_container_media(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        mid, payload = r["media_id"], bytes(r["payload"])
        k = mid % 4
        if k == 0:
            assert payload == make_png((mid % 640) + 1, (mid % 480) + 1)
        elif k == 1:
            assert payload == make_gif((mid % 640) + 1, (mid % 480) + 1)
        elif k == 2:
            assert payload == make_wav(8000 + (mid % 8) * 1000,
                                       1 + mid % 2, 16,
                                       ((mid % 1000) + 1) * 4)
        else:
            assert len(payload) == 5


def test_gate_operator_all_parsed(spark):
    rows = media_header_meta(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 96
    ok = [r for r in rows if r["parse_ok"]]
    bad = [r for r in rows if not r["parse_ok"]]
    assert len(bad) == len([r for r in rows if r["media_id"] % 4 == 3])
    assert all(r["container"] == "unknown" for r in bad)
    assert {r["container"] for r in ok} == {"png", "gif", "wav"}
