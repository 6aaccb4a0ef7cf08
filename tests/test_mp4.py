"""MP4/ISO-BMFF source tests (sources/mp4.py): round-trip against the
twin encoder, HAND-ASSEMBLED fixtures located by structural offsets
(the GIF discipline — no stdlib writer exists for ISO-BMFF), general
multi-run/multi-chunk sample-table walks, and honest error gates."""

from __future__ import annotations

import struct

import pytest

from lswms_forage_etl_spark.sources.mp4 import (
    _FIXED,
    encode_mp4,
    parse_mp4_boxes,
    parse_mp4_frames,
    scan_mp4_boxes,
    scan_mp4_frames,
    synth_mp4_media,
)


def _box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def test_roundtrip_boxes_and_frames():
    frames = [b"alpha", b"", b"gamma" * 40]
    buf = encode_mp4(frames)
    boxes = parse_mp4_boxes(buf)
    paths = [p for p, _, _ in boxes]
    assert paths[0] == "ftyp" and paths[-1] == "mdat"
    assert "moov/trak/mdia/minf/stbl/stco" in paths
    # every fixed layout constant matches the real encoder output
    sz = {p.split("/")[-1]: s for p, _, s in boxes}
    for k, v in _FIXED.items():
        assert sz[k] == v, k
    rows = parse_mp4_frames(buf)
    assert [r[5] for r in rows] == frames
    # (idx, dts, cts, dur): no ctts -> cts == dts
    assert [(r[0], r[1], r[2], r[3]) for r in rows] == [
        (0, 0, 0, 1000), (1, 1000, 1000, 1000), (2, 2000, 2000, 1000)]
    # boxes tile the file exactly: top-level sizes sum to len(buf)
    top = [(o, s) for p, o, s in boxes if "/" not in p]
    assert sum(s for _, s in top) == len(buf)


def test_hand_assembled_fixture_structural_offsets():
    """Build a file by hand (independent of encode_mp4's assembly
    path) and check the walk finds each box at its STRUCTURAL offset —
    not by byte-pattern search (the GIF 0x2c lesson: fourcc bytes can
    appear inside payloads)."""
    # payload contains a fake 'moov' fourcc — must NOT be parsed
    inner = _box(b"free", b"decoy moov\x00\x00moov")
    container = _box(b"udta", inner)           # udta recurses
    fixture = _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + container \
        + _box(b"mdat", b"payload moov bytes")
    boxes = parse_mp4_boxes(fixture)
    assert [(p, o) for p, o, _ in boxes] == [
        ("ftyp", 0),
        ("udta", len(fixture) - len(container)
         - (8 + len(b"payload moov bytes"))),
        ("udta/free", 8 + 8 + len(b"isom\x00\x00\x02\x00isom")),
        ("mdat", len(fixture) - (8 + len(b"payload moov bytes"))),
    ]
    assert all("moov" not in p for p, _, _ in boxes)


def test_largesize_and_size_zero_boxes():
    # size==1 -> 64-bit largesize header
    payload = b"x" * 5
    large = struct.pack(">I", 1) + b"mdat" \
        + struct.pack(">Q", 16 + len(payload)) + payload
    boxes = parse_mp4_boxes(large)
    assert boxes == [("mdat", 0, 16 + len(payload))]
    # size==0 -> extends to end of enclosing scope
    tail = struct.pack(">I", 0) + b"mdat" + b"y" * 9
    boxes = parse_mp4_boxes(_box(b"ftyp", b"isom0000") + tail)
    assert boxes[-1] == ("mdat", 8 + 8, 8 + 9)


def test_malformed_boxes_raise():
    with pytest.raises(ValueError, match="truncated"):
        parse_mp4_boxes(b"\x00\x00\x00\x10mda")      # short header
    with pytest.raises(ValueError, match="bad size"):
        parse_mp4_boxes(struct.pack(">I", 4) + b"mdat")   # size < hdr
    with pytest.raises(ValueError, match="bad size"):
        parse_mp4_boxes(struct.pack(">I", 64) + b"mdat")  # overruns


def test_multi_run_multi_chunk_sample_walk():
    """General stts runs + stsc chunk map: rebuild a sample table by
    hand with 2 chunks (2+1 samples) and two stts runs, and check the
    walk derives dts/offset/payload per sample."""
    payloads = [b"aa", b"bbb", b"cccc"]
    # two stts runs: 1 sample at 500, then 2 samples at 250
    stts = _box(b"stts", struct.pack(">II", 0, 2)
                + struct.pack(">II", 1, 500)
                + struct.pack(">II", 2, 250))
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, 3)
                + b"".join(struct.pack(">I", len(p)) for p in payloads))
    # chunk 1 holds 2 samples, chunk 2 holds 1
    stsc = _box(b"stsc", struct.pack(">II", 0, 2)
                + struct.pack(">III", 1, 2, 1)
                + struct.pack(">III", 2, 1, 1))
    stbl_inner = stts + stsz + stsc
    # layout: moov(trak(mdia(mdhd, minf(stbl(..., stco))))) mdat
    mdhd = _box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, 1000, 750,
                                     0x55C4, 0))

    def assemble(c1, c2):
        stco = _box(b"stco", struct.pack(">II", 0, 2)
                    + struct.pack(">II", c1, c2))
        stbl = _box(b"stbl", stbl_inner + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + minf)
        trak = _box(b"trak", mdia)
        moov = _box(b"moov", trak)
        mdat = _box(b"mdat", b"".join(payloads))
        return moov + mdat

    probe = assemble(0, 0)
    base = len(probe) - (8 + sum(len(p) for p in payloads)) + 8
    buf = assemble(base, base + len(payloads[0]) + len(payloads[1]))
    rows = parse_mp4_frames(buf)
    assert [r[5] for r in rows] == payloads
    assert [(r[1], r[3]) for r in rows] == [(0, 500), (500, 250),
                                            (750, 250)]


def test_ctts_composition_offsets():
    """Progressive ctts (version 1, signed): cts = dts + offset; the
    B-frame shape includes a negative offset."""
    frames = [b"i", b"pp", b"bbb", b"pppp"]
    offs = [0, 2000, -500, 1000]
    rows = parse_mp4_frames(encode_mp4(frames, cts_offsets=offs))
    assert [r[2] - r[1] for r in rows] == offs
    assert [r[5] for r in rows] == frames


def test_fragmented_moof_traf_trun_walk():
    """Fragmented layout: per_fragment=3 over 8 samples -> 3 moofs;
    tfdt carries base decode time, trun carries per-sample
    duration/size/SIGNED cts offsets, data offsets are
    default-base-is-moof relative."""
    from lswms_forage_etl_spark.sources.mp4 import (
        FRAME_DURATION, encode_mp4_fragmented)
    frames = [f"s{i}".encode() * (i + 1) for i in range(8)]
    buf = encode_mp4_fragmented(frames)
    paths = [p for p, _, _ in parse_mp4_boxes(buf)]
    assert paths.count("moof") == 3
    assert paths.count("moof/traf/trun") == 3
    assert "moov/mvex/trex" in paths
    rows = parse_mp4_frames(buf)
    assert [r[0] for r in rows] == list(range(8))
    assert [r[1] for r in rows] == [i * FRAME_DURATION
                                    for i in range(8)]
    assert [r[2] - r[1] for r in rows] == [
        (i % 3) * FRAME_DURATION for i in range(8)]
    assert [r[5] for r in rows] == frames


def test_fragmented_hand_fixture_tfhd_defaults():
    """Hand-built fragment exercising the paths the twin never emits:
    tfhd default-sample-duration/size (trun carries only cts), and a
    trun WITHOUT tfdt (dts accumulates from the previous fragment)."""
    from lswms_forage_etl_spark.sources.mp4 import _full
    payloads = [b"xx", b"yy"]
    mfhd = _full("mfhd", 0, 0, struct.pack(">I", 1))
    # flags: default-base-is-moof | def-dur (0x08) | def-size (0x10)
    tfhd = _full("tfhd", 0, 0x020018,
                 struct.pack(">III", 1, 700, 2))
    # trun v1: data-offset | cts only (0x801)
    per = struct.pack(">ii", 100, -100)
    trun_size = 8 + 4 + 4 + 4 + len(per)
    traf_size = 8 + len(tfhd) + trun_size
    moof_size = 8 + len(mfhd) + traf_size
    trun = _full("trun", 1, 0x000801,
                 struct.pack(">Ii", 2, moof_size + 8) + per)
    traf = _box(b"traf", bytes(tfhd + trun))
    moof = _box(b"moof", bytes(mfhd) + traf)
    assert len(moof) == moof_size
    buf = moof + _box(b"mdat", b"".join(payloads))
    rows = parse_mp4_frames(buf)
    assert [(r[1], r[2], r[3], r[4]) for r in rows] == [
        (0, 100, 700, 2), (700, 600, 700, 2)]
    assert [r[5] for r in rows] == payloads


def test_spark_scan_matches_local(spark):
    docs = spark.createDataFrame(
        [(i, f"doc number {i} text " * (i % 3 + 1)) for i in range(20)],
        "doc_id long, text string")
    media = synth_mp4_media(docs)
    out = scan_mp4_boxes(media).collect()
    assert {r["archive_id"] for r in out} == {0, 8, 16}
    # 19 boxes per archive
    from collections import Counter
    per = Counter(r["archive_id"] for r in out)
    assert set(per.values()) == {19}
    fr = scan_mp4_frames(media, every_n=2).collect()
    # archives 0 and 8 have 8 frames -> 4 sampled; 16 has 4 -> 2
    per = Counter(r["archive_id"] for r in fr)
    assert per == {0: 4, 8: 4, 16: 2}
    import hashlib
    want_fp = {(i - i % 8, i % 8):
               hashlib.md5((f"doc number {i} text " * (i % 3 + 1))
                           .encode()).hexdigest()
               for i in range(20)}
    for r in fr:
        assert r["content_fp"] == want_fp[(r["archive_id"],
                                           r["frame_idx"])]
        assert r["dts"] == r["frame_idx"] * 1000
