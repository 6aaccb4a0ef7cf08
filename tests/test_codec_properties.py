"""Property tests for the byte-level codecs added in round 12: GIF-LZW,
zip, tar, and WARC round-trips over arbitrary content — the adversarial
generator probes the width-growth/table-reset boundaries and the
framing edge cases the hand-written cases can miss. Pure-Python, no
Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings, strategies as st

from lswms_forage_etl_spark.operators.gif import (
    encode_gif,
    lzw_decode,
    lzw_encode,
    parse_gif,
    synth_palette,
)
from lswms_forage_etl_spark.sources.archive import (
    encode_tar,
    encode_warc,
    encode_zip,
    parse_tar,
    parse_warc,
    parse_zip,
)

PAL = synth_palette()

# biased byte streams: low-alphabet runs stress the LZW dictionary
# (repeats, KwKwK), full-range streams stress width growth
_bytes_runs = st.binary(min_size=0, max_size=4000).map(
    lambda b: bytes(x % 7 for x in b))
_bytes_any = st.binary(min_size=0, max_size=4000)


@settings(max_examples=60, deadline=None)
@given(data=st.one_of(_bytes_runs, _bytes_any),
       mcs=st.sampled_from([2, 4, 8]))
# the round-12 tail-widening bug: the decoder's post-final-code table
# add crossed 2^width, so it read EOI one bit wider than written
@example(data=b"\x01\x00\x00\x01\x01\x02\x00\x02\x02\x01\x03", mcs=2)
def test_lzw_roundtrip_property(data, mcs):
    # LZW literals must fit the initial table: clamp to 2^mcs symbols
    data = bytes(x % (1 << mcs) for x in data)
    assert lzw_decode(lzw_encode(data, mcs), mcs) == data


@settings(max_examples=15, deadline=None)
@given(h=st.integers(min_value=1, max_value=12),
       w=st.integers(min_value=1, max_value=40),
       seed=st.integers(min_value=0, max_value=2**31 - 1),
       interlaced=st.booleans())
def test_gif_roundtrip_property(h, w, seed, interlaced):
    ix = np.random.RandomState(seed).randint(
        0, 256, (h, w)).astype(np.uint8)
    gw, gh, pix = parse_gif(encode_gif(ix, interlaced=interlaced))
    assert (gw, gh) == (w, h)
    assert np.array_equal(pix, PAL[ix.reshape(-1)].reshape(-1))


_names = st.lists(
    st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=122),
            min_size=1, max_size=30),
    min_size=1, max_size=6, unique=True)


@settings(max_examples=20, deadline=None)
@given(names=_names, data=st.data())
def test_zip_roundtrip_property(names, data):
    members = [(n, data.draw(_bytes_any), data.draw(st.booleans()))
               for n in names]
    assert parse_zip(encode_zip(members)) \
        == [(n, c) for n, c, _ in members]


@settings(max_examples=20, deadline=None)
@given(names=_names, data=st.data())
def test_tar_roundtrip_property(names, data):
    members = [(n, data.draw(_bytes_any)) for n in names]
    assert parse_tar(encode_tar(members)) == members


@settings(max_examples=20, deadline=None)
@given(n=st.integers(min_value=1, max_value=5), data=st.data())
def test_warc_roundtrip_property(n, data):
    recs = [(f"http://corpus/doc/{i}", data.draw(_bytes_any))
            for i in range(n)]
    got = parse_warc(encode_warc(recs))
    assert [(h["WARC-Target-URI"], c) for h, c in got] == recs
