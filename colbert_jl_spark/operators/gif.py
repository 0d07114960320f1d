"""GIF codec on numpy + stdlib only (VERDICT r5 item 7's named
alternative — landed alongside progressive JPEG).

An original implementation of the PUBLIC GIF87a/89a specification
(CompuServe GIF, the W3C-hosted spec) — the same "public spec
transcription" status as operators/jpeg.py (ITU-T T.81) and
functions/hashing.py (xxHash64). GIF is the one common web image format
whose compression (LZW) needs no external library at all, and an
ANIMATED GIF is the first REAL multi-frame format the frame-sampling
operator can consume (operators/multimodal.sample_frames previously had
only the FVID fake codec).

Scope (honestly bounded, errors name the boundary):

* decode: GIF87a + GIF89a, global/local color tables, interlaced rows,
  transparency (GCE), animation with disposal methods 0/1 (draw over)
  and 2 (restore background). Disposal 3 (restore previous) raises
  NotImplementedError.
* encode: GIF89a, single- or multi-frame grayscale (256-entry gray
  palette), variable-width LZW with dictionary reset at 4096 — real
  files any viewer opens/animates.

LZW here is the GIF variant: LSB-first bit packing in ≤255-byte
sub-blocks, clear/end codes, code width growing from min+1 up to 12
bits when the table fills a width.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, mcs: int) -> list[int]:
    """Pixel indices from concatenated GIF image sub-block bytes."""
    if not (2 <= mcs <= 8):
        raise ValueError("bad LZW minimum code size %d" % mcs)
    clear = 1 << mcs
    end = clear + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    width = mcs + 1
    out: list[int] = []
    prev: int | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits  # LSB-first
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= clear:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(table[code])
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = table[prev] + (table[prev][0],)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        table.append(table[prev] + (entry[0],))
        prev = code
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1


def _lzw_encode(indices, mcs: int) -> bytes:
    """GIF-variant LZW bytes for a pixel-index sequence (table reset at
    4096 entries; width grows exactly when the DECODER's table would)."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    state = {"width": mcs + 1, "size": end + 1, "d": None}

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += state["width"]
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> None:
        state["width"] = mcs + 1
        state["size"] = end + 1
        state["d"] = {(i,): i for i in range(clear)}

    reset()
    emit(clear)
    cur: tuple = ()
    for p in indices:
        p = int(p)
        if not (0 <= p < clear):
            raise ValueError(
                "pixel index %d outside the %d-entry palette" % (p, clear)
            )
        nxt = cur + (p,)
        if nxt in state["d"]:
            cur = nxt
            continue
        emit(state["d"][cur])
        # mirror the decoder's READ-time table: it appends the entry for
        # our registration only while processing the NEXT code (and the
        # KwKwK case may reference it there), then widens when the table
        # fills the current width — so the encoder widens when its size
        # passes 2^width, one registration after its own table "fills"
        state["d"][nxt] = state["size"]
        state["size"] += 1
        if state["size"] == (1 << state["width"]) + 1:
            if state["width"] < _MAX_CODE_WIDTH:
                state["width"] += 1
            else:  # table full (code 4096 would be unrepresentable)
                emit(clear)
                reset()
        cur = (p,)
    if cur:
        emit(state["d"][cur])
        # the decoder appends an entry for this final code too, and
        # widens before reading the END code if that append fills the
        # width — mirror it so END is read at the right width
        state["size"] += 1
        if (
            state["size"] == (1 << state["width"]) + 1
            and state["width"] < _MAX_CODE_WIDTH
        ):
            state["width"] += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into GIF ≤255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(payload: bytes):
    """(frames (n, h, w, 3) RGB uint8, delays_ms list) — every frame of
    a (possibly animated) GIF, composited on the logical screen per the
    87a/89a disposal rules (0/1 draw-over, 2 restore-background;
    3 restore-previous raises). Truncated or corrupt payloads raise
    ValueError, never a raw IndexError (same executor-dispatch contract
    as operators/jpeg.decode_jpeg)."""
    try:
        return _decode_gif_frames(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError("truncated GIF stream") from exc


def _decode_gif_frames(payload: bytes):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    if w == 0 or h == 0:
        raise ValueError("empty GIF logical screen")

    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags, delay, tidx = struct.unpack_from(
                    "<BHB", payload, pos + 1
                )
                pos += 1 + size
                disposal = (gflags >> 2) & 0x07
                transparent = tidx if gflags & 0x01 else None
                if disposal == 3:
                    raise NotImplementedError(
                        "GIF disposal method 3 (restore previous) is not "
                        "supported"
                    )
            # skip this extension's (remaining) sub-blocks
            while True:
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                pos += size
        elif block == 0x2C:  # image descriptor
            il, it, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    payload, np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image has no color table")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while True:
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                lzw += payload[pos : pos + size]
                pos += size
            idx = _lzw_decode(bytes(lzw), mcs)
            if len(idx) < iw * ih:
                raise ValueError("GIF frame pixel data is short")
            rows = np.asarray(idx[: iw * ih], dtype=np.int64).reshape(ih, iw)
            if (rows >= len(table)).any():
                raise ValueError("GIF pixel index outside color table")
            if iflags & 0x40:
                rows = _deinterlace(rows)
            if it + ih > h or il + iw > w:
                raise ValueError("GIF frame rect outside logical screen")
            rect = canvas[it : it + ih, il : il + iw]
            rgb = table[rows]
            if transparent is not None:
                mask = rows != transparent
                rect[mask] = rgb[mask]
            else:
                rect[:] = rgb
            frames.append(canvas.copy())
            delays.append(delay * 10)  # GCE delay is in 1/100 s
            if disposal == 2:
                canvas[it : it + ih, il : il + iw] = bg_rgb
            disposal = 0
            transparent = None
            delay = 0
        else:
            raise ValueError("unknown GIF block 0x%02X" % block)
    if not frames:
        raise ValueError("GIF stream has no image data")
    return np.stack(frames), delays


def decode_gif(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 — the first frame."""
    return decode_gif_frames(payload)[0][0]


def decode_gif_gray(payload: bytes) -> np.ndarray:
    """(h, w) uint8 gray projection ((r+g+b)//3), matching the PNG/BMP/
    JPEG convention the shared multimodal operators use."""
    rgb = decode_gif(payload)
    return (rgb.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (grayscale palette)
# ---------------------------------------------------------------------------

def encode_gif(
    frames: np.ndarray, delays_ms=None, loop: bool = True
) -> bytes:
    """REAL GIF89a bytes from an (h, w) gray image or an (n, h, w) gray
    animation — 256-entry grayscale global palette, variable-width LZW.
    ``delays_ms`` (per frame or scalar) emits graphic-control blocks;
    multi-frame output carries the NETSCAPE looping extension when
    ``loop``. Lossless for gray inputs by construction (the palette is
    the identity on gray levels) — round-trips exactly, gated in tests."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[None]
    if arr.ndim != 3:
        raise ValueError("encode_gif takes (h, w) or (n, h, w) gray uint8")
    n, h, w = arr.shape
    if delays_ms is None:
        delays = [0] * n
    elif np.isscalar(delays_ms):
        delays = [int(delays_ms)] * n
    else:
        delays = [int(d) for d in delays_ms]
        if len(delays) != n:
            raise ValueError("delays_ms length must match frame count")

    out = bytearray(b"GIF89a")
    # logical screen: global table flag, 8-bit color resolution, 256 entries
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)  # (i, i, i) gray
    out += pal.tobytes()
    if n > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    for fi in range(n):
        if n > 1 or delays[fi]:
            out += b"\x21\xf9" + bytes([4, 0]) + struct.pack(
                "<H", max(0, delays[fi] // 10)
            ) + bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([8])  # LZW minimum code size for a 256-color palette
        out += _sub_blocks(_lzw_encode(arr[fi].reshape(-1), 8))
    out += b"\x3b"
    return bytes(out)
