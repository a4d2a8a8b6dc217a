"""Multimodal span processing (image/audio/table spans).

The interleaved documents carry media as opaque references
(``media_ref``) with typed metadata; real payloads would be ``binary``
columns.  No image/audio codecs exist in this container, so the decode
kernels are STUBBED (deterministic fake features, clearly marked) —
the Ray-side plumbing is real and tested: schema, actor-pool stage
shape, per-kind batch routing, small-batch sizing for wide rows.

A real deployment replaces ``_fake_decode`` with e.g. PIL/ffmpeg calls
in ``__init__``-loaded codecs; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import stable_u32

MEDIA_FEATURE_DIM = 32


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """documents -> one row per media span (doc_id, span_idx, kind,
    media_ref).  Text spans are not emitted — they go down the NLP
    branch; the split is the pipeline's modality router."""
    doc_ids = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    d, i, k, r = [], [], [], []
    for did, spans in zip(doc_ids, spans_col):
        for idx, s in enumerate(spans or []):
            if s["kind"] != "text":
                d.append(did)
                i.append(idx)
                k.append(s["kind"])
                r.append(s["media_ref"])
    return pa.table(
        {
            "doc_id": pa.array(d, pa.string()),
            "span_idx": pa.array(i, pa.int32()),
            "kind": pa.array(k, pa.string()),
            "media_ref": pa.array(r, pa.string()),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool stage: media row -> fixed-dim feature vector.

    STUB: features are a seeded function of the media_ref (no codecs in
    this environment).  The actor interface (codec "loaded" once in
    ``__init__``, small batch_size for wide binary rows, one output row
    per input row) is the real contract.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict  # strict=True: behave like a missing codec

    def _fake_decode(self, kind: str, ref: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "media decode requires image/audio codecs not present in "
                "this environment; deterministic fake features used in "
                "non-strict mode"
            )
        rng = np.random.default_rng(stable_u32(kind + ":" + ref, "media:"))
        return rng.standard_normal(MEDIA_FEATURE_DIM).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        feats = np.stack(
            [self._fake_decode(k, r) for k, r in zip(kinds, refs)]
        ) if len(kinds) else np.zeros((0, MEDIA_FEATURE_DIM), np.float32)
        n = len(kinds)
        offsets = np.arange(0, (n + 1) * MEDIA_FEATURE_DIM, MEDIA_FEATURE_DIM)
        feat_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(feats.ravel(), pa.float32())
        )
        return batch.append_column("features", feat_col)


class ImageResize:
    """Image decode + resize stage (actor pool).

    STUB decode (no codecs in this container): the "decoded image" is a
    seeded uint8 array whose shape derives from the media_ref; the
    resize itself is REAL (numpy nearest-neighbor sampling) and the
    output contract is what production code keeps: fixed (H, W)
    flattened uint8 + original dims.  Wide binary rows -> use small
    ``batch_size`` (and a larger ``DataContext.target_max_block_size``)
    so a batch x concurrency fits worker heaps.
    """

    def __init__(self, out_h: int = 16, out_w: int = 16, strict: bool = False):
        self.out_h, self.out_w = out_h, out_w
        self.strict = strict

    def _fake_decode(self, ref: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError("image codecs not available in this env")
        rng = np.random.default_rng(stable_u32(ref, "img:"))
        h = 32 + int(rng.integers(0, 64))
        w = 32 + int(rng.integers(0, 64))
        return rng.integers(0, 256, (h, w), dtype=np.uint8)

    @staticmethod
    def resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        """Real nearest-neighbor resize (index sampling)."""
        h, w = img.shape
        ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
        xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        pixels, hs, ws = [], [], []
        for r in refs:
            img = self._fake_decode(r)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            pixels.append(self.resize_nn(img, self.out_h, self.out_w).ravel())
        n = len(refs)
        flat = (
            np.concatenate(pixels)
            if pixels
            else np.zeros(0, np.uint8)
        )
        offs = np.arange(0, (n + 1) * self.out_h * self.out_w, self.out_h * self.out_w)
        col = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(flat, pa.uint8())
        )
        return (
            batch.append_column("pixels", col)
            .append_column("src_h", pa.array(hs, pa.int32()))
            .append_column("src_w", pa.array(ws, pa.int32()))
        )


class AudioFrameSample:
    """Audio decode + frame sampling stage (actor pool).

    STUB decode -> seeded waveform; REAL frame sampling: every
    ``hop``-th window of ``frame`` samples, energy per frame.  Output:
    fixed ``n_frames`` float32 energies per row.
    """

    def __init__(self, n_frames: int = 8, frame: int = 256, strict: bool = False):
        self.n_frames, self.frame = n_frames, frame
        self.strict = strict

    def _fake_decode(self, ref: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError("audio codecs not available in this env")
        rng = np.random.default_rng(stable_u32(ref, "aud:"))
        n = 2048 + int(rng.integers(0, 6144))
        return rng.standard_normal(n).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        out = np.zeros((len(refs), self.n_frames), dtype=np.float32)
        for i, r in enumerate(refs):
            wav = self._fake_decode(r)
            hop = max(1, (len(wav) - self.frame) // max(1, self.n_frames - 1))
            for j in range(self.n_frames):
                s = min(j * hop, max(0, len(wav) - self.frame))
                seg = wav[s : s + self.frame]
                out[i, j] = float(np.sqrt((seg**2).mean()))
        n = len(refs)
        offs = np.arange(0, (n + 1) * self.n_frames, self.n_frames)
        col = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(out.ravel(), pa.float32())
        )
        return batch.append_column("frame_energy", col)


def route_media(spans_ds, kind: str):
    """Modality router: media-span rows of one kind (the per-kind
    stages above consume the routed stream with kind-appropriate
    batch sizes)."""
    import pyarrow.compute as pc

    return spans_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], kind)), batch_format="pyarrow"
    )


def media_stats(batch: pa.Table) -> pa.Table:
    """Per-batch partial media counts by kind (combiner for the
    modality histogram)."""
    g = batch.group_by("kind").aggregate([([], "count_all")])
    return pa.table({"kind": g["kind"], "n": g["count_all"]})


# ------------------------------------------------ REAL codecs (no deps)
#
# The stubbed stages above stand in for formats whose codecs are absent
# from this container (jpeg/png/mp3/...).  The formats below are
# decodable with the stdlib + numpy alone, so their paths are REAL end
# to end: real bytes -> real decode -> the same real resize/frame math.


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6) bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes -> (H, W, 3) uint8.  Pure bytes/numpy
    parsing: magic, whitespace/comment-tolerant header, raster."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raster = np.frombuffer(data, np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized (int32 in, int32 out)."""
    p = a + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) uint8 grayscale or (H, W, 3) uint8 RGB -> PNG bytes
    (8-bit, non-interlaced).  Rows cycle through filter types 0-4 so a
    round trip exercises EVERY defilter path in ``decode_png``."""
    import struct
    import zlib

    if img.ndim == 2:
        color_type = 0
        arr = img[:, :, None].astype(np.int32)
    else:
        assert img.shape[2] == 3
        color_type = 2
        arr = img.astype(np.int32)
    h, w, ch = arr.shape
    out = bytearray()
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        row = arr[y]
        left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
        upleft = np.vstack([np.zeros((1, ch), np.int32), prev[:-1]])
        f = y % 5
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            filt = row - left
        elif f == 2:  # Up
            filt = row - prev
        elif f == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            filt = row - _paeth_pred(left, prev, upleft)
        out.append(f)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W) or (H, W, 3) uint8.  Stdlib zlib inflate +
    numpy defiltering (None/Sub/Up/Average/Paeth per the PNG spec);
    supports 8-bit grayscale (color type 0) and truecolor (2),
    non-interlaced — round-3 verdict #7's real-decode extension.  Sub
    rows defilter as a mod-256 cumsum; Average/Paeth rows carry a true
    in-row recurrence and scan left-to-right with per-pixel channel
    vectors."""
    import struct
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_m, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp != 0 or filt_m != 0:
        raise ValueError("only 8-bit gray/RGB non-interlaced PNG supported")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = 1 if color_type == 0 else 3
    raw = zlib.decompress(bytes(idat))
    stride = 1 + w * ch
    if len(raw) != h * stride:
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, w, ch), np.int32)
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        f = raw[y * stride]
        cur = np.frombuffer(
            raw, np.uint8, count=w * ch, offset=y * stride + 1
        ).reshape(w, ch).astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-1] -> mod-256 cumsum
            rec = np.cumsum(cur, axis=0, dtype=np.int64) & 0xFF
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 3:  # Average: in-row recurrence
            rec = cur.copy()
            left = np.zeros(ch, np.int32)
            for x in range(w):
                left = (cur[x] + (left + prev[x]) // 2) & 0xFF
                rec[x] = left
        elif f == 4:  # Paeth: in-row recurrence
            rec = cur.copy()
            left = np.zeros(ch, np.int32)
            for x in range(w):
                upleft = prev[x - 1] if x else np.zeros(ch, np.int32)
                left = (cur[x] + _paeth_pred(left, prev[x], upleft)) & 0xFF
                rec[x] = left
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec
        prev = out[y]
    img = out.astype(np.uint8)
    return img[:, :, 0] if color_type == 0 else img


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bit BI_RGB BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR byte order, rows padded to
    4 bytes — the Windows 3.x baseline every viewer reads)."""
    import struct

    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    data_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    # bottom-up, BGR, padded: one vectorized flip + channel reverse
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = img[::-1, :, ::-1].reshape(h, row)
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB.
    Handles both bottom-up (positive height) and top-down (negative)
    row orders; numpy strided de-pad, no per-pixel Python."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, np.uint8, count=stride * h, offset=data_off)
    rows = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = rows if top_down else rows[::-1]
    return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB


def _gif_lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW over a palette-index stream (variable code
    width mcs+1..12, LSB-first bit packing, clear/EOI codes)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table: dict[tuple[int, int], int] = {}
    next_code, width = eoi + 1, mcs + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    emit(clear)
    cur = int(indices[0])
    for k in indices[1:]:
        k = int(k)
        nxt = table.get((cur, k))
        if nxt is not None:
            cur = nxt
            continue
        emit(cur)
        table[(cur, k)] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            # GIF "deferred" growth: width bumps when next_code EXCEEDS
            # the current range (encoder emits old-width codes only)
            width += 1
        if next_code >= 4095:
            emit(clear)
            table.clear()
            next_code, width = eoi + 1, mcs + 1
        cur = k
    emit(cur)
    emit(eoi)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int, n_px: int) -> np.ndarray:
    """Inverse of ``_gif_lzw_encode`` -> uint8 index array."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    out = bytearray()
    acc = n_bits = pos = 0
    prev: bytes | None = None
    while len(out) < n_px:
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width, prev = mcs + 1, None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_px]), np.uint8)


def encode_gif(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB with <=256 distinct colors -> single-frame
    GIF89a bytes (global color table, no interlace)."""
    import struct

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    flat = img.reshape(-1, 3)
    palette, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <=256 distinct colors")
    # color table size field: 2^(s+1) entries, minimum 2
    s = max(1, int(np.ceil(np.log2(max(2, len(palette)))))) - 1
    n_entries = 1 << (s + 1)
    gct = np.zeros((n_entries, 3), np.uint8)
    gct[: len(palette)] = palette
    mcs = max(2, s + 1)
    body = _gif_lzw_encode(inv.astype(np.int64), mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | s, 0, 0)  # LSD + GCT flag
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(mcs)
    for i in range(0, len(body), 255):  # sub-block framing
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a bytes -> first frame as (H, W, 3) uint8 RGB.  One
    block-walk parser for the whole module: this is
    ``decode_gif_frames(data)[0]`` (single-frame payloads decode a
    1-frame stack)."""
    return decode_gif_frames(data)[0]


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 [-1, 1] mono -> 16-bit PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV bytes -> (float32 mono samples in [-1, 1], rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
        pcm = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
        if f.getnchannels() > 1:
            pcm = pcm.reshape(-1, f.getnchannels()).mean(axis=1)
    return pcm, rate


def synth_payload(kind: str, ref: str) -> bytes:
    """Deterministic REAL media payload for a span reference: a valid
    P6 PPM for image spans, a valid 16-bit PCM WAV for audio spans —
    the test stand-in for fetching the bytes ``media_ref`` points at
    (content is seeded by the ref, so any partitioning/retry re-creates
    identical bytes)."""
    rng = np.random.default_rng(stable_u32(kind + ":" + ref, "payload:"))
    if kind == "image":
        h = 8 + int(rng.integers(0, 24))
        w = 8 + int(rng.integers(0, 24))
        pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        # refs split across PNG / BMP / GIF / PPM — the decoder
        # dispatches on magic bytes, so the pipeline exercises all four
        # real codecs
        pick = int(rng.integers(0, 4))
        if pick == 0:
            return encode_png(pixels)
        if pick == 1:
            return encode_bmp(pixels)
        if pick == 2:
            # GIF is palettized: quantize to 4 levels/channel (<=64
            # distinct colors) — still seeded-deterministic
            return encode_gif(pixels & 0xC0)
        return encode_ppm(pixels)
    if kind == "audio":
        n = 1600 + int(rng.integers(0, 4800))
        t = np.arange(n, dtype=np.float32)
        freq = 100.0 + float(rng.integers(0, 300))
        return encode_wav(0.5 * np.sin(2 * np.pi * freq * t / 16000.0))
    if kind == "video":
        f = 3 + int(rng.integers(0, 6))
        h = 8 + int(rng.integers(0, 16))
        w = 8 + int(rng.integers(0, 16))
        # <=64 distinct colors so the animation fits one GIF palette
        frames = rng.integers(0, 256, (f, h, w, 3), dtype=np.uint8) & 0xC0
        return encode_gif_anim(frames)
    raise NotImplementedError(f"no synthesizable codec for kind={kind!r}")


class BinaryMediaDecoder:
    """Actor-pool stage over REAL binary payloads -> per-row features:
    image (PPM, PNG, BMP, GIF or baseline JPEG, dispatched on magic
    bytes) rows decode,
    nearest-neighbor-resize to 8x8 grayscale
    and emit the 64 pixels + source dims; audio (WAV) rows decode and
    emit 8 frame RMS energies + sample count.  Output is one row per
    input with a fixed-width float32 ``media_feat`` column (images:
    pixels/255; audio: energies zero-padded to 64) so both modalities
    union into one feature table.

    This is the non-stub twin of MediaFeatureExtractor: the decode is
    real for container-decodable formats; formats needing external
    codecs still route to the strict stub.  batch_size stays small —
    rows are wide (binary payloads)."""

    WIDTH = 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        n = len(kinds)
        feats = np.zeros((n, self.WIDTH), np.float32)
        dims = np.zeros((n, 2), np.int32)
        for i, (k, data) in enumerate(zip(kinds, payloads)):
            if k == "image":
                # one magic-byte dispatch for all five real codecs
                img = decode_image(data)
                gray = img.mean(axis=2).astype(np.uint8)
                small = ImageResize.resize_nn(gray, 8, 8)
                feats[i] = small.ravel().astype(np.float32) / 255.0
                dims[i] = (img.shape[0], img.shape[1])
            elif k == "audio":
                pcm, rate = decode_wav(data)
                frame = max(1, len(pcm) // 8)
                for j in range(8):
                    seg = pcm[j * frame : (j + 1) * frame]
                    feats[i, j] = float(np.sqrt((seg**2).mean())) if len(seg) else 0.0
                dims[i] = (len(pcm), rate)
            else:
                raise NotImplementedError(f"no codec for kind={k!r}")
        offs = np.arange(0, (n + 1) * self.WIDTH, self.WIDTH)
        col = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(feats.ravel(), pa.float32())
        )
        return (
            batch.drop_columns(["payload"])
            .append_column("media_feat", col)
            .append_column("dim0", pa.array(dims[:, 0], pa.int32()))
            .append_column("dim1", pa.array(dims[:, 1], pa.int32()))
        )


# ------------------------------------- header sniffing + perceptual hashes


def decode_image(data: bytes) -> np.ndarray:
    """Magic-byte dispatch over the five real image codecs (PNG, BMP,
    GIF, PPM, baseline JPEG) -> (H, W, 3) uint8.  Grayscale PNG/JPEG
    is expanded to 3 channels so every caller sees one layout."""
    if data.startswith(_PNG_SIG):
        img = decode_png(data)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    if data.startswith(b"BM"):
        return decode_bmp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    if data.startswith(b"P6"):
        return decode_ppm(data)
    if data[:2] == b"\xff\xd8":
        img = decode_jpeg(data)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    raise ValueError("unknown image container (magic bytes)")


def sniff_media_meta(data: bytes) -> tuple[str, int, int]:
    """Container metadata from HEADER BYTES ONLY — no decode.

    This is the 100-TB path for shape/format statistics: a metadata
    scan reads tens of header bytes per blob instead of inflating the
    payload (for PNG that skips the whole zlib stream).  Returns
    ``(fmt, d0, d1)``: images -> (fmt, height, width); WAV ->
    ("wav", n_samples, sample_rate).  Pinned against the real decoders
    by pytest (sniff == decode on every codec).
    """
    if data.startswith(_PNG_SIG):
        # IHDR is always the first chunk: length(4) type(4) at 8,
        # width/height big-endian u32 at 16/20
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return "png", h, w
    if data.startswith(b"BM"):
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        return "bmp", abs(h), w  # negative height = top-down rows
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return "gif", h, w
    if data.startswith(b"P6"):
        pos, fields = 2, []
        while len(fields) < 2:  # width, height only — stop before raster
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                pos = data.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        return "ppm", fields[1], fields[0]
    if data[:2] == b"\xff\xd8":
        # walk marker segments to SOF0/SOF2: height/width live there.
        # For JFIF files without EXIF blobs SOFn sits well inside the
        # 256-byte window; an EXIF-laden file falls back to full payload
        # via sniff_meta_batch's per-row retry.
        pos = 2
        while pos + 9 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError("JPEG marker misalignment")
            while pos + 9 <= len(data) and data[pos + 1] == 0xFF:
                pos += 1  # optional fill bytes (T.81 B.1.1.2)
            marker = data[pos + 1]
            if marker in (
                0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
            ):  # every SOFn shares the height/width layout
                hh = int.from_bytes(data[pos + 5 : pos + 7], "big")
                ww = int.from_bytes(data[pos + 7 : pos + 9], "big")
                return "jpeg", hh, ww
            pos += 2 + int.from_bytes(data[pos + 2 : pos + 4], "big")
        raise ValueError("JPEG SOF beyond the header window")
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        # walk chunk headers only (8 bytes each + declared size)
        pos, rate, block_align, n_samples = 12, 0, 2, 0
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            if cid == b"fmt ":
                channels = int.from_bytes(data[pos + 10 : pos + 12], "little")
                rate = int.from_bytes(data[pos + 12 : pos + 16], "little")
                bits = int.from_bytes(data[pos + 22 : pos + 24], "little")
                block_align = max(1, channels * bits // 8)
            elif cid == b"data":
                n_samples = size // block_align
                return "wav", n_samples, rate  # data body is never read
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        # no data chunk inside the bytes seen: header window too small
        raise ValueError("WAVE data chunk beyond the header window")
    raise ValueError("unknown media container (magic bytes)")


SNIFF_HEADER_BYTES = 256  # covers every fixed-offset header + the RIFF walk


def sniff_meta_batch(batch: pa.Table) -> pa.Table:
    """Stateless metadata-scan stage: (..., payload) -> (..., fmt,
    dim0, dim1) touching only header bytes: ``pc.binary_slice`` cuts
    the first 256 bytes per row BEFORE anything crosses into Python,
    so per-blob work is O(header), not O(payload) (a PNG's zlib stream
    is never copied).  The rare container whose metadata lies past the
    window (e.g. a WAV with a huge pre-data LIST chunk) falls back to
    the full payload for that row only."""
    col = batch["payload"]
    heads = pc.binary_slice(col, 0, SNIFF_HEADER_BYTES)
    fmts, d0s, d1s = [], [], []
    for i, head in enumerate(heads.to_pylist()):
        try:
            fmt, d0, d1 = sniff_media_meta(head)
        except (ValueError, IndexError):
            if len(head) < SNIFF_HEADER_BYTES:
                raise  # whole payload seen — genuinely unknown container
            fmt, d0, d1 = sniff_media_meta(col[i].as_py())
        fmts.append(fmt)
        d0s.append(d0)
        d1s.append(d1)
    return (
        batch.drop_columns(["payload"])
        .append_column("fmt", pa.array(fmts, pa.string()))
        .append_column("dim0", pa.array(d0s, pa.int64()))
        .append_column("dim1", pa.array(d1s, pa.int64()))
    )


def _dct_basis(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix B (n x n): ``B @ x`` is the
    1-D DCT-II of x; ``B @ img @ B.T`` the 2-D transform."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    B = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    B[0] *= np.sqrt(0.5)
    return B


_PHASH_B8 = _dct_basis(32)[:8]  # only the 8 low-frequency rows are needed


def phash64(grays: np.ndarray) -> np.ndarray:
    """DCT perceptual hash: (n, 32, 32) float grayscale -> (n,) int64.

    Standard pHash construction (Zauner 2010 / the imagehash
    convention): 2-D DCT-II, keep the 8x8 low-frequency block, bit =
    coefficient > median(block).  Robust to small pixel noise,
    re-encoding and resizing because low-frequency structure survives
    all three.  Vectorized across the batch: one einsum computes the
    low-frequency block directly (8x32 basis slices both sides), no
    full 32x32 transform."""
    low = np.einsum(
        "ky,nyx,jx->nkj", _PHASH_B8, grays.astype(np.float64), _PHASH_B8
    )
    flat = low.reshape(len(grays), 64)
    med = np.median(flat, axis=1, keepdims=True)
    bits = (flat > med).astype(np.uint64)
    words = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return words.view(np.int64)


N_FP_FRAMES = 9  # 9 frames x 9 bands -> 8x8 delta bits = 64


def audio_fp64(pcm: np.ndarray) -> int:
    """64-bit audio fingerprint: the Haitsma-Kalker (2002) bit rule
    over a 9-frame x 9-band energy grid.

    The signal splits into 9 equal frames; each frame's rfft power is
    summed into 9 log-spaced frequency bands; bit[t, b] = sign of the
    time-difference of the band-difference
    ``E[t,b]-E[t,b+1] - (E[t-1,b]-E[t-1,b+1])`` -> 8x8 = 64 bits.
    Differential in both axes, so the hash is invariant to overall
    gain and robust to broadband noise."""
    n = len(pcm) // N_FP_FRAMES
    if n < 20:
        # too short for 9 distinct bands (needs n//2+1 >= 11 rfft
        # bins): zero-pad to the minimum frame width — deterministic,
        # content-dependent, and crash-free on arbitrarily short PCM
        pcm = np.pad(
            np.asarray(pcm, dtype=np.float64),
            (0, 20 * N_FP_FRAMES - len(pcm)),
        )
        n = 20
    frames = pcm[: n * N_FP_FRAMES].reshape(N_FP_FRAMES, n).astype(np.float64)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (9, n//2+1)
    n_bins = power.shape[1]
    edges = np.unique(
        np.geomspace(1, n_bins - 1, N_FP_FRAMES + 1).astype(np.int64)
    )
    if len(edges) < N_FP_FRAMES + 1:
        # log spacing collapsed at the low end: fill with the smallest
        # unused bins, keeping every edge < n_bins (valid reduceat
        # indices at ANY length — n >= 20 guarantees enough bins)
        extra = np.setdiff1d(np.arange(1, n_bins, dtype=np.int64), edges)
        edges = np.sort(
            np.concatenate([edges, extra[: N_FP_FRAMES + 1 - len(edges)]])
        )
    E = np.add.reduceat(power[:, : edges[-1]], edges[:-1], axis=1)  # (9, 9)
    D = E[:, :-1] - E[:, 1:]  # band deltas (9, 8)
    bits = (D[1:] - D[:-1] > 0).astype(np.uint64).ravel()  # (8*8,)
    return int(
        (bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).view(
            np.int64
        )
    )


class PerceptualHasher:
    """Actor-pool stage: REAL media payloads -> 64-bit perceptual
    signatures suitable for the generic banded Hamming near-dup join
    (ops/dedup.hamming64_neardup_pairs).

    Images (PNG/BMP/GIF/PPM, magic dispatch): decode -> grayscale ->
    32x32 nearest-neighbor resize -> DCT pHash, batched through one
    einsum.  Audio (WAV): decode -> 9x9 band-energy grid ->
    Haitsma-Kalker delta bits.  Output rows are NARROW (ref + int64) —
    the payload bodies never leave this stage, which is what makes the
    downstream self-join shuffle metadata-sized at corpus scale."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        n = len(kinds)
        sigs = np.zeros(n, dtype=np.int64)
        img_idx = [i for i, k in enumerate(kinds) if k == "image"]
        if img_idx:
            grays = np.zeros((len(img_idx), 32, 32), dtype=np.float64)
            for j, i in enumerate(img_idx):
                img = decode_image(payloads[i])
                gray = img.mean(axis=2)
                ys = (np.arange(32) * gray.shape[0] // 32).clip(
                    0, gray.shape[0] - 1
                )
                xs = (np.arange(32) * gray.shape[1] // 32).clip(
                    0, gray.shape[1] - 1
                )
                grays[j] = gray[np.ix_(ys, xs)]
            sigs[img_idx] = phash64(grays)
        for i, k in enumerate(kinds):
            if k == "audio":
                pcm, _rate = decode_wav(payloads[i])
                sigs[i] = audio_fp64(pcm)
            elif k != "image":
                raise NotImplementedError(f"no perceptual hash for kind={k!r}")
        return (
            batch.drop_columns(["payload"])
            .append_column("sig", pa.array(sigs, pa.int64()))
        )


def synth_neardup_payload(kind: str, ref: str, n_families: int = 4) -> bytes:
    """Deterministic payload WITH PLANTED NEAR-DUPLICATES: ~20% of refs
    collapse into ``n_families`` content families (same base content,
    per-ref low-amplitude noise — a re-encoded/lightly-edited copy);
    the rest are unique.  Seeded by the ref alone, so any
    partitioning/retry regenerates identical bytes."""
    r = stable_u32(ref, "dupfam:") % 100
    if r < 20:
        seed_key = f"family:{kind}:{r % n_families}"
    else:
        seed_key = f"unique:{kind}:{ref}"
    rng = np.random.default_rng(stable_u32(seed_key, "payload2:"))
    noise_rng = np.random.default_rng(stable_u32(ref, "noise:"))
    if kind == "image":
        h = 24 + int(rng.integers(0, 16))
        w = 24 + int(rng.integers(0, 16))
        # smooth base (low-frequency content) so +-1 pixel noise cannot
        # flip low-frequency DCT signs: upsample an 8x8 coarse grid
        coarse = rng.integers(30, 226, (8, 8, 3))
        ys = (np.arange(h) * 8 // h).clip(0, 7)
        xs = (np.arange(w) * 8 // w).clip(0, 7)
        base = coarse[np.ix_(ys, xs)]
        noisy = np.clip(
            base + noise_rng.integers(-1, 2, base.shape), 0, 255
        ).astype(np.uint8)
        pick = int(noise_rng.integers(0, 3))  # codec varies per REF:
        if pick == 0:  # the same content re-encoded in another container
            return encode_png(noisy)
        if pick == 1:
            return encode_bmp(noisy)
        return encode_ppm(noisy)
    if kind == "audio":
        # broadband base (family-seeded filtered noise) so EVERY
        # fingerprint band carries signal-scale energy — the delta
        # bits then have wide margins and per-ref noise cannot flip
        # them, while independent bases decorrelate completely
        n = 3200 + int(rng.integers(0, 3200))
        base = rng.standard_normal(4 * 3200)
        sig = 0.4 * base[:n] + 0.01 * noise_rng.standard_normal(n)
        return encode_wav(np.clip(sig, -1, 1).astype(np.float32))
    if kind == "video":
        # family base = a palette-quantized slideshow (per-frame smooth
        # coarse grids); per-ref noise shifts ~2% of pixels by ONE
        # quantization level — a re-encoded/lightly-edited copy whose
        # per-frame pHash stays within the detection threshold
        f = 5 + int(rng.integers(0, 4))
        h = 20 + int(rng.integers(0, 12))
        w = 20 + int(rng.integers(0, 12))
        coarse = (rng.integers(0, 4, (f, 8, 8, 3)) * 0x40).astype(np.int64)
        ys = (np.arange(h) * 8 // h).clip(0, 7)
        xs = (np.arange(w) * 8 // w).clip(0, 7)
        base = coarse[:, ys][:, :, xs]
        flip = noise_rng.random(base.shape) < 0.02
        step = noise_rng.integers(0, 2, base.shape) * 0x80 - 0x40  # +-0x40
        noisy = np.clip(base + flip * step, 0, 0xC0).astype(np.uint8)
        return encode_gif_anim(noisy)
    raise NotImplementedError(f"no synthesizable codec for kind={kind!r}")


# --------------------------------------------------- video (animated GIF)


def encode_gif_anim(frames: np.ndarray, delay_cs: int = 10) -> bytes:
    """(F, H, W, 3) uint8 RGB (<=256 distinct colors across ALL
    frames) -> animated GIF89a bytes: one global color table, a
    Graphic Control Extension (delay) + full-frame image descriptor
    per frame.  The container-decodable VIDEO stand-in — every byte
    real, no external codec."""
    import struct

    f, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8 and f >= 1
    flat = frames.reshape(-1, 3)
    palette, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif_anim needs <=256 distinct colors")
    s = max(1, int(np.ceil(np.log2(max(2, len(palette)))))) - 1
    n_entries = 1 << (s + 1)
    gct = np.zeros((n_entries, 3), np.uint8)
    gct[: len(palette)] = palette
    mcs = max(2, s + 1)
    inv = inv.astype(np.int64).reshape(f, h * w)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | s, 0, 0)
    out += gct.tobytes()
    for fi in range(f):
        # GCE: no disposal, no transparency, delay in centiseconds
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay_cs, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(mcs)
        body = _gif_lzw_encode(inv[fi], mcs)
        for i in range(0, len(body), 255):
            chunk = body[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> np.ndarray:
    """GIF87a/89a bytes -> (F, H, W, 3) uint8: EVERY image block, each
    pasted onto the logical-screen canvas at its (left, top) offset
    (paste-over compositing; disposal methods beyond 'none' are not
    produced by our encoder and not interpreted)."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 0x07) + 1)
        gct = np.frombuffer(data, np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), np.uint8)
    frames: list[np.ndarray] = []
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            il, it, iw, ih, iflags = struct.unpack(
                "<HHHHB", data[pos + 1 : pos + 10]
            )
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 1 << ((iflags & 0x07) + 1)
                ct = np.frombuffer(
                    data, np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if ct is None:
                raise ValueError("GIF image without a color table")
            mcs = data[pos]
            pos += 1
            body = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                body += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # block terminator
            idx = _gif_lzw_decode(bytes(body), mcs, iw * ih)
            canvas[it : it + ih, il : il + iw] = ct[idx].reshape(ih, iw, 3)
            frames.append(canvas.copy())
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image block")
    return np.stack(frames)


def sample_frames(frames: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """REAL frame sampling: (F, ...) -> up to k frames at evenly
    spaced indices (always includes the first; the last when k > 1).
    Returns (sampled, indices)."""
    f = len(frames)
    if f <= k:
        idx = np.arange(f, dtype=np.int64)
    elif k <= 1:  # k == 1 keeps the first frame (no divide-by-zero)
        idx = np.zeros(1, dtype=np.int64)
    else:
        idx = np.unique((np.arange(k, dtype=np.int64) * (f - 1)) // (k - 1))
    return frames[idx], idx


class VideoFrameHasher:
    """Actor-pool stage: animated-GIF video payloads -> one row PER
    SAMPLED FRAME (media_ref, frame_idx, sig): real decode, real
    evenly-spaced frame sampling (``sample_frames``), DCT pHash per
    frame batched through one einsum.  Feeds the frame-level banded
    Hamming join whose per-video aggregation is the standard
    content-based video near-dup shape (frame-hash LSH -> matched-
    frame count per video pair)."""

    def __init__(self, max_frames: int = 8):
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_ref: list[str] = []
        out_idx: list[int] = []
        grays: list[np.ndarray] = []
        for ref, data in zip(refs, payloads):
            frames, idx = sample_frames(
                decode_gif_frames(data), self.max_frames
            )
            gray = frames.mean(axis=3)
            hh, ww = gray.shape[1], gray.shape[2]
            ys = (np.arange(32) * hh // 32).clip(0, hh - 1)
            xs = (np.arange(32) * ww // 32).clip(0, ww - 1)
            grays.append(gray[:, ys][:, :, xs])
            out_ref.extend([ref] * len(idx))
            out_idx.extend(idx.tolist())
        sigs = (
            phash64(np.concatenate(grays))
            if grays
            else np.zeros(0, np.int64)
        )
        return pa.table(
            {
                "media_ref": pa.array(out_ref, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "sig": pa.array(sigs, pa.int64()),
            }
        )


# ----------------------------------------------- baseline JPEG (ITU T.81)
#
# A real, spec-shaped baseline sequential JPEG codec in pure numpy +
# stdlib: 8x8 DCT blocks, Annex-K.1 quantization tables with libjpeg
# quality scaling, canonical Huffman entropy coding, JFIF container
# (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, 0xFF byte stuffing).  The Huffman
# code-length assignment is a FLAT canonical alphabet (every DC size
# symbol at 4 bits, every AC (run,size) symbol at 8 bits) instead of
# Annex K.3's frequency-tuned lengths: the DHT segment carries the
# table, so any spec-compliant decoder reads it — we trade a few
# percent of compression for a construction that is verifiable by
# inspection.  4:4:4 sampling (no chroma subsampling), 3-channel RGB
# or single-channel grayscale.  Graft-brief media surface (the
# reference has none); like the PNG/BMP/GIF/WAV codecs above this is
# the per-payload leaf of an actor-pool decode stage, never a
# driver-side loop.

_JPEG_QL = np.array(  # Annex K.1 luminance, row-major
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], np.float64)
_JPEG_QC = np.array(  # Annex K.1 chrominance
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, np.float64)

# zig-zag scan order: index i of the zig-zag sequence -> row-major slot
_ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# flat canonical alphabets: DC sizes 0..11 at 4 bits; AC symbols
# (run<<4)|size for run 0..15, size 1..10, plus EOB=0x00 and ZRL=0xF0,
# all at 8 bits (162 symbols <= 256 -> a valid prefix code)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: symbol -> (code, length)."""
    assert sum(bits) == len(vals)
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


_DCT8 = None


def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (cached)."""
    global _DCT8
    if _DCT8 is None:
        n = 8
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        m = np.cos((2 * x + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT8 = m
    return _DCT8


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base table -> uint8 in [1, 255]."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.float64)


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(H, W) float -> (nby*nbx, 8, 8) blocks, edge-padded, plus block
    grid dims.  Block order is row-major over the grid (the MCU order
    for 4:4:4)."""
    h, w = plane.shape
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    p = np.pad(plane, ((0, nby * 8 - h), (0, nbx * 8 - w)), mode="edge")
    return (
        p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        nby,
        nbx,
    )


def _deblockify(blocks: np.ndarray, nby: int, nbx: int, h: int, w: int):
    p = blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
    return p.reshape(nby * 8, nbx * 8)[:h, :w]


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put(0xFF, 8 - self.n)  # pad with 1-bits


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _encode_block(
    row: np.ndarray, dc_tab: dict, ac_tab: dict, bw: "_BitWriter",
    prev_dc: int,
) -> int:
    """Entropy-encode ONE quantized zig-zag coefficient row (64,).
    Returns the new DC predictor."""
    diff = int(row[0]) - prev_dc
    prev_dc = int(row[0])
    s, extra = _mag_bits(diff)
    c, ln = dc_tab[s]
    bw.put(c, ln)
    if s:
        bw.put(extra, s)
    nz = np.nonzero(row[1:])[0]
    pos = 0
    for idx in nz:
        run = int(idx) - pos
        while run >= 16:
            c, ln = ac_tab[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        s, extra = _mag_bits(int(row[1 + idx]))
        c, ln = ac_tab[(run << 4) | s]
        bw.put(c, ln)
        bw.put(extra, s)
        pos = int(idx) + 1
    if pos < 63:
        c, ln = ac_tab[0x00]  # EOB
        bw.put(c, ln)
    return prev_dc


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(table[_ZIGZAG].astype(np.uint8))
    return b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) uint8 gray -> baseline JFIF bytes
    (4:4:4, flat canonical Huffman tables carried in DHT)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _quality_scale(_JPEG_QL, quality)
    qc = _quality_scale(_JPEG_QC, quality)
    f = img.astype(np.float64)
    if gray:
        planes = [(f, ql)]
    else:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [(y, ql), (cb, qc), (cr, qc)]
    d = _dct8()
    zz_per_comp = []
    for plane, qt in planes:
        blocks, nby, nbx = _blockify(plane - 128.0)
        coef = np.einsum("ij,njk,lk->nil", d, blocks, d)
        qz = np.round(coef / qt.reshape(8, 8)).astype(np.int32)
        zz_per_comp.append(qz.reshape(-1, 64)[:, _ZIGZAG])

    out = bytearray(b"\xff\xd8")  # SOI
    out += (  # APP0 JFIF 1.01, no thumbnail
        b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += _dqt_segment(0, ql)
    ncomp = 1 if gray else 3
    if not gray:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])  # 1x1 sampling
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    if not gray:
        out += _dht_segment(0, 1, _DC_BITS, _DC_VALS)
        out += _dht_segment(1, 1, _AC_BITS, _AC_VALS)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    dc_tab = _huff_encode_table(_DC_BITS, _DC_VALS)
    ac_tab = _huff_encode_table(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    if gray:
        prev_dc = 0
        for row in zz_per_comp[0]:
            prev_dc = _encode_block(row, dc_tab, ac_tab, bw, prev_dc)
    else:
        # interleaved 4:4:4 MCU = one block of each component in turn
        prev = [0, 0, 0]
        n_mcu = zz_per_comp[0].shape[0]
        for m in range(n_mcu):
            for c in range(3):
                prev[c] = _encode_block(
                    zz_per_comp[c][m], dc_tab, ac_tab, bw, prev[c]
                )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:  # stuffed byte: 0xFF 0x00 -> literal 0xFF
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                # a real marker (EOI/RSTn) inside entropy data means the
                # stream is truncated or corrupt — fail loudly instead of
                # decoding the marker bytes as coefficients
                raise ValueError("JPEG entropy stream ended at a marker")
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 17:
            code = (code << 1) | self.bits(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: s-bit magnitude bits -> signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB (grayscale expands
    on return from ``decode_image``; here 1-component returns (H, W)).
    Supports baseline sequential, 8-bit, 4:4:4 (all sampling factors
    1x1), no restart intervals — exactly the shape ``encode_jpeg``
    emits, plus any other encoder constrained the same way.  Every
    malformed-payload path raises ValueError (the quarantine contract
    shared by the other codecs)."""
    try:
        return _decode_jpeg(data)
    except IndexError as e:  # truncated header / entropy stream
        raise ValueError("truncated JPEG payload") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan: list[tuple[int, int, int]] = []  # (cid, dc table, ac table)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker misalignment")
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1  # optional fill bytes before a marker (T.81 B.1.1.2)
        marker = data[pos + 1]
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit DQT not supported (baseline)")
                zz = np.frombuffer(body, np.uint8, 64, p + 1).astype(np.float64)
                t = np.empty(64, np.float64)
                t[_ZIGZAG] = zz  # stored in zig-zag order
                qtabs[tid] = t
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 (1x1 sampling) supported")
                comps.append((cid, tq))
        elif marker in (
            0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            raise ValueError("non-baseline JPEG (progressive/extended/lossless)")
        elif marker == 0xDD:
            if int.from_bytes(body[:2], "big") != 0:
                raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS: entropy data follows the segment
            ns = body[0]
            for c in range(ns):
                cid = body[1 + 2 * c]
                tt = body[2 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0x0F))
            pos += 2 + seglen
            break
        pos += 2 + seglen
    if not comps or not scan or h == 0:
        raise ValueError("JPEG missing SOF/SOS")
    if len(scan) != len(comps):
        # T.81 allows one SOS per component; returning just the Y scan
        # would silently decode a color image as grayscale
        raise ValueError("multi-scan baseline JPEG not supported")
    if h * w > 100_000_000:
        # quarantine guard: a corrupt header can declare 65535x65535
        # and the coefficient buffers allocate BEFORE entropy decode
        # would fail — cap at 100M pixels (a real need can raise this)
        raise ValueError("JPEG dimensions exceed the 100M-pixel guard")

    br = _BitReader(data[pos:])
    d = _dct8()
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    n_blocks = nby * nbx
    planes = []
    zz = [np.zeros((n_blocks, 64), np.int32) for _ in scan]
    prev = [0] * len(scan)
    for m in range(n_blocks):
        for ci, (cid, dct_id, act_id) in enumerate(scan):
            dc_tab = htabs[(0, dct_id)]
            ac_tab = htabs[(1, act_id)]
            s = br.huff(dc_tab)
            diff = _extend(br.bits(s), s) if s else 0
            prev[ci] += diff
            row = zz[ci][m]
            row[0] = prev[ci]
            k = 1
            while k < 64:
                sym = br.huff(ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                row[k] = _extend(br.bits(size), size)
                k += 1
    for ci, (cid, _, _) in enumerate(scan):
        tq = dict(comps)[cid]
        qt = qtabs[tq].reshape(8, 8)
        coef = np.zeros((n_blocks, 64), np.float64)
        coef[:, _ZIGZAG] = zz[ci]  # inverse zig-zag
        coef = coef.reshape(-1, 8, 8) * qt
        blocks = np.einsum("ji,njk,kl->nil", d, coef, d)
        planes.append(
            np.clip(_deblockify(blocks + 128.0, nby, nbx, h, w), 0, 255)
        )
    if len(planes) == 1:
        return planes[0].round().astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ spectrogram


def spectrogram(
    pcm: np.ndarray, n_fft: int = 256, hop: int = 128
) -> np.ndarray:
    """Magnitude-squared STFT power spectrogram -> (n_frames,
    n_fft//2+1) float64.  Hann-windowed, hop-strided frames, numpy rfft
    — the standard front end of every audio feature extractor.  Short
    signals zero-pad to one full frame; the frame walk is a strided
    VIEW (no copy) + one batched rfft."""
    x = np.asarray(pcm, dtype=np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, n_fft),
        strides=(x.strides[0] * hop, x.strides[0]),
        writeable=False,
    )
    win = np.hanning(n_fft)
    return np.abs(np.fft.rfft(frames * win, axis=1)) ** 2


def audio_spectral_stats(
    pcm: np.ndarray, rate: int, n_fft: int = 256, hop: int = 128
) -> dict:
    """Spectral summary of one PCM signal (the audio-quality /
    content-typing features a corpus pipeline keeps per clip):
    ``centroid_hz`` (power-weighted mean frequency), ``bandwidth_hz``
    (power-weighted std around it), ``flux`` (mean L2 frame-to-frame
    power change over mean power — relative, gain-invariant), and
    ``n_frames``.  All from one ``spectrogram`` pass."""
    P = spectrogram(pcm, n_fft=n_fft, hop=hop)
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    tot = P.sum()
    if tot <= 0.0:
        return {
            "n_frames": int(P.shape[0]),
            "centroid_hz": 0.0,
            "bandwidth_hz": 0.0,
            "flux": 0.0,
        }
    pf = P.sum(axis=0)  # power per frequency bin
    c = float((pf * freqs).sum() / tot)
    bw = float(np.sqrt((pf * (freqs - c) ** 2).sum() / tot))
    if P.shape[0] > 1:
        flux = float(
            np.linalg.norm(P[1:] - P[:-1], axis=1).mean() / P.mean()
        )
    else:
        flux = 0.0
    return {
        "n_frames": int(P.shape[0]),
        "centroid_hz": c,
        "bandwidth_hz": bw,
        "flux": flux,
    }
