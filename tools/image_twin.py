#!/usr/bin/env python3
"""Engine-independent image-path verifier (VERDICT r2 'Next round' #2,
r3 #3 closes the JPEG half).

Decodes the engine's PNG bytes with a from-scratch pure-Python decoder
(stdlib zlib + the five PNG scanline filters) and its JPEG bytes with a
from-scratch pure-Python BASELINE-JPEG decoder (marker parse, Huffman
entropy decode, dequantize/dezigzag, 8x8 IDCT, chroma upsample,
YCbCr->RGB — NO PIL, NO JVM), re-derives the expected pixel matrix from
image_id via the same LCG arithmetic the engine uses
(graft.images.Images.pixels), and cross-checks:

  - PNG rows: exact pixel equality + channel means ×10000 + 8x8 aHash
    (the input_hint invariant's lossless half, independently of
    javax.imageio)
  - JPEG rows: PSNR >= 40 dB against the expected matrix (the input_hint
    invariant's lossy half, INDEPENDENTLY of the JVM codec that encoded
    them), plus the f19 gate's bounded feature checks (mean dev <= 3 gray
    levels, aHash hamming <= 24)
  - the phash column itself, every row

Usage:  image_twin.py <images_stage_dir>     (e.g. /tmp/pipe-v/images)
The stage is written by graft.pipeline.Pipeline stage 1 and carries the full
input_hint schema (image_id, bytes, w, h, fmt, caption, phash).
"""
import glob
import math
import struct
import sys
import zlib

import duckdb

M = 6364136223846793005
C = 1442695040888963407
MASK = (1 << 64) - 1
W = H = 16


def pixels(idv):
    """Python mirror of graft.images.Images.pixels (LCG channel gradients)."""
    s = (idv * M + C) & MASK

    def nxt():
        nonlocal s
        s = (s * M + C) & MASK
        return (s >> 40) & 0xFF

    r0, g0, b0 = nxt(), nxt(), nxt()
    rx = nxt() % 9 - 4
    ry = nxt() % 9 - 4
    gx = nxt() % 9 - 4
    gy = nxt() % 9 - 4
    bx = nxt() % 9 - 4
    by = nxt() % 9 - 4

    def cl(v):
        return max(0, min(255, v))

    return [
        (cl(r0 + rx * (i % W) + ry * (i // W)) << 16)
        | (cl(g0 + gx * (i % W) + gy * (i // W)) << 8)
        | cl(b0 + bx * (i % W) + by * (i // W))
        for i in range(W * H)
    ]


def ahash(px):
    """Python mirror of Images.phash (8x8 aHash over gray)."""
    gray = [((p >> 16 & 0xFF) * 299 + (p >> 8 & 0xFF) * 587 + (p & 0xFF) * 114) // 1000
            for p in px]
    cells = [
        sum(gray[((i // 8) * 2 + dy) * W + (i % 8) * 2 + dx]
            for dy in range(2) for dx in range(2)) // 4
        for i in range(64)
    ]
    mean = sum(cells) // 64
    return sum(1 << i for i, v in enumerate(cells) if v > mean)


def png_decode(data):
    """From-scratch PNG decoder for 8-bit truecolor (color type 2/6) and
    gray (0): parse chunks, zlib-inflate IDAT, undo the per-scanline filter
    (None/Sub/Up/Average/Paeth). Returns (w, h, [0xRRGGBB])."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = depth = ctype = interlace = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
        raise ValueError(f"unsupported PNG layout depth={depth} ctype={ctype} interlace={interlace}")
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * nch
    out = bytearray(h * stride)
    prior = bytearray(stride)
    p = 0
    for y in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + (left + prior[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prior[i]
                c = prior[i - nch] if i >= nch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prior = line
    px = []
    for i in range(w * h):
        if ctype == 0:
            v = out[i]
            px.append((v << 16) | (v << 8) | v)
        else:
            o = i * nch
            px.append((out[o] << 16) | (out[o + 1] << 8) | out[o + 2])
    return w, h, px


ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# separable IDCT basis: c[u] * cos((2x+1) u pi / 16), 8x8
_IDCT = [[(math.sqrt(0.5) if u == 0 else 1.0)
          * math.cos((2 * x + 1) * u * math.pi / 16) / 2.0
          for u in range(8)] for x in range(8)]


class _Bits:
    """Entropy-segment bit reader: 0xFF00 unstuffing, RSTn byte-align."""

    def __init__(self, data, pos):
        self.d, self.p, self.buf, self.n = data, pos, 0, 0

    def bit(self):
        if self.n == 0:
            b = self.d[self.p]
            if b == 0xFF:
                nxt = self.d[self.p + 1]
                if nxt == 0x00:
                    self.p += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resyncs
                    raise _Restart()
                else:
                    raise ValueError(f"marker FF{nxt:02X} inside scan")
            else:
                self.p += 1
            self.buf, self.n = b, 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def resync(self):
        """Skip the RSTn marker and byte-align."""
        self.n = 0
        self.p += 2


class _Restart(Exception):
    pass


def _huff(counts, symbols):
    """(length, code) -> symbol map from a DHT segment."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_sym(bits, table):
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | bits.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _extend(v, t):
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def jpeg_decode(data):
    """From-scratch BASELINE JPEG (SOF0) decoder: returns (w, h, [0xRRGGBB]).
    Handles arbitrary sampling factors, multiple DQT/DHT segments, restart
    intervals, and 0xFF00 stuffing. No progressive, no arithmetic coding —
    the baseline subset javax.imageio writes."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt, hdc, hac = {}, {}, {}
    w = h = None
    comps = []  # (cid, hs, vs, tq)
    dri = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:
            break
        ln = (data[pos + 2] << 8) | data[pos + 3]
        seg = data[pos + 4:pos + 2 + ln]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = list(seg[i + 1:i + 65])
                i += 65
        elif m == 0xC0:  # SOF0 baseline
            h, w = (seg[1] << 8) | seg[2], (seg[3] << 8) | seg[4]
            comps = [(seg[6 + c * 3], seg[7 + c * 3] >> 4,
                      seg[7 + c * 3] & 15, seg[8 + c * 3])
                     for c in range(seg[5])]
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF FF{m:02X}")
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                ns = sum(counts)
                tbl = _huff(counts, list(seg[i + 17:i + 17 + ns]))
                (hdc if tc == 0 else hac)[th] = tbl
                i += 17 + ns
        elif m == 0xDD:  # DRI
            dri = (seg[0] << 8) | seg[1]
        elif m == 0xDA:  # SOS: entropy data follows
            ns = seg[0]
            scan = {seg[1 + c * 2]: (seg[2 + c * 2] >> 4, seg[2 + c * 2] & 15)
                    for c in range(ns)}
            return _scan(data, pos + 2 + ln, w, h, comps, scan, qt, hdc, hac, dri)
        pos += 2 + ln
    raise ValueError("no SOS segment")


def _scan(data, pos, w, h, comps, scan, qt, hdc, hac, dri):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {cid: [[0] * (mcx * hs * 8) for _ in range(mcy * vs * 8)]
              for cid, hs, vs, _ in comps}
    bits = _Bits(data, pos)
    pred = {cid: 0 for cid, _, _, _ in comps}
    mcu = 0
    for my in range(mcy):
        for mx in range(mcx):
            if dri and mcu and mcu % dri == 0:
                # skip to the restart marker (tolerate already-aligned)
                try:
                    while True:
                        bits.bit()
                except _Restart:
                    bits.resync()
                pred = {cid: 0 for cid, _, _, _ in comps}
            mcu += 1
            for cid, hs, vs, tq in comps:
                dct, act = scan[cid]
                for by in range(vs):
                    for bx in range(hs):
                        blk = _block(bits, hdc[dct], hac[act], qt[tq], pred, cid)
                        _place(planes[cid], blk, (mx * hs + bx) * 8, (my * vs + by) * 8)
    def sample(cid, hs, vs, x, y):
        """Subsampled planes are upsampled BILINEARLY at half-pel centers
        (libjpeg's 'fancy upsampling'); nearest-neighbor loses ~1 dB on
        smooth gradients and would under-report the codec's true PSNR."""
        plane = planes[cid]
        if hs == hmax and vs == vmax:
            return plane[y][x]
        fx = (x + 0.5) * hs / hmax - 0.5
        fy = (y + 0.5) * vs / vmax - 0.5
        maxx, maxy = len(plane[0]) - 1, len(plane) - 1
        x0 = max(0, min(maxx, math.floor(fx)))
        y0 = max(0, min(maxy, math.floor(fy)))
        x1, y1 = min(maxx, x0 + 1), min(maxy, y0 + 1)
        wx = min(1.0, max(0.0, fx - x0))
        wy = min(1.0, max(0.0, fy - y0))
        top = plane[y0][x0] * (1 - wx) + plane[y0][x1] * wx
        bot = plane[y1][x0] * (1 - wx) + plane[y1][x1] * wx
        return top * (1 - wy) + bot * wy

    px = []
    for y in range(h):
        for x in range(w):
            yv = sample(comps[0][0], comps[0][1], comps[0][2], x, y)
            if len(comps) == 1:
                v = max(0, min(255, round(yv)))
                px.append((v << 16) | (v << 8) | v)
                continue
            cb = sample(comps[1][0], comps[1][1], comps[1][2], x, y)
            cr = sample(comps[2][0], comps[2][1], comps[2][2], x, y)
            r = max(0, min(255, round(yv + 1.402 * (cr - 128))))
            g = max(0, min(255, round(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))))
            b = max(0, min(255, round(yv + 1.772 * (cb - 128))))
            px.append((r << 16) | (g << 8) | b)
    return w, h, px


def _block(bits, hdc, hac, q, pred, cid):
    coef = [0] * 64
    t = _decode_sym(bits, hdc)
    diff = _extend(bits.bits(t), t) if t else 0
    pred[cid] += diff
    coef[0] = pred[cid] * q[0]
    k = 1
    while k < 64:
        rs = _decode_sym(bits, hac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        coef[ZIGZAG[k]] = _extend(bits.bits(s), s) * q[k]
        k += 1
    # separable 2D IDCT
    tmp = [[sum(coef[v * 8 + u] * _IDCT[x][u] for u in range(8)) for x in range(8)]
           for v in range(8)]
    return [[max(0, min(255, round(
        sum(tmp[v][x] * _IDCT[y][v] for v in range(8)) + 128)))
        for x in range(8)] for y in range(8)]


def _place(plane, blk, ox, oy):
    for y in range(8):
        row = plane[oy + y]
        for x in range(8):
            row[ox + x] = blk[y][x]


def psnr(a, b):
    se = n = 0
    for pa, pb in zip(a, b):
        for s in (16, 8, 0):
            d = ((pa >> s) & 0xFF) - ((pb >> s) & 0xFF)
            se += d * d
            n += 1
    return float("inf") if se == 0 else 10 * math.log10(255 * 255 * n / se)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipe-v/images"
    files = sorted(glob.glob(f"{stage}/*.parquet"))
    if not files:
        print(f"no parquet under {stage} — run graft.pipeline.Pipeline first")
        sys.exit(2)
    con = duckdb.connect()
    rows = con.execute(
        "SELECT image_id, bytes, w, h, fmt, phash FROM read_parquet(?) ORDER BY image_id",
        [files],
    ).fetchall()
    ok = jpeg_ok = bad = 0
    min_psnr = float("inf")
    for image_id, data, w, h, fmt, phash_col in rows:
        idv = int(image_id.replace("img_", ""))
        expected = pixels(idv)
        exp_hash = ahash(expected)
        exp_signed = exp_hash - (1 << 64) if exp_hash >= (1 << 63) else exp_hash
        if exp_signed != phash_col:
            print(f"PHASH    {image_id}: col={phash_col} derived={exp_signed}")
            bad += 1
            continue
        try:
            if fmt == "png":
                dw, dh, got = png_decode(bytes(data))
            else:
                dw, dh, got = jpeg_decode(bytes(data))
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            print(f"DECODE   {image_id}: {e}")
            bad += 1
            continue
        if (dw, dh) != (w, h):
            print(f"DIMS     {image_id}: ({dw},{dh}) vs ({w},{h})")
            bad += 1
            continue
        n = len(got)
        means = tuple(sum((p >> s) & 0xFF for p in got) * 10000 // n for s in (16, 8, 0))
        exp_means = tuple(sum((p >> s) & 0xFF for p in expected) * 10000 // n for s in (16, 8, 0))
        ham = bin(ahash(got) ^ exp_hash).count("1")
        if fmt == "png":
            # lossless half: exact pixels, exact features
            if got != expected:
                ndiff = sum(1 for a, b in zip(got, expected) if a != b)
                print(f"PIXELS   {image_id}: {ndiff} px differ")
                bad += 1
                continue
            if means != exp_means or ham != 0:
                print(f"FEATURES {image_id}: means={means} vs {exp_means} ham={ham}")
                bad += 1
                continue
            ok += 1
        else:
            # lossy half, decoded INDEPENDENTLY of the JVM codec:
            # the input_hint invariant (PSNR >= 40 dB) plus the f19 gate's
            # bounded feature checks
            p = psnr(got, expected)
            mean_dev = max(abs(a - b) for a, b in zip(means, exp_means))
            if p < 40.0:
                print(f"PSNR     {image_id}: {p:.2f} dB < 40")
                bad += 1
                continue
            if mean_dev > 30000 or ham > 24:
                print(f"FEATURES {image_id}: mean_dev={mean_dev} ham={ham}")
                bad += 1
                continue
            jpeg_ok += 1
            min_psnr = min(min_psnr, p)
    tail = (f", min jpeg PSNR {min_psnr:.2f} dB" if jpeg_ok else "")
    print(f"{ok} png rows exact (pixels+means+ahash+phash), "
          f"{jpeg_ok} jpeg rows verified independently (PSNR>=40+features+phash), "
          f"{bad} bad{tail}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
