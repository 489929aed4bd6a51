#!/usr/bin/env python3
"""Engine-independent image-path verifier (VERDICT r2 'Next round' #2).

Decodes the engine's PNG bytes with a from-scratch pure-Python decoder
(stdlib zlib + the five PNG scanline filters — NO PIL, NO JVM), re-derives
the expected pixel matrix from image_id via the same LCG arithmetic the
engine uses (graft.images.Images.pixels), and cross-checks:

  - exact pixel equality for every PNG row (the input_hint invariant's
    lossless half, independently of javax.imageio)
  - channel means ×10000 and the 8x8 aHash (f19's feature math)
  - the phash column itself

JPEG rows are reported as skipped: this sandbox has no non-JVM JPEG decoder
(no PIL); the lossy half of the invariant stays covered by ImagesSpec's
PSNR>=40dB property and the f17 rows-only run.

Usage:  image_twin.py <images_stage_dir>     (e.g. /tmp/pipe-v/images)
The stage is written by graft.pipeline.Pipeline stage 1 and carries the full
input_hint schema (image_id, bytes, w, h, fmt, caption, phash).
"""
import glob
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
    ok = bad = skipped = 0
    for image_id, data, w, h, fmt, phash_col in rows:
        idv = int(image_id.replace("img_", ""))
        expected = pixels(idv)
        exp_hash = ahash(expected)
        exp_signed = exp_hash - (1 << 64) if exp_hash >= (1 << 63) else exp_hash
        if exp_signed != phash_col:
            print(f"PHASH    {image_id}: col={phash_col} derived={exp_signed}")
            bad += 1
            continue
        if fmt != "png":
            skipped += 1  # no non-JVM JPEG decoder in this sandbox
            continue
        try:
            dw, dh, got = png_decode(bytes(data))
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            print(f"DECODE   {image_id}: {e}")
            bad += 1
            continue
        if (dw, dh) != (w, h) or got != expected:
            ndiff = sum(1 for a, b in zip(got, expected) if a != b)
            print(f"PIXELS   {image_id}: dims=({dw},{dh}) vs ({w},{h}), {ndiff} px differ")
            bad += 1
            continue
        n = len(got)
        means = tuple(sum((p >> s) & 0xFF for p in got) * 10000 // n for s in (16, 8, 0))
        exp_means = tuple(sum((p >> s) & 0xFF for p in expected) * 10000 // n for s in (16, 8, 0))
        if means != exp_means or ahash(got) != exp_hash:
            print(f"FEATURES {image_id}: means={means} vs {exp_means}")
            bad += 1
            continue
        ok += 1
    print(f"{ok} png rows exact (pixels+means+ahash+phash), {bad} bad, "
          f"{skipped} jpeg rows skipped (no non-JVM JPEG decoder; covered by "
          f"ImagesSpec PSNR property)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
