#!/usr/bin/env python3
"""Engine-independent VIDEO-path verifier — the clip sibling of
image_twin.py.

Walks the engine's RIFF/AVI bytes with a from-scratch Python parser (no
JVM, no PyAV/ffmpeg), decodes every frame with image_twin's from-scratch
PNG / baseline-JPEG decoders, re-derives each frame's expected pixel
matrix from the frame seed vid*64+k (graft.images.Video.frameSeed →
Images.pixels LCG arithmetic), and cross-checks per clip:

  - container metadata: w, h, fps (from avih usec/frame), stream fourcc
    (MPNG / MJPG), frame count == 6 + vid % 5
  - avi-mpng clips: every frame decodes to the EXACT expected matrix
  - avi-mjpg clips: every frame meets the input_hint invariant
    (PSNR >= 40 dB) against the expected matrix, decoded INDEPENDENTLY
    of the JVM codec that encoded it
  - caption carried on the row (byte equality vs the re-read documents
    parquet is the engine-side f22 check; here we assert non-null shape)

Usage:
  sbt -batch "runMain graft.tools.VideoStage <sfDir> <stageDir>"
  python3 tools/video_twin.py <stageDir>
"""
import glob
import struct
import sys

import duckdb

import image_twin  # the from-scratch PNG/JPEG decoders + LCG pixels

MAX_FRAMES = 64  # graft.images.Video.MaxFrames — the frame-seed radix
FPS = 4


def parse_avi(data):
    """From-scratch RIFF/AVI walk. Returns (w, h, fps, fourcc, frames) or
    raises ValueError — independent of the engine's Scala parser."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI")
    riff_len = struct.unpack_from("<I", data, 4)[0]
    if riff_len + 8 > len(data):
        raise ValueError("riff length overruns buffer")
    pos, end = 12, 8 + riff_len
    w = h = fps = total = None
    fourcc = None
    frames = []
    seen_hdrl = False
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        ln = struct.unpack_from("<I", data, pos + 4)[0]
        body, nxt = pos + 8, pos + 8 + ln + (ln & 1)
        if body + ln > end:
            raise ValueError("chunk overruns riff")
        if tag == b"LIST":
            typ = data[body : body + 4]
            if typ == b"hdrl":
                p = body + 4
                while p + 8 <= body + ln:
                    t2 = data[p : p + 4]
                    l2 = struct.unpack_from("<I", data, p + 4)[0]
                    b2 = p + 8
                    if t2 == b"avih":
                        (usec, _mbps, _pad, _flags, total, _init, _streams,
                         _buf, w, h) = struct.unpack_from("<10I", data, b2)
                        if usec == 0 or 1000000 % usec:
                            raise ValueError("bad usec/frame")
                        fps = 1000000 // usec
                    elif t2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                        q = b2 + 4
                        while q + 8 <= b2 + l2:
                            t3 = data[q : q + 4]
                            l3 = struct.unpack_from("<I", data, q + 4)[0]
                            if t3 == b"strh" and data[q + 8 : q + 12] == b"vids":
                                fourcc = data[q + 12 : q + 16].decode("ascii")
                            q += 8 + l3 + (l3 & 1)
                    p += 8 + l2 + (l2 & 1)
                seen_hdrl = True
            elif typ == b"movi":
                if not seen_hdrl:
                    raise ValueError("movi before hdrl")
                p = body + 4
                while p + 8 <= body + ln:
                    t2 = data[p : p + 4]
                    l2 = struct.unpack_from("<I", data, p + 4)[0]
                    if t2 in (b"00dc", b"00db"):
                        frames.append(bytes(data[p + 8 : p + 8 + l2]))
                    p += 8 + l2 + (l2 & 1)
        pos = nxt
    if not (w and h and fps and fourcc and total is not None):
        raise ValueError("missing header fields")
    if len(frames) != total:
        raise ValueError(f"avih declares {total} frames, movi has {len(frames)}")
    return w, h, fps, fourcc, frames


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "/tmp/video-stage"
    files = sorted(glob.glob(f"{stage}/*.parquet"))
    if not files:
        print(f"no parquet under {stage} — run graft.tools.VideoStage first")
        sys.exit(2)
    con = duckdb.connect()
    rows = con.execute(
        "SELECT video_id, bytes, w, h, fps, n_frames, fmt, caption "
        "FROM read_parquet(?) ORDER BY video_id",
        [files],
    ).fetchall()
    png_ok = jpeg_ok = bad = 0
    min_psnr = float("inf")
    for video_id, data, w, h, fps, n_frames, fmt, caption in rows:
        vid = int(video_id.replace("vid_", ""))
        try:
            aw, ah, afps, fourcc, frames = parse_avi(bytes(data))
        except ValueError as e:
            print(f"CONTAINER {video_id}: {e}")
            bad += 1
            continue
        exp_n = 6 + vid % 5
        exp_cc = "MPNG" if vid % 2 == 0 else "MJPG"
        if (aw, ah, afps, fourcc, len(frames)) != (w, h, FPS, exp_cc, exp_n) \
                or n_frames != exp_n or caption is None:
            print(f"META     {video_id}: ({aw},{ah},{afps},{fourcc},"
                  f"{len(frames)}) vs ({w},{h},{FPS},{exp_cc},{exp_n})")
            bad += 1
            continue
        clip_ok = True
        for k, fb in enumerate(frames):
            expected = image_twin.pixels(vid * MAX_FRAMES + k)
            try:
                if fourcc == "MPNG":
                    dw, dh, got = image_twin.png_decode(fb)
                else:
                    dw, dh, got = image_twin.jpeg_decode(fb)
            except Exception as e:  # noqa: BLE001 - report, don't crash
                print(f"DECODE   {video_id}[{k}]: {e}")
                clip_ok = False
                break
            if (dw, dh) != (w, h):
                print(f"DIMS     {video_id}[{k}]: ({dw},{dh}) vs ({w},{h})")
                clip_ok = False
                break
            if fourcc == "MPNG":
                if got != expected:
                    nd = sum(1 for a, b in zip(got, expected) if a != b)
                    print(f"PIXELS   {video_id}[{k}]: {nd} px differ")
                    clip_ok = False
                    break
            else:
                p = image_twin.psnr(got, expected)
                if p < 40.0:
                    print(f"PSNR     {video_id}[{k}]: {p:.2f} dB < 40")
                    clip_ok = False
                    break
                min_psnr = min(min_psnr, p)
        if not clip_ok:
            bad += 1
        elif fourcc == "MPNG":
            png_ok += 1
        else:
            jpeg_ok += 1
    tail = f", min mjpg frame PSNR {min_psnr:.2f} dB" if jpeg_ok else ""
    print(f"{png_ok} mpng clips exact (every frame), "
          f"{jpeg_ok} mjpg clips verified independently (every frame "
          f"PSNR>=40), {bad} bad{tail}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
