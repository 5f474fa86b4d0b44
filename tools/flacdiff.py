#!/usr/bin/env python
"""flacdiff: structural A/B diff of two FLAC streams
(src/utils/flacdiff analogue, plus per-frame size accounting for
compression-parity debugging).

Usage: python tools/flacdiff.py a.flac b.flac [--pcm]

Reports: first differing byte offset, per-stream frame tables, the first
frame whose decoded PCM differs (with --pcm), and a per-frame byte-size
delta summary (who wins where, by subframe type).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def frame_table(data):
    from flac_tpu.decoder import parse_metadata, scan_frames
    from flac_tpu import native
    st, pos = parse_metadata(data, 4)
    frames = scan_frames(data, st, pos)
    return st, frames


def subframe_kinds(data, st, frames):
    """Per-frame subframe (type, order) via the native parser."""
    from flac_tpu import native
    from flac_tpu.decoder_fast import _group_arrays
    out = {}
    groups = {}
    for i, f in enumerate(frames):
        groups.setdefault((f["blocksize"], f["channels"]), []).append(i)
    arr = np.frombuffer(data, np.uint8)
    for (bs, ch), idxs in groups.items():
        offs, starts, sizes, asg, ch_bps = _group_arrays(frames, idxs, ch)
        pg = native.parse_frames(arr, offs, starts, sizes, ch_bps, bs)
        names = {0: "CONST", 1: "VERB", 2: "FIXED", 3: "LPC"}
        for j, i in enumerate(idxs):
            kinds = []
            for c in range(ch):
                s = j * ch + c
                kinds.append((names[int(pg.sftype[s])], int(pg.order[s])))
            out[i] = kinds
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--pcm", action="store_true",
                    help="decode both and report first differing sample")
    ap.add_argument("--frames", type=int, default=8,
                    help="max differing frames to print")
    args = ap.parse_args()
    da = open(args.a, "rb").read()
    db = open(args.b, "rb").read()

    n = min(len(da), len(db))
    ab = np.frombuffer(da[:n], np.uint8)
    bb = np.frombuffer(db[:n], np.uint8)
    diff = np.nonzero(ab != bb)[0]
    if len(da) == len(db) and not len(diff):
        print(f"streams are byte-identical ({len(da)} bytes)")
        return 0
    first = int(diff[0]) if len(diff) else n
    print(f"sizes: {args.a}={len(da)}  {args.b}={len(db)}  "
          f"(delta {len(db) - len(da):+d})")
    print(f"first differing byte: offset {first}")

    sta, fa = frame_table(da)
    stb, fb = frame_table(db)
    print(f"frames: {len(fa)} vs {len(fb)}")
    ka = subframe_kinds(da, sta, fa)
    kb = subframe_kinds(db, stb, fb)
    shown = 0
    wins = {"a": 0, "b": 0, "tie": 0}
    delta_total = 0
    for i in range(min(len(fa), len(fb))):
        sa, sb = fa[i]["size"], fb[i]["size"]
        delta_total += sb - sa
        wins["tie" if sa == sb else ("a" if sa < sb else "b")] += 1
        if (sa != sb or ka.get(i) != kb.get(i)) and shown < args.frames:
            print(f"  frame {i}: {sa}B {ka.get(i)}  vs  {sb}B {kb.get(i)}")
            shown += 1
    print(f"per-frame size wins: {args.a}={wins['a']} "
          f"{args.b}={wins['b']} tie={wins['tie']} "
          f"(sum delta {delta_total:+d}B over common frames)")

    if args.pcm:
        from flac_tpu.decoder import decode_stream_tpu
        pa = decode_stream_tpu(da, verify_md5=False, engine="host").samples
        pb = decode_stream_tpu(db, verify_md5=False, engine="host").samples
        m = min(pa.shape[1], pb.shape[1])
        d = np.nonzero(pa[:, :m] != pb[:, :m])
        if pa.shape == pb.shape and not len(d[0]):
            print("decoded PCM identical")
        elif len(d[0]):
            print(f"first differing sample: channel {int(d[0][0])} "
                  f"sample {int(d[1][0])}")
        else:
            print(f"decoded lengths differ: {pa.shape[1]} vs {pb.shape[1]}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
