#!/usr/bin/env python
"""flactimer: time a codec command (src/utils/flactimer analogue).

Usage: python tools/flactimer.py [-n REPS] -- <command...>
e.g.   python tools/flactimer.py -n 3 -- python -m flac_tpu.cli -8 -f \\
           -o /tmp/o.flac in.wav

Reports wall/user/sys seconds per run (min/mean) — the reference tool
prints elapsed real/user/system time for its child process.
"""
import argparse
import os
import resource
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=1, help="repetitions")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to run (prefix with --)")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given")
    walls = []
    for i in range(args.n):
        ru0 = resource.getrusage(resource.RUSAGE_CHILDREN)
        t0 = time.perf_counter()
        r = subprocess.run(cmd)
        wall = time.perf_counter() - t0
        ru1 = resource.getrusage(resource.RUSAGE_CHILDREN)
        walls.append(wall)
        print(f"run {i + 1}: real {wall:8.3f}s  "
              f"user {ru1.ru_utime - ru0.ru_utime:8.3f}s  "
              f"sys {ru1.ru_stime - ru0.ru_stime:7.3f}s  rc={r.returncode}",
              file=sys.stderr)
        if r.returncode != 0:
            return r.returncode
    if args.n > 1:
        print(f"best  {min(walls):8.3f}s   mean {sum(walls)/len(walls):8.3f}s",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
