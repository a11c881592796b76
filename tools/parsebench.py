#!/usr/bin/env python
"""Parse cpu.txt walltime logs into per-stage timing summaries
(tools/parsebench.py analog; reads both this framework's cpu.txt and
the reference's — the header/indent format is shared,
walltime.cpp:185-205).

Usage:
  python tools/parsebench.py <outputdir> [--nparticles N]

Prints total elapsed, per-stage breakdown summed over steps, and (with
--nparticles) particle-steps/sec — the BASELINE.md protocol metric.
"""

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

HDR = re.compile(r"Step ([0-9]+), Time: ([-.0-9eE]+),"
                 r"(?: MPIs: ([0-9]+) Threads: ([0-9]+) Elapsed:"
                 r"|.*Walltime:) ([-.0-9eE]+)")
ROW = re.compile(r"^(\s+)([A-Za-z/][\w@./:-]*)\s+([.0-9]+)")


def parse_file(fname):
    """Returns (list of step headers, per-stage total seconds)."""
    steps = []
    stage = defaultdict(float)
    with open(fname) as f:
        for line in f:
            m = HDR.match(line)
            if m:
                steps.append({
                    "step": int(m.group(1)),
                    "a": float(m.group(2)),
                    "mpi": int(m.group(3) or 1),
                    "threads": int(m.group(4) or 1),
                    "elapsed": float(m.group(5)),
                })
                continue
            r = ROW.match(line)
            if r and steps:
                stage[r.group(2).lstrip("/")] += float(r.group(3))
    return steps, dict(stage)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("directory")
    ap.add_argument("--nparticles", type=int, default=0,
                    help="total particles: prints particle-steps/sec")
    args = ap.parse_args()
    files = sorted(glob.glob(os.path.join(args.directory, "cpu.tx*")))
    if not files:
        sys.exit(f"no cpu.txt under {args.directory}")
    all_steps = []
    all_stage = defaultdict(float)
    for f in files:
        steps, stage = parse_file(f)
        all_steps += steps
        for k, v in stage.items():
            all_stage[k] += v
    if not all_steps:
        sys.exit("no step records found")
    last = all_steps[-1]
    nsteps = last["step"] + 1
    wall = last["elapsed"]
    cores = last["mpi"] * last["threads"]
    print(f"steps: {nsteps}   a: {all_steps[0]['a']:g} -> "
          f"{last['a']:g}   wall: {wall:.1f}s   cores: {cores}")
    tot = sum(all_stage.values()) or 1.0
    for k in sorted(all_stage, key=all_stage.get, reverse=True):
        print(f"  {k:<22s} {all_stage[k]:10.1f}s  "
              f"{100 * all_stage[k] / tot:5.1f}%")
    if args.nparticles:
        ps = args.nparticles * nsteps / wall
        print(f"particle-steps/sec (all particles active): {ps:.4g}")
        print(f"core-normalized: {ps / cores:.4g} /core")


if __name__ == "__main__":
    main()
