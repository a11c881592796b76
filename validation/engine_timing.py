"""On-chip engine decision: time the fused stencil megastep with each
pair-evaluation engine (xla / pallas / mxu) at the bench's 128^3
clustered config, and record the winner.

This is the measurement VERDICT round-2 item #2 demanded: the pallas
kernel (ops/pallas_p2p.py) and the MXU pair pass are wired and
correctness-verified (tests/test_stencil_gravity.py), but the
production default (gravity/stencil.py `engine`) must be chosen from a
real-TPU timing, not a guess.  Each engine runs bench.py's `treepm`
stage in a subprocess (the axon tunnel can wedge; a hang must not take
the harness down) and the best particle-steps/sec wins.

Usage:  python validation/engine_timing.py [outfile]
Writes: validation/RESULT_engine_timing_r3.txt (or outfile)
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINES = ["xla", "pallas", "mxu"]


def run_engine(engine: str, timeout_s: int = 2400):
    env = dict(os.environ)
    env.update({
        "SHENQI_SCHEDULE": "stencil",
        "SHENQI_STENCIL_FUSED": "1",
        "SHENQI_REFINED_ENGINE": engine,
        "BENCH_TREE_SIDE": env.get("BENCH_TREE_SIDE", "128"),
        "BENCH_NSTEPS": env.get("BENCH_NSTEPS", "3"),
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, ".jax_cache"),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "5",
    })
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--stage", "treepm"],
            capture_output=True, text=True, timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        return None, time.time() - t0, "timeout"
    for line in out.stdout.splitlines():
        if line.startswith("STAGE_RESULT "):
            return float(line.split()[1]), time.time() - t0, "ok"
    return None, time.time() - t0, (out.stderr or "")[-500:]


def main():
    outfile = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "validation", "RESULT_engine_timing_r3.txt")
    side = os.environ.get("BENCH_TREE_SIDE", "128")
    lines = [f"# fused stencil megastep engine timing, {side}^3 "
             f"clustered, best-of-1 x 3 steps each"]
    results = {}
    for eng in ENGINES:
        pps, wall, status = run_engine(eng)
        results[eng] = pps
        lines.append(
            f"{eng:8s} pps={pps if pps else 0:14.1f} wall={wall:7.1f}s"
            f" status={status}")
        print(lines[-1], flush=True)
    ok = {k: v for k, v in results.items() if v}
    if ok:
        winner = max(ok, key=ok.get)
        lines.append(f"WINNER {winner} ({ok[winner]:.1f} pps)")
        for eng, pps in sorted(ok.items(), key=lambda kv: -kv[1]):
            if eng != winner:
                lines.append(
                    f"  {winner} vs {eng}: {ok[winner]/pps:.3f}x")
    else:
        lines.append("WINNER none (all engines failed)")
    with open(outfile, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
