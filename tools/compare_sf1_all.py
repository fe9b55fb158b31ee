#!/usr/bin/env python3
"""Full-set sf1 comparison orchestrator (dev tooling, not library code).

Runs tools/compare_oracle.py one query at a time in subprocesses with a
per-query timeout, so one pathologically slow DuckDB oracle (the
recursive-CTE graph replays are minutes each at sf1) cannot eat the
session. Results stream to stdout and a summary prints at the end:
PASS / FAIL / TIMEOUT counts with names.

Usage: compare_sf1_all.py [--allow-timeout] <sfDir> <outDir> [timeoutSec] [parallel]

Exit code is nonzero on any FAIL — and on any TIMEOUT too, unless
--allow-timeout is given: a comparison that never completed is not a
pass, and must not be indistinguishable from one at the exit-code level.
"""
import sys, os, json, subprocess, time
from concurrent.futures import ThreadPoolExecutor

def main():
    argv = list(sys.argv[1:])
    allow_timeout = "--allow-timeout" in argv
    if allow_timeout:
        argv.remove("--allow-timeout")
    sf_dir, out_dir = argv[0], argv[1]
    timeout = int(argv[2]) if len(argv) > 2 else 900
    workers = int(argv[3]) if len(argv) > 3 else 3
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        names = sorted(json.load(f))
    here = os.path.dirname(os.path.abspath(__file__))
    script = os.path.join(here, "compare_oracle.py")
    results = {}

    def run(name):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, script, sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout)
            dt = time.time() - t0
            ok = p.returncode == 0
            line = (p.stdout.strip().splitlines() or ["?"])[0]
            print(f"{'PASS' if ok else 'FAIL'}  {name}  {dt:6.1f}s  {line}",
                  flush=True)
            return "pass" if ok else "fail"
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT  {name}  >{timeout}s", flush=True)
            return "timeout"

    with ThreadPoolExecutor(max_workers=workers) as ex:
        for name, res in zip(names, ex.map(run, names)):
            results[name] = res
    counts = {k: sum(1 for v in results.values() if v == k)
              for k in ("pass", "fail", "timeout")}
    print(f"\nSUMMARY: {counts['pass']} pass, {counts['fail']} fail, "
          f"{counts['timeout']} timeout of {len(names)}")
    for k in ("fail", "timeout"):
        bad = sorted(n for n, v in results.items() if v == k)
        if bad:
            print(f"{k}: {', '.join(bad)}")
    bad = counts["fail"] + (0 if allow_timeout else counts["timeout"])
    sys.exit(0 if bad == 0 else 1)

if __name__ == "__main__":
    main()
