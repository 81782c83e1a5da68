"""Give the streaming rehearsals the batch bench's trust protocol
(round 6): quiet-gate the host, run ``curate_stream_rehearsal`` N times
(fresh dirs each — no state reuse across reps), and report PER-DROP
trimmed medians plus per-rep walls for audit, so round-over-round stream
claims rest on the same footing as pages/s.

Usage: python scripts/stream_bench.py [sf_dir] [n_drops] [reps] [out_json]
Env: SPARK_GRAFT_MAX_LOAD (default 1.0), SPARK_GRAFT_QUIET_WAIT (default 240).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _wait_for_quiet(max_load: float, max_wait_s: float):
    deadline = time.time() + max_wait_s
    while True:
        l1, l5, _ = os.getloadavg()
        ok = l1 <= max_load and l5 <= 1.5 * max_load
        if ok or time.time() >= deadline:
            return ok, round(l1, 2), round(l5, 2)
        time.sleep(10)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 2)


def _trimmed_median(xs):
    return _median(sorted(xs)[1:-1]) if len(xs) >= 3 else _median(xs)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    n_drops = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "BENCH/stream_bench_r6.json"
    max_load = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "1.0"))
    quiet_wait = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "240"))
    here = os.path.dirname(os.path.abspath(__file__))

    runs = []
    for rep in range(reps):
        quiet, l1, l5 = _wait_for_quiet(max_load, quiet_wait)
        p = subprocess.run(
            [
                sys.executable,
                os.path.join(here, "curate_stream_rehearsal.py"),
                sf_dir,
                str(n_drops),
                "1",  # near_verify: the production recipe
                "1",  # span_bloom
            ],
            capture_output=True,
            text=True,
        )
        line = p.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        rec["quiet"] = quiet
        rec["load_at_gate"] = [l1, l5]
        runs.append(rec)
        print(
            f"rep {rep}: walls "
            f"{[d['wall_s'] for d in rec['drops']]} quiet={quiet}",
            flush=True,
        )

    per_drop = []
    for i in range(n_drops):
        walls = [r["drops"][i]["wall_s"] for r in runs]
        per_drop.append(
            {
                "drop": i,
                "wall_median_s": _trimmed_median(walls),
                "walls": walls,
                "spread": round(max(walls) / max(min(walls), 1e-9), 2),
            }
        )
    out = {
        "sf_dir": sf_dir,
        "n_drops": n_drops,
        "reps": reps,
        "recipe": runs[0]["tiers"] | runs[0]["gates"],
        "per_drop": per_drop,
        "docs_out": runs[0]["docs_out"],
        "docs_dropped": runs[0]["docs_dropped"],
        "index_bytes_final": {
            k: runs[0]["drops"][-1][k]
            for k in ("exact_bytes", "bands_bytes", "grams_bytes")
        },
        "all_reps_quiet": all(r["quiet"] for r in runs),
        "runs": runs,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("per_drop", "all_reps_quiet")}))


if __name__ == "__main__":
    main()
