"""Per-query bench regression gate (VERDICT r3 #8).

Compares a fresh bench.py JSON line against the newest BENCH_r*.json
and flags any query slower than THRESHOLD x its previous time (with
an absolute floor so sub-second scheduling jitter never trips it).
The round-3 simhash_md5 regression (3.07 s -> 20.26 s, shipped
unexamined) is exactly what this catches.

Usage:
    python bench.py | tail -1 | python scripts/bench_regression_check.py
    python scripts/bench_regression_check.py bench_out.json
Exit code 1 if any regression is flagged.
"""

import glob
import json
import os
import re
import sys

THRESHOLD = 2.5
ABS_FLOOR_SEC = 1.0    # ignore blow-ups below this absolute time


def latest_baseline(repo):
    benches = sorted(
        glob.glob(os.path.join(repo, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not benches:
        return None, None
    with open(benches[-1]) as f:
        d = json.load(f)
    parsed = d.get("parsed") or d
    # prefer per-query MINs (noise-robust for deterministic work on
    # a steal-prone host: one burst can inflate a rep 10-30x, which
    # poisons medians on EITHER side of the comparison); fall back
    # to medians for records that predate queries_min
    q = parsed.get("queries_min") or parsed.get("queries", {})
    return os.path.basename(benches[-1]), q


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    raw = (open(sys.argv[1]).read() if len(sys.argv) > 1
           else sys.stdin.read())
    rec = json.loads(raw.strip().splitlines()[-1])
    cur = rec.get("queries_min") or rec["queries"]
    base_name, base = latest_baseline(repo)
    if base is None:
        print("no BENCH_r*.json baseline found; nothing to compare")
        return 0
    flagged = []
    for k, t in cur.items():
        prev = base.get(k)
        if (prev and t is not None and t > ABS_FLOOR_SEC
                and t > THRESHOLD * prev):
            flagged.append((k, prev, t, t / prev))
    if flagged:
        print(f"REGRESSIONS vs {base_name} (> {THRESHOLD}x, "
              f"> {ABS_FLOOR_SEC}s):")
        for k, prev, t, ratio in sorted(flagged,
                                        key=lambda x: -x[3]):
            print(f"  {k}: {prev:.2f}s -> {t:.2f}s ({ratio:.1f}x)")
        return 1
    print(f"no per-query regressions vs {base_name} "
          f"({len(cur)} queries checked)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
