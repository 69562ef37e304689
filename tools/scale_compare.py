"""Build the per-query scaling-factor table from two bench JSON lines
(sf0.1 and the 10x replica). Ratios ~<=10x are at-or-better-than-linear
for a 10x data decade; dedup/contamination queries run against 10-way
exact-duplicated documents (the crawl worst case), so their ratio also
absorbs the d-squared pair pressure the collapse stages exist to kill.

Usage: python tools/scale_compare.py /tmp/bench_sf01.json /tmp/bench_sf1.json
Prints a markdown table and writes the big-side JSON to the path given
as an optional third argument (default: no copy).
"""

import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    small = json.loads(Path(sys.argv[1]).read_text())
    big = json.loads(Path(sys.argv[2]).read_text())
    if len(sys.argv) > 3:
        shutil.copy(sys.argv[2], sys.argv[3])
    rows = []
    for q, t_small in small["queries"].items():
        t_big = big["queries"].get(q)
        if t_big is None:
            continue
        ratio = t_big / t_small if t_small > 0 else float("inf")
        rows.append((q, t_small, t_big, ratio))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1 s | 10x s | ratio |")
    print("|---|---|---|---|")
    for q, a, b, r in rows:
        flag = " **>10x**" if r > 10 else ""
        print(f"| {q} | {a:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    print(f"\ntotal: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value']/small['value']:.1f}x over a 10x data decade)")


if __name__ == "__main__":
    main()
