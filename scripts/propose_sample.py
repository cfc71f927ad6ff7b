"""Emit proposed_sample.txt: the 50 registered queries the external
driver has gone longest without sampling (VERDICT r11 next-round #4 —
285/419 queries had never been driver-sampled and the r11 draw contained
zero new names). The driver can rotate toward these at no cost; the list
is regenerated each round so it always reflects CORRECTNESS_r*.json
history.

Ordering: never-sampled first (alphabetical for stability), then by
staleness (earliest last-sampled round first).

Usage: python scripts/propose_sample.py  (writes proposed_sample.txt)
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")

from hw_kafka_flink_health_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name in data:
            if name in QUERIES:
                last_round[name] = max(last_round.get(name, 0), rnd)

    never = sorted(n for n in QUERIES if n not in last_round)
    stale = sorted(
        (n for n in QUERIES if n in last_round),
        key=lambda n: (last_round[n], n),
    )
    ranked = never + stale
    with open("proposed_sample.txt", "w") as fh:
        fh.write(
            "# 50 longest-unsampled queries (never-sampled first), "
            "regenerated per round by scripts/propose_sample.py\n"
        )
        for name in ranked[:50]:
            tag = (
                "never-sampled"
                if name not in last_round
                else f"last r{last_round[name]:02d}"
            )
            fh.write(f"{name}\t{tag}\n")
    print(
        f"{len(never)} never-sampled / {len(QUERIES)} total; "
        "wrote proposed_sample.txt"
    )


if __name__ == "__main__":
    main()
