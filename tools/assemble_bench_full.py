#!/usr/bin/env python3
"""Assemble BENCH_FULL_r<N>.json (the per-round medians table of record)
from a SPARK_GRAFT_BENCH_OUT dump: adds round/host metadata so
cross-round drift questions cite a self-describing artifact.

Usage: assemble_bench_full.py <bench_out.json> <round> <out.json>
"""
import json
import platform
import os
import sys


def main() -> None:
    src, rnd, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    d = json.load(open(src))
    full = {
        "round": rnd,
        "sf": d.get("sf"),
        "reps": d.get("reps"),
        "total_warm_median_s": sum(d["medians"].values()),
        "host": {
            "platform": platform.platform(),
            "cpus": os.cpu_count(),
            "loadavg_at_write": list(os.getloadavg()),
        },
        "note": ("full per-query medians committed per round so cross-round "
                 "drift questions cite an artifact, not prose; 'cold' is rep 1 "
                 "(carries once-per-session training/publish), 'medians' is "
                 "the table of record"),
        "medians": d["medians"],
        "cold": d["cold"],
    }
    json.dump(full, open(out, "w"), indent=None)
    print(f"{out}: {len(d['medians'])} queries, "
          f"total {full['total_warm_median_s']:.1f}s")


if __name__ == "__main__":
    main()
