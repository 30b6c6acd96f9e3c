"""N vs 4N scaling evidence (BASELINE.json north_rule): run the flagship
pipeline at local[8] and local[32] on identical input, report throughput
at both plus scaling efficiency into BENCH.md.

Usage: python tools/scaling_bench.py [sf_dir] [n_entities]
"""

from __future__ import annotations

import datetime
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_at(cpus: int, sf_dir: str, n_entities: int) -> dict:
    from bench import build_spark, run_geo_pipeline

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        res = run_geo_pipeline(spark, sf_dir, n_entities)
    finally:
        spark.stop()
    res["cpus"] = cpus
    return res


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000

    small = run_at(8, sf_dir, n_entities)
    big = run_at(32, sf_dir, n_entities)
    # efficiency: speedup achieved / speedup available
    eff = (small["sec"] / big["sec"]) / (32 / 8)
    out = {
        "sf_dir": sf_dir,
        "n_pages": big["n_pages"],
        "local8": small,
        "local32": big,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out, indent=1))

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%MZ"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run {stamp} — {sf_dir}, {big['n_pages']} pages\n\n"
            "| cores | wall (s) | pages/sec | matches |\n|---|---|---|---|\n"
            f"| local[8] | {small['sec']} | {small['pages_per_sec']} | {small['n_matches']} |\n"
            f"| local[32] | {big['sec']} | {big['pages_per_sec']} | {big['n_matches']} |\n\n"
            f"**Scaling efficiency (8→32 cores, 4×): {out['scaling_efficiency']}**"
            f" (north_rule target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
