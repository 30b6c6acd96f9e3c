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


def run_at(
    cpus: int,
    sf_dir: str,
    n_entities: int,
    trials: int = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "2")),
) -> dict:
    """Min wall over ``trials`` runs — this host's steal time and
    page-fault service vary by 2-4× run to run; min is the standard
    noise-robust wall-clock estimator."""
    from bench import build_spark, run_geo_pipeline

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        best = None
        for _ in range(trials):
            # identical logical plans would hit CacheManager reuse from the
            # previous trial's persisted stages — that would measure cached
            # re-reads, not compute
            spark.catalog.clearCache()
            res = run_geo_pipeline(spark, sf_dir, n_entities)
            if best is None or res["sec"] < best["sec"]:
                best = res
    finally:
        spark.stop()
    best["cpus"] = cpus
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_big = 4 * n_small

    small = run_at(n_small, sf_dir, n_entities)
    big = run_at(n_big, sf_dir, n_entities)
    # efficiency: speedup achieved / speedup available
    eff = (small["sec"] / big["sec"]) / (n_big / n_small)
    out = {
        "sf_dir": sf_dir,
        "n_pages": big["n_pages"],
        f"local{n_small}": small,
        f"local{n_big}": big,
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
            f"| local[{n_small}] | {small['sec']} | {small['pages_per_sec']} | {small['n_matches']} |\n"
            f"| local[{n_big}] | {big['sec']} | {big['pages_per_sec']} | {big['n_matches']} |\n\n"
            f"**Scaling efficiency ({n_small}→{n_big} cores, 4×): "
            f"{out['scaling_efficiency']}** (north_rule target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
