"""Snapshot per-query source-closure fingerprints for driver staleness.

Run at ROUND START, before editing any code (CLAUDE.md workflow): the
working tree at that point is exactly the code the driver's verify just
ran, so for every query with a verdict in the LATEST CORRECTNESS_r*.json
the current fingerprint IS the fingerprint of the verified code.  Those
records are merged into ``tools/verdict_fingerprints.json``; queries not
in the latest file keep their older records (or none — staying stale).

``__spark_entry__._driver_order`` compares current fingerprints against
this sidecar: mismatch or missing record ⇒ the query's code changed
since its last verdict ⇒ stale tier, drained oldest-verdict-first.

Usage:
    python tools/record_fingerprints.py              # merge latest round
    python tools/record_fingerprints.py --bootstrap NAME...
        # record ALL queries as current EXCEPT the named ones (one-time
        # migration from module-granularity staleness: the named queries
        # are known to have changed since their last verdict)
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SIDECAR = os.path.join(HERE, "verdict_fingerprints.json")
sys.path.insert(0, REPO)


def main() -> None:
    from duckdb_extension_kafquack_spark.fingerprint import (
        import_registering_modules,
        registry_fingerprints,
    )

    # the SAME import list __spark_entry__ uses — fingerprints depend on
    # the loaded module set, so writer and reader must match exactly
    import_registering_modules()
    current = registry_fingerprints()
    recorded: dict[str, str] = {}
    if os.path.exists(SIDECAR):
        with open(SIDECAR) as f:
            recorded = json.load(f)

    if len(sys.argv) > 1 and sys.argv[1] == "--bootstrap":
        exclude = set(sys.argv[2:])
        merged = {n: fp for n, fp in current.items() if n not in exclude}
        print(
            f"bootstrap: recorded {len(merged)} queries, "
            f"excluded {sorted(exclude & set(current))}"
        )
    else:
        files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
        if not files:
            print("no CORRECTNESS files; nothing to record")
            return
        with open(files[-1]) as f:
            latest = json.load(f)
        fresh = {
            n: current[n]
            for n, v in latest.items()
            if n in current
            and v.get("err") is None
            and all(
                v.get(k) is not False
                for k in ("rows_match", "schema_match", "hash_match")
            )
        }
        merged = {**recorded, **fresh}
        changed = [n for n in fresh if recorded.get(n) != fresh[n]]
        print(
            f"{os.path.basename(files[-1])}: {len(fresh)} fresh green "
            f"verdicts, {len(changed)} records updated"
        )
    with open(SIDECAR, "w") as f:
        json.dump(dict(sorted(merged.items())), f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
