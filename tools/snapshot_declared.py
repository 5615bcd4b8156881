"""Snapshot the declared query names for rotation pinning.

Run at the END of each round (after registering that round's queries):

    python tools/snapshot_declared.py

Writes ``tools/declared_snapshot.json`` — the full set of names in
``registry.queries()`` at snapshot time. On the NEXT round,
``registry.queries()`` pins any snapshot name that still has no
driver row ahead of every newly registered query, so the driver's
50-sample window always drains the backlog before new work can
front-run it (the failure mode that deferred ``semdedup_pipeline``
for two rounds — see VERDICT r7 "What's wrong" #1).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gpu_database_spark import registry  # noqa: E402


def main() -> None:
    names = sorted(registry.queries())
    out = os.path.join(REPO, "tools", "declared_snapshot.json")
    with open(out, "w") as fh:
        json.dump(names, fh, indent=0)
        fh.write("\n")
    print(f"snapshotted {len(names)} declared query names -> {out}")


if __name__ == "__main__":
    main()
