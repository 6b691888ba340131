"""Re-emit probe skew verdicts under the stall-robust eligibility
rule (VERDICT r12 item 3) from committed PROBE_*_stages.log files.

The r12 probes computed PASS/FAIL over every shuffle stage whose MAX
task exceeded 1 s, so single host stalls on sub-second bookkeeping
stages produced red-looking headlines (knn_final 11.8x from one
5.1 s stall over a 0.43 s median; cc_ab 51.5x from one 4.6 s GC
stall) that needed prose to rehabilitate. smoke_scale.py now gates
the verdict on ``verdict_eligible`` (median >= 1 s, or >= 16 MB
shuffle per task, or a >= 30 s max task); this script replays that
exact rule over the stage lines already printed in the committed
probe logs and writes SKEW_REEMIT_<round>.json, so the historical
artifacts self-describe without re-running 10-minute probes.

Usage: python scripts/reemit_skew.py PROBE_a.log [PROBE_b.log ...]
       [--out SKEW_REEMIT_r12.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# stage  44 tasks=256 shufW=     0.0MB shufR=  260.44MB \
#   task med/max=432/5093ms skew=11.8 data_skew=... (excl N empty) | owner
_LINE = re.compile(
    r"stage\s+(?P<stage>\d+) tasks=\s*(?P<tasks>\d+) "
    r"shufW=\s*(?P<w>[\d.]+)MB shufR=\s*(?P<r>[\d.]+)MB "
    r"task med/max=(?P<med>\d+)/(?P<mx>\d+)ms "
    r"skew=(?P<skew>[\d.]+|None)"
    r"(?: data_skew=(?P<dskew>[\d.]+|None)(?: \(excl \d+ empty\))?)?"
    r".* \| (?P<owner>.+)$"
)


def eligible(s: dict) -> bool:
    """Mirror of smoke_scale.verdict_eligible — keep in sync."""
    if s["task_max_ms"] >= 30_000:
        return True
    per_task_mb = (s["shuffle_write_mb"] + s["shuffle_read_mb"]) / max(
        s["tasks"], 1
    )
    return s["task_med_ms"] >= 1000 or per_task_mb >= 16


def replay(path: str) -> dict:
    stages = []
    with open(path) as f:
        for line in f:
            m = _LINE.match(line.strip())
            if not m:
                continue
            d = m.groupdict()
            s = {
                "stage": int(d["stage"]),
                "tasks": int(d["tasks"]),
                "shuffle_write_mb": float(d["w"]),
                "shuffle_read_mb": float(d["r"]),
                "task_med_ms": float(d["med"]),
                "task_max_ms": float(d["mx"]),
                "skew": None if d["skew"] == "None" else float(d["skew"]),
                "data_skew": (
                    None
                    if d["dskew"] in (None, "None")
                    else float(d["dskew"])
                ),
                "owner": d["owner"].strip(),
            }
            s["verdict_eligible"] = eligible(s)
            stages.append(s)

    def eff(s: dict) -> float:
        if not s["verdict_eligible"]:
            return 0
        v = s["data_skew"] if s["data_skew"] is not None else s["skew"]
        return v or 0

    worst = max(stages, key=eff, default=None)
    worst_v = eff(worst) if worst else 0
    old_flagged = [
        s
        for s in stages
        if not s["verdict_eligible"]
        and s["task_max_ms"] >= 1000
        and ((s["data_skew"] if s["data_skew"] is not None else s["skew"]) or 0)
        >= 10
    ]
    return {
        "log": os.path.basename(path),
        "stages_parsed": len(stages),
        "worst_eligible_skew": worst_v,
        "worst_eligible_stage": worst if worst_v else None,
        "verdict": "PASS" if worst_v < 10 else "FAIL",
        # stages the OLD rule flagged that the new rule excludes —
        # each should be a sub-second-median bookkeeping stage
        "declassified_stall_flags": old_flagged,
    }


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if not args:
        sys.exit(__doc__)
    report = {"rule": "verdict_eligible: max>=30s or med>=1s or >=16MB/task",
              "logs": [replay(p) for p in args]}
    print(json.dumps(report, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
