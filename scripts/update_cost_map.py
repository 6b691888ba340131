"""Rewrite __spark_entry__._MEASURED_COST from a time_queries.py JSON
dump: python scripts/update_cost_map.py /tmp/qtimes.json
"""

from __future__ import annotations

import json
import re
import sys

ENTRY = "__spark_entry__.py"


def main() -> None:
    times = json.load(open(sys.argv[1]))
    bad = {k: v for k, v in times.items() if isinstance(v, str)}
    if bad:
        raise SystemExit(f"refusing to update: errored queries {bad}")
    items = sorted(times.items(), key=lambda kv: (kv[1], kv[0]))
    lines = [f'    "{k}": {v},' for k, v in items]
    body = "_MEASURED_COST = {\n" + "\n".join(lines) + "\n}"
    src = open(ENTRY).read()
    new, n = re.subn(r"_MEASURED_COST = \{.*?\n\}", body, src, count=1, flags=re.S)
    if n != 1:
        raise SystemExit("did not find _MEASURED_COST literal")
    open(ENTRY, "w").write(new)
    print(f"wrote {len(items)} entries")


if __name__ == "__main__":
    main()
