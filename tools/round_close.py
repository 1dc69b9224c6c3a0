#!/usr/bin/env python3
"""Round-close correctness artifact: run tools/check.py over a Verify
output dir and write CORRECTNESS_LOCAL.json — per-query pass/fail plus
the summary line — so a driver-side harness failure (round 13's empty
CORRECTNESS_r13.json) never leaves a round unadjudicated.

Usage: python3 tools/round_close.py <sfDir> <verifyOutDir> [outJson]
"""
import io
import json
import re
import sys
from contextlib import redirect_stdout

import check


def main(sf_dir, out_dir, out_json="CORRECTNESS_LOCAL.json"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = check.main(sf_dir, out_dir)
    text = buf.getvalue()
    sys.stdout.write(text)
    queries = {}
    for line in text.splitlines():
        m = re.match(r"\[(PASS|FAIL)\] (\S+):\s*(.*)", line)
        if m:
            queries[m.group(2)] = {
                "status": m.group(1).lower(),
                "detail": m.group(3),
            }
    summary = re.search(r"== (\d+) pass, (\d+) fail, (\d+) no-oracle ==",
                        text)
    doc = {
        "sf_dir": sf_dir,
        "n_pass": int(summary.group(1)) if summary else None,
        "n_fail": int(summary.group(2)) if summary else None,
        "n_no_oracle": int(summary.group(3)) if summary else None,
        "queries": queries,
    }
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_json}: {doc['n_pass']} pass, {doc['n_fail']} fail")
    return rc


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
