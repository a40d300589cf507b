#!/usr/bin/env python3
"""Regenerate SURVEY.md §2's STATUS line from gate artifacts.

Usage: python3 tools/survey_header.py [CORRECTNESS_json ...]

Reads the newest CORRECTNESS_r*.json (or the files given), counts
green/red rows, and rewrites the single `STATUS r..:` sentence in
SURVEY.md between the markers the section carries. The header is
never hand-edited again (VERDICT r7 #6: hand-edited counts drifted
from the driver's gate twice).
"""
import glob
import json
import re
import sys


def main():
    files = sys.argv[1:] or glob.glob("CORRECTNESS_r*.json")
    if not files:
        print("no CORRECTNESS_r*.json found", file=sys.stderr)
        sys.exit(1)
    # numeric round order — lexicographic sorting breaks at r10 vs r9
    # and with unsorted CLI args
    latest = max(files, key=lambda f: int(re.search(r"r(\d+)", f).group(1)))
    data = json.load(open(latest))
    total = len(data)
    # live inventory size, counted from the §2 table itself so the
    # STATUS sentence can never carry a stale hand-edited count
    survey_text = open("SURVEY.md").read()
    n_rows = len(set(re.findall(r"^\| `(\w+)` \|", survey_text, re.M)))
    green = sum(1 for v in data.values()
                if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    red = sorted(k for k, v in data.items()
                 if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match")))
    red_note = "" if not red else f"; red: {', '.join(red)}"
    status = (f"STATUS (generated from {latest}): the inventory below holds "
              f"{n_rows} keys, each with a `queries` entry and an `oracleSql` "
              f"entry; the driver's last gate hash-matched {green}/{total} of "
              f"the keys it saw at sf0.01{red_note}; keys added since are "
              f"gated by the local dtype-strict replica (tools/check.py), "
              f"which must agree with the adversarial corpora "
              f"(tools/make_nonascii.py, tools/make_adversarial.py) before "
              f"close.")
    survey = survey_text
    pat = re.compile(r"STATUS[^#]*?(?=\n\n|\n`stream_relay`)", re.S)
    if not pat.search(survey):
        print("STATUS sentence not found in SURVEY.md", file=sys.stderr)
        sys.exit(1)
    survey = pat.sub(status, survey, count=1)
    if not survey.endswith("\n"):
        survey += "\n"
    open("SURVEY.md", "w").write(survey)
    print(f"SURVEY.md STATUS <- {latest}: {green}/{total} green{red_note}")


if __name__ == "__main__":
    main()