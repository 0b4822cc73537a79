"""Merge per-instance parity CSVs (same header) into one file.

Usage: python benchmarks/consolidate.py OUT.csv IN1.csv [IN2.csv ...]
Inputs that are missing or header-only are skipped (crashed instances).
"""

from __future__ import annotations

import csv
import glob
import sys


def main():
    out, patterns = sys.argv[1], sys.argv[2:]
    rows, header = [], None
    files = []
    for p in patterns:
        files += sorted(glob.glob(p))
    for f in files:
        try:
            with open(f) as fh:
                r = list(csv.reader(fh))
        except OSError:
            continue
        if len(r) >= 2:
            header = header or r[0]
            rows += r[1:]
    if header:
        with open(out, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(header)
            w.writerows(rows)
    print(f"{out}: {len(rows)} rows from {len(files)} files")


if __name__ == "__main__":
    main()
