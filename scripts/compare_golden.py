#!/usr/bin/env python3
"""Digit-compare an integration_scaling --out table against a reference
results_test table (tests/integration_test/results_test{1,2}.txt).

Rows are matched by dx (first column, 5-decimal scientific text); the
four error columns must agree to EVERY PRINTED DIGIT.  Time columns are
reported but not compared.

Usage: compare_golden.py OURS REF
Exit 0 = all matched rows digit-exact; 1 otherwise.
"""

import sys


def rows(path):
    out = {}
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        f = line.split()
        if len(f) >= 5:
            out[f[0]] = f[1:5]
    return out


def main():
    ours, ref = rows(sys.argv[1]), rows(sys.argv[2])
    names = ["Ea_max", "Ea_avg", "Eb_max", "Eb_avg"]
    bad = 0
    matched = 0
    for dx, rvals in ref.items():
        if dx not in ours:
            continue
        matched += 1
        for name, a, b in zip(names, ours[dx], rvals):
            tag = "OK " if a == b else "DIFF"
            if a != b:
                bad += 1
            print(f"dx={dx} {name}: ours={a} ref={b} {tag}")
    print(f"{matched} rows matched, {bad} cell differences")
    sys.exit(1 if (bad or not matched) else 0)


if __name__ == "__main__":
    main()
