#!/usr/bin/env python3
"""Independent conformance check for graft's SAS7BDAT writer/reader.

Reads a graft-written .sas7bdat with pandas (a third-party implementation of
the community format spec) and diffs every value against the parquet twin.
If pandas parses our bytes and sees the twin's values, writer and reader
conform to the real-world format rather than merely agreeing with each other.

Usage: python3 scripts/check_sas7bdat.py <file.sas7bdat> <twin_parquet_dir>
"""
import sys

import numpy as np
import pandas as pd


def main(sas_path: str, twin_path: str) -> int:
    sas = pd.read_sas(sas_path)
    twin = pd.read_parquet(twin_path)
    ok = True
    if list(sas.columns) != list(twin.columns):
        print(f"[FAIL] columns: sas={list(sas.columns)} twin={list(twin.columns)}")
        ok = False
    if len(sas) != len(twin):
        print(f"[FAIL] rows: sas={len(sas)} twin={len(twin)}")
        ok = False
    if ok:
        for c in twin.columns:
            a, b = sas[c], twin[c]
            if b.dtype.kind == "f":
                same = np.array_equal(a.to_numpy(np.float64), b.to_numpy(np.float64), equal_nan=True)
            else:
                # SAS blanks-out missing strings; normalize both to ""
                av = a.fillna("").astype(str).replace({"nan": ""})
                bv = b.fillna("").astype(str)
                same = (av == bv).all()
            if not same:
                bad = (a != b) if b.dtype.kind != "f" else ~np.isclose(a, b, equal_nan=True)
                print(f"[FAIL] col {c}: e.g. {list(a[bad][:3])} vs {list(b[bad][:3])}")
                ok = False
    print("[ok] pandas round-trip matches twin" if ok else "[FAIL]")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
