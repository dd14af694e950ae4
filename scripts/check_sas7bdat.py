#!/usr/bin/env python3
"""Independent conformance check for graft's SAS7BDAT writer/reader.

Reads a graft-written .sas7bdat with pandas (a third-party implementation of
the community format spec) and diffs every value against the parquet twin.
If pandas parses our bytes and sees the twin's values, writer and reader
conform to the real-world format rather than merely agreeing with each other.

Usage: python3 scripts/check_sas7bdat.py <file.sas7bdat> <twin_parquet_dir>
   or: python3 scripts/check_sas7bdat.py --variants <dir>   (layout variants
       written by `sbt "Test/runMain graft.sources.SasVariantGen <dir>"`)
"""
import sys

import numpy as np
import pandas as pd


def check_variants(d: str) -> int:
    ok = True
    for f in ("v32", "vmix", "v32mix", "vrle", "v32rle"):
        df = pd.read_sas(f"{d}/{f}.sas7bdat")
        good = (
            len(df) == 450
            and list(df.columns) == ["a", "b"]
            and np.array_equal(df["a"].to_numpy(np.float64), np.arange(450) * 0.5)
            and df["b"].map(lambda b: b.decode() if isinstance(b, bytes) else str(b)).tolist()
            == [f"s{i}" for i in range(450)]
        )
        print(("[ok] " if good else "[FAIL] ") + f)
        ok = ok and good
    return 0 if ok else 1


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
    if sys.argv[1] == "--variants":
        sys.exit(check_variants(sys.argv[2]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
