#!/usr/bin/env python3
"""Regenerate my_feast_spark/functions/data/public_suffixes.dat from
the canonical upstream Public Suffix List.

The vendored snapshot was written from public knowledge because the
build environment has no network; this script replaces it with the
real upstream file whenever network IS available. The loader
(functions/urls.py::load_public_suffix_list) parses the upstream
format unchanged, so the simplest correct regeneration is a verbatim
download — the loader itself filters to the multi-label exact rules
the isin expression can represent.

Usage::

    python tools/update_public_suffixes.py [--url URL]
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

UPSTREAM = "https://publicsuffix.org/list/public_suffix_list.dat"
DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "my_feast_spark", "functions", "data", "public_suffixes.dat",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default=UPSTREAM)
    ap.add_argument("--dest", default=DEST)
    args = ap.parse_args()
    with urllib.request.urlopen(args.url, timeout=60) as resp:
        data = resp.read().decode("utf-8")
    if "===BEGIN ICANN DOMAINS===" not in data:
        print("refusing to write: response is not a PSL file",
              file=sys.stderr)
        return 1
    tmp = args.dest + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(data)
    os.replace(tmp, args.dest)
    # sanity: the loader must still find a healthy number of rules
    # (repo root = three levels above the data file's directory:
    # data/ -> functions/ -> my_feast_spark/ -> <root>)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(args.dest))
    )))
    sys.path.insert(0, repo_root)
    from my_feast_spark.functions.urls import load_public_suffix_list

    n = len(load_public_suffix_list(args.dest))
    print(f"wrote {args.dest}: {n} multi-label exact rules")
    return 0 if n > 500 else 1


if __name__ == "__main__":
    raise SystemExit(main())
