"""Solver-log parsing and result tables.

Counterpart of the reference's benchmark tooling (reference:
benchmark/scripts/logparser.jl + tblwriter.jl, and Julia/ipx.jl:187-205
which reconstructs the Info struct from solver logs): given logfiles
written by Control (display/logfile) with debug >= 2, reconstruct the Info
fields and the per-iteration IPM history, and format a result table across
runs.

Usage:
    python tools/logparse.py LOGFILE [LOGFILE ...]

Library:
    parse_info(text)        -> dict of Info fields (from the debug>=2 dump)
    parse_iterations(text)  -> list of per-iteration dicts
    summary_table(rows)     -> formatted table string
"""
from __future__ import annotations

import re
import sys
from typing import Dict, List

# "name = value" lines of the Info dump (ipx_tpu/info.py, printed at
# debug >= 2 like the reference's operator<<, reference: src/info.cc:20-115)
_INFO_LINE = re.compile(r"^(\w+) = (.+)$")

# per-iteration progress line (reference format, src/ipm.cc:647-700):
#   iter  P.res  D.res  P.obj  D.obj  mu  time
_ITER_LINE = re.compile(
    r"^\s*(\d+)\s+([\d.eE+-]+)\s+([\d.eE+-]+)\s+([\d.eE+-]+)"
    r"\s+([\d.eE+-]+)\s+([\d.eE+-]+)\s+(\d+)s\s*$")

# debug continuation line: steps .. pivots .. kktiter ..
_DEBUG_LINE = re.compile(
    r"^\s*steps\s+([\d.]+)\s+([\d.]+)\s+pivots\s+(\d+)\s+kktiter\s+(\d+)")


def _coerce(s: str):
    s = s.strip()
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            continue
    return s


def parse_info(text: str) -> Dict[str, object]:
    """Reconstructs the Info fields from a debug>=2 log dump."""
    out: Dict[str, object] = {}
    for line in text.splitlines():
        mo = _INFO_LINE.match(line.strip())
        if mo:
            out[mo.group(1)] = _coerce(mo.group(2))
    return out


def parse_iterations(text: str) -> List[Dict[str, float]]:
    """Per-iteration IPM history from the progress lines."""
    rows: List[Dict[str, float]] = []
    for line in text.splitlines():
        mo = _ITER_LINE.match(line)
        if mo:
            rows.append(dict(
                iter=int(mo.group(1)),
                presidual=float(mo.group(2)),
                dresidual=float(mo.group(3)),
                pobj=float(mo.group(4)),
                dobj=float(mo.group(5)),
                mu=float(mo.group(6)),
                time=float(mo.group(7))))
            continue
        mo = _DEBUG_LINE.match(line)
        if mo and rows:
            rows[-1].update(step_primal=float(mo.group(1)),
                            step_dual=float(mo.group(2)),
                            pivots=int(mo.group(3)),
                            kktiter=int(mo.group(4)))
    return rows


_TABLE_FIELDS = ("status", "iter", "kktiter1", "kktiter2", "updates_ipm",
                 "updates_crossover", "objval", "time_total")


def summary_table(rows: List[Dict[str, object]],
                  names: List[str] = None) -> str:
    """Result table across runs (reference: benchmark tblwriter output)."""
    names = names or [f"run{i}" for i in range(len(rows))]
    width = max([len(n) for n in names] + [8])
    head = "name".ljust(width) + "".join(
        f"{f:>18}" for f in _TABLE_FIELDS)
    lines = [head, "-" * len(head)]
    for name, info in zip(names, rows):
        cells = []
        for f in _TABLE_FIELDS:
            v = info.get(f, "")
            if isinstance(v, float):
                cells.append(f"{v:>18.6g}")
            else:
                cells.append(f"{str(v):>18}")
        lines.append(name.ljust(width) + "".join(cells))
    return "\n".join(lines)


def main(argv: List[str]) -> int:
    if not argv:
        print(__doc__)
        return 1
    infos, names = [], []
    for path in argv:
        with open(path) as f:
            text = f.read()
        infos.append(parse_info(text))
        names.append(path)
    print(summary_table(infos, names))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
