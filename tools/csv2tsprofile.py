#!/usr/bin/env python
"""csv2tsprofile — CSV time series in, TSProfile JSON out.

Analogue of the reference's primary user surface
(/root/reference/cmd/csv2tsprofile/main.go; .goreleaser.yml builds exactly
this plus tspredictor). Flag names, defaults, CSV parsing (every cell
parsed as float64, non-numeric cells silently skipped — main.go:149-177,
so metric_<i> indexes the i-th PARSED value of a row, not the i-th
column), per-row observability files (phase id / period path / current
states — main.go:194-247), and the profile/history JSON documents all
match the reference.

A single CSV is ONE series consumed strictly in row order — the
reference's own design is a single-consumer stream (profiler.go:99-133),
so this CLI drives the sequential parity kernel directly on the driver;
Spark adds nothing for one stream. The distributed engine
(tools/run_pipeline.py, plans/*) is the many-series surface, where the
same kernel runs per series under applyInPandas.

Usage: python tools/csv2tsprofile.py data.csv --states 10 --buffersize 1 \
           --fixedbound --fixedmax 100 --output profile.json
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsprofiler_spark.config import Settings  # noqa: E402
from tsprofiler_spark.kernel.profiler import ReferenceProfiler  # noqa: E402


def parse_args(argv=None):
    ap = argparse.ArgumentParser(
        prog="csv2tsprofile",
        description="Reads time series values from a CSV file and generates a tsprofile",
    )
    ap.add_argument("inputfile")
    ap.add_argument("--states", type=int, default=4)
    ap.add_argument("--buffersize", type=int, default=10)
    ap.add_argument("--history", type=int, default=1)
    ap.add_argument("--filterstddevs", type=int, default=2)
    ap.add_argument("--fixedbound", action="store_true")
    ap.add_argument("--fixedmin", type=float, default=0.0)
    ap.add_argument("--fixedmax", type=float, default=100.0)
    ap.add_argument("--periodsize", default="",
                    help="comma separated list of ints, states per period")
    ap.add_argument("--phasechangelikeliness", type=float, default=0.0)
    ap.add_argument("--phasechangehistory", type=int, default=1)
    ap.add_argument("--phasechangehistoryfadeout", action="store_true")
    ap.add_argument("--output", default="-",
                    help="path to write profile to, stdout if '-'")
    # the reference's go-flags spellings are DOTTED (main.go:35-38
    # long:"out.history" etc.) — accept both so reference-driving scripts
    # work verbatim; argparse needs an explicit dest for the dotted form
    ap.add_argument("--out-history", "--out.history", dest="out_history",
                    default="",
                    help="path for the history doc, '-' stdout, empty disables")
    ap.add_argument("--out-phases", "--out.phases", dest="out_phases", default="")
    ap.add_argument("--out-periods", "--out.periods", dest="out_periods", default="")
    ap.add_argument("--out-states", "--out.states", dest="out_states", default="")
    return ap.parse_args(argv)


class _RowLog:
    """Per-row observability sink: '-' -> stdout, path -> file, '' -> off."""

    def __init__(self, target: str):
        self.target = target
        self.fh = open(target, "w") if target not in ("", "-") else None

    def write(self, line: str) -> None:
        if self.target == "-":
            sys.stdout.write(line + "\n")
        elif self.fh is not None:
            self.fh.write(line + "\n")

    def close(self) -> None:
        if self.fh is not None:
            self.fh.close()


def run(args) -> dict:
    period_size = tuple(
        int(s) for s in args.periodsize.split(",") if s != ""
    )
    settings = Settings(
        name="csv2tsprofile",
        buffer_size=args.buffersize,
        states=args.states,
        history=args.history,
        filter_stddevs=args.filterstddevs,
        fix_bound=args.fixedbound,
        fixed_min=args.fixedmin,
        fixed_max=args.fixedmax,
        period_size=period_size,
        phase_change_likeliness=args.phasechangelikeliness,
        phase_change_history=args.phasechangehistory,
        phase_change_history_fadeout=args.phasechangehistoryfadeout,
    )
    prof = ReferenceProfiler(settings)

    phases_log = _RowLog(args.out_phases)
    periods_log = _RowLog(args.out_periods)
    states_log = _RowLog(args.out_states)
    try:
        with open(args.inputfile, newline="") as f:
            for record in csv.reader(f):
                values = []
                for raw in record:
                    try:
                        values.append(float(raw))
                    except ValueError:
                        continue  # silently skip non-numeric cells
                prof.put(
                    [(f"metric_{i}", v) for i, v in enumerate(values)]
                )
                # per-row observability reflects state as of the last
                # completed chunk (main.go:194-247)
                phases_log.write(str(prof.get_current_phase()))
                periods_log.write(
                    ",".join(str(p) for p in prof.get_current_period_path())
                )
                states_log.write(
                    " ".join(str(s.state) for s in prof.last_states)
                )
    finally:
        phases_log.close()
        periods_log.close()
        states_log.close()

    profile = prof.get_profile()
    doc = json.dumps(profile, sort_keys=True)
    if args.output == "-":
        print(doc)
    else:
        with open(args.output, "w") as f:
            f.write(doc)

    if args.out_history != "":
        hist = json.dumps(prof.get_history(), sort_keys=True)
        if args.out_history == "-":
            print(hist)
        else:
            with open(args.out_history, "w") as f:
                f.write(hist)
    return profile


if __name__ == "__main__":
    run(parse_args())
