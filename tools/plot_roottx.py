#!/usr/bin/env python
"""plot_roottx — render a profile's root transition matrices as heatmap PNGs.

Analogue of the reference's plotting utility
(/root/reference/tools/plotRootTx:31-43): for every metric in
``profile["roottx"]``, build the S×S matrix by string-index lookup into
``transitions`` (missing from-state idents yield an all-zero row), then
draw it in a Greys colormap (higher probability = darker) to
``<outdir>/txplot-<metric>.png``.

matplotlib is used when importable; this container doesn't ship it, so the
fallback is a dependency-free grayscale PNG writer (stdlib zlib/struct) —
same matrix, same orientation, same min–max Greys normalization as
``plt.imshow(values, cmap='Greys')``, each cell scaled to ``--cell`` px.

Usage: python tools/plot_roottx.py profile.json outdir/ [--cell 32]
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import zlib


def tx_matrix(transitions: dict, states: int) -> list[list[int]]:
    """S×S nextProbs rows by string state index (plotRootTx:31-38)."""
    empty = [0] * states
    return [
        transitions.get(str(x), {}).get("nextProbs", empty) for x in range(states)
    ]


def write_gray_png(path: str, rows: list[list[int]], cell: int = 32) -> None:
    """Minimal 8-bit grayscale PNG: min–max normalized, Greys (dark=high)."""
    flat = [v for r in rows for v in r]
    vmin, vmax = min(flat), max(flat)
    span = (vmax - vmin) or 1
    h, w = len(rows), len(rows[0])
    raster = b""
    for r in rows:
        line = bytearray()
        for v in r:
            shade = 255 - round(255 * (v - vmin) / span)
            line += bytes([shade]) * cell
        raster += (b"\x00" + bytes(line)) * cell  # filter 0 per scanline

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w * cell, h * cell, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def plot(profile: dict, outdir: str, cell: int = 32) -> list[str]:
    os.makedirs(outdir, exist_ok=True)
    states = profile["settings"]["states"]
    written = []
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        have_mpl = True
    except ImportError:
        have_mpl = False
    for m in profile["roottx"]:
        out = os.path.join(outdir, f"txplot-{m['metric']}.png")
        rows = tx_matrix(m["transitions"], states)
        if have_mpl:
            plt.imshow(rows, cmap="Greys")
            plt.colorbar()
            plt.savefig(out)
            plt.clf()
            plt.close()
        else:
            write_gray_png(out, rows, cell)
        written.append(out)
    return written


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Plot the root transition matrices of a tsprofile as PNG heatmaps."
    )
    ap.add_argument("profile", help="profile json file")
    ap.add_argument("outdir", help="output directory for txplot-<metric>.png")
    ap.add_argument("--cell", type=int, default=32, help="pixels per matrix cell")
    args = ap.parse_args()
    with open(args.profile) as f:
        profile = json.load(f)
    for path in plot(profile, args.outdir, args.cell):
        print(path, file=sys.stderr)


if __name__ == "__main__":
    main()
