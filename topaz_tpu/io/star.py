"""Minimal RELION STAR file parsing/writing.

Behavioral contract with topaz/utils/star.py:19-98: reads the first data_
block's loop_ table, strips 'rln' prefixes and '#' comments from column
names, renames legacy 'ParticleScore' to 'AutopickFigureOfMerit', coerces
known columns to numeric types; writes 'data_images'/'loop_' with
'_rln<name> #<i>' headers and tab-separated rows.
"""

from __future__ import annotations

import sys
from typing import IO

import pandas as pd

X_COLUMN_NAME = "CoordinateX"
Y_COLUMN_NAME = "CoordinateY"
SCORE_COLUMN_NAME = "AutopickFigureOfMerit"
OLD_SCORE_COLUMN_NAME = "ParticleScore"

VOLTAGE = "Voltage"
DETECTOR_PIXEL_SIZE = "DetectorPixelSize"
MAGNIFICATION = "Magnification"
AMPLITUDE_CONTRAST = "AmplitudeContrast"

_INT_COLUMNS = (X_COLUMN_NAME, Y_COLUMN_NAME)
_FLOAT_COLUMNS = (
    SCORE_COLUMN_NAME,
    VOLTAGE,
    DETECTOR_PIXEL_SIZE,
    MAGNIFICATION,
    AMPLITUDE_CONTRAST,
)


def _clean_column(raw: str) -> str:
    name = raw[1:]  # strip leading underscore
    loc = name.find("#")
    if loc >= 0:
        name = name[:loc]
    name = name.strip()
    if name.startswith("rln"):
        name = name[3:]
    return name


def _is_block_start(stripped: str) -> bool:
    """A new STAR data block is a BARE ``data_<name>`` token — a body row
    whose first cell merely starts with 'data' (e.g. a micrograph named
    data001.mrc, or a 'data/job01/...' path) is particle data, not a block
    terminator (the reference parser drops all such rows silently)."""
    return stripped.startswith("data_") and len(stripped.split()) == 1


def parse(f: IO[str]) -> pd.DataFrame:
    """Parse the first data_ block of a STAR file into a DataFrame."""
    columns = []
    rows = []
    state = "preamble"  # -> in_data -> in_loop -> in_body
    for line in f:
        stripped = line.strip()
        if state == "preamble":
            if stripped.startswith("data_"):
                state = "in_data"
        elif state == "in_data":
            if stripped.startswith("loop_"):
                state = "in_loop"
        elif state == "in_loop":
            if stripped.startswith("_"):
                columns.append(_clean_column(stripped))
            elif stripped:
                if _is_block_start(stripped):
                    break
                state = "in_body"
                if not (stripped.startswith("#") or stripped.startswith(";")):
                    rows.append(stripped.split())
        elif state == "in_body":
            if _is_block_start(stripped):
                break
            if stripped.startswith("#") or stripped.startswith(";") or not stripped:
                continue
            rows.append(stripped.split())

    table = pd.DataFrame(rows, columns=columns)

    if OLD_SCORE_COLUMN_NAME in table.columns and SCORE_COLUMN_NAME not in table.columns:
        table[SCORE_COLUMN_NAME] = table[OLD_SCORE_COLUMN_NAME]
        table = table.drop(OLD_SCORE_COLUMN_NAME, axis=1)

    for col in _INT_COLUMNS:
        if col in table:
            table[col] = table[col].astype(float).astype(int)
    for col in _FLOAT_COLUMNS:
        if col in table:
            table[col] = table[col].astype(float)
    return table


def parse_star(f: IO[str]) -> pd.DataFrame:
    """Alias of :func:`parse` kept for reference-API familiarity."""
    return parse(f)


def write(table: pd.DataFrame, f: IO[str]) -> None:
    """Write a data_images loop (topaz/utils/star.py:91-98)."""
    print("data_images", file=f)
    print("loop_", file=f)
    for i, name in enumerate(table.columns):
        print(f"_rln{name} #{i + 1}", file=f)
    table.to_csv(f, sep="\t", index=False, header=False)


def threshold_star_particles(input_file: str, threshold: float,
                             output_file: str = None) -> None:
    """Filter star particles by legacy ParticleScore
    (topaz/utils/star.py:101-113)."""
    with open(input_file) as f:
        particles = parse(f)
    n = len(particles)
    col = SCORE_COLUMN_NAME if SCORE_COLUMN_NAME in particles.columns else OLD_SCORE_COLUMN_NAME
    particles[col] = particles[col].astype(float)
    particles = particles.loc[particles[col] >= threshold]
    print(f"# filtered {n} particles to {len(particles)} with threshold of {threshold}",
          file=sys.stderr)
    out = sys.stdout if output_file is None else open(output_file, "w")
    try:
        write(particles, out)
    finally:
        if output_file is not None:
            out.close()
