#!/usr/bin/env python
"""Match predicted particles to a target set per micrograph and write the
match/distance columns (fresh equivalent of
scripts/match_extracted_particles.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import pandas as pd

from topaz_tpu.ops.metrics import match_coordinates


def main():
    p = argparse.ArgumentParser("Match predicted particles with a test set")
    p.add_argument("path", help="path to predictions")
    p.add_argument("-r", "--radius", type=int, required=True)
    p.add_argument("--targets", required=True)
    p.add_argument("-o", "--output")
    args = p.parse_args()

    preds = pd.read_csv(args.path, sep="\t", comment="#")
    targets = pd.read_csv(args.targets, sep="\t")

    frames = []
    for name, group in preds.groupby("image_name"):
        t = targets.loc[targets.image_name == name][["x_coord", "y_coord"]].values
        c = group[["x_coord", "y_coord"]].values
        match, dist = match_coordinates(t, c, args.radius)
        group = group.copy()
        group["match"] = match
        group["distance"] = dist
        frames.append(group)

    table = pd.concat(frames, axis=0)
    out = sys.stdout if args.output is None else args.output
    table.to_csv(out, sep="\t", index=False)


if __name__ == "__main__":
    main()
