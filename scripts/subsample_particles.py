#!/usr/bin/env python
"""Randomly subsample rows of a particle coordinates table
(fresh equivalent of scripts/subsample_particles.py)."""
import argparse
import sys

import numpy as np
import pandas as pd


def main():
    p = argparse.ArgumentParser("Subsample particles from a coordinates table")
    p.add_argument("file")
    p.add_argument("-n", "--number", type=int, required=True)
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args()

    random = np.random.RandomState(args.seed)
    targets = pd.read_csv(args.file, sep="\t")
    order = random.permutation(len(targets))
    sampled = targets.iloc[order[: args.number]].copy()
    sampled.sort_values("image_name", inplace=True)
    sampled.to_csv(sys.stdout, sep="\t", index=False)


if __name__ == "__main__":
    main()
