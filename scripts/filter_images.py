#!/usr/bin/env python
"""Filter an image list to images that appear in a particle targets file
(fresh equivalent of scripts/filter_images.py)."""
import argparse
import sys

import pandas as pd


def main():
    p = argparse.ArgumentParser("Filter an image list by a targets file")
    p.add_argument("file")
    p.add_argument("--targets", required=True)
    p.add_argument("-o", "--output")
    args = p.parse_args()

    images = pd.read_csv(args.file, sep="\t")
    targets = pd.read_csv(args.targets, sep="\t")
    images = images.loc[images.image_name.isin(targets.image_name)]
    out = sys.stdout if args.output is None else args.output
    images.to_csv(out, sep="\t", header=True, index=False)


if __name__ == "__main__":
    main()
