#!/usr/bin/env python
"""Split an image list + coordinates table into train/test sets
(fresh equivalent of scripts/train_test_split.py)."""
import argparse
import os

import numpy as np
import pandas as pd


def main():
    p = argparse.ArgumentParser("Split images and coordinates into train/test")
    p.add_argument("--images", required=True)
    p.add_argument("--targets", required=True)
    p.add_argument("-n", "--number", type=int, required=True,
                   help="number of images in the test set")
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args()

    random = np.random.RandomState(args.seed)
    images = pd.read_csv(args.images, sep="\t")
    targets = pd.read_csv(args.targets, sep="\t")

    order = random.permutation(len(images))
    images = images.iloc[order]
    test_images = images.iloc[: args.number]
    train_images = images.iloc[args.number :]
    train_targets = targets.loc[targets.image_name.isin(train_images.image_name)]
    test_targets = targets.loc[targets.image_name.isin(test_images.image_name)]

    img_base = os.path.splitext(args.images)[0]
    tgt_base = os.path.splitext(args.targets)[0]
    for path, table in [
        (img_base + "_train.txt", train_images),
        (img_base + "_test.txt", test_images),
        (tgt_base + "_train.txt", train_targets),
        (tgt_base + "_test.txt", test_targets),
    ]:
        print("# writing:", path)
        table.to_csv(path, sep="\t", index=False)


if __name__ == "__main__":
    main()
