#!/usr/bin/env python
"""Generate an image_name/path list file from paths on the command line
(fresh equivalent of scripts/generate_image_list.py)."""
import argparse
import os


def main():
    p = argparse.ArgumentParser("Generate an image list file from paths")
    p.add_argument("paths", nargs="+")
    args = p.parse_args()
    print("image_name\tpath")
    for path in args.paths:
        name = os.path.splitext(os.path.basename(path))[0]
        print(f"{name}\t{path}")


if __name__ == "__main__":
    main()
