"""topaz particle_stack (topaz/commands/particle_stack.py)."""
import argparse

import numpy as np

name = "particle_stack"
help = "extract images of particles into a particle stack"


def add_arguments(parser=None):
    if parser is None:
        parser = argparse.ArgumentParser(help)
    parser.add_argument("file", help="path to input particle file")
    parser.add_argument("-o", "--output", help="path to write particle stack file")
    parser.add_argument("--image-root", help="root directory of the micrograph files")
    parser.add_argument("--size", type=int, help="size of particle stack images")
    parser.add_argument("--threshold", type=float, default=-np.inf, help="only take particles with scores >= this value (default: -inf)")
    parser.add_argument("--resize", type=int, default=-1, help="rescaled particle size (default: no rescaling)")
    parser.add_argument("--image-ext", default=".mrc", help="image file extension (default: .mrc)")
    parser.add_argument("--metadata", help="path to metadata star file to merge into output")
    return parser


def main(args):
    from topaz_tpu.ops.masks import create_particle_stack

    create_particle_stack(args.file, args.output, args.threshold, args.size,
                          args.resize, args.image_root, args.image_ext,
                          args.metadata)
