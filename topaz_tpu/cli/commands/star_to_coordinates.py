"""topaz star_to_coordinates [deprecated]."""
import sys

name = "star_to_coordinates"
help = "convert .star file coordinates to tab delimited coordinates table"


def add_arguments(parser):
    parser.add_argument("file", help="path to input star file")
    parser.add_argument("-o", "--output", help="output file (default: stdout)")
    return parser


def main(args):
    import os

    from topaz_tpu.io import star

    with open(args.file) as f:
        table = star.parse(f)
    cols = ["MicrographName", "CoordinateX", "CoordinateY"]
    names = ["image_name", "x_coord", "y_coord"]
    if "ParticleScore" in table.columns:
        cols.append("ParticleScore")
        names.append("score")
    elif star.SCORE_COLUMN_NAME in table.columns:
        cols.append(star.SCORE_COLUMN_NAME)
        names.append("score")
    table = table[cols]
    table.columns = names
    table["x_coord"] = table["x_coord"].astype(float).astype(int)
    table["y_coord"] = table["y_coord"].astype(float).astype(int)
    table["image_name"] = table["image_name"].apply(lambda p: os.path.splitext(p)[0])
    out = args.output if args.output is not None else sys.stdout
    table.to_csv(out, sep="\t", index=False)
