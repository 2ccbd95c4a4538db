"""topaz boxes_to_coordinates [deprecated]."""
import os
import sys

name = "boxes_to_coordinates"
help = "convert .box format coordinates to tab delimited coordinates table"


def add_arguments(parser):
    parser.add_argument("files", nargs="+", help="path to input box files")
    parser.add_argument("--invert-y", action="store_true", help="invert (mirror) the y-axis particle coordinates")
    parser.add_argument("--imagedir", help="directory of images, required to invert the y-axis")
    parser.add_argument("--image-ext", default="tiff", help="image format extension (default: tiff)")
    parser.add_argument("-o", "--output", help="destination file (default: stdout)")
    return parser


def main(args):
    import glob

    import pandas as pd

    from topaz_tpu.io.coordinates import boxes_to_coordinates
    from topaz_tpu.io.image import load_image

    tables = []
    for path in args.files:
        if os.path.getsize(path) == 0:
            continue
        shape = None
        image_name = os.path.splitext(os.path.basename(path))[0]
        if args.invert_y:
            impath = glob.glob(os.path.join(args.imagedir, image_name) + "." + args.image_ext)[0]
            im = load_image(impath)
            shape = im.shape
        box = pd.read_csv(path, sep="\t", header=None).values
        tables.append(boxes_to_coordinates(box, shape=shape,
                                           invert_y=args.invert_y,
                                           image_name=image_name))
    table = pd.concat(tables, axis=0)
    out = sys.stdout if args.output is None else args.output
    table.to_csv(out, sep="\t", index=False)
