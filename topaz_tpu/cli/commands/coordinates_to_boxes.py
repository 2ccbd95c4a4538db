"""topaz coordinates_to_boxes [deprecated]."""
import os

name = "coordinates_to_boxes"
help = "convert coordinates table to .box format files per image"


def add_arguments(parser):
    parser.add_argument("paths", nargs="+", help="path to input coordinates file")
    parser.add_argument("--destdir", required=True, help="directory to write per image files")
    parser.add_argument("--boxsize", required=True, type=int, help="size of particle boxes")
    parser.add_argument("--invert-y", action="store_true", help="invert (mirror) the y-axis particle coordinates")
    parser.add_argument("--imagedir", help="directory of images, required to invert the y-axis")
    parser.add_argument("--image-ext", default="tiff", help="image format extension (default: tiff)")
    return parser


def main(args):
    import glob

    import numpy as np
    import pandas as pd

    from topaz_tpu.io.coordinates import coordinates_to_boxes
    from topaz_tpu.io.image import load_image

    coords = pd.concat([pd.read_csv(p, sep="\t") for p in args.paths], axis=0)
    coords = coords.drop_duplicates()
    os.makedirs(args.destdir, exist_ok=True)
    for image_name, group in coords.groupby("image_name"):
        shape = None
        if args.invert_y:
            impath = glob.glob(os.path.join(args.imagedir, image_name) + "." + args.image_ext)[0]
            shape = load_image(impath).shape
        xy = group[["x_coord", "y_coord"]].values.astype(np.int32)
        boxes = pd.DataFrame(coordinates_to_boxes(xy, args.boxsize, args.boxsize,
                                                  shape=shape, invert_y=args.invert_y))
        boxes.to_csv(os.path.join(args.destdir, image_name + ".box"),
                     sep="\t", header=False, index=False)
