#!/usr/bin/env python
"""RELION External-job wrapper for the topaz_tpu pipeline.

Fresh equivalent of the reference wrapper of the same name
(relion_run_topaz/): same parameter surface, but micrograph star files are
parsed directly (no relion_star_printtable dependency) and the bundled
TPU-native topaz CLI is invoked.
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def read_micrograph_paths(star_path):
    from topaz_tpu.io import star

    with open(star_path) as f:
        table = star.parse(f)
    col = "MicrographName" if "MicrographName" in table.columns else table.columns[0]
    return [str(p) for p in table[col]]


def run(cmd):
    print("Running command:", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def topaz_cmd(topaz_path):
    if topaz_path and os.path.isdir(topaz_path):
        return [os.path.join(topaz_path, "topaz")]
    if topaz_path and os.path.exists(topaz_path):
        return [topaz_path]
    return [sys.executable, "-m", "topaz_tpu"]


def finish(out_path, nodes):
    with open(os.path.join(out_path, "RELION_OUTPUT_NODES.star"), "w") as f:
        f.write("data_output_nodes\nloop_\n_rlnPipeLineNodeName #1\n_rlnPipeLineNodeType #2\n")
        for name, kind in nodes:
            f.write(f"{name} {kind}\n")
    open(os.path.join(out_path, "RELION_JOB_EXIT_SUCCESS"), "w").close()
    print("All done!")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-t", "-tpath", "--topaz_path", type=str, default="")
    p.add_argument("-i", "--inputmic", "--in_mics", dest="inputmic")
    p.add_argument("--inputpart", "--in_parts", dest="inputpart")
    p.add_argument("--inputcoords", "--in_coords", dest="inputcoords")
    p.add_argument("-o", "--output", type=str)
    p.add_argument("-r", "--radius", default=3, type=int)
    p.add_argument("--cnn_model", type=str, default="resnet8")
    p.add_argument("-d", "--device", type=int, default=0)
    p.add_argument("-a", "--autoencoder", type=float, default=0)
    p.add_argument("-n", "--numberofparticles", type=int, default=100)
    p.add_argument("-s", "--scalefactor", type=int, default=4)
    p.add_argument("-e", "--epochs", type=int, default=10)
    args, _ = p.parse_known_args()

    out = args.output
    preproc = os.path.join(out, "PreProcessed")
    os.makedirs(preproc, exist_ok=True)
    topaz = topaz_cmd(args.topaz_path)

    parts_raw = os.path.join(out, "inputparts.txt")
    parts_scaled = os.path.join(out, "inputparts_scaled.txt")

    from topaz_tpu.io import star
    import glob
    import pandas as pd

    rows = []
    if args.inputpart is not None:
        with open(args.inputpart) as f:
            table = star.parse(f)
        for r in table.itertuples():
            name = os.path.splitext(os.path.basename(str(r.MicrographName)))[0]
            rows.append((name, int(float(r.CoordinateX)), int(float(r.CoordinateY))))
    else:
        coord_dir = os.path.dirname(args.inputcoords)
        for path in sorted(glob.glob(os.path.join(coord_dir, "*", "*star"))):
            with open(path) as f:
                table = star.parse(f)
            name = os.path.basename(path).replace("_manualpick.star", "")
            name = os.path.splitext(name)[0]
            for r in table.itertuples():
                rows.append((name, int(float(r.CoordinateX)), int(float(r.CoordinateY))))
    pd.DataFrame(rows, columns=["image_name", "x_coord", "y_coord"]).to_csv(
        parts_raw, sep="\t", index=False)

    run(topaz + ["convert", "-s", str(args.scalefactor), parts_raw, "-o", parts_scaled])

    mics = read_micrograph_paths(args.inputmic)
    run(topaz + ["preprocess", "--scale", str(args.scalefactor), "--sample", "1",
                 "--niters", "100", "--alpha", "900", "--beta", "1", "-v",
                 "--device", str(args.device),
                 "--destdir", preproc] + mics)

    run(topaz + ["train", "--train-images", preproc, "--train-targets", parts_scaled,
                 "--device", str(args.device),
                 "--k-fold", "5", "--fold", "0", "--radius", str(args.radius),
                 "--model", args.cnn_model, "--image-ext", ".mrc", "--units", "32",
                 "--method", "GE-binomial", "--autoencoder", str(args.autoencoder),
                 "--num-particles", str(args.numberofparticles),
                 "--learning-rate", "0.0002", "--minibatch-size", "256",
                 "--minibatch-balance", "0.0625", "--epoch-size", "5000",
                 "--num-epochs", str(args.epochs),
                 "--save-prefix", os.path.join(out, "model"),
                 "--output", os.path.join(out, "model_plot.star")])

    star_out = os.path.join(out, "preprocessed_micrographs.star")
    with open(star_out, "w") as f:
        f.write("data_micrographs\nloop_\n_rlnMicrographName #1\n")
        for path in sorted(glob.glob(os.path.join(preproc, "*.mrc"))):
            f.write(path + "\n")
    with open(os.path.join(out, "coords_suffix_extract.star"), "w") as f:
        f.write(args.inputmic)
    finish(out, [(star_out, 1), (os.path.join(out, "coords_suffix_extract.star"), 2)])


if __name__ == "__main__":
    main()
