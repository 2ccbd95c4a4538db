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


def str2bool(v):
    """RELION external-job params arrive as strings: treat 'False'/'No'/'0'
    (the values RELION's GUI actually sends) as False instead of truthy —
    the reference wrapper skips the stage on ANY supplied value."""
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() not in ("false", "no", "0", "", "none")


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
    p.add_argument("-i", "--input", "--in_mics", dest="input", help="Input micrographs star")
    p.add_argument("-o", "--output", type=str, help="Output folder (full path)")
    p.add_argument("-d", "--device", type=int, default=0)
    p.add_argument("-scale", "--scalefactor", type=int, default=4)
    p.add_argument("-r", "--radius", type=int, default=8)
    p.add_argument("-m", "--model", type=str, default="resnet16_u64")
    p.add_argument("--pickthreshold", "--pick_threshold", dest="pickthreshold", type=float, default=-6)
    p.add_argument("--selectthreshold", "--select_threshold", dest="selectthreshold", type=float, default=0)
    p.add_argument("--skip_preprocess", default=False, type=str2bool)
    p.add_argument("--skip_pick", default=False, type=str2bool)
    args, _ = p.parse_known_args()

    out = args.output
    preproc = os.path.join(out, "PreProcessed")
    picks_raw = os.path.join(out, "topaz_picks.txt")
    picks_scaled = os.path.join(out, "topaz_picks_scaled.txt")
    os.makedirs(preproc, exist_ok=True)
    topaz = topaz_cmd(args.topaz_path)
    mics = read_micrograph_paths(args.input)

    if not (args.skip_pick or args.skip_preprocess):
        run(topaz + ["preprocess", "--scale", str(args.scalefactor), "--sample", "1",
                     "--niters", "100", "--alpha", "900", "--beta", "1", "-v",
                     "--device", str(args.device),
                     "--destdir", preproc] + mics)
    if not args.skip_pick:
        import glob

        run(topaz + ["extract", "--model", args.model, "--radius", str(args.radius),
                     "--threshold", str(args.pickthreshold), "--up-scale", "1",
                     "--device", str(args.device),
                     "--output", picks_raw] + sorted(glob.glob(os.path.join(preproc, "*.mrc"))))

    run(topaz + ["convert", picks_raw, "--threshold", str(args.selectthreshold),
                 "--up-scale", str(args.scalefactor), "--output", picks_scaled])

    # one star file of picks per micrograph
    import pandas as pd

    picks = pd.read_csv(picks_scaled, sep="\t")
    job_dir = os.path.basename(os.path.dirname(mics[0])) if mics else "picks"
    star_dir = os.path.join(out, job_dir)
    os.makedirs(star_dir, exist_ok=True)
    for name, group in picks.groupby("image_name"):
        with open(os.path.join(star_dir, f"{name}_topazpicks.star"), "w") as f:
            f.write("# version 30001\n\ndata_\n\nloop_\n_rlnCoordinateX #1\n"
                    "_rlnCoordinateY #2\n_rlnAutopickFigureOfMerit #3\n")
            for row in group.itertuples():
                f.write(f"{row.x_coord}\t{row.y_coord}\t{row.score}\n")

    with open(os.path.join(out, "coords_suffix_topazpicks.star"), "w") as f:
        f.write(args.input)
    finish(out, [(os.path.join(out, "coords_suffix_topazpicks.star"), 2)])


if __name__ == "__main__":
    main()
