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
    p.add_argument("-i", "--input", "--in_movies", dest="input", help="Input movies star")
    p.add_argument("-o", "--output")
    p.add_argument("-g", "--gain", help="Gain image (flip/rotate beforehand if needed)")
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-c", "--criteria", default="L2")
    p.add_argument("-d", "--device", type=int, default=0)
    p.add_argument("-n", "--num_cpus", type=int, default=8)
    p.add_argument("-f", "--frames", type=int, help="Number of frames in each movie")
    p.add_argument("-s", "--skip_preprocess", default=False, type=str2bool)
    args, _ = p.parse_known_args()

    out = args.output
    odd_dir = os.path.join(out, "TrainOdd")
    even_dir = os.path.join(out, "TrainEven")
    topaz = topaz_cmd(args.topaz_path)

    if not args.skip_preprocess:
        # split each movie into odd/even frame-sum halves (noise2noise pairs)
        import numpy as np

        from topaz_tpu.io import mrc

        os.makedirs(odd_dir, exist_ok=True)
        os.makedirs(even_dir, exist_ok=True)
        gain = None
        if args.gain:
            gain, _, _ = mrc.read(args.gain)
        for path in read_micrograph_paths(args.input):
            movie, header, _ = mrc.read(path)
            movie = movie.astype("float32")
            if movie.ndim == 2:
                movie = movie[None]
            if gain is not None:
                movie = movie * gain
            name = os.path.splitext(os.path.basename(path))[0] + ".mrc"
            mrc.write(os.path.join(odd_dir, name), movie[1::2].sum(axis=0))
            mrc.write(os.path.join(even_dir, name), movie[0::2].sum(axis=0))

    run(topaz + ["denoise", "--dir-a", odd_dir, "--dir-b", even_dir,
                 "--device", str(args.device),
                 "--criteria", args.criteria, "--preload",
                 "--num-epochs", str(args.epochs),
                 "--save-prefix", os.path.join(out, "model")])
    finish(out, [])


if __name__ == "__main__":
    main()
