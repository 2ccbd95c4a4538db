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
    p.add_argument("-i", "--input", "--in_mics", dest="input")
    p.add_argument("-o", "--output")
    p.add_argument("-m", "--model", default="unet", type=str)
    p.add_argument("-d", "--device", type=int, default=0)
    p.add_argument("--patch_size", type=int, default=1280)
    p.add_argument("--patch_padding", type=int, default=384)
    args, _ = p.parse_known_args()

    out = args.output
    denoised = os.path.join(out, "Denoised")
    os.makedirs(denoised, exist_ok=True)
    topaz = topaz_cmd(args.topaz_path)
    mics = read_micrograph_paths(args.input)

    run(topaz + ["denoise", "--model", args.model, "--format", "mrc",
                 "--device", str(args.device),
                 "--patch-size", str(args.patch_size),
                 "--patch-padding", str(args.patch_padding), "--normalize",
                 "--output", denoised] + mics)

    star_out = os.path.join(out, "denoised_micrographs.star")
    with open(star_out, "w") as f:
        f.write("data_micrographs\nloop_\n_rlnMicrographName #1\n")
        for m in mics:
            name = os.path.splitext(os.path.basename(m))[0]
            f.write(os.path.join(denoised, name + ".mrc") + "\n")
    finish(out, [(star_out, 1)])


if __name__ == "__main__":
    main()
