#!/usr/bin/env python
"""Export a topaz_tpu picker checkpoint (.npz or pretrained alias) as a
reference-compatible torch state-dict .sav — readable by `torch.load` and
the reference CLI's --model flag (topaz/model/factory.py:54-56) — without
requiring torch to be installed (models/convert.write_sav).

Usage: python scripts/export_reference_sav.py <model-or-ckpt> <out.sav>
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model", help="pretrained alias or .npz checkpoint")
    parser.add_argument("output", help="output .sav path")
    args = parser.parse_args()

    from topaz_tpu.models.convert import export_picker_sav

    export_picker_sav(args.output, args.model)
    print(f"# wrote {args.output}")


if __name__ == "__main__":
    main()
