#!/usr/bin/env python
"""Export a topaz_tpu checkpoint (.npz or pretrained alias) as a
reference-compatible torch .sav.

Default: a state-dict archive written WITHOUT torch
(models/convert.write_sav) — load it on the torch side with
``model.load_state_dict(torch.load(path, weights_only=True))``.

--whole-module: a pickled nn.Module that the reference CLI's --model flag
loads directly (topaz/model/factory.py:54-56 and
topaz/denoising/models.py:608-610 expect a whole module for user paths) —
requires torch and the reference `topaz` package at export time.

Usage: python scripts/export_reference_sav.py <model-or-ckpt> <out.sav>
           [--denoiser] [--whole-module]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model", help="pretrained alias or .npz checkpoint")
    parser.add_argument("output", help="output .sav path")
    parser.add_argument("--denoiser", action="store_true",
                        help="the checkpoint is a denoiser, not a picker")
    parser.add_argument("--whole-module", action="store_true",
                        help="write a pickled nn.Module instead of a "
                             "state-dict (drop-in for the reference CLI; "
                             "needs torch + reference topaz)")
    args = parser.parse_args()

    if args.denoiser:
        from topaz_tpu.models.convert import export_denoiser_sav

        export_denoiser_sav(args.output, args.model,
                            whole_module=args.whole_module)
    else:
        from topaz_tpu.models.convert import export_picker_sav

        export_picker_sav(args.output, args.model,
                          whole_module=args.whole_module)
    print(f"# wrote {args.output}")


if __name__ == "__main__":
    main()
