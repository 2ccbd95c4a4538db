"""The documented fast profile: one switch for the measured fast paths.

``--fast`` is available on the throughput-critical commands and resolves to
the opt-in accelerations that were individually benchmarked (BENCH_r02
extras; ROADMAP "fast profile"):

  * ``--precision bf16`` where the command denoises or scores
    (bf16 params+activations, f32 output; measured -25% denoise time at
    4096^2 with ~0.4% relative error on the denoised image),
  * histogram-EM normalization (``--bins 65536``) where the command fits
    the intensity GMM (full-pixel histogram EM, ~5x faster at 4k full
    resolution; error is value quantization to the bin width only),
  * ``--auto-patch`` on denoise3d: the cost-optimal patch size for each
    tomogram's dimensions instead of the reference's fixed -s 96 (whose
    +-48 padding is an 8x overlap tax; measured 2.5x on a 192x384x384
    volume, profiles/PROFILE.md). Same padding, so the seam-apron
    quality knob is untouched; only the patch grid (and hence each
    patch's normalization statistics) differs from the reference layout.

Defaults stay exact/f32 everywhere for bit-level parity with the torch
reference (reference defaults anchor: topaz/commands/denoise.py:52-53).
"""

from __future__ import annotations

FAST_BINS = 65536


def add_fast_flag(parser) -> None:
    parser.add_argument(
        "--fast", action="store_true",
        help="enable the documented fast profile: bf16 inference and/or "
             "histogram-EM normalization where applicable (equivalent to "
             "--precision bf16 / --bins 65536; ~0.4%% relative error on "
             "denoised output, GMM stats quantized to 1/65536 of the "
             "intensity range). Defaults stay f32/exact for bit-parity "
             "with the reference")


def apply_fast(args) -> None:
    """Resolve ``--fast`` into the concrete knobs, without overriding a
    knob the user set away from its default."""
    if not getattr(args, "fast", False):
        return
    if getattr(args, "precision", None) == "f32":
        args.precision = "bf16"
    if getattr(args, "bins", None) == 0:
        args.bins = FAST_BINS
    # denoise3d only: cost-optimal patch grid unless the user chose a
    # patch size themselves (-s away from the reference default of 96)
    if hasattr(args, "auto_patch") and not args.auto_patch \
            and getattr(args, "patch_size", None) == 96:
        args.auto_patch = True
