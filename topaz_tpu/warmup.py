"""``topaz warmup`` — pre-seed the persistent compile cache (TPU-build
extension; the reference has no compile step to warm).

First compiles of the acquisition-shaped device programs take minutes on
remote-attached chips (measured: 36s pipeline warmup, 225s train-step
compile — BENCH tail). The CLI's persistent cache (cli/main.py,
``~/.cache/topaz_tpu/jax_cache``) makes that a one-time cost per shape —
but nothing pays it ahead of time, so the FIRST micrograph of a real
acquisition run lands on a cold cache. ``topaz warmup`` compiles the
standard programs for a model + scale + shape list before acquisition
starts: run it once after install (or at pod start, before pointing
``topaz watch``/``topaz serve`` at the microscope) and the first frame is
served at steady-state latency.

What gets compiled, per shape bucket: the batched extraction pipeline
program (device Fourier crop + GMM normalize + dense score + NMS) at each
requested batch size — exactly the programs ``topaz watch``, ``topaz
serve`` and batched ``topaz extract`` run — and, when a denoise model is
given, the whole-image denoise program at the raw shape (the ``topaz
denoise`` / ``/denoise`` path).

Note on remote-attached (tunneled) chips: a persistent-cache hit still
pays a one-time per-process executable upload/load on first dispatch
(measured ~50-130s for the 6 MB pipeline executable over a ~15 MB/s
tunnel; sub-second on a local TPU VM). Warmup removes the multi-minute
XLA compiles — the dominant cold-start term — but long-running
``watch``/``serve`` processes are the way to amortize the load cost on
tunneled deployments.
"""

from __future__ import annotations

import os
import tempfile
import time
from typing import Optional, Sequence, Tuple

import numpy as np

from topaz_tpu.utils.printing import report


def parse_shapes(text: str) -> Tuple[Tuple[int, int], ...]:
    """``"4096x4096,5760x4092"`` -> ((4096, 4096), (5760, 4092))."""
    shapes = []
    for tok in text.split(","):
        tok = tok.strip().lower()
        if not tok:
            continue
        try:
            h, w = (int(v) for v in tok.split("x"))
        except ValueError as e:
            raise ValueError(
                f"bad shape {tok!r}: expected HEIGHTxWIDTH, e.g. 4096x4096"
            ) from e
        shapes.append((h, w))
    if not shapes:
        raise ValueError("no shapes given")
    return tuple(shapes)


def warmup(model: str = "resnet16_u32",
           denoise_model: Optional[str] = None, scale: int = 8,
           radius: int = 14, threshold: float = -6.0,
           shapes: Sequence[Tuple[int, int]] = ((4096, 4096),),
           batch_sizes: Sequence[int] = (1, 8), bins: int = 0,
           precision=None, dtype=None, mesh=None) -> int:
    """Compile the standard acquisition programs into the (already
    configured) persistent cache. Returns the number of programs run."""
    from topaz_tpu.io import mrc
    from topaz_tpu.pipeline import MicrographPipeline

    # identical construction to watch.py:198 / serve.py — same programs
    # (incl. the pipeline's picking-scale denoise arm when a denoiser is
    # given, which is what watch runs)
    pipe = MicrographPipeline(
        model=model, denoise_model=denoise_model, scale=scale,
        radius=radius, threshold=threshold, normalize=True, mesh=mesh,
        precision=precision, bins=bins, dtype=dtype)
    denoiser = None
    if denoise_model is not None:
        # also the raw-shape whole-image program (topaz denoise /
        # serve's /denoise)
        from topaz_tpu.denoise import Denoise

        denoiser = Denoise(denoise_model, dtype=dtype, precision=precision)

    rng = np.random.default_rng(0)
    n_programs = 0
    t_all = time.time()
    with tempfile.TemporaryDirectory(prefix="topaz_warmup_") as tmp:
        for h, w in shapes:
            path = os.path.join(tmp, f"warm_{h}x{w}.mrc")
            mrc.write(path, rng.normal(0, 1, (h, w)).astype(np.float32))
            for bs in batch_sizes:
                t0 = time.time()
                for _ in pipe.process([path] * bs, batch_size=bs):
                    pass
                report(f"warmup: extract {h}x{w} batch {bs} ready in "
                       f"{time.time() - t0:.1f}s")
                n_programs += 1
            if denoiser is not None:
                t0 = time.time()
                denoiser.denoise(
                    np.asarray(mrc.read(path)[0], dtype=np.float32),
                    patch_size=0)
                report(f"warmup: denoise {h}x{w} ready in "
                       f"{time.time() - t0:.1f}s")
                n_programs += 1
    report(f"warmup: {n_programs} programs compiled/validated in "
           f"{time.time() - t_all:.1f}s; subsequent runs with these "
           f"shapes start warm")
    return n_programs


def warmup_from_args(args) -> int:
    from topaz_tpu.parallel.devices import hybrid_mesh_for, resolve_devices

    devices = resolve_devices(args.device)
    mesh = None
    batch_sizes = sorted({int(b) for b in args.batch_sizes.split(",") if b})
    if devices is not None and len(devices) > 1:
        mesh = hybrid_mesh_for(devices, max(batch_sizes), warn=True)
    dtype = "bf16" if getattr(args, "precision", "f32") == "bf16" else None
    warmup(model=args.model, denoise_model=args.denoise_model,
           scale=args.scale, radius=args.radius, threshold=args.threshold,
           shapes=parse_shapes(args.shapes), batch_sizes=batch_sizes,
           bins=getattr(args, "bins", 0), dtype=dtype, mesh=mesh)
    return 0
