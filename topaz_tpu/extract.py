"""Particle extraction: dense scoring + on-device NMS + coordinate output.

TPU-native pipeline with the behavioral contract of topaz/extract.py:
  * score_images streams (path, dense score map); whole-image scoring under
    jit by default (the TPU has HBM for full micrographs — the reference's
    patch loop, model/utils.py:110-193, exists only as a parity/memory
    fallback here)
  * NMS runs on device (ops/nms.py) instead of a multiprocessing pool
  * radius auto-tuning and AUPRC validation against target coordinates
    (extract.py:135-204), Hungarian matching on host
  * output: single table / per-micrograph files / stdout, coordinates
    rescaled by up_scale/down_scale (extract.py:311-354)
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Iterable, Iterator, List, Optional, TextIO, Tuple

import numpy as np
import pandas as pd

from topaz_tpu.io.image import load_image
from topaz_tpu.ops.metrics import average_precision, match_coordinates
from topaz_tpu.ops.nms import non_maximum_suppression, non_maximum_suppression_3d
from topaz_tpu.utils.printing import report


def stream_inputs(f: TextIO) -> Iterator[str]:
    """Yield non-empty stripped lines (stdin streaming, extract.py:271)."""
    for line in f:
        line = line.strip()
        if line:
            yield line


def score_images(
    model: Optional[str],
    paths: Iterable[str],
    patch_size: int = 0,
    batch_size: int = 1,
    precision=None,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (path, dense score map) per micrograph
    (topaz/extract.py:224-256). ``model='none'`` passes images through as
    already-computed score maps."""
    if model is None or model == "none":
        for path in paths:
            yield path, load_image(path)
        return

    import jax
    import jax.numpy as jnp

    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker

    spec, params, state = load_picker(model)

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def _score(x):
        y, _ = apply_picker(spec, params, x[None], state=state, dense=True,
                            precision=precision)
        return y[0]

    for path in paths:
        image = np.asarray(load_image(path), dtype=np.float32)
        if image.ndim == 3:
            from topaz_tpu.models.tiling import classify_patches_3d

            scores = classify_patches_3d(spec, params, state, image,
                                         precision=precision)
        elif patch_size:
            from topaz_tpu.models.tiling import predict_in_patches

            scores = predict_in_patches(spec, params, state, image,
                                        patch_size, precision=precision)
        else:
            scores = np.asarray(_score(jnp.asarray(image)))
        yield path, scores


def _nms_for_dims(dims: int):
    if dims == 2:
        return lambda score, r, threshold: non_maximum_suppression(
            score, r, threshold=threshold
        )
    return lambda score, r, threshold: non_maximum_suppression_3d(
        score, r, threshold=threshold
    )


def iterate_score_target_pairs(scores: Dict[str, np.ndarray], targets: pd.DataFrame,
                               dims: int = 2):
    """Pair each image's score map with its target coordinates."""
    cols = ["x_coord", "y_coord"] + (["z_coord"] if dims == 3 else [])
    for image_name, score in scores.items():
        target = targets.loc[targets.image_name == image_name][cols].values
        yield score, target


def extract_auprc(
    targets: pd.DataFrame,
    scores: Dict[str, np.ndarray],
    radius: float,
    threshold: float,
    match_radius: Optional[float] = None,
    dims: int = 2,
) -> Tuple[float, float, int, int]:
    """AUPRC/RMSE of extraction against labeled targets
    (topaz/extract.py:135-171)."""
    N = 0
    mse = 0.0
    hits = []
    preds = []
    for score, target in iterate_score_target_pairs(scores, targets, dims=dims):
        if dims == 2:
            s, coords = non_maximum_suppression(score, radius, threshold=threshold)
        else:
            # 3D validation crashes in the reference (2-column targets vs
            # 3-column predictions, extract.py:107-128) — fixed here
            s, coords = non_maximum_suppression_3d(score, radius * 2,
                                                   threshold=threshold)
        r = radius if match_radius is None else match_radius
        assignment, dist = match_coordinates(target, coords, r)
        mse += float(np.sum(dist[assignment == 1] ** 2))
        hits.append(assignment)
        preds.append(s)
        N += len(target)

    hits = np.concatenate(hits, 0) if hits else np.zeros(0, dtype=np.float32)
    preds = np.concatenate(preds, 0) if preds else np.zeros(0, dtype=np.float32)
    auprc = average_precision(hits, preds, N=N)
    total_hits = int(hits.sum())
    rmse = float(np.sqrt(mse / total_hits)) if total_hits > 0 else 0.0
    return auprc, rmse, total_hits, N


def find_opt_radius(
    targets: pd.DataFrame,
    scores: Dict[str, np.ndarray],
    threshold: float,
    lo: int = 0,
    hi: int = 200,
    step: int = 10,
    match_radius: Optional[float] = None,
    dims: int = 2,
) -> Tuple[int, float]:
    """Grid-search the extraction radius maximizing AUPRC
    (topaz/extract.py:187-204)."""
    auprc = np.zeros(hi + 1) - 1
    for r in range(lo, hi + 1, step):
        au, rmse, recall, n = extract_auprc(targets, scores, r, threshold,
                                            match_radius=match_radius, dims=dims)
        auprc[r] = au
        print(f"# radius={r}, auprc={au}, rmse={rmse}, recall={recall}, targets={n}")
    r = int(np.argmax(auprc))
    return r, auprc[r]


def extract_particles(
    paths: List[str],
    model: Optional[str],
    threshold: float,
    radius: Optional[int],
    targets: Optional[str] = None,
    min_radius: int = 5,
    max_radius: int = 100,
    step: int = 5,
    match_radius: Optional[int] = None,
    patch_size: int = 0,
    batch_size: int = 1,
    only_validate: bool = False,
    output: Optional[str] = None,
    per_micrograph: bool = False,
    suffix: str = "",
    out_format: str = "coord",
    up_scale: float = 1.0,
    down_scale: float = 1.0,
    dims: int = 2,
    verbose: bool = False,
    precision=None,
    device: int = 0,
    skip_errors: bool = False,
) -> None:
    """Orchestrate scoring + NMS + output (topaz/extract.py:266-367).
    ``device=-2`` spreads batched scoring over all devices via the mesh."""
    from topaz_tpu.io import coordinates as file_utils

    report("Beginning extraction")
    paths = list(paths) if paths else list(stream_inputs(sys.stdin))

    from topaz_tpu.parallel.devices import resolve_devices

    resolved = resolve_devices(device)  # pins -d N; resolves the mesh set
    devices = None
    if device == -2:
        devices = resolved
        if batch_size <= 1:
            batch_size = len(devices)
    stream: Iterable[Tuple[str, np.ndarray]] = score_images(
        model, paths, patch_size=patch_size, batch_size=batch_size,
        precision=precision,
    )

    radius = radius if radius is not None else -1

    # batched fast path: same-shape scoring sharded/batched on device
    # (reference scores strictly one image at a time, extract.py:224-256)
    use_batched = (
        batch_size > 1 and model not in (None, "none") and dims == 2
        and targets is None and not patch_size and radius >= 0
        and not only_validate
    )
    if use_batched:
        return _extract_batched(
            paths, model, threshold, radius, batch_size, output,
            per_micrograph, suffix, out_format, up_scale, down_scale,
            verbose, precision, devices, skip_errors=skip_errors,
        )
    if devices is not None and len(devices) > 1:
        print("# WARNING: -d -2 multi-device scoring needs the batched "
              "fast path (2D, a model, an explicit radius >= 0, and no "
              "--targets/--only-validate/--patch-size); falling back to "
              "single-device scoring", file=sys.stderr)

    if targets is not None:
        scores = {k: v for k, v in stream}
        stream = scores.items()
        targets_df = pd.read_csv(targets, sep="\t")
        target_scores = {
            name: scores[name]
            for name in targets_df.image_name.unique()
            if name in scores
        }
        if radius < 0:
            report("Finding optimal radius for extraction")
            radius, auprc = find_opt_radius(
                targets_df, target_scores, threshold, lo=min_radius,
                hi=max_radius, step=step, match_radius=match_radius, dims=dims,
            )
            report(f"Optimal radius found: {radius} with AUPRC: {auprc}")
        else:
            au, rmse, recall, n = extract_auprc(
                targets_df, target_scores, radius, threshold,
                match_radius=match_radius, dims=dims,
            )
            print(f"# radius={radius}, auprc={au}, rmse={rmse}, "
                  f"recall={recall}, targets={n}")
    elif radius < 0:
        raise ValueError(
            "Must specify targets for choosing the extraction radius if "
            "extraction radius is not provided"
        )

    if only_validate:
        report("Extraction complete")
        return

    scale = up_scale / down_scale
    nms = _nms_for_dims(dims)

    f = None
    output_dir = None
    if not per_micrograph:
        if output is not None and os.path.isdir(output):
            output = os.path.join(output, "extracted_particles.txt")
        f = sys.stdout if output is None else open(output, "w")
        z_string = "\tz_coord" if dims == 3 else ""
        print(f"image_name\tx_coord\ty_coord{z_string}\tscore", file=f)
    elif output is not None and not os.path.isdir(output):
        os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
        output_dir = os.path.join(os.path.dirname(output), "COORDS")
        os.makedirs(output_dir, exist_ok=True)
    else:
        output_dir = output

    for path, score in stream:
        name, ext = os.path.splitext(os.path.basename(path))
        s, coords = nms(score, radius, threshold)
        if verbose:
            report(f"Extracted {len(s)} particles from {name}")
        if scale != 1:
            coords = np.round(coords * scale).astype(int)
        if per_micrograph:
            data = {"image_name": name, "x_coord": coords[:, 0],
                    "y_coord": coords[:, 1]}
            if dims == 3:
                data["z_coord"] = coords[:, 2]
            data["score"] = s
            table = pd.DataFrame(data)
            out_path = os.path.join(output_dir, name + suffix + "." + out_format)
            with open(out_path, "w") as pf:
                file_utils.write_table(pf, table, format=out_format, image_ext=ext)
        else:
            for i in range(len(s)):
                z_coord = f"\t{coords[i, 2]}" if dims == 3 else ""
                print(f"{name}\t{coords[i, 0]}\t{coords[i, 1]}{z_coord}\t{s[i]}",
                      file=f)

    if f is not None and f is not sys.stdout:
        f.close()
    report("Extraction complete")


def _extract_batched(paths, model, threshold, radius, batch_size, output,
                     per_micrograph, suffix, out_format, up_scale,
                     down_scale, verbose, precision, devices=None,
                     skip_errors=False):
    """Batched extraction through the device pipeline (pipeline.py),
    sharded over the mesh's data axis when multiple devices are given."""
    from topaz_tpu.io import coordinates as file_utils
    from topaz_tpu.parallel.devices import hybrid_mesh_for
    from topaz_tpu.pipeline import MicrographPipeline

    mesh = hybrid_mesh_for(devices, batch_size, warn=True)
    if mesh is not None:
        nd, ns = mesh.shape["data"], mesh.shape.get("space", 1)
        report(f"Batched scoring sharded over {nd * ns} devices"
               + (f" ({nd} batch x {ns} spatial)" if ns > 1 else ""))
    pipe = MicrographPipeline(model=model, scale=1, radius=radius,
                              threshold=threshold, normalize=False,
                              mesh=mesh, precision=precision,
                              skip_errors=skip_errors)
    scale = up_scale / down_scale

    f = None
    output_dir = None
    if not per_micrograph:
        if output is not None and os.path.isdir(output):
            output = os.path.join(output, "extracted_particles.txt")
        f = sys.stdout if output is None else open(output, "w")
        print("image_name\tx_coord\ty_coord\tscore", file=f)
    elif output is not None and not os.path.isdir(output):
        os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
        output_dir = os.path.join(os.path.dirname(output), "COORDS")
        os.makedirs(output_dir, exist_ok=True)
    else:
        output_dir = output

    for path, s, coords in pipe.process(paths, batch_size=batch_size):
        name, ext = os.path.splitext(os.path.basename(path))
        if verbose:
            report(f"Extracted {len(s)} particles from {name}")
        if scale != 1:
            coords = np.round(coords * scale).astype(int)
        if per_micrograph:
            table = pd.DataFrame({"image_name": name, "x_coord": coords[:, 0],
                                  "y_coord": coords[:, 1], "score": s})
            out_path = os.path.join(output_dir, name + suffix + "." + out_format)
            with open(out_path, "w") as pf:
                file_utils.write_table(pf, table, format=out_format, image_ext=ext)
        else:
            for i in range(len(s)):
                print(f"{name}\t{coords[i, 0]}\t{coords[i, 1]}\t{s[i]}", file=f)

    if f is not None and f is not sys.stdout:
        f.close()
    report("Extraction complete")
