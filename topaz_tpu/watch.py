"""Streaming acquisition watcher: process micrographs as they are written.

Production extension — the reference has no streaming mode (its pipeline
commands are batch jobs a facility must re-run by hand during data
collection). ``topaz watch`` monitors a directory for new micrographs,
waits for each file to finish writing (size stable across polls), then
runs everything that arrived through the batched device pipeline
(pipeline.MicrographPipeline: downsample + GMM normalize + dense scoring
+ NMS [+ denoise]), appending picks to the output file and writing
denoised previews incrementally.

Crash/restart safety: a JSON manifest next to the output records every
processed file (with its size) and is replaced atomically after each
batch, and picks are flushed per batch — a restarted watcher resumes
exactly where the previous one stopped, never reprocessing or dropping a
micrograph. Stages reuse the same compiled programs across polls, so
after the first batch each new micrograph costs only device time.
"""

from __future__ import annotations

import fnmatch
import json
import os
import sys
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from topaz_tpu.utils.printing import report


class DirectoryWatcher:
    """Tracks a directory for new, fully-written files matching patterns.

    A file is *stable* — i.e. presumed completely written — once its size
    is unchanged between two consecutive :meth:`scan` calls (microscope
    software writes sequentially; a growing file keeps changing size).
    ``settle_polls`` raises the bar to N unchanged polls for flaky network
    filesystems. Files listed in the manifest are never re-offered unless
    they have grown since they were processed (``reprocess_grown``).
    """

    def __init__(self, input_dir: str, patterns: Sequence[str] = ("*.mrc",),
                 manifest_path: Optional[str] = None, settle_polls: int = 1,
                 reprocess_grown: bool = False, recursive: bool = False):
        self.input_dir = input_dir
        self.patterns = list(patterns)
        self.manifest_path = manifest_path
        self.settle_polls = max(1, int(settle_polls))
        self.reprocess_grown = bool(reprocess_grown)
        # recursive: acquisition software (EPU, SerialEM) nests micrographs
        # in per-grid-square subdirectories created during the run
        self.recursive = bool(recursive)
        #: path -> (last seen size, consecutive stable polls)
        self._pending: Dict[str, Tuple[int, int]] = {}
        #: path -> size when offered by scan(); never re-offered at that
        #: size, so a corrupt file skipped by the pipeline is not retried
        #: on every poll (mark_done promotes entries out of here)
        self._offered: Dict[str, int] = {}
        #: path -> size at processing time
        self.done: Dict[str, int] = {}
        if manifest_path and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                data = json.load(f)
            self.done = {k: int(v["size"]) for k, v in
                         data.get("processed", {}).items()}

    def _matches(self, name: str) -> bool:
        return any(fnmatch.fnmatch(name, p) for p in self.patterns)

    def _entries(self):
        if not self.recursive:
            with os.scandir(self.input_dir) as it:
                yield from it
            return
        stack = [self.input_dir]
        while stack:
            try:
                with os.scandir(stack.pop()) as it:
                    for e in it:
                        if e.is_dir(follow_symlinks=False):
                            stack.append(e.path)
                        else:
                            yield e
            except OSError:
                continue  # directory vanished mid-scan

    def scan(self) -> List[str]:
        """One poll; returns newly *stable* files (sorted by mtime then
        name, so processing follows acquisition order)."""
        found = []
        for e in self._entries():
            if not e.is_file() or not self._matches(e.name):
                continue
            try:
                st = e.stat()
            except OSError:
                continue  # vanished mid-scan
            path = e.path
            if path in self.done:
                if not (self.reprocess_grown
                        and st.st_size > self.done[path]):
                    continue
            if self._offered.get(path) == st.st_size:
                continue  # already handed out at this size
            size, stable = self._pending.get(path, (-1, 0))
            if st.st_size == size:
                stable += 1
            else:
                stable = 0
            self._pending[path] = (st.st_size, stable)
            if stable >= self.settle_polls:
                found.append((st.st_mtime, e.name, path))
        ready = [p for _, _, p in sorted(found)]
        for p in ready:
            self._offered[p] = self._pending.pop(p)[0]
        return ready

    def mark_done(self, path: str) -> None:
        self.done[path] = self._offered.pop(path, -1)

    def requeue(self, paths: Sequence[str]) -> None:
        """Forget that these files were offered so a later scan re-offers
        them — used after a transient device failure so an interrupted
        batch is retried on the next poll instead of being lost."""
        for p in paths:
            self._offered.pop(p, None)

    def save_manifest(self) -> None:
        if not self.manifest_path:
            return
        payload = {"processed": {k: {"size": v}
                                 for k, v in self.done.items()}}
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=0)
        os.replace(tmp, self.manifest_path)


def watch_directory(
    input_dir: str,
    output: str,
    model: str = "resnet16_u32",
    denoise_model: Optional[str] = None,
    denoised_dir: Optional[str] = None,
    scale: int = 8,
    radius: int = 14,
    threshold: float = -6.0,
    batch_size: int = 1,
    patterns: Sequence[str] = ("*.mrc",),
    poll_interval: float = 5.0,
    settle_polls: int = 1,
    recursive: bool = False,
    once: bool = False,
    idle_timeout: Optional[float] = None,
    mesh=None,
    precision=None,
    bins: int = 0,
    dtype=None,
    skip_errors: bool = True,
    up_scale: Optional[float] = None,
    per_micrograph: bool = False,
    out_format: str = "coord",
    suffix: str = "",
    _poll_hook=None,
) -> int:
    """Watch ``input_dir`` and stream new micrographs through the pipeline.

    Picks are appended to ``output`` (``image_name\\tx\\ty\\tscore``, one
    header when the file is created) with coordinates mapped back to RAW
    pixel space (``up_scale`` defaults to ``scale``, matching ``extract
    -x``); when ``denoise_model`` is set, a denoised preview of each
    micrograph (at the pipeline's working scale) is written to
    ``denoised_dir``. Returns the number of micrographs processed.

    ``per_micrograph=True`` instead treats ``output`` as a DIRECTORY and
    writes one coordinate file per micrograph (``<name><suffix>.<fmt>``,
    any ``extract --format``: txt/star/box/json — the layout live
    RELION/CryoSPARC imports consume; reference anchor
    topaz/commands/extract.py:48 + topaz/utils/files.py write path). The
    manifest lives inside the directory and each file is written before
    the micrograph is marked done, so restarts stay lossless.

    Exit conditions: ``once=True`` processes the current backlog and
    returns; ``idle_timeout`` returns after that many seconds without a
    new stable file; otherwise runs until interrupted (the manifest makes
    interruption safe at any point). ``_poll_hook`` (tests) is called
    before each poll and may return False to stop.
    """
    from topaz_tpu.io.mrc import write as write_mrc
    from topaz_tpu.pipeline import MicrographPipeline

    if up_scale is None:
        up_scale = float(scale)
    settle_polls = max(1, int(settle_polls))
    pipe = MicrographPipeline(
        model=model, denoise_model=denoise_model, scale=scale,
        radius=radius, threshold=threshold, normalize=True, mesh=mesh,
        precision=precision, bins=bins, dtype=dtype,
        skip_errors=skip_errors)

    if per_micrograph:
        out_dir = output
        os.makedirs(out_dir, exist_ok=True)
        manifest_path = os.path.join(out_dir, "watch.manifest.json")
        anchor_dir = out_dir
    else:
        os.makedirs(os.path.dirname(os.path.abspath(output)) or ".",
                    exist_ok=True)
        manifest_path = output + ".manifest.json"
        anchor_dir = os.path.dirname(os.path.abspath(output))
    if denoise_model is not None:
        denoised_dir = denoised_dir or os.path.join(anchor_dir, "denoised")
        os.makedirs(denoised_dir, exist_ok=True)

    watcher = DirectoryWatcher(
        input_dir, patterns=patterns, manifest_path=manifest_path,
        settle_polls=settle_polls, recursive=recursive)

    out_f = None
    if not per_micrograph:
        fresh = not os.path.exists(output) or os.path.getsize(output) == 0
        out_f = open(output, "a")
        if fresh:
            print("image_name\tx_coord\ty_coord\tscore", file=out_f,
                  flush=True)

    n_processed = 0

    def _process_ready(ready):
        nonlocal n_processed
        for result in pipe.process(ready, batch_size=batch_size):
            path, scores, coords = result[:3]
            name, in_ext = os.path.splitext(os.path.basename(path))
            if up_scale != 1:
                coords = np.round(
                    np.asarray(coords) * up_scale).astype(int)
            if per_micrograph:
                import pandas as pd

                from topaz_tpu.io import coordinates as file_utils

                table = pd.DataFrame(
                    {"image_name": name,
                     "x_coord": np.asarray(coords)[:, 0],
                     "y_coord": np.asarray(coords)[:, 1],
                     "score": np.asarray(scores)})
                out_path = os.path.join(
                    out_dir, name + suffix + "." + out_format)
                with open(out_path, "w") as pf:
                    file_utils.write_table(pf, table,
                                           format=out_format,
                                           image_ext=in_ext)
            else:
                for i in range(len(scores)):
                    print(f"{name}\t{coords[i, 0]}\t{coords[i, 1]}"
                          f"\t{scores[i]}", file=out_f)
            if len(result) > 3 and denoised_dir is not None:
                write_mrc(
                    os.path.join(denoised_dir, name + ".mrc"),
                    np.asarray(result[3], dtype=np.float32))
            watcher.mark_done(path)
            n_processed += 1
            report(f"watch: {name}: {len(scores)} picks")

    last_activity = time.monotonic()
    polls_done = 0
    # under systemd/k8s the stop path is SIGTERM; route it through the
    # same orderly shutdown as ^C (manifest saved, output flushed)
    from topaz_tpu.utils.signals import sigterm_as_interrupt

    _sigctx = sigterm_as_interrupt()
    _sigctx.__enter__()
    try:
        while True:
            if _poll_hook is not None and _poll_hook() is False:
                break
            ready = watcher.scan()
            polls_done += 1
            if ready:
                last_activity = time.monotonic()
                report(f"watch: {len(ready)} new micrograph(s)")
                try:
                    _process_ready(ready)
                except Exception as e:  # noqa: BLE001 — transient-filtered
                    from topaz_tpu.utils.retry import (
                        is_transient_device_error)

                    if not is_transient_device_error(e):
                        raise
                    # outlasted the pipeline's own in-process retry:
                    # requeue what this poll didn't finish and keep
                    # watching — the next scan re-offers those files
                    lost = [p for p in ready if p not in watcher.done]
                    watcher.requeue(lost)
                    report(f"watch: transient device failure "
                           f"({type(e).__name__}: {e}); {len(lost)} "
                           f"micrograph(s) requeued for the next poll")
                else:
                    # files the pipeline skipped (corrupt, --skip-errors)
                    # are recorded as done at their offered size so they
                    # are not retried every poll
                    for p in ready:
                        if p not in watcher.done:
                            watcher.mark_done(p)
                if out_f is not None:
                    out_f.flush()
                watcher.save_manifest()
            if once:
                # the stability check needs settle_polls+1 sightings of an
                # unchanged size, so the backlog becomes ready on poll
                # settle_polls+1; anything still pending after that is a
                # file mid-write, which --once correctly leaves behind
                if polls_done > settle_polls:
                    break
            if (idle_timeout is not None
                    and time.monotonic() - last_activity >= idle_timeout):
                report(f"watch: no new files for {idle_timeout:g}s — done")
                break
            time.sleep(poll_interval)
    except KeyboardInterrupt:
        report("watch: interrupted — manifest saved, safe to restart")
    finally:
        _sigctx.__exit__(None, None, None)
        if out_f is not None:
            out_f.close()
        watcher.save_manifest()
    report(f"watch: processed {n_processed} micrograph(s) total")
    return n_processed


def watch_from_args(args) -> int:
    """CLI adapter (cli/commands/watch.py)."""
    from topaz_tpu.parallel.devices import hybrid_mesh_for, resolve_devices

    mesh = None
    dev_flag = getattr(args, "device", 0)
    if dev_flag == -2:
        mesh = hybrid_mesh_for(resolve_devices(-2), args.batch_size,
                               warn=True)
        if mesh is not None:
            nd, ns = mesh.shape["data"], mesh.shape.get("space", 1)
            report(f"watch: pipeline sharded over {nd * ns} devices"
                   + (f" ({nd} batch x {ns} spatial)" if ns > 1 else ""))
    elif dev_flag >= 0:
        resolve_devices(dev_flag)

    # bf16 engages the pipeline's denoise-arm contract (scores/NMS stay
    # f32 so picks keep reference parity — pipeline.py dtype docs)
    dtype = "bf16" if getattr(args, "precision", "f32") == "bf16" else None

    return watch_directory(
        input_dir=args.dir,
        output=args.output,
        model=args.model,
        denoise_model=(args.denoise_model
                       if getattr(args, "denoise_model", None) else None),
        denoised_dir=getattr(args, "denoised_output", None),
        scale=args.scale,
        radius=args.radius,
        threshold=args.threshold,
        batch_size=args.batch_size,
        patterns=args.pattern,
        poll_interval=args.poll_interval,
        settle_polls=args.settle_polls,
        recursive=getattr(args, "recursive", False),
        once=args.once,
        idle_timeout=args.idle_timeout,
        mesh=mesh,
        precision=None,
        bins=getattr(args, "bins", 0),
        dtype=dtype,
        skip_errors=not getattr(args, "fail_fast", False),
        per_micrograph=getattr(args, "per_micrograph", False),
        out_format=getattr(args, "out_format", "coord") or "coord",
        suffix=getattr(args, "suffix", "") or "",
    )
