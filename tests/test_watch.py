"""Streaming watch mode: directory stability tracking, backlog
processing, restart safety, live-arrival processing (extension; the
reference has only batch commands)."""

import json
import os
import types

import numpy as np


def _write_micrograph(path, rng, shape=(128, 128), peaks=((40, 40), (90, 80))):
    from topaz_tpu.io import mrc

    x = rng.normal(0, 1, shape).astype(np.float32)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    for cy, cx in peaks:
        x -= 3.0 * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2)
        ).astype(np.float32)
    mrc.write(str(path), x)


def test_directory_watcher_stability_and_manifest(tmp_path):
    from topaz_tpu.watch import DirectoryWatcher

    d = tmp_path / "in"
    d.mkdir()
    manifest = str(tmp_path / "m.json")
    (d / "a.mrc").write_bytes(b"x" * 100)
    (d / "ignored.txt").write_bytes(b"y")

    w = DirectoryWatcher(str(d), manifest_path=manifest)
    assert w.scan() == []  # first sighting: stability unknown
    assert w.scan() == [str(d / "a.mrc")]  # size unchanged -> stable

    # a file that grows between polls is never offered until it settles
    (d / "b.mrc").write_bytes(b"x" * 10)
    assert w.scan() == []
    (d / "b.mrc").write_bytes(b"x" * 20)  # grew
    assert w.scan() == []
    assert w.scan() == [str(d / "b.mrc")]  # settled at 20 bytes

    w.mark_done(str(d / "a.mrc"))
    w.mark_done(str(d / "b.mrc"))
    w.save_manifest()
    assert w.scan() == []  # both done; nothing new

    # a fresh watcher (restart) reads the manifest and re-offers nothing
    w2 = DirectoryWatcher(str(d), manifest_path=manifest)
    assert w2.scan() == []
    assert w2.scan() == []
    data = json.load(open(manifest))
    assert set(os.path.basename(k) for k in data["processed"]) == {
        "a.mrc", "b.mrc"}


def test_watch_once_backlog_then_restart_with_new_files(tmp_path, rng):
    """--once processes the existing backlog; a restarted watcher
    processes ONLY files that arrived since, appending to the same
    output. Picks match the batch extract pipeline exactly."""
    from topaz_tpu.pipeline import MicrographPipeline
    from topaz_tpu.watch import watch_directory

    d = tmp_path / "in"
    d.mkdir()
    for i in range(3):
        _write_micrograph(d / f"mic{i}.mrc", rng)
    out = str(tmp_path / "picks.txt")

    kw = dict(model="resnet8_u32", scale=1, radius=6, threshold=1.0,
              batch_size=2, poll_interval=0.01, once=True)
    n = watch_directory(str(d), out, **kw)
    assert n == 3
    lines1 = open(out).read().strip().splitlines()
    assert lines1[0] == "image_name\tx_coord\ty_coord\tscore"
    names1 = {ln.split("\t")[0] for ln in lines1[1:]}
    assert names1 == {"mic0", "mic1", "mic2"}

    # restart with one new file: only it is processed, output appended
    _write_micrograph(d / "mic3.mrc", rng, peaks=((60, 60),))
    n = watch_directory(str(d), out, **kw)
    assert n == 1
    lines2 = open(out).read().strip().splitlines()
    assert lines2[: len(lines1)] == lines1
    assert {ln.split("\t")[0] for ln in lines2[len(lines1):]} == {"mic3"}

    # watch picks (scale=1) == the batch pipeline's picks
    pipe = MicrographPipeline(model="resnet8_u32", scale=1, radius=6,
                              threshold=1.0)
    for path, s, c in pipe.process([str(d / "mic0.mrc")]):
        want = {(int(x), int(y), f"{v}") for (x, y), v in zip(c, s)}
    got = {(int(x), int(y), v)
           for nm, x, y, v in (ln.split("\t") for ln in lines2[1:])
           if nm == "mic0"}
    assert got == want


def test_watch_live_arrival_denoise_and_upscale(tmp_path, rng):
    """Files appearing while watching are processed on later polls;
    denoised previews are written; coordinates are mapped back to raw
    pixels when the pipeline downsamples (up_scale defaults to scale)."""
    from topaz_tpu.io.image import load_image
    from topaz_tpu.watch import watch_directory

    d = tmp_path / "in"
    d.mkdir()
    _write_micrograph(d / "first.mrc", rng)
    out = str(tmp_path / "picks.txt")
    den_dir = str(tmp_path / "den")

    polls = {"n": 0}

    def hook():
        polls["n"] += 1
        if polls["n"] == 4:
            _write_micrograph(d / "late.mrc", rng, peaks=((64, 64),))
        return polls["n"] <= 8

    n = watch_directory(
        str(d), out, model="resnet8_u32", denoise_model="fcnn",
        denoised_dir=den_dir, scale=2, radius=3, threshold=1.0,
        batch_size=1, poll_interval=0.01, _poll_hook=hook)
    assert n == 2
    rows = [ln.split("\t") for ln in
            open(out).read().strip().splitlines()[1:]]
    assert {r[0] for r in rows} == {"first", "late"}
    # raw-pixel coordinates: scale=2 halves the image; picks must span
    # the full 128-wide raw frame, not the 64-wide working frame
    xy = np.array([[int(r[1]), int(r[2])] for r in rows])
    assert xy.max() > 64
    assert xy.max() < 128
    for nm in ("first", "late"):
        den = np.asarray(load_image(os.path.join(den_dir, nm + ".mrc")))
        assert den.shape == (64, 64)
        assert np.isfinite(den).all()

    # the manifest records both, so another pass is a no-op
    n = watch_directory(str(d), out, model="resnet8_u32", scale=2,
                        radius=3, threshold=1.0, poll_interval=0.01,
                        once=True)
    assert n == 0


def test_watch_cli_parses_and_runs(tmp_path, rng, monkeypatch, capsys):
    """The registered `topaz watch` command parses its flags and drives
    watch_from_args end-to-end (--once backlog mode)."""
    from topaz_tpu.cli.main import _command_modules

    mods = [m for _, ms in _command_modules() for m in ms]
    watch_cmd = [m for m in mods if m.name == "watch"]
    assert watch_cmd, "watch not registered in the CLI"
    watch_cmd = watch_cmd[0]

    d = tmp_path / "in"
    d.mkdir()
    _write_micrograph(d / "m0.mrc", rng)
    out = str(tmp_path / "picks.txt")

    p = watch_cmd.add_arguments()
    args = p.parse_args([str(d), "-o", out, "-m", "resnet8_u32",
                         "-s", "1", "-r", "6", "-t", "1.0",
                         "--poll-interval", "0.01", "--once"])
    watch_cmd.main(args)
    lines = open(out).read().strip().splitlines()
    assert lines[0] == "image_name\tx_coord\ty_coord\tscore"
    assert len(lines) > 1 and lines[1].startswith("m0\t")


def test_watcher_recursive_nested_dirs(tmp_path):
    """--recursive sees files in subdirectories created after watching
    starts (EPU/SerialEM layout: per-grid-square folders)."""
    from topaz_tpu.watch import DirectoryWatcher

    d = tmp_path / "in"
    (d / "GridSquare_1" / "Data").mkdir(parents=True)
    (d / "GridSquare_1" / "Data" / "a.mrc").write_bytes(b"x" * 50)

    flat = DirectoryWatcher(str(d))
    assert flat.scan() == [] and flat.scan() == []  # flat: never seen

    w = DirectoryWatcher(str(d), recursive=True)
    assert w.scan() == []
    assert w.scan() == [str(d / "GridSquare_1" / "Data" / "a.mrc")]

    # a directory appearing mid-run is picked up on later polls
    (d / "GridSquare_2").mkdir()
    (d / "GridSquare_2" / "b.mrc").write_bytes(b"y" * 10)
    assert w.scan() == []
    assert w.scan() == [str(d / "GridSquare_2" / "b.mrc")]


def test_watch_per_micrograph_star_files(tmp_path, rng):
    """--per-micrograph writes one coordinate file per micrograph into the
    output directory (live RELION import layout), restart-safe via the
    in-directory manifest; star rows round-trip through the star parser."""
    from topaz_tpu.io import coordinates as file_utils
    from topaz_tpu.watch import watch_directory

    d = tmp_path / "in"
    d.mkdir()
    for i in range(2):
        _write_micrograph(d / f"mic{i}.mrc", rng)
    out_dir = str(tmp_path / "picks")

    kw = dict(model="resnet8_u32", scale=1, radius=6, threshold=1.0,
              batch_size=1, poll_interval=0.01, once=True,
              per_micrograph=True, out_format="star", suffix="_topaz")
    n = watch_directory(str(d), out_dir, **kw)
    assert n == 2
    files = sorted(os.listdir(out_dir))
    assert "watch.manifest.json" in files
    star_files = [f for f in files if f.endswith(".star")]
    assert star_files == ["mic0_topaz.star", "mic1_topaz.star"]
    table = file_utils.read_coordinates(
        os.path.join(out_dir, "mic0_topaz.star"), format="star")
    assert len(table) > 0
    assert {"image_name", "x_coord", "y_coord", "score"} <= set(table.columns)

    # restart: nothing reprocessed; a new arrival gets its own file
    _write_micrograph(d / "mic2.mrc", rng, peaks=((60, 60),))
    n = watch_directory(str(d), out_dir, **kw)
    assert n == 1
    assert os.path.exists(os.path.join(out_dir, "mic2_topaz.star"))


def test_watch_per_micrograph_cli_flags(tmp_path):
    from topaz_tpu.cli.commands import watch as watch_cmd

    p = watch_cmd.add_arguments()
    args = p.parse_args(["in", "-o", "picks/", "--per-micrograph",
                         "--format", "star", "--suffix", "_topaz"])
    assert args.per_micrograph and args.out_format == "star"
    assert args.suffix == "_topaz"


def test_watch_fast_flag_resolves(tmp_path):
    from topaz_tpu.cli.commands import watch as watch_cmd

    p = watch_cmd.add_arguments()
    args = p.parse_args(["in", "-o", "out.txt", "--fast"])
    from topaz_tpu.cli.fast import apply_fast

    apply_fast(args)
    assert args.precision == "bf16"
    assert args.bins == 65536


def test_sigterm_shuts_down_watch_cleanly(tmp_path, rng):
    """SIGTERM (the systemd/k8s stop signal) takes the same orderly
    shutdown path as ^C: watch returns normally with the manifest saved,
    and the previous SIGTERM disposition is restored afterwards."""
    import signal

    from topaz_tpu.watch import watch_directory

    d = tmp_path / "in"
    d.mkdir()
    _write_micrograph(d / "mic0.mrc", rng)
    out = str(tmp_path / "picks.txt")

    polls = {"n": 0}

    def hook():
        polls["n"] += 1
        if polls["n"] > 4:  # backlog processed on poll 2; then stop
            os.kill(os.getpid(), signal.SIGTERM)
        return True

    before = signal.getsignal(signal.SIGTERM)
    n = watch_directory(str(d), out, model="resnet8_u32", scale=1,
                        radius=6, threshold=1.0, poll_interval=0.01,
                        _poll_hook=hook)
    assert n == 1  # processed, then interrupted without dying
    assert signal.getsignal(signal.SIGTERM) is before
    manifest = json.load(open(out + ".manifest.json"))
    assert str(d / "mic0.mrc") in manifest["processed"]


def test_sigterm_as_interrupt_unit():
    """The context manager converts SIGTERM to KeyboardInterrupt in the
    main thread and is a no-op elsewhere."""
    import signal
    import threading

    from topaz_tpu.utils.signals import sigterm_as_interrupt

    import pytest

    with pytest.raises(KeyboardInterrupt):
        with sigterm_as_interrupt():
            os.kill(os.getpid(), signal.SIGTERM)
            signal.sigtimedwait  # noqa: B018 — any bytecode delivers it

    # non-main thread: degrades to a no-op instead of ValueError
    errs = []

    def body():
        try:
            with sigterm_as_interrupt():
                pass
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t = threading.Thread(target=body)
    t.start()
    t.join()
    assert errs == []
