"""CLI contract tests: every command parses the reference's documented argv
(mirrors test/test_commands_simple.py in the reference), plus end-to-end
smoke runs of the file-level commands."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_main_no_args():
    from topaz_tpu.cli import main

    old_argv = sys.argv
    sys.argv = ["topaz"]
    try:
        main.main()
    except SystemExit:
        pass
    finally:
        sys.argv = old_argv


def test_train_args():
    from topaz_tpu.cli.commands import train

    parser = train.add_arguments()
    args = parser.parse_args([
        "-n", "400", "--num-workers=8",
        "--train-images", "data/EMPIAR-10025/processed/micrographs/",
        "--train-targets", "data/EMPIAR-10025/processed/particles.txt",
        "--save-prefix=saved_models/EMPIAR-10025/model",
        "-o", "saved_models/EMPIAR-10025/model_training.txt",
    ])
    assert args.num_particles == 400
    assert args.method == "GE-binomial"
    assert args.learning_rate == 2e-4
    assert args.minibatch_size == 256
    assert args.minibatch_balance == 0.0625
    assert args.radius == 3
    assert args.num_epochs == 10


def test_extract_args():
    from topaz_tpu.cli.commands import extract

    args = extract.add_arguments().parse_args([
        "-r", "14", "-x", "8",
        "-m", "saved_models/EMPIAR-10025/model_epoch10.sav",
        "-o", "out.txt", "micrographs/*.mrc",
    ])
    assert args.radius == 14 and args.up_scale == 8
    assert args.threshold == -6


def test_all_commands_parse():
    from topaz_tpu.cli.commands import (denoise, denoise3d, downsample,
                                        normalize, particle_stack,
                                        precision_recall_curve, preprocess,
                                        segment, split, train_test_split)

    denoise.add_arguments().parse_args(
        ["--patch-size", "1024", "-o", "out/", "a.mrc"])
    denoise3d.add_arguments().parse_args([])
    downsample.add_arguments().parse_args(["-s", "8", "x.mrc"])
    normalize.add_arguments().parse_args(["x.mrc"])
    preprocess.add_arguments().parse_args(["-v", "-s", "8", "-o", "out/", "x.mrc"])
    segment.add_arguments()
    split.add_arguments()
    particle_stack.add_arguments().parse_args([
        "--image-root=d/", "--size=400", "--threshold=0",
        "--metadata=m.star", "-o", "stack.mrcs", "parts.txt"])
    train_test_split.add_arguments().parse_args(
        ["-n", "10", "--image-dir", "d/", "p.txt"])
    precision_recall_curve.add_arguments().parse_args(
        ["-r", "14", "--predicted", "p.txt", "--targets", "t.txt"])


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # PYTHONPATH = repo ONLY: an inherited axon sitecustomize overrides
    # JAX_PLATFORMS and would silently run these subprocesses over the
    # tunneled TPU (slow remote compiles, occasional wedges); the test
    # suite's contract is CPU (tests/conftest.py)
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "topaz_tpu"] + args,
        capture_output=True, text=True, cwd=cwd, env=env, timeout=1200,
    )


def test_cli_downsample_normalize_roundtrip(tmp_path, rng):
    from topaz_tpu.io import mrc

    x = rng.normal(2.0, 3.0, size=(128, 128)).astype(np.float32)
    src = tmp_path / "micro.mrc"
    mrc.write(str(src), x)

    r = _run_cli(["downsample", "-s", "2", "-o", str(tmp_path / "small.mrc"),
                  str(src)], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    y, _, _ = mrc.read(str(tmp_path / "small.mrc"))
    assert y.shape == (64, 64)

    outdir = tmp_path / "normed"
    r = _run_cli(["normalize", "--affine", "-o", str(outdir), str(src)],
                 cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    z, _, _ = mrc.read(str(outdir / "micro.mrc"))
    assert abs(z.mean()) < 1e-4 and abs(z.std() - 1) < 1e-4


def test_cli_convert_and_split(tmp_path):
    table = pd.DataFrame({
        "image_name": ["a", "a", "b"],
        "x_coord": [10, 20, 30],
        "y_coord": [15, 25, 35],
        "score": [1.0, -2.0, 3.0],
    })
    src = tmp_path / "parts.txt"
    table.to_csv(src, sep="\t", index=False)

    # coord -> star -> coord roundtrip
    r = _run_cli(["convert", "-o", str(tmp_path / "parts.star"), str(src)],
                 cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    r = _run_cli(["convert", "-o", str(tmp_path / "back.txt"),
                  str(tmp_path / "parts.star")], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    back = pd.read_csv(tmp_path / "back.txt", sep="\t")
    assert list(back.image_name) == ["a", "a", "b"]
    assert list(back.x_coord) == [10, 20, 30]
    assert list(back.y_coord) == [15, 25, 35]
    np.testing.assert_allclose(back.score.values, [1.0, -2.0, 3.0])

    # threshold filter
    r = _run_cli(["convert", "-t", "0", "-o", str(tmp_path / "thresh.txt"),
                  str(src)], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    th = pd.read_csv(tmp_path / "thresh.txt", sep="\t")
    assert len(th) == 2

    # split per micrograph
    outdir = tmp_path / "per_mic"
    outdir.mkdir()
    r = _run_cli(["split", "-o", str(outdir), str(src)], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert sorted(os.listdir(outdir)) == ["a.txt", "b.txt"]


def test_cli_extract_on_score_map(tmp_path, rng):
    """extract -m none on a synthetic pre-segmented score map."""
    from topaz_tpu.io import mrc

    score = rng.normal(-4, 1, size=(64, 64)).astype(np.float32)
    score[10, 12] = 5.0
    score[40, 50] = 4.0
    mrc.write(str(tmp_path / "seg.mrc"), score)

    r = _run_cli(["extract", "-m", "none", "-r", "5", "-t", "2",
                  "-o", str(tmp_path / "picks.txt"), str(tmp_path / "seg.mrc")],
                 cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    picks = pd.read_csv(tmp_path / "picks.txt", sep="\t")
    assert len(picks) == 2
    assert set(zip(picks.x_coord, picks.y_coord)) == {(12, 10), (50, 40)}
    assert picks.score.iloc[0] > picks.score.iloc[1]


def _cli(argv):
    from topaz_tpu.cli import main

    old = sys.argv
    sys.argv = ["topaz"] + [str(a) for a in argv]
    try:
        main.main()
    finally:
        sys.argv = old


def test_precision_recall_curve_cli_runs(tmp_path, capsys):
    preds = pd.DataFrame({
        "image_name": ["m0"] * 4,
        "x_coord": [10, 30, 50, 70], "y_coord": [10, 30, 50, 70],
        "score": [4.0, 3.0, 2.0, 1.0]})
    targets = pd.DataFrame({
        "image_name": ["m0"] * 3,
        "x_coord": [11, 29, 90], "y_coord": [9, 31, 90]})
    preds.to_csv(tmp_path / "pred.txt", sep="\t", index=False)
    targets.to_csv(tmp_path / "targ.txt", sep="\t", index=False)
    _cli(["precision_recall_curve", "-r", "5",
          "--predicted", str(tmp_path / "pred.txt"),
          "--targets", str(tmp_path / "targ.txt")])
    out = capsys.readouterr().out
    # TSV curve rows plus the final auprc line (reference stdout contract)
    assert "precision" in out and "auprc" in out


def test_preprocess_cli_runs(tmp_path, rng):
    from topaz_tpu.io import mrc

    x = rng.normal(5, 3, (64, 64)).astype(np.float32)
    mrc.write(str(tmp_path / "raw.mrc"), x)
    _cli(["preprocess", "-s", "2", "--metadata",
          "-o", str(tmp_path / "proc"), str(tmp_path / "raw.mrc")])
    y, _, _ = mrc.read(str(tmp_path / "proc" / "raw.mrc"))
    assert y.shape == (32, 32)
    assert os.path.exists(tmp_path / "proc" / "raw.metadata.json")


def test_particle_stack_cli_runs(tmp_path, rng):
    from topaz_tpu.io import mrc

    x = rng.normal(0, 1, (64, 64)).astype(np.float32)
    mrc.write(str(tmp_path / "m0.mrc"), x)
    pd.DataFrame({"image_name": ["m0", "m0"], "x_coord": [20, 40],
                  "y_coord": [20, 40], "score": [2.0, 3.0]}).to_csv(
        tmp_path / "parts.txt", sep="\t", index=False)
    _cli(["particle_stack", str(tmp_path / "parts.txt"),
          "-o", str(tmp_path / "stack.mrcs"), "--size", "16",
          "--image-root", str(tmp_path)])
    stack, _, _ = mrc.read(str(tmp_path / "stack.mrcs"))
    assert stack.shape == (2, 16, 16)
    assert os.path.exists(tmp_path / "stack.star")


def test_train_test_split_cli_runs(tmp_path, rng):
    from topaz_tpu.io import mrc

    img_dir = tmp_path / "mics"
    img_dir.mkdir()
    rows = []
    for i in range(6):
        mrc.write(str(img_dir / f"m{i}.mrc"),
                  rng.normal(0, 1, (32, 32)).astype(np.float32))
        rows.append({"image_name": f"m{i}", "x_coord": 10, "y_coord": 10})
    parts = tmp_path / "parts.txt"
    pd.DataFrame(rows).to_csv(parts, sep="\t", index=False)
    _cli(["train_test_split", "-n", "2", "--image-dir", str(img_dir),
          str(parts)])
    for suffix in ("_train.txt", "_test.txt"):
        assert os.path.exists(str(parts).replace(".txt", suffix)), suffix
    # image lists are written next to the particle file (reference naming)
    for name in ("image_list_train.txt", "image_list_test.txt"):
        assert os.path.exists(tmp_path / name), name


def test_cli_denoise_bf16_precision(tmp_path, rng):
    """topaz denoise --precision bf16 (argv wiring for the fast mode)."""
    from topaz_tpu.io import mrc

    src = tmp_path / "m.mrc"
    mrc.write(str(src), rng.normal(0, 1, (96, 96)).astype(np.float32))
    r = _run_cli(["denoise", "-m", "fcnn", "--precision", "bf16",
                  "-o", str(tmp_path / "out"), str(src)], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    y, _, _ = mrc.read(str(tmp_path / "out" / "m.mrc"))
    assert y.shape == (96, 96) and np.isfinite(y).all()


def test_cli_compile_cache_default_on(tmp_path, rng):
    """The persistent compile cache is ON by default for CLI processes
    (VERDICT r2 item 4): the first cold process populates
    $XDG_CACHE_HOME/topaz_tpu/jax_cache, a second cold process on the
    same shapes adds no new entries (pure cache hits), and
    TOPAZ_NO_COMPILE_CACHE=1 opts out."""
    from topaz_tpu.io import mrc

    x = rng.normal(2.0, 3.0, size=(96, 96)).astype(np.float32)
    src = tmp_path / "m.mrc"
    mrc.write(str(src), x)

    cache_home = tmp_path / "xdg"
    cache_dir = cache_home / "topaz_tpu" / "jax_cache"

    def run(outdir, extra_env):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # PYTHONPATH = repo ONLY: an inherited axon sitecustomize would
        # force the remote TPU backend, whose compiles bypass the local
        # persistent cache this test asserts on
        env["PYTHONPATH"] = REPO
        env["XDG_CACHE_HOME"] = str(cache_home)
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        env.update(extra_env)
        r = subprocess.run(
            [sys.executable, "-m", "topaz_tpu", "normalize", "-o",
             str(tmp_path / outdir), str(src)],
            capture_output=True, text=True, cwd=str(tmp_path), env=env,
            timeout=1200)
        assert r.returncode == 0, r.stderr

    run("out0", {"TOPAZ_NO_COMPILE_CACHE": "1"})
    assert not cache_dir.exists()  # opt-out leaves no cache behind

    run("out1", {})
    entries = set(os.listdir(cache_dir))
    assert entries, "first CLI run populated no compile-cache entries"

    run("out2", {})
    assert set(os.listdir(cache_dir)) == entries, \
        "second cold process recompiled (cache miss) on identical shapes"


def test_cli_fast_profile(tmp_path, rng):
    """--fast (the documented fast profile) on denoise and normalize:
    resolves to bf16 / histogram-EM, runs, and stays close to the exact
    default output."""
    from topaz_tpu.io import mrc

    src = tmp_path / "m.mrc"
    x = rng.normal(0, 1, (96, 96)).astype(np.float32)
    x[40:48, 40:48] -= 3.0
    mrc.write(str(src), x)

    r = _run_cli(["denoise", "-m", "fcnn", "--fast",
                  "-o", str(tmp_path / "dfast"), str(src)],
                 cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    r = _run_cli(["denoise", "-m", "fcnn",
                  "-o", str(tmp_path / "dexact"), str(src)],
                 cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    fast, _, _ = mrc.read(str(tmp_path / "dfast" / "m.mrc"))
    exact, _, _ = mrc.read(str(tmp_path / "dexact" / "m.mrc"))
    rel = np.linalg.norm(fast - exact) / np.linalg.norm(exact)
    assert np.isfinite(fast).all() and rel < 0.02, rel

    r = _run_cli(["normalize", "--fast", "-o", str(tmp_path / "nfast"),
                  str(src)], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    # --sample 1 = exact full-pixel fit (the CLI default --sample 10
    # subsamples randomly, which adds sampling noise the histogram-EM
    # fast path does not have)
    r = _run_cli(["normalize", "--sample", "1",
                  "-o", str(tmp_path / "nexact"), str(src)],
                 cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    nf, _, _ = mrc.read(str(tmp_path / "nfast" / "m.mrc"))
    ne, _, _ = mrc.read(str(tmp_path / "nexact" / "m.mrc"))
    rel = np.linalg.norm(nf - ne) / np.linalg.norm(ne)
    assert rel < 0.02, rel

    # the resolver leaves explicit user choices alone
    import types as _types

    from topaz_tpu.cli.fast import apply_fast

    a = _types.SimpleNamespace(fast=True, precision="f32", bins=0)
    apply_fast(a)
    assert a.precision == "bf16" and a.bins == 65536
    b = _types.SimpleNamespace(fast=True, precision="bf16", bins=1024)
    apply_fast(b)
    assert b.bins == 1024
    c = _types.SimpleNamespace(fast=False, precision="f32", bins=0)
    apply_fast(c)
    assert c.precision == "f32" and c.bins == 0
    # denoise3d: --fast turns on the cost-optimal patch grid, but only
    # when the user left -s at the reference default of 96
    d = _types.SimpleNamespace(fast=True, precision="f32", bins=0,
                               auto_patch=False, patch_size=96)
    apply_fast(d)
    assert d.auto_patch
    e = _types.SimpleNamespace(fast=True, precision="f32", bins=0,
                               auto_patch=False, patch_size=128)
    apply_fast(e)
    assert not e.auto_patch  # explicit -s 128 wins over --fast
