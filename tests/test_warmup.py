"""``topaz warmup`` (VERDICT r3 item 7): pre-seeding the persistent
compile cache so a COLD process serves its first micrograph without
recompiling. The subprocess test runs warmup once, then the real
acquisition command (``topaz watch --once``) in a fresh process against
the same cache and asserts zero new cache entries — every device program
the acquisition run needs was already compiled."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, cache_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO  # no axon sitecustomize (tests are CPU)
    # explicit cache dir (jax reads it natively; cli/main defers to it)
    # + zero min-compile-time so EVERY program lands in the cache and
    # "no new entries" below is airtight
    env["JAX_COMPILATION_CACHE_DIR"] = str(cache_dir)
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    return subprocess.run(
        [sys.executable, "-m", "topaz_tpu"] + args,
        capture_output=True, text=True, cwd=cwd, env=env, timeout=1200)


def _cache_entries(cache_dir):
    return sorted(
        f for f in os.listdir(cache_dir) if not f.startswith("."))


def test_parse_shapes():
    from topaz_tpu.warmup import parse_shapes

    assert parse_shapes("4096x4096") == ((4096, 4096),)
    assert parse_shapes("128x96, 64x64") == ((128, 96), (64, 64))
    with pytest.raises(ValueError):
        parse_shapes("4096")
    with pytest.raises(ValueError):
        parse_shapes("")


def test_warmup_cli_registration():
    from topaz_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["warmup", "-m", "resnet8_u32", "--shapes", "4096x4096,5760x4092",
         "--batch-sizes", "1,8", "--denoise-model", "unet", "--fast"])
    assert args.shapes == "4096x4096,5760x4092" and args.fast
    assert callable(args.func)


def test_warmup_seeds_cache_for_cold_acquisition_process(tmp_path, rng):
    from topaz_tpu.io import mrc

    cache = tmp_path / "cache"
    cache.mkdir()
    watch_dir = tmp_path / "frames"
    watch_dir.mkdir()

    # 1) cold warmup: compiles the pipeline + denoise programs
    r = _run(["warmup", "-m", "resnet8_u32", "--denoise-model", "affine",
              "--shapes", "64x64", "--batch-sizes", "1", "-s", "4",
              "-r", "4"], str(tmp_path), cache)
    assert r.returncode == 0, r.stderr
    assert "warmup:" in r.stderr
    seeded = _cache_entries(cache)
    assert len(seeded) > 0, "warmup wrote nothing to the compile cache"

    # 2) a COLD process runs the real acquisition command against the
    # warm cache: every program it needs must be a cache hit (no new
    # cache entries), and it must produce picks
    x = rng.normal(0, 1, (64, 64)).astype(np.float32)
    yy, xx = np.mgrid[0:64, 0:64]
    x -= 4.0 * np.exp(-((yy - 30) ** 2 + (xx - 40) ** 2) / (2 * 2.0**2))
    mrc.write(str(watch_dir / "frame0.mrc"), x.astype(np.float32))
    out = tmp_path / "picks.txt"
    r = _run(["watch", str(watch_dir), "-o", str(out), "-m", "resnet8_u32",
              "--denoise-model", "affine",
              "--denoised-output", str(tmp_path / "den"),
              "-s", "4", "-r", "4", "-t", "-6", "--batch-size", "1",
              "--once"], str(tmp_path), cache)
    assert r.returncode == 0, r.stderr
    assert out.exists() and len(out.read_text().splitlines()) >= 2
    after = _cache_entries(cache)
    new = sorted(set(after) - set(seeded))
    assert not new, (
        f"acquisition run on a warm cache still compiled {len(new)} new "
        f"programs: {new}")
