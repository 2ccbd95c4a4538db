"""Edge cases across the CLI surface: empty pick sets, images smaller
than a bucket, odd sizes through the downsample/denoise paths."""

import os
import sys

import numpy as np
import pandas as pd


def run_cli(argv):
    from topaz_tpu.cli import main

    old = sys.argv
    sys.argv = ["topaz"] + [str(a) for a in argv]
    try:
        main.main()
    finally:
        sys.argv = old


def _write_mrc(path, arr):
    from topaz_tpu.io import mrc

    mrc.write(str(path), np.asarray(arr, dtype=np.float32))


def test_extract_no_picks_above_threshold(tmp_path, rng):
    """A featureless micrograph with an impossible threshold produces a
    valid empty table through both the single and batched paths."""
    img = rng.normal(0, 0.01, (96, 96)).astype(np.float32)
    _write_mrc(tmp_path / "flat.mrc", img)

    for tag, extra in (("single", []), ("batched", ["--batch-size", "4"])):
        out = tmp_path / f"{tag}.txt"
        run_cli(["extract", "-m", "resnet8_u32", "-r", "6", "-t", "999",
                 "-o", str(out)] + extra + [str(tmp_path / "flat.mrc")])
        table = pd.read_csv(out, sep="\t")
        assert list(table.columns) == ["image_name", "x_coord", "y_coord",
                                       "score"]
        assert len(table) == 0


def test_pipeline_image_smaller_than_bucket(tmp_path, rng):
    """An image smaller than bucket_step pads up and still picks
    correctly (mask keeps GMM/NMS on the valid region)."""
    from topaz_tpu.pipeline import MicrographPipeline

    img = rng.normal(0, 1, (40, 56)).astype(np.float32)
    yy, xx = np.mgrid[0:40, 0:56]
    img -= 4.0 * np.exp(-((yy - 20) ** 2 + (xx - 28) ** 2) / 8.0)
    _write_mrc(tmp_path / "tiny.mrc", img)

    pipe = MicrographPipeline(model="resnet8_u32", scale=1, radius=4,
                              threshold=1.0, normalize=True, bucket_step=64)
    (path, scores, coords), = list(pipe.process([str(tmp_path / "tiny.mrc")]))
    assert len(scores) >= 1
    assert (coords[:, 0] < 56).all() and (coords[:, 1] < 40).all()
    # the planted particle is the top pick
    assert abs(int(coords[0, 0]) - 28) <= 2 and abs(int(coords[0, 1]) - 20) <= 2


def test_denoise_downsample_odd_size(tmp_path, rng):
    """--downsample on an odd-sized micrograph: output is the Fourier-crop
    size and finite."""
    from topaz_tpu.io import mrc

    img = rng.normal(0, 1, (101, 77)).astype(np.float32)
    _write_mrc(tmp_path / "odd.mrc", img)
    os.makedirs(tmp_path / "out", exist_ok=True)
    run_cli(["denoise", "-m", "fcnn", "--downsample", "3", "-s", "-1",
             "-o", str(tmp_path / "out"), str(tmp_path / "odd.mrc")])
    y, _, _ = mrc.read(str(tmp_path / "out" / "odd.mrc"))
    assert y.shape == (33, 25)
    assert np.isfinite(y).all()


def test_segment_small_image_falls_back(tmp_path, rng):
    """segment -d -2 on an image too small for two halo shards silently
    uses one device."""
    from PIL import Image

    img = rng.normal(0, 1, (48, 48)).astype(np.float32)
    _write_mrc(tmp_path / "sm.mrc", img)
    run_cli(["segment", "-m", "resnet8_u32", "-d", "-2",
             "-o", str(tmp_path / "seg"), str(tmp_path / "sm.mrc")])
    a = np.asarray(Image.open(tmp_path / "seg" / "sm.tiff"))
    assert a.shape == (48, 48)
    assert np.isfinite(a).all()


def test_convert_empty_after_threshold(tmp_path):
    """convert -t on a table where nothing survives writes a valid empty
    file."""
    src = tmp_path / "p.txt"
    pd.DataFrame({"image_name": ["a"], "x_coord": [5], "y_coord": [6],
                  "score": [-3.0]}).to_csv(src, sep="\t", index=False)
    dst = tmp_path / "o.txt"
    run_cli(["convert", "-t", "100", "-o", str(dst), str(src)])
    table = pd.read_csv(dst, sep="\t")
    assert len(table) == 0


def test_auto_patch_size_padding_exceeds_envelope():
    """auto_patch_size with padding too large for the HBM-safe extent fails
    fast with guidance instead of crashing with None[1] or falling back to
    a patch that would OOM."""
    import pytest

    from topaz_tpu.denoise import auto_patch_size

    for padding in (128, 500):  # 500 = the 2D default, a plausible mistake
        with pytest.raises(ValueError, match="lower -p or pass an explicit"):
            auto_patch_size((192, 384, 384), padding=padding)

    # the largest supported padding still resolves
    s = auto_patch_size((192, 384, 384), padding=112)
    assert isinstance(s, int) and s >= 1 and (s + 224) % 32 == 0


def test_window_batches_pads_partial():
    from topaz_tpu.utils.batching import window_batches

    items = list(range(5))
    batches = list(window_batches(items, lambda x: x * 10, 2, 4))
    assert [c for c, _, _ in batches] == [[0, 1], [2, 3], [4]]
    assert [n for _, n, _ in batches] == [2, 2, 1]
    assert batches[-1][2] == [40, 40]  # padded by repetition


def test_fetch_async_values_and_passthrough():
    import jax.numpy as jnp
    import numpy as np

    from topaz_tpu.utils.batching import fetch_async

    dev = [jnp.full((3, 2), i, jnp.int32) for i in range(4)]
    host = np.ones(2, np.float32)
    out = fetch_async(dev[0], None, host, *dev[1:])
    assert out[1] is None
    np.testing.assert_array_equal(out[2], host)
    for i, o in zip([0, 1, 2, 3], [out[0], out[3], out[4], out[5]]):
        assert isinstance(o, np.ndarray)
        np.testing.assert_array_equal(o, np.full((3, 2), i, np.int32))


def test_valid_mask_2d_3d():
    import numpy as np

    from topaz_tpu.utils.batching import valid_mask

    m = np.asarray(valid_mask((4, 6), np.array([[2, 3], [4, 6]])))
    assert m.shape == (2, 4, 6)
    assert m[0].sum() == 6 and m[1].all()
    m3 = np.asarray(valid_mask((2, 3, 4), np.array([[1, 2, 3]])))
    assert m3.sum() == 6


def test_denoise3d_missing_pretrained_clear_error(tmp_path, rng, capsys):
    """denoise3d with unavailable pretrained 3D weights exits with a clear
    pointer to the training path instead of a raw traceback."""
    import pytest

    from topaz_tpu.cli.commands.denoise3d import add_arguments
    from topaz_tpu.denoise import denoise3d_main
    from topaz_tpu.io import mrc

    vol = rng.normal(size=(16, 24, 24)).astype(np.float32)
    mrc.write(str(tmp_path / "t.mrc"), vol)
    args = add_arguments().parse_args(
        ["-m", "unet-3d", "-o", str(tmp_path), str(tmp_path / "t.mrc")])
    with pytest.raises(SystemExit):
        denoise3d_main(args)
    err = capsys.readouterr().err
    assert "even-train" in err and "Error:" in err
