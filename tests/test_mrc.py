import numpy as np
import pytest

from topaz_tpu.io import mrc

from reference_oracle import ref_module, reference_available


def test_roundtrip_2d(tmp_path, rng):
    x = rng.normal(size=(61, 73)).astype(np.float32)
    path = str(tmp_path / "img.mrc")
    mrc.write(path, x)
    y, header, ext = mrc.read(path)
    assert y.shape == x.shape
    np.testing.assert_array_equal(y, x)
    assert int(header.mode) == 2
    assert int(header.nx) == 73 and int(header.ny) == 61 and int(header.nz) == 1
    assert np.isclose(float(header.amean), x.mean())
    assert np.isclose(float(header.rms), x.std())


def test_roundtrip_3d(tmp_path, rng):
    x = rng.normal(size=(5, 16, 24)).astype(np.float32)
    path = str(tmp_path / "vol.mrc")
    mrc.write(path, x)
    y, header, _ = mrc.read(path)
    assert y.shape == x.shape
    np.testing.assert_array_equal(y, x)


def test_int16_mode(tmp_path, rng):
    x = rng.integers(-100, 100, size=(10, 12)).astype(np.int16)
    header = mrc.default_header((1, 10, 12), dtype=np.int16)
    path = str(tmp_path / "i16.mrc")
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(x.tobytes())
    y, h, _ = mrc.read(path)
    assert y.dtype == np.int16
    np.testing.assert_array_equal(y, x)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_with_reference_writer(tmp_path, rng):
    """Our parser reads the reference's bytes and vice versa."""
    ref_mrc = ref_module("topaz.mrc")
    x = rng.normal(size=(33, 47)).astype(np.float32)

    # reference writes, we parse
    p1 = tmp_path / "ref.mrc"
    with open(p1, "wb") as f:
        ref_mrc.write(f, x[np.newaxis])
    ours, oh, _ = mrc.read(str(p1))
    np.testing.assert_array_equal(ours, x)

    # we write, reference parses
    p2 = str(tmp_path / "ours.mrc")
    mrc.write(p2, x)
    with open(p2, "rb") as f:
        theirs, th, _ = ref_mrc.parse(f.read())
    np.testing.assert_array_equal(theirs, x)
    assert th.nx == 47 and th.ny == 33 and th.nz == 1
    assert th.mode == 2

    # byte-identical headers for identical inputs
    with open(p1, "rb") as f:
        b1 = f.read()
    with open(p2, "rb") as f:
        b2 = f.read()
    assert b1 == b2


def test_memmap_crop(tmp_path, rng):
    x = rng.normal(size=(40, 50)).astype(np.float32)
    path = str(tmp_path / "img.mrc")
    mrc.write(path, x)
    mm = mrc.MrcMemmap(path)
    assert mm.shape == (40, 50)
    np.testing.assert_array_equal(mm.crop(5, 7, 10, 12), x[5:15, 7:19])
    # out-of-bounds regions zero-padded
    c = mm.crop(-3, -4, 10, 10)
    assert c.shape == (10, 10)
    assert np.all(c[:3, :] == 0) and np.all(c[:, :4] == 0)
    np.testing.assert_array_equal(c[3:, 4:], x[:7, :6])
    c2 = mm.crop(35, 45, 10, 10)
    np.testing.assert_array_equal(c2[:5, :5], x[35:, 45:])
    assert np.all(c2[5:, :] == 0) and np.all(c2[:, 5:] == 0)


def test_downsampled_write_rescales_voxel_spacing(tmp_path):
    """Fourier-crop downsampling keeps the physical cell and rescales mx/my
    so the recorded voxel spacing (xlen/mx) doubles (regression: nx/ny were
    pre-replaced, skipping mrc.write's resize branch and leaving stale
    spacing metadata)."""
    import numpy as np

    from topaz_tpu.io import mrc
    from topaz_tpu.io.image import downsample_file

    arr = np.random.default_rng(0).normal(size=(64, 64)).astype(np.float32)
    p = str(tmp_path / "a.mrc")
    mrc.write(p, arr)
    _, h, _ = mrc.read(p)
    # realistic spacing metadata: 64 px over a 64 A cell -> 1 A/px
    h = h.replace(mx=64, my=64, xlen=64.0, ylen=64.0)
    mrc.write(p, arr, header=h)

    out = str(tmp_path / "a_ds.mrc")
    downsample_file(p, 2, out)
    small, h2, _ = mrc.read(out)
    assert small.shape == (32, 32)
    assert (int(h2.nx), int(h2.ny)) == (32, 32)
    assert (int(h2.mx), int(h2.my)) == (32, 32)
    assert float(h2.xlen) == 64.0  # cell unchanged -> spacing now 2 A/px


def test_parse_mode16_rgb():
    """Mode-16 (RGB) files load with a trailing channel axis (the
    reference's reshape chokes on the subarray dtype, topaz/mrc.py:121)."""
    import numpy as np

    from topaz_tpu.io import mrc as M

    rgb = np.arange(2 * 4 * 5 * 3, dtype=np.uint8).reshape(2, 4, 5, 3)
    header = M.default_header((2, 4, 5), dtype=np.float32)
    raw = header.raw.copy()
    raw["mode"] = 16
    content = raw.tobytes() + rgb.tobytes()
    arr, h, ext = M.parse(content)
    assert arr.shape == (2, 4, 5, 3)
    np.testing.assert_array_equal(arr, rgb)


def test_write_fixes_stale_extended_header_size(tmp_path):
    """write() records the extended-header length actually written, not a
    stale header.next (which would shift every reader's data offset)."""
    import numpy as np

    from topaz_tpu.io import mrc

    arr = np.ones((6, 6), np.float32)
    p = str(tmp_path / "x.mrc")
    mrc.write(p, arr)
    _, h, _ = mrc.read(p)
    mrc.write(p, arr, header=h.replace(next=128))  # stale claim, no ext data
    a2, h2, e2 = mrc.read(p)
    assert int(h2.next) == 0 and e2 == b""
    np.testing.assert_array_equal(a2, arr)


def test_load_image_float16_promoted_and_header_standardize(tmp_path):
    """Mode-12 (float16) MRC loads as float32 (loader.py:55-56) and MRC
    standardization uses the HEADER amean/rms (loader.py:57-59)."""
    import numpy as np

    from topaz_tpu.io import mrc as M
    from topaz_tpu.io.image import load_image

    data16 = (np.arange(24, dtype=np.float16) / 8).reshape(4, 6)
    header = M.default_header((1, 4, 6), dtype=np.float16)
    content = header.tobytes() + data16.tobytes()
    p = tmp_path / "h.mrc"
    p.write_bytes(content)
    x = load_image(str(p))
    assert x.dtype == np.float32
    np.testing.assert_allclose(x, data16.astype(np.float32))

    # header-stat standardization
    arr = np.arange(36, dtype=np.float32).reshape(6, 6)
    p2 = str(tmp_path / "s.mrc")
    M.write(p2, arr)
    _, h, _ = M.read(p2)
    h = h.replace(amean=10.0, rms=2.0)
    M.write(p2, arr, header=h)
    xs = load_image(p2, standardize=True)
    np.testing.assert_allclose(xs, (arr - 10.0) / 2.0, rtol=1e-6)
