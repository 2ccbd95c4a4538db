"""The benchmark's reporting layer must be self-checking (VERDICT r4:
BENCH_r04 published mfu 2.64 from a corrupted peak denominator, and its
stdout JSON line outgrew the driver's ~2000-char capture window and
failed to parse). These tests pin the invariant checks and the
variance/compaction plumbing without touching a device."""

import json

import numpy as np


def _bench():
    import bench

    return bench


def test_stats_median_best_spread():
    b = _bench()
    s = b._stats([3.0, 1.0, 2.0])
    assert s["med"] == 2.0 and s["best"] == 3.0
    assert s["reps"] == [3.0, 1.0, 2.0]  # run order preserved
    assert s["spread_pct"] == 100.0  # (3-1)/2
    s2 = b._stats([4.0, 2.0])  # even count -> mean of middle two
    assert s2["med"] == 3.0 and s2["best"] == 4.0


def test_peak_invariants():
    """bf16 >= f32-default >= f32-highest (f32-default IS one bf16 MXU
    pass), nothing above the datasheet+noise cap. The r4 failure mode
    (bf16 8.4 < f32 115.9) must be rejected."""
    b = _bench()
    assert b._peaks_ok({"bf16": 120.0, "f32": 115.0, "f32_highest": 28.0})
    # the exact BENCH_r04 corruption
    assert not b._peaks_ok({"bf16": 8.4, "f32": 115.9,
                            "f32_highest": 28.3})
    # above the physical cap
    assert not b._peaks_ok({"bf16": 500.0, "f32": 115.0,
                            "f32_highest": 28.0})
    # highest-precision faster than default is equally impossible
    assert not b._peaks_ok({"bf16": 120.0, "f32": 20.0,
                            "f32_highest": 28.0})


def test_compact_line_fits_driver_window():
    """A record with full rep arrays must come out under the driver's
    capture window, shedding reps (then the note) as needed — and stay
    parseable JSON with the headline fields intact."""
    b = _bench()
    extra = {"note": "x" * 400}
    for i in range(20):
        extra[f"metric_{i}"] = {"med": 1.2345, "best": 2.3456,
                                "reps": [1.1 * j for j in range(10)],
                                "spread_pct": 12.3}
    record = {"metric": "m", "value": 1.0, "unit": "u",
              "vs_baseline": 2.0, "extra": extra}
    line = b.compact_line(record, limit=1900)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["value"] == 1.0 and parsed["vs_baseline"] == 2.0
    assert parsed["extra"]["metric_0"]["med"] == 1.2345


def test_mfu_formula_sane():
    """The published MFU inputs at round-4's measured rates land under 1
    with a sane denominator: 4.62e12 FLOPs * ~4.8 mic/s over ~117 TF/s
    is ~0.19, not 2.64."""
    b = _bench()
    mfu = b.DENOISE4K_FLOPS * 4.8 / (117.0 * 1e12)
    assert 0.05 < mfu < 1.0
    mfu_train = b.TRAIN_STEP_FLOPS * (165754.6 / b.TRAIN_BATCH) / (115.9e12)
    assert 0.05 < mfu_train < 1.0


def test_hbm_two_point_plumbing():
    """bench_hbm_peak's two-point differencing returns the published dict
    shape on any backend (tiny array on CPU here); the result is either a
    positive in-cap bandwidth or flagged unreliable — never silent junk."""
    b = _bench()
    r = b.bench_hbm_peak(reps=2, k_small=1, k_big=64, n=65536)
    assert set(r) == {"measured_hbm_gb_s", "hbm_unreliable"}
    if not r["hbm_unreliable"]:
        assert 0 < r["measured_hbm_gb_s"] <= b.HBM_CAP_GB_S


def test_bytes_accessed_best_effort():
    """_bytes_accessed returns a positive float (or None on backends
    without the field) and never raises — it gates the published HBM
    utilization."""
    import jax
    import jax.numpy as jnp

    b = _bench()

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    x = jnp.zeros((1024,), jnp.float32)
    f(x)  # compile
    got = b._bytes_accessed(f, x)
    assert got is None or got > 0

    def boom(*a):
        raise RuntimeError("no analysis")

    assert b._bytes_accessed(type("J", (), {"lower": boom})(), x) is None
