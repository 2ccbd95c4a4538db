"""Failure detection and recovery: transient device-error classification,
pipeline batch retry, and watch-mode requeue (SURVEY section 5
failure-detection row — the reference has no failure handling at all,
topaz/cuda.py:16-32 being its only fallback)."""

import numpy as np
import pytest


def test_is_transient_classification():
    from topaz_tpu.utils.retry import is_transient_device_error as tr

    # transport / grant weather: retryable
    assert tr(RuntimeError("UNAVAILABLE: socket closed"))
    assert tr(RuntimeError("DEADLINE_EXCEEDED: operation timed out"))
    assert tr(ConnectionResetError("peer reset"))
    assert tr(TimeoutError())
    assert tr(RuntimeError("failed to connect to all addresses"))
    assert tr(RuntimeError("TPU device grant already claimed by pid 123"))
    # program errors and OOM: never retried
    assert not tr(RuntimeError(
        "INTERNAL: Ran out of memory in memory space hbm"))
    assert not tr(RuntimeError("RESOURCE_EXHAUSTED: out of memory"))
    assert not tr(RuntimeError("INVALID_ARGUMENT: shapes do not match"))
    assert not tr(ValueError("bad radius"))
    # OOM marker wins even when a transient marker also appears
    assert not tr(RuntimeError(
        "UNAVAILABLE: worker died — Ran out of memory in hbm"))


def test_retry_transient_retries_then_succeeds(capsys):
    from topaz_tpu.utils.retry import retry_transient

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("UNAVAILABLE: socket closed")
        return 42

    assert retry_transient(flaky, retries=1, base_delay=0.01) == 42
    assert calls["n"] == 2
    assert "retrying" in capsys.readouterr().err


def test_retry_transient_gives_up_and_propagates():
    from topaz_tpu.utils.retry import retry_transient

    calls = {"n": 0}

    def always_down():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: socket closed")

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        retry_transient(always_down, retries=2, base_delay=0.01)
    assert calls["n"] == 3

    def program_bug():
        calls["n"] += 1
        raise RuntimeError("INVALID_ARGUMENT: nope")

    calls["n"] = 0
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        retry_transient(program_bug, retries=5, base_delay=0.01)
    assert calls["n"] == 1  # not retried


def _write_micrograph(path, rng, shape=(128, 128),
                      peaks=((40, 40), (90, 80))):
    from topaz_tpu.io import mrc

    x = rng.normal(0, 1, shape).astype(np.float32)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    for cy, cx in peaks:
        x -= 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                          / (2 * 3.0**2)).astype(np.float32)
    mrc.write(str(path), x)


def test_pipeline_batch_survives_one_transient_failure(tmp_path, rng,
                                                       capsys):
    """A device program that dies once with a transport error is retried
    in-process and the batch completes with correct results."""
    from topaz_tpu.pipeline import MicrographPipeline

    paths = []
    for i in range(2):
        p = tmp_path / f"m{i}.mrc"
        _write_micrograph(p, rng)
        paths.append(str(p))

    kw = dict(model="resnet8_u32", scale=1, radius=6, threshold=1.0)
    ref = {p: (np.asarray(s), np.asarray(c)) for p, s, c in
           MicrographPipeline(**kw).process(paths, batch_size=2)}

    pipe = MicrographPipeline(**kw)
    orig_fn_for = pipe._fn_for
    calls = {"n": 0}

    def flaky_fn_for(bucket):
        fn = orig_fn_for(bucket)

        def wrapped(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("UNAVAILABLE: socket closed")
            return fn(*a, **k)

        return wrapped

    pipe._fn_for = flaky_fn_for
    got = {p: (np.asarray(s), np.asarray(c)) for p, s, c in
           pipe.process(paths, batch_size=2)}
    assert calls["n"] == 2  # failed once, retried once
    assert "retrying" in capsys.readouterr().err
    assert set(got) == set(ref)
    for p in paths:
        np.testing.assert_array_equal(got[p][1], ref[p][1])
        np.testing.assert_allclose(got[p][0], ref[p][0])


def test_pipeline_program_errors_not_retried(tmp_path, rng):
    from topaz_tpu.pipeline import MicrographPipeline

    p = tmp_path / "m.mrc"
    _write_micrograph(p, rng)
    pipe = MicrographPipeline(model="resnet8_u32", scale=1, radius=6,
                              threshold=1.0)
    calls = {"n": 0}

    def broken_fn_for(bucket):
        def wrapped(*a, **k):
            calls["n"] += 1
            raise RuntimeError("INVALID_ARGUMENT: bad program")

        return wrapped

    pipe._fn_for = broken_fn_for
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        list(pipe.process([str(p)], batch_size=1))
    assert calls["n"] == 1


def test_watch_requeues_batch_after_transient_failure(tmp_path, rng,
                                                      monkeypatch):
    """A transient failure that outlasts the pipeline's in-process retry
    does not kill the watcher: the unprocessed files are re-offered on a
    later poll and every micrograph is eventually processed exactly
    once."""
    import topaz_tpu.pipeline as pipeline_mod
    from topaz_tpu.watch import watch_directory

    d = tmp_path / "in"
    d.mkdir()
    for i in range(2):
        _write_micrograph(d / f"mic{i}.mrc", rng)
    out = str(tmp_path / "picks.txt")

    orig_process = pipeline_mod.MicrographPipeline.process
    state = {"failures_left": 1}

    def flaky_process(self, paths, **kw):
        if state["failures_left"] > 0:
            state["failures_left"] -= 1
            raise RuntimeError("UNAVAILABLE: socket closed")
        return orig_process(self, paths, **kw)

    # the patched process raises at call time — before the pipeline's own
    # per-batch retry scope — so the failure reaches watch directly
    monkeypatch.setattr(pipeline_mod.MicrographPipeline, "process",
                        flaky_process)

    polls = {"n": 0}

    def poll_hook():
        polls["n"] += 1
        return polls["n"] <= 12  # bounded run

    n = watch_directory(str(d), out, model="resnet8_u32", scale=1,
                        radius=6, threshold=1.0, batch_size=2,
                        poll_interval=0.01, _poll_hook=poll_hook)
    assert n == 2
    lines = open(out).read().strip().splitlines()
    names = [ln.split("\t")[0] for ln in lines[1:]]
    assert set(names) == {"mic0", "mic1"}
    # exactly once: no duplicate rows from the failed attempt
    assert len(names) == len(set((n_, x) for n_, x in
                                 ((ln.split("\t")[0], ln.split("\t")[1])
                                  for ln in lines[1:])))
