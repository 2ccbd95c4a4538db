"""``topaz serve`` HTTP endpoint: request/response contract and parity of
served picks with the direct pipeline (extension — the reference has no
serving mode)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from topaz_tpu.serve import TopazService, make_server

    service = TopazService(model="resnet8_u32", denoise_model="affine",
                           scale=1, radius=6, threshold=1.0)
    srv = make_server(service, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, service
    srv.shutdown()
    srv.server_close()
    service.close()


def _micrograph_bytes(tmp_path, rng, shape=(128, 128),
                      peaks=((40, 40), (90, 80))):
    from topaz_tpu.io import mrc

    x = rng.normal(0, 1, shape).astype(np.float32)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    for cy, cx in peaks:
        x -= 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                          / (2 * 3.0**2)).astype(np.float32)
    p = tmp_path / "m.mrc"
    mrc.write(str(p), x)
    return str(p), p.read_bytes()


def _post(url, body, ctype="application/x-mrc"):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz_and_models(server):
    base, service = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["model"] == "resnet8_u32"
    with urllib.request.urlopen(base + "/models", timeout=30) as r:
        m = json.loads(r.read())
    assert "resnet16_u32" in m["pickers"] and "unet" in m["denoisers"]


def test_metrics_prometheus_exposition(server, tmp_path, rng):
    """GET /metrics serves Prometheus text format whose counters track
    served requests."""
    base, service = server
    _, body = _micrograph_bytes(tmp_path, rng)
    _post(base + "/extract", body)
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        assert r.headers.get("Content-Type", "").startswith("text/plain")
        text = r.read().decode()
    lines = text.strip().splitlines()
    assert "# TYPE topaz_extract_requests_total counter" in lines
    sample = {l.split()[0]: float(l.split()[1]) for l in lines
              if l and not l.startswith("#")}
    assert sample["topaz_extract_requests_total"] == service.n_extracted >= 1
    assert sample["topaz_queue_capacity"] == service.queue_depth
    assert sample["topaz_uptime_seconds"] > 0
    # latency histogram (VERDICT r4 item 6): cumulative buckets per kind,
    # +Inf bucket == count, and the extract we just served is observed
    assert "# TYPE topaz_request_duration_seconds histogram" in lines
    inf = sample['topaz_request_duration_seconds_bucket{kind="extract",le="+Inf"}']
    cnt = sample['topaz_request_duration_seconds_count{kind="extract"}']
    assert inf == cnt >= 1
    assert sample['topaz_request_duration_seconds_sum{kind="extract"}'] > 0
    buckets = [v for k, v in sample.items()
               if k.startswith('topaz_request_duration_seconds_bucket'
                               '{kind="extract"')]
    assert buckets == sorted(buckets)  # cumulative


def test_extract_matches_direct_pipeline(server, tmp_path, rng):
    base, service = server
    path, body = _micrograph_bytes(tmp_path, rng)
    status, ctype, resp = _post(base + "/extract", body)
    assert status == 200 and ctype == "application/json"
    out = json.loads(resp)
    assert out["count"] == len(out["picks"]) >= 1
    assert out["scale"] == 1

    # served picks == the pipeline run directly on the same file
    (_, s_ref, c_ref), = service.pipe.process([path])
    assert out["count"] == len(s_ref)
    for pick, s, c in zip(out["picks"], np.asarray(s_ref),
                          np.asarray(c_ref)):
        assert (pick["x"], pick["y"]) == (int(c[0]), int(c[1]))
        assert pick["score"] == pytest.approx(float(s), rel=1e-5)


def test_extract_threshold_filter_and_floor(server, tmp_path, rng):
    base, _ = server
    _, body = _micrograph_bytes(tmp_path, rng)
    _, _, resp = _post(base + "/extract", body)
    all_picks = json.loads(resp)["picks"]
    hi = float(np.median([p["score"] for p in all_picks]))
    _, _, resp = _post(base + f"/extract?threshold={hi}", body)
    filtered = json.loads(resp)["picks"]
    assert 0 < len(filtered) <= len(all_picks)
    assert all(p["score"] >= hi for p in filtered)
    # below the server's configured threshold: 400, not silent truncation
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/extract?threshold=-99", body)
    assert ei.value.code == 400
    assert "configured" in json.loads(ei.value.read())["error"]


def test_denoise_roundtrip(server, tmp_path, rng):
    from topaz_tpu.io import mrc

    base, service = server
    path, body = _micrograph_bytes(tmp_path, rng, shape=(64, 64),
                                   peaks=((30, 30),))
    status, ctype, resp = _post(base + "/denoise", body)
    assert status == 200 and ctype == "application/x-mrc"
    out = tmp_path / "denoised.mrc"
    out.write_bytes(resp)
    y = mrc.read(str(out))[0]
    assert y.shape == (64, 64) and y.dtype == np.float32
    ref = service.denoise(path)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_bad_requests(server):
    base, _ = server
    # unknown route
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert ei.value.code == 404
    # empty body
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/extract", b"")
    assert ei.value.code == 400
    # corrupt MRC: an error response, never a hung/dead server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/extract", b"this is not an mrc file at all")
    assert ei.value.code in (400, 500)
    # still alive afterwards
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_request_size_limit(tmp_path, rng):
    from topaz_tpu.serve import TopazService, make_server

    service = TopazService(model="resnet8_u32", scale=1, radius=6,
                           threshold=1.0, max_request_bytes=100)
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/extract", b"x" * 200)
        assert ei.value.code == 413
    finally:
        srv.shutdown()
        srv.server_close()
        service.close()


def test_dynamic_batching_coalesces_concurrent_requests(tmp_path, rng):
    """Concurrent /extract requests run as ONE batched device program
    (mixed micrograph sizes included, via shape bucketing) and every
    client still gets exactly its own picks."""
    from topaz_tpu.serve import TopazService, make_server

    # a 10 s window makes the coalescing deterministic: the worker holds
    # the first request until all three are queued (or the batch fills)
    service = TopazService(model="resnet8_u32", scale=1, radius=6,
                           threshold=1.0, max_batch=3,
                           batch_window_ms=10_000)
    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        peaks = [((30, 40),), ((80, 30), (40, 90)), ((60, 60),)]
        shapes = [(128, 128), (128, 128), (160, 128)]  # two buckets
        bodies = []
        for i, (s, p) in enumerate(zip(shapes, peaks)):
            d = tmp_path / f"m{i}"
            d.mkdir(exist_ok=True)
            bodies.append(_micrograph_bytes(d, rng, shape=s, peaks=p)[1])

        results = [None] * 3

        def hit(i):
            _, _, resp = _post(base + "/extract", bodies[i])
            results[i] = json.loads(resp)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None for r in results)
        # each client got picks near its OWN planted peaks
        for r, pk in zip(results, peaks):
            assert r["count"] >= len(pk)
            got = {(p["x"], p["y"]) for p in r["picks"]}
            for cy, cx in pk:
                assert any(abs(x - cx) <= 3 and abs(y - cy) <= 3
                           for x, y in got), (pk, got)
        # and the device really coalesced: 3 requests, <= 2 batches (one
        # per shape bucket at most), largest batch > 1
        assert service.n_extracted == 3
        assert service.n_batches <= 2
        assert service.max_batch_seen >= 2
    finally:
        srv.shutdown()
        srv.server_close()
        service.close()


def test_corrupt_batchmate_fails_alone(tmp_path, rng):
    """A corrupt upload coalesced into a batch 400s by itself; the good
    request in the same batch succeeds."""
    from topaz_tpu.serve import TopazService, make_server

    service = TopazService(model="resnet8_u32", scale=1, radius=6,
                           threshold=1.0, max_batch=2,
                           batch_window_ms=10_000)
    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        _, good = _micrograph_bytes(tmp_path, rng)
        outcome = {}

        def hit(name, body):
            try:
                _, _, resp = _post(base + "/extract", body)
                outcome[name] = ("ok", json.loads(resp))
            except urllib.error.HTTPError as e:
                outcome[name] = ("err", e.code)

        threads = [threading.Thread(target=hit, args=("good", good)),
                   threading.Thread(target=hit,
                                    args=("bad", b"not an mrc at all"))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert outcome["good"][0] == "ok"
        assert outcome["good"][1]["count"] >= 1
        assert outcome["bad"] == ("err", 400)
    finally:
        srv.shutdown()
        srv.server_close()
        service.close()


def test_device_timeout_504_and_worker_recovery(tmp_path, rng):
    """VERDICT r3 item 3: a wedged device call (the environment's
    documented failure mode — a compile that hangs for minutes) must 504
    the waiting request within --device-timeout, replace the worker, and
    leave the server able to answer the NEXT request."""
    import time as _time

    from topaz_tpu.serve import TopazService, make_server

    service = TopazService(model="resnet8_u32", scale=1, radius=6,
                           threshold=1.0, device_timeout=300.0)
    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    release = threading.Event()
    real_process = service.pipe.process
    calls = []

    def wedged_process(*a, **kw):
        if not calls:
            calls.append("wedged")
            release.wait(timeout=120)  # simulate a hung device call
            return []
        return real_process(*a, **kw)

    try:
        _, body = _micrograph_bytes(tmp_path, rng)
        # warm first (compiles run under the generous default deadline)
        _post(base + "/extract", body)

        service.pipe.process = wedged_process
        service.device_timeout = 2.0
        t0 = _time.time()
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/extract", body)
        assert ei.value.code == 504
        assert _time.time() - t0 < 30  # answered near the deadline
        assert "device-timeout" in json.loads(ei.value.read())["error"]
        assert service.n_timeouts == 1
        assert service.n_worker_restarts == 1

        # the NEXT request succeeds on the fresh worker while the old one
        # is still wedged
        service.device_timeout = 120.0
        status, _, resp = _post(base + "/extract", body)
        assert status == 200 and json.loads(resp)["count"] >= 1

        h = json.loads(urllib.request.urlopen(base + "/healthz",
                                              timeout=30).read())
        assert h["worker_alive"] and h["worker_restarts"] == 1
        assert h["suspect_workers"] == 1  # old thread still stuck
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            text = r.read().decode()
        assert "topaz_device_timeouts_total 1" in text
        assert "topaz_worker_restarts_total 1" in text
    finally:
        release.set()  # unwedge the abandoned worker so it can exit
        service.pipe.process = real_process
        srv.shutdown()
        srv.server_close()
        service.close()
    # once released, the abandoned worker drains its private _SHUTDOWN
    for _ in range(100):
        if service._suspect_workers() == 0:
            break
        _time.sleep(0.1)
    assert service._suspect_workers() == 0


def test_denoise_dynamic_batching(tmp_path, rng):
    """VERDICT r3 item 8: concurrent same-shape /denoise requests run as
    ONE batched device program (Denoise.denoise_batch) with results
    identical to the single-frame path."""
    from topaz_tpu.serve import TopazService, make_server

    service = TopazService(model="resnet8_u32", denoise_model="affine",
                           scale=1, radius=6, threshold=1.0, max_batch=3,
                           batch_window_ms=10_000)
    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        paths, bodies = [], []
        for i in range(3):
            d = tmp_path / f"m{i}"
            d.mkdir(exist_ok=True)
            p, b = _micrograph_bytes(d, rng, shape=(96, 96),
                                     peaks=((30 + 10 * i, 40),))
            paths.append(p)
            bodies.append(b)

        results = [None] * 3

        def hit(i):
            _, ctype, resp = _post(base + "/denoise", bodies[i])
            assert ctype == "application/x-mrc"
            results[i] = resp

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None for r in results)
        assert service.n_denoised == 3
        assert service.n_denoise_batches >= 1
        assert service.max_denoise_batch_seen == 3

        # batched output == the single-frame path on the same file
        from topaz_tpu.io import mrc

        for i in (0, 2):
            out = tmp_path / f"out{i}.mrc"
            out.write_bytes(results[i])
            y = mrc.read(str(out))[0]
            ref = service.denoise(paths[i])  # runs singly (no concurrency)
            np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)
    finally:
        srv.shutdown()
        srv.server_close()
        service.close()


def test_queue_backpressure_503(tmp_path, rng):
    """Requests beyond --queue-depth get 503, not an unbounded queue."""
    from topaz_tpu.serve import TopazService, _Busy, _Job

    service = TopazService(model="resnet8_u32", scale=1, radius=6,
                           threshold=1.0, queue_depth=1)
    service.close()  # stop the worker so the queue can't drain
    service._queue.put(_Job("extract", "placeholder"))
    with pytest.raises(_Busy):
        service._submit(_Job("extract", "x"))


def test_serve_cli_registration():
    """The serve command parses through the real CLI tree."""
    from topaz_tpu.cli.main import build_parser

    parser = build_parser()
    args = parser.parse_args(["serve", "--port", "0", "-m", "resnet8_u32",
                              "-s", "4", "-t", "-5", "--fast"])
    assert args.port == 0 and args.scale == 4 and args.fast


def test_abandoned_queued_job_never_reaches_device(tmp_path, rng):
    """VERDICT r4 item 6, congestion side of the race window: a job that
    504s while still QUEUED (worker busy on an earlier batch, job not yet
    committed/started) is classified as queue congestion — no worker
    restart — and is dropped at batch-commit time, so the device never
    executes work whose submitter already left."""
    import time as _time

    from topaz_tpu.serve import TopazService, _Timeout

    service = TopazService(model="resnet8_u32", scale=1, radius=6,
                           threshold=1.0, device_timeout=60.0,
                           batch_window_ms=0.0)
    calls = []
    release = threading.Event()

    def fake_process(paths, batch_size=None, **kw):
        calls.append(list(paths))
        if len(calls) == 1:
            release.wait(timeout=60)
        return [(p, np.zeros(1, np.float32), np.zeros((1, 2), int))
                for p in paths]

    service.pipe.process = fake_process
    try:
        results = {}
        t1 = threading.Thread(
            target=lambda: results.update(a=service.extract("job1")))
        t1.start()
        for _ in range(200):  # wait until the worker is wedged inside job1
            if calls:
                break
            _time.sleep(0.01)
        assert calls, "worker never picked up job1"

        # job2 times out while queued behind the wedge
        service.device_timeout = 0.3
        with pytest.raises(_Timeout):
            service.extract("job2")
        # race-free classification: not started => congestion, no restart
        assert service.n_worker_restarts == 0
        assert service.n_timeouts == 1

        # unwedge; job1 completes, job2 must be dropped, job3 served
        service.device_timeout = 60.0
        release.set()
        t1.join(timeout=30)
        assert "a" in results and len(results["a"][0]) == 1
        s3, _ = service.extract("job3")
        assert len(s3) == 1
        assert all("job2" not in batch for batch in calls), calls
        assert service._worker.is_alive() and not service._suspect_workers()
    finally:
        release.set()
        service.close()


def test_denoise_batch_stops_for_abandoned_jobs(tmp_path, rng):
    """VERDICT r4 item 6, abandoned-work side: a denoise job 504'd while
    an earlier shape group of the same batch is executing is skipped
    before its own device call (checked between groups), not run to
    completion for nobody."""
    from topaz_tpu.io import mrc
    from topaz_tpu.serve import TopazService, _Job

    p1 = tmp_path / "a.mrc"
    p2 = tmp_path / "b.mrc"
    mrc.write(str(p1), rng.normal(0, 1, (32, 32)).astype(np.float32))
    mrc.write(str(p2), rng.normal(0, 1, (48, 48)).astype(np.float32))

    service = TopazService(model="resnet8_u32", scale=1, radius=6,
                           threshold=1.0)
    service.close()  # unit-level: drive _run_denoise_batch directly
    j1, j2 = _Job("denoise", str(p1)), _Job("denoise", str(p2))

    class FakeDenoiser:
        calls = 0

        def denoise(self, x, patch_size=0):
            FakeDenoiser.calls += 1
            j2.abandoned = True  # j2's submitter 504s mid-group-1
            return x

        def denoise_batch(self, xs):
            FakeDenoiser.calls += 1
            j2.abandoned = True
            return xs

    service._denoiser = FakeDenoiser()
    service._run_denoise_batch([j1, j2])
    assert FakeDenoiser.calls == 1  # group 2 never hit the device
    assert j1.done.is_set() and j1.error is None
    assert not j2.done.is_set()
