"""Serving app: the five reference routes + extras over real HTTP."""
import json
import threading
import urllib.error
import urllib.request
from wsgiref.simple_server import make_server

import numpy as np
import pytest

from melogan_tpu.config import GANConfig
from melogan_tpu.midi.midifile import read_midi
from melogan_tpu.sampling import Sampler
from melogan_tpu.serving.app import AppState, ThreadingWSGIServer, build_app


@pytest.fixture(scope="module")
def server():
    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    state = AppState(cfg, Sampler(cfg, seed=0))
    httpd = make_server("127.0.0.1", 0, build_app(state), server_class=ThreadingWSGIServer)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", state
    httpd.shutdown()


def req(base, path, data=None, method=None):
    r = urllib.request.Request(
        base + path,
        data=json.dumps(data).encode() if data is not None else None,
        headers={"Content-Type": "application/json"},
        method=method,
    )
    try:
        resp = urllib.request.urlopen(r, timeout=30)
        return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_index(server):
    base, _ = server
    status, headers, body = req(base, "/")
    assert status == 200 and "text/html" in headers["Content-Type"]
    assert b"Melo-GAN" in body


def test_text_emotion_routes(server):
    base, _ = server
    for text, expected in [
        ("I am thrilled and so excited!", "happy"),
        ("this is infuriating, I hate it", "angry"),
        ("", "calm"),
    ]:
        status, _, body = req(base, "/get_text_emotion", {"text": text})
        assert status == 200
        assert json.loads(body)["emotion"] == expected


def test_generate_returns_midi(server):
    base, _ = server
    status, headers, body = req(base, "/generate", {"emotion": "angry"})
    assert status == 200
    assert headers["Content-Type"] == "audio/midi"
    assert "melo_angry.mid" in headers["Content-Disposition"]
    song = read_midi(body)
    assert abs(song.initial_tempo - 160.0) < 0.01  # angry bpm map


def test_generate_unknown_emotion(server):
    base, _ = server
    status, _, body = req(base, "/generate", {"emotion": "bogus"})
    assert status == 400
    assert "bogus" in json.loads(body)["error"]


def test_camera_routes(server):
    base, state = server
    status, _, body = req(base, "/get_camera_emotion")
    assert status == 200 and json.loads(body)["emotion"] == "calm"
    status, _, _ = req(base, "/video_feed")
    assert status == 503  # no camera device in this deployment


def test_generate_uses_fresh_seed_per_request(server):
    base, state = server
    c0 = state.seed_counter
    req(base, "/generate", {"emotion": "calm"})
    req(base, "/generate", {"emotion": "calm"})
    # fresh seed each request (jittered features + noise); with untrained
    # weights the note QUANTIZATION may still collapse to identical bytes,
    # so assert on the seed mechanism, and on raw-note divergence:
    assert state.seed_counter == c0 + 2
    n1 = state.sampler.sample_notes(["calm"], seed=1)
    n2 = state.sampler.sample_notes(["calm"], seed=2)
    assert not np.array_equal(n1, n2)


def test_404(server):
    base, _ = server
    assert req(base, "/nope")[0] == 404


def test_oversized_json_body_gets_413(server):
    """A body above MAX_JSON_BODY is rejected with 413 (after a bounded
    drain so the connection closes cleanly), never read into memory whole,
    and the server stays healthy for the next request."""
    base, _ = server
    big = b'{"emotion": "happy", "pad": "' + b"x" * (3 << 20) + b'"}'
    status, _, body = req_raw(base, "/generate", big)
    assert status == 413
    assert b"too large" in body
    status, _, body = req(base, "/generate", {"emotion": "happy"})
    assert status == 200 and body[:4] == b"MThd"


def test_negative_content_length_reads_nothing():
    """A hostile 'Content-Length: -1' must not make the server read to
    socket EOF (read(-1) on the wsgi input would buffer unboundedly)."""
    import io

    from melogan_tpu.serving.app import _read_json

    class EofBomb(io.RawIOBase):
        def read(self, n=-1):
            assert n is not None and n >= 0, "read-to-EOF issued against the socket"
            return b""

    payload = _read_json({"CONTENT_LENGTH": "-1", "wsgi.input": EofBomb()})
    assert payload == {}
    payload = _read_json({"CONTENT_LENGTH": "junk", "wsgi.input": EofBomb()})
    assert payload == {}


def req_raw(base, path, data):
    r = urllib.request.Request(
        base + path, data=data, headers={"Content-Type": "application/json"}
    )
    try:
        resp = urllib.request.urlopen(r, timeout=30)
        return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_malformed_json_body(server):
    base, _ = server
    r = urllib.request.Request(
        base + "/get_text_emotion", data=b"not json{{{",
        headers={"Content-Type": "application/json"},
    )
    resp = urllib.request.urlopen(r, timeout=30)
    assert json.loads(resp.read())["emotion"] == "calm"  # fail-soft default


def test_concurrent_generate_requests(server):
    """8 threads × 4 requests: every response is a valid MIDI file and the
    camera/text routes stay responsive (thread-safety of the shared jitted
    sampler + locked state)."""
    import concurrent.futures

    base, _ = server

    def one(i):
        emotion = ["happy", "sad", "angry", "calm"][i % 4]
        status, headers, body = req(base, "/generate", {"emotion": emotion})
        assert status == 200 and body[:4] == b"MThd"
        status, _, _ = req(base, "/get_camera_emotion")
        assert status == 200
        return len(body)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        sizes = list(ex.map(one, range(32)))
    assert all(s > 100 for s in sizes)


# ---------------------------------------------------------------------------
# MJPEG /video_feed (VERDICT r1 item 5): multipart/x-mixed-replace streaming
# of annotated frames from a pluggable frame source.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def video_server():
    from melogan_tpu.serving.video import SyntheticFrameSource

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    state = AppState(
        cfg, Sampler(cfg, seed=0), frame_source=SyntheticFrameSource(n_frames=3)
    )
    httpd = make_server("127.0.0.1", 0, build_app(state), server_class=ThreadingWSGIServer)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", state
    httpd.shutdown()


def _read_mjpeg_parts(raw: bytes):
    """Split a multipart/x-mixed-replace byte stream into JPEG payloads."""
    parts = []
    for chunk in raw.split(b"--frame")[1:]:
        idx = chunk.find(b"\r\n\r\n")
        if idx < 0:
            continue
        payload = chunk[idx + 4:].rstrip(b"\r\n")
        if payload:
            parts.append(payload)
    return parts


def test_video_feed_streams_jpeg_parts(video_server):
    base, state = video_server
    resp = urllib.request.urlopen(base + "/video_feed", timeout=120)
    assert resp.status == 200
    assert resp.headers["Content-Type"].startswith("multipart/x-mixed-replace")
    raw = resp.read()  # finite synthetic source -> stream terminates
    parts = _read_mjpeg_parts(raw)
    assert len(parts) >= 2, f"expected >=2 JPEG parts, got {len(parts)}"
    for p in parts:
        assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"  # SOI/EOI
    # frames are decodable standard JPEG (PIL is test-only)
    try:
        import io
        from PIL import Image
    except ImportError:
        return
    img = np.asarray(Image.open(io.BytesIO(parts[0])).convert("RGB"))
    assert img.shape == (240, 320, 3)
    # annotation overlay present: some saturated green pixels from the box
    green = (img[..., 1] > 180) & (img[..., 0] < 120) & (img[..., 2] < 120)
    assert green.sum() > 50


def test_video_feed_updates_camera_emotion(video_server):
    base, state = video_server
    urllib.request.urlopen(base + "/video_feed", timeout=120).read()
    status, _, body = req(base, "/get_camera_emotion")
    assert status == 200
    assert json.loads(body)["emotion"] in ("happy", "sad", "angry", "calm")


def test_video_feed_healthz_flag(video_server):
    base, _ = video_server
    status, _, body = req(base, "/healthz")
    assert status == 200 and json.loads(body)["video_feed"] is True


# ---------------------------------------------------------------------------
# Sample pool (VERDICT r1 item 3): batched prefetched generation kills the
# per-request dispatch floor.
# ---------------------------------------------------------------------------


def test_sample_pool_unique_fresh_samples():
    from melogan_tpu.serving.pool import SamplePool

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    pool = SamplePool(Sampler(cfg, seed=0), target=8, refill_batch=16, background=False)
    try:
        pool.prefill()
        a = pool.take("happy")
        b = pool.take("happy")
        assert a.shape == (64, 4) and b.shape == (64, 4)
        assert not np.array_equal(a, b)  # every request gets a fresh sample
        with pytest.raises(ValueError, match="unknown emotion"):
            pool.take("bogus")
    finally:
        pool.close()


def test_sample_pool_cold_miss_and_stats():
    from melogan_tpu.serving.pool import SamplePool

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    pool = SamplePool(Sampler(cfg, seed=0), target=4, refill_batch=8, background=False)
    try:
        n = pool.take("sad")  # cold miss triggers a coalesced refill
        assert n.shape == (64, 4)
        s = pool.stats()
        assert s["misses"] == 1 and s["hits"] == 0
        pool.take("sad")
        assert pool.stats()["hits"] == 1
    finally:
        pool.close()


@pytest.fixture(scope="module")
def pooled_server():
    from melogan_tpu.serving.pool import SamplePool

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    pool = SamplePool(sampler, target=8, refill_batch=32)
    pool.prefill(timeout=120)
    state = AppState(cfg, sampler, pool=pool)
    httpd = make_server("127.0.0.1", 0, build_app(state), server_class=ThreadingWSGIServer)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", state
    httpd.shutdown()
    pool.close()


def test_pooled_generate_serves_valid_unique_midi(pooled_server):
    base, state = pooled_server
    for _ in range(6):
        status, headers, body = req(base, "/generate", {"emotion": "happy"})
        assert status == 200 and body[:4] == b"MThd"
    # each request consumed a distinct pool entry (freshness is asserted at
    # the notes level in test_sample_pool_unique_fresh_samples — rendered
    # bytes can collide under untrained-weight quantization)
    status, _, body = req(base, "/healthz")
    stats = json.loads(body)["sample_pool"]
    assert stats is not None and stats["hits"] >= 1


def test_pooled_generate_concurrent(pooled_server):
    import concurrent.futures

    base, _ = pooled_server

    def one(i):
        emotion = ["happy", "sad", "angry", "calm"][i % 4]
        status, _, body = req(base, "/generate", {"emotion": emotion})
        assert status == 200 and body[:4] == b"MThd"
        return len(body)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        sizes = list(ex.map(one, range(32)))
    assert all(s > 50 for s in sizes)


def test_sample_pool_warm_compiles_the_refill_ladder():
    """warm_async dispatches one batch per quantized refill size (each size
    is a distinct XLA program), stocks pools only to the cap, and reports
    progress through stats()['warm']."""
    import time

    from melogan_tpu.serving.pool import SamplePool

    class StubSampler:
        def __init__(self):
            self.batches = []

        def sample_notes(self, prompts, seed=0):
            self.batches.append(len(prompts))
            return np.zeros((len(prompts), 8, 4), np.float32)

    stub = StubSampler()
    pool = SamplePool(stub, target=4, refill_batch=8, max_refill=64, background=False)
    try:
        assert pool.warm_sizes() == [8, 16, 32, 64]
        # a non-power-of-two max_refill is itself a reachable _refill_size
        # and must be part of the ladder
        odd = SamplePool(stub, target=4, refill_batch=8, max_refill=48,
                         background=False)
        assert odd.warm_sizes() == [8, 16, 32, 48]
        assert odd._refill_size(1000) == 48
        odd.close()
        assert pool.stats()["warm"] == "idle"
        t = pool.warm_async()
        t.join(timeout=10)
        assert pool.stats()["warm"] == "done"
        assert stub.batches == [8, 16, 32, 64]
        assert all(d <= 4 * pool.target for d in pool.depth().values())
        assert all(d > 0 for d in pool.depth().values())
        # warmed samples are real: take() serves them without a dispatch
        n_dispatches = len(stub.batches)
        assert pool.take("happy").shape == (8, 4)
        assert len(stub.batches) == n_dispatches
    finally:
        pool.close()


def test_sample_pool_warm_failure_does_not_kill_serving():
    from melogan_tpu.serving.pool import SamplePool

    class BrokenSampler:
        def sample_notes(self, prompts, seed=0):
            raise RuntimeError("compile exploded")

    pool = SamplePool(BrokenSampler(), target=4, refill_batch=8, max_refill=16,
                      background=False, take_timeout=0.3)
    try:
        t = pool.warm_async()
        t.join(timeout=10)
        assert pool.stats()["warm"].startswith("error:")
        assert "compile exploded" in pool.stats()["warm"]
    finally:
        pool.close()


def test_sample_pool_adaptive_refill_batch():
    """Under sustained drain the refill batch grows toward the drain rate
    (amortizing the per-dispatch round trip)."""
    from melogan_tpu.serving.pool import SamplePool

    class StubSampler:
        def __init__(self):
            self.batches = []

        def sample_notes(self, prompts, seed=0):
            self.batches.append(len(prompts))
            return np.zeros((len(prompts), 8, 4), np.float32)

    stub = StubSampler()
    pool = SamplePool(stub, target=4, refill_batch=16, max_refill=512, background=False)
    try:
        pool.prefill()
        first = stub.batches[-1]
        assert first == 16
        for _ in range(100):  # heavy drain
            pool.take("happy")
        pool._refill(pool._low_emotions() or ["happy"])
        assert stub.batches[-1] > first  # grew with the drain rate
        assert stub.batches[-1] <= 512
    finally:
        pool.close()


def test_sample_pool_take_deadline_on_failing_sampler():
    """VERDICT-r2 #4: a persistently failing sampler must surface as a bounded
    PoolTimeout carrying the last refill error, never an unbounded spin."""
    import time

    from melogan_tpu.serving.pool import PoolTimeout, SamplePool

    class BrokenSampler:
        def sample_notes(self, prompts, seed=0):
            raise RuntimeError("device wedged")

    pool = SamplePool(BrokenSampler(), target=4, refill_batch=8, background=False,
                      take_timeout=0.4)
    try:
        t0 = time.monotonic()
        with pytest.raises(PoolTimeout) as ei:
            pool.take("happy")
        elapsed = time.monotonic() - t0
        assert elapsed < 5.0  # bounded, roughly the configured deadline
        assert "device wedged" in str(ei.value)
        assert ei.value.last_error and "RuntimeError" in ei.value.last_error
    finally:
        pool.close()


def test_sample_pool_take_deadline_on_hung_dispatch():
    """A dispatch HUNG in another thread (wedged device, stalled remote
    compile) holds the refill lock for minutes; take() must still time out —
    the timed lock acquire + stocked-condition wait keep the request path
    deadline-bounded instead of blocking on the lock."""
    import time

    from melogan_tpu.serving.pool import PoolTimeout, SamplePool

    release = threading.Event()

    class HangingSampler:
        def sample_notes(self, prompts, seed=0):
            release.wait(timeout=30)  # simulates a wedged device dispatch
            raise RuntimeError("unwedged")

    pool = SamplePool(HangingSampler(), target=4, refill_batch=8, background=False,
                      take_timeout=0.5)

    def hung_refill():
        try:
            pool._refill(["happy"])
        except RuntimeError:
            pass  # the post-release "unwedged" error is the simulated outcome

    try:
        hung = threading.Thread(target=hung_refill, daemon=True)
        hung.start()
        time.sleep(0.05)  # let the hung dispatch grab the refill lock
        t0 = time.monotonic()
        with pytest.raises(PoolTimeout):
            pool.take("happy")
        assert time.monotonic() - t0 < 5.0  # bounded despite the held lock
    finally:
        release.set()
        hung.join(timeout=5)
        pool.close()


def test_sample_pool_take_waits_for_concurrent_refill_stock():
    """A take() that loses the refill lock race must pick up the winner's
    stock promptly (condition-variable wait, not deadline expiry)."""
    import time

    from melogan_tpu.serving.pool import SamplePool

    class SlowSampler:
        max_notes = 8

        def sample_notes(self, prompts, seed=0):
            time.sleep(0.3)  # long enough for the taker to lose the race
            return np.zeros((len(prompts), 8, 4), np.float32)

    pool = SamplePool(SlowSampler(), target=2, refill_batch=4, background=False,
                      take_timeout=10.0)
    try:
        refiller = threading.Thread(target=lambda: pool._refill(["happy"]), daemon=True)
        refiller.start()
        time.sleep(0.05)
        t0 = time.monotonic()
        note = pool.take("happy")  # blocks on the in-flight refill's stock
        assert note.shape == (8, 4)
        assert time.monotonic() - t0 < 5.0
    finally:
        refiller.join(timeout=5)
        pool.close()


def test_generate_returns_503_when_pool_refill_hangs():
    """The HTTP /generate path maps PoolTimeout to 503 + last_error detail."""
    from melogan_tpu.serving.pool import SamplePool

    class BrokenSampler:
        def sample_notes(self, prompts, seed=0):
            raise RuntimeError("compile stalled")

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    pool = SamplePool(BrokenSampler(), target=4, refill_batch=8, background=False,
                      take_timeout=0.4)
    state = AppState(cfg, Sampler(cfg, seed=0), pool=pool)
    httpd = make_server("127.0.0.1", 0, build_app(state), server_class=ThreadingWSGIServer)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        status, _, body = req(base, "/generate", {"emotion": "happy"})
        assert status == 503
        payload = json.loads(body)
        assert "compile stalled" in payload["last_refill_error"]
    finally:
        httpd.shutdown()
        pool.close()


def test_sample_pool_drain_count_survives_covered_refill():
    """ADVICE-r2 #3: when a concurrent refill already stocked the requested
    emotions, the early return must NOT discard the drain count — the next
    dispatch still sizes to the true drain rate."""
    from melogan_tpu.serving.pool import SamplePool

    class StubSampler:
        def __init__(self):
            self.batches = []

        def sample_notes(self, prompts, seed=0):
            self.batches.append(len(prompts))
            return np.zeros((len(prompts), 8, 4), np.float32)

    stub = StubSampler()
    pool = SamplePool(stub, target=4, refill_batch=16, max_refill=512, background=False)
    try:
        pool.prefill()  # every emotion at target
        pool._drained = 100  # pretend a heavy drain happened
        dispatches = len(stub.batches)
        pool._refill(["happy"])  # covered: must early-return without dispatch
        assert len(stub.batches) == dispatches  # no dispatch happened
        assert pool._drained == 100  # drain count preserved
        # force a real refill: drain one emotion below target
        for _ in range(4):
            pool.take("sad")
        pool._refill(["sad"])
        assert stub.batches[-1] >= 2 * 100  # sized to the accumulated drain rate
    finally:
        pool.close()


def test_healthz_states_lexicon_accuracy_caveat(server):
    """VERDICT-r2 weak #1: when the lexicon fallback serves text emotion the
    health endpoint must say loudly that it is not the go_emotions model."""
    from melogan_tpu.models import text_emotion

    base, _ = server
    status, _, body = req(base, "/healthz")
    payload = json.loads(body)
    assert payload["text_backend"] == text_emotion.backend_name()
    note = payload["text_backend_note"]
    if payload["text_backend"] == "lexicon":
        assert "NOT the go_emotions model" in note
        assert "MELOGAN_TEXT_MODEL_DIR" in note
    else:
        assert "accuracy" in note


def test_take_path_refill_success_clears_last_error():
    """A background=False pool must not report a long-resolved incident: a
    take-path refill that succeeds clears last_error just like the producer."""
    from melogan_tpu.serving.pool import SamplePool

    class FlakySampler:
        def __init__(self):
            self.calls = 0

        def sample_notes(self, prompts, seed=0):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("transient wedge")
            return np.zeros((len(prompts), 64, 4), np.float32)

    pool = SamplePool(FlakySampler(), target=4, refill_batch=8, background=False,
                      take_timeout=5.0)
    try:
        note = pool.take("happy")  # first refill fails, retry succeeds
        assert note.shape == (64, 4)
        assert pool.stats()["last_error"] is None
    finally:
        pool.close()


# ---------------------------------------------------------------------------
# Startup watchdog: a wedged TPU tunnel hangs device init forever, silently
# ---------------------------------------------------------------------------


def test_init_watchdog_fires_when_step_never_finishes(capsys):
    import time

    from melogan_tpu.serving.app import init_watchdog

    init_watchdog("device probe", 0.05)
    time.sleep(0.5)
    out = capsys.readouterr().out
    assert "device probe still not finished" in out
    assert "Serving has NOT started" in out


def test_init_watchdog_silent_when_step_completes(capsys):
    import time

    from melogan_tpu.serving.app import init_watchdog

    done = init_watchdog("device probe", 0.05)
    done.set()
    time.sleep(0.5)
    assert "still not finished" not in capsys.readouterr().out


def test_init_watchdog_disabled_by_zero_timeout(capsys):
    import time

    from melogan_tpu.serving.app import init_watchdog

    init_watchdog("device probe", 0)
    time.sleep(0.2)
    assert capsys.readouterr().out == ""


def test_init_watchdog_all_clear_after_late_completion(capsys):
    """A slow cold compile fires the warning but must be retracted when init
    completes — otherwise a healthy startup reads as a wedged device."""
    import time

    from melogan_tpu.serving.app import init_watchdog

    done = init_watchdog("device probe", 0.05)
    time.sleep(0.4)
    done.set()
    time.sleep(0.4)
    out = capsys.readouterr().out
    assert "device probe still not finished" in out
    assert "all clear" in out


def test_healthz_reports_device_info(server):
    base, _ = server
    status, _, body = req(base, "/healthz")
    dev = json.loads(body)["device"]
    assert status == 200
    assert dev["platform"] == "cpu" and dev["count"] >= 1 and dev["kind"]


def test_healthz_reports_weight_provenance(server, tmp_path):
    """An operator must see whether the generator serves checkpoint weights
    or random init (a serve started before its training job): healthz carries
    generator provenance, flipped by a successful reload."""
    base, state = server
    payload = json.loads(req(base, "/healthz")[2])
    assert payload["generator"] == "random-weights"  # fixture has no ckpt
    ckpt = str(tmp_path / "gan_final.ckpt")
    _gan_final_ckpt_from(state.sampler, ckpt)
    assert req(base, "/reload", {"checkpoint": ckpt})[0] == 200
    payload = json.loads(req(base, "/healthz")[2])
    assert payload["generator"] == "checkpoint"
    assert payload["checkpoint"] == ckpt


# ---------------------------------------------------------------------------
# /metrics: Prometheus text exposition (beyond-reference production surface)
# ---------------------------------------------------------------------------


def test_metrics_registry_render_format():
    from melogan_tpu.serving.metrics import Registry

    reg = Registry()
    reg.counter_inc("melogan_http_requests_total", help="reqs", route="/generate",
                    method="POST", status="200")
    reg.counter_inc("melogan_http_requests_total", route="/generate",
                    method="POST", status="200")
    reg.observe("melogan_http_request_duration_seconds", 0.003, help="latency",
                route="/generate")
    reg.gauge_fn("melogan_pool_depth", lambda: {"happy": 3, "sad": 0}, help="depth")
    text = reg.render()
    assert "# TYPE melogan_http_requests_total counter" in text
    assert ('melogan_http_requests_total{method="POST",route="/generate",'
            'status="200"} 2') in text
    assert "# TYPE melogan_http_request_duration_seconds histogram" in text
    # 0.003 lands in the first bucket with le >= 0.003 and every later one
    assert ('melogan_http_request_duration_seconds_bucket{route="/generate",'
            'le="0.005"} 1') in text
    assert 'melogan_http_request_duration_seconds_count{route="/generate"} 1' in text
    assert 'melogan_pool_depth{key="happy"} 3' in text
    assert "process_uptime_seconds" in text


def test_metrics_gauge_failure_does_not_break_render():
    from melogan_tpu.serving.metrics import Registry

    reg = Registry()
    reg.gauge_fn("melogan_broken", lambda: 1 / 0, help="boom")
    reg.counter_inc("ok_total")
    text = reg.render()
    assert "ok_total 1" in text and "melogan_broken" not in text


def test_metrics_gauge_bad_value_does_not_break_render():
    """The guard covers the RETURN VALUE too: nan/inf or a non-numeric from
    a gauge callback must be dropped, not 500 every /metrics scrape via
    _fmt/float — and a half-bad dict gauge must not leave an orphan
    HELP/TYPE header with no sample."""
    from melogan_tpu.serving.metrics import Registry

    reg = Registry()
    reg.gauge_fn("melogan_nan", lambda: float("nan"), help="zero-denominator ratio")
    reg.gauge_fn("melogan_inf", lambda: float("inf"), help="overflow")
    reg.gauge_fn("melogan_notnum", lambda: "oops", help="wrong type")
    reg.gauge_fn("melogan_dict_bad", lambda: {"a": 1.0, "b": object()}, help="bad dict")
    reg.counter_inc("ok_total")
    text = reg.render()
    assert "ok_total 1" in text
    for name in ("melogan_nan", "melogan_inf", "melogan_notnum", "melogan_dict_bad"):
        assert name not in text, text


def test_metrics_endpoint_counts_requests(server):
    base, _ = server
    req(base, "/generate", {"emotion": "happy"})
    req(base, "/nonexistent")
    status, headers, body = req(base, "/metrics")
    assert status == 200 and headers["Content-Type"].startswith("text/plain")
    text = body.decode()
    assert ('melogan_http_requests_total{method="POST",route="/generate",'
            'status="200"}') in text
    # unknown paths collapse into "other" — no unbounded label values
    assert 'route="other"' in text and 'route="/nonexistent"' not in text
    assert 'melogan_http_request_duration_seconds_bucket{route="/generate"' in text


def test_metrics_endpoint_pool_gauges(pooled_server):
    base, _ = pooled_server
    req(base, "/generate", {"emotion": "calm"})
    _, _, body = req(base, "/metrics")
    text = body.decode()
    assert 'melogan_pool_depth{key="calm"}' in text
    assert "melogan_pool_hits_total" in text


# ---------------------------------------------------------------------------
# POST /reload: checkpoint hot-swap (no restart, no recompile)
# ---------------------------------------------------------------------------


def _gan_final_ckpt_from(sampler, path):
    from melogan_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(path, {
        "G": {"params": sampler.gen_variables["params"],
              "batch_stats": sampler.gen_variables.get("batch_stats", {})},
        "E_num": {"params": sampler.fe_variables["params"]},
    })


def test_reload_hot_swaps_weights_and_flushes_pool(tmp_path):
    from melogan_tpu.serving.pool import SamplePool

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    donor = Sampler(cfg, seed=7)  # different weights, same shapes
    ckpt = str(tmp_path / "gan_final.ckpt")
    _gan_final_ckpt_from(donor, ckpt)

    pool = SamplePool(sampler, target=4, refill_batch=8, background=False)
    pool.prefill()
    state = AppState(cfg, sampler, pool=pool, ckpt_path=None)
    httpd = make_server("127.0.0.1", 0, build_app(state), server_class=ThreadingWSGIServer)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        before = sampler.sample_notes(["happy"], seed=123)
        status, _, body = req(base, "/reload", {"checkpoint": ckpt})
        assert status == 200
        payload = json.loads(body)
        assert payload["status"] == "ok" and payload["flushed_pool_samples"] >= 16
        # stale pooled samples (old weights) are gone
        assert sum(pool.depth().values()) == 0
        # the running sampler now computes with the donor's weights — same
        # compiled program (weights are jit args), new values
        after = sampler.sample_notes(["happy"], seed=123)
        want = donor.sample_notes(["happy"], seed=123)
        assert np.allclose(after, want) and not np.allclose(after, before)
        # generate still works end-to-end off the swapped weights
        status, _, body = req(base, "/generate", {"emotion": "happy"})
        assert status == 200 and body[:4] == b"MThd"
    finally:
        httpd.shutdown()


def test_reload_missing_checkpoint_404(server):
    base, _ = server
    status, _, body = req(base, "/reload", {"checkpoint": "/nope/gan_final.ckpt"})
    assert status == 404 and "not found" in json.loads(body)["error"]


def test_reload_corrupt_checkpoint_400(server, tmp_path):
    base, _ = server
    bad = tmp_path / "bad.ckpt"
    bad.write_bytes(b"this is not a checkpoint")
    status, _, body = req(base, "/reload", {"checkpoint": str(bad)})
    assert status == 400 and "reload failed" in json.loads(body)["error"]


def test_reload_400s_when_body_read_fails(tmp_path):
    """A connection reset/timeout mid-body on POST /reload must answer 400 —
    NOT fall back to {} and silently reload the default checkpoint (flushing
    the pool) on a half-dead connection (strict _read_json covers read
    failures, not only unparseable JSON)."""
    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    ckpt = str(tmp_path / "gan_final.ckpt")
    _gan_final_ckpt_from(sampler, ckpt)
    state = AppState(cfg, sampler, ckpt_path=ckpt)
    app = build_app(state)

    class _BrokenBody:
        def read(self, n=-1):
            raise ConnectionResetError("client went away mid-body")

    seen = {}

    def start_response(status, headers, exc_info=None):
        seen["status"] = status

    environ = {"REQUEST_METHOD": "POST", "PATH_INFO": "/reload",
               "CONTENT_LENGTH": "40", "wsgi.input": _BrokenBody()}
    body_iter = app(environ, start_response)
    try:
        body = b"".join(body_iter)
    finally:
        close = getattr(body_iter, "close", None)
        if close:
            close()
    assert seen["status"].startswith("400"), (seen, body)
    # no reload happened: the watcher baseline and metrics stay untouched
    assert "melogan_reloads_total" not in state.metrics.render()


# ---------------------------------------------------------------------------
# --watch-ckpt: auto hot-reload on checkpoint mtime change
# ---------------------------------------------------------------------------


def test_watch_checkpoint_swaps_on_mtime_change(tmp_path):
    import os
    import time

    from melogan_tpu.serving.app import watch_checkpoint

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    donor = Sampler(cfg, seed=5)
    ckpt = str(tmp_path / "gan_final.ckpt")
    _gan_final_ckpt_from(sampler, ckpt)  # initial file == current weights
    state = AppState(cfg, sampler, ckpt_path=ckpt)
    watcher = watch_checkpoint(state, interval_secs=0.05)
    try:
        want = donor.sample_notes(["angry"], seed=3)
        _gan_final_ckpt_from(donor, ckpt)  # retrain-in-place
        os.utime(ckpt, (time.time() + 2, time.time() + 2))  # force a new mtime
        deadline = time.time() + 20
        while time.time() < deadline:
            if np.allclose(sampler.sample_notes(["angry"], seed=3), want):
                break
            time.sleep(0.05)
        assert np.allclose(sampler.sample_notes(["angry"], seed=3), want)
    finally:
        watcher.stop.set()


def test_watch_checkpoint_keeps_serving_on_corrupt_file(tmp_path, capsys):
    import os
    import time

    from melogan_tpu.serving.app import watch_checkpoint

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    ckpt = str(tmp_path / "gan_final.ckpt")
    _gan_final_ckpt_from(sampler, ckpt)
    state = AppState(cfg, sampler, ckpt_path=ckpt)
    before = sampler.sample_notes(["calm"], seed=11)
    watcher = watch_checkpoint(state, interval_secs=0.05)
    try:
        with open(ckpt, "wb") as f:  # a torn/garbage write
            f.write(b"garbage not a checkpoint")
        os.utime(ckpt, (time.time() + 2, time.time() + 2))
        seen = ""
        deadline = time.time() + 10
        while time.time() < deadline:
            seen += capsys.readouterr().out
            if "keeping current weights" in seen:
                break
            time.sleep(0.05)
        assert "keeping current weights" in seen
        # the current weights kept serving throughout
        assert np.allclose(sampler.sample_notes(["calm"], seed=11), before)
    finally:
        watcher.stop.set()


def test_watch_checkpoint_picks_up_checkpoint_that_appears_later(tmp_path):
    """serve --watch-ckpt started BEFORE training wrote the checkpoint: the
    watcher hot-loads the file the moment it appears (regression: serve()
    used to silently skip starting the watcher when the path did not exist
    at startup, serving random weights for the whole process lifetime)."""
    import time

    from melogan_tpu.serving.app import watch_checkpoint

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    donor = Sampler(cfg, seed=5)
    ckpt = str(tmp_path / "gan_final.ckpt")  # does not exist yet
    state = AppState(cfg, sampler, ckpt_path=ckpt)
    assert state.loaded_version is None
    watcher = watch_checkpoint(state, interval_secs=0.05)
    try:
        want = donor.sample_notes(["happy"], seed=3)
        _gan_final_ckpt_from(donor, ckpt)  # training completes
        deadline = time.time() + 20
        while time.time() < deadline:
            if np.allclose(sampler.sample_notes(["happy"], seed=3), want):
                break
            time.sleep(0.05)
        assert np.allclose(sampler.sample_notes(["happy"], seed=3), want)
    finally:
        watcher.stop.set()


def test_watch_checkpoint_sees_rewrite_during_warmup(tmp_path):
    """The watcher's skip baseline is the version captured WHEN the weights
    were read (serve() passes it explicitly), so a checkpoint atomically
    rewritten during the minutes-long warm-up window still looks new on the
    first tick — the constructor-time fallback would have recorded the NEW
    file's mtime against the OLD weights and skipped it forever."""
    import os
    import time

    from melogan_tpu.serving.app import watch_checkpoint

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    donor = Sampler(cfg, seed=5)
    ckpt = str(tmp_path / "gan_final.ckpt")
    _gan_final_ckpt_from(sampler, ckpt)
    loaded_version = (ckpt, os.path.getmtime(ckpt))  # captured at load time
    # a retrain job rewrites the checkpoint while serve() is still warming up
    _gan_final_ckpt_from(donor, ckpt)
    os.utime(ckpt, (time.time() + 2, time.time() + 2))
    state = AppState(cfg, sampler, ckpt_path=ckpt, loaded_version=loaded_version)
    watcher = watch_checkpoint(state, interval_secs=0.05)
    try:
        want = donor.sample_notes(["sad"], seed=9)
        deadline = time.time() + 20
        while time.time() < deadline:
            if np.allclose(sampler.sample_notes(["sad"], seed=9), want):
                break
            time.sleep(0.05)
        assert np.allclose(sampler.sample_notes(["sad"], seed=9), want)
    finally:
        watcher.stop.set()


# ---------------------------------------------------------------------------
# Graceful shutdown: in-flight accounting + SIGTERM drain
# ---------------------------------------------------------------------------


def test_inflight_accounting_returns_to_zero(server):
    base, state = server
    assert state.inflight() == 0
    for _ in range(3):
        req(base, "/generate", {"emotion": "sad"})
    # urllib reads the full body before returning, so the tracked body has
    # been closed by the time the client call returns
    deadline = 50
    import time
    for _ in range(deadline):
        if state.inflight() == 0:
            break
        time.sleep(0.1)
    assert state.inflight() == 0


def test_sigterm_drains_and_exits_cleanly(tmp_path):
    """Full lifecycle e2e: a real `serve()` process on CPU gets SIGTERM and
    must stop accepting, drain, close the pool, and exit 0 with the shutdown
    breadcrumbs — a rolling restart must never cut responses mid-body."""
    import signal
    import socket
    import subprocess
    import sys
    import time

    script = """
import sys
sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
from melogan_tpu.config import GANConfig
from melogan_tpu.serving.app import serve
cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
serve(host="127.0.0.1", port={port}, config=cfg, workdir={wd!r})
print("serve() returned", flush=True)
"""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    import os as _os
    env = dict(_os.environ, MELOGAN_SAMPLE_POOL="0", MELOGAN_DEVICE_WARN_SECS="0")
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", script.format(repo=repo, port=port, wd=str(tmp_path))],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        deadline = time.time() + 120
        up = False
        while time.time() < deadline:
            try:
                status, _, _ = req(f"http://127.0.0.1:{port}", "/healthz")
                up = status == 200
                break
            except Exception:
                time.sleep(0.25)
        assert up, "server never came up"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "[SHUTDOWN] all in-flight requests completed" in out
    assert "[SHUTDOWN] bye" in out and "serve() returned" in out


# ---------------------------------------------------------------------------
# Review fixes: stale-refill generation, strict /reload body, label hygiene,
# watcher baseline after POST /reload
# ---------------------------------------------------------------------------


def test_flush_during_inflight_refill_drops_stale_batch():
    """A refill that sampled under the OLD weights must not restock after a
    hot-swap flush: samples from pre-swap weights would otherwise be served
    as output of the new checkpoint."""
    from melogan_tpu.serving.pool import SamplePool

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    pool = SamplePool(sampler, target=4, refill_batch=8, background=False)

    real = sampler.sample_notes

    def sample_then_flush(prompts, seed):
        notes = real(prompts, seed=seed)
        pool.flush()  # checkpoint hot-swap lands while the dispatch is in flight
        return notes

    sampler.sample_notes = sample_then_flush
    try:
        pool._refill(list(pool.emotions))
    finally:
        sampler.sample_notes = real
    assert all(v == 0 for v in pool.depth().values()), "stale batch was stocked"
    # the drain count survives the drop, so the next dispatch sizes correctly
    pool._refill(list(pool.emotions))  # fresh-generation refill stocks fine
    assert all(v > 0 for v in pool.depth().values())


def test_reload_malformed_json_is_400(server):
    base, state = server
    import urllib.request as u

    r = u.Request(base + "/reload", data=b'{"checkpoint": /oops}',
                  headers={"Content-Type": "application/json"}, method="POST")
    try:
        resp = u.urlopen(r, timeout=30)
        status, body = resp.status, resp.read()
    except urllib.error.HTTPError as e:
        status, body = e.code, e.read()
    assert status == 400
    assert "not valid JSON" in json.loads(body)["error"]


def test_metrics_method_label_is_bounded(server):
    base, _ = server
    import http.client
    from urllib.parse import urlparse

    host = urlparse(base)
    conn = http.client.HTTPConnection(host.hostname, host.port, timeout=30)
    # wsgiref forwards arbitrary request-line tokens as REQUEST_METHOD;
    # the metrics label must collapse them instead of minting new series
    conn.request('WEIRDVERB123', "/healthz")
    conn.getresponse().read()
    conn.close()
    _, _, body = req(base, "/metrics")
    text = body.decode()
    assert 'method="other"' in text
    assert "WEIRDVERB123" not in text


def test_watcher_skips_checkpoint_loaded_via_post_reload(tmp_path):
    """POST /reload of a DIFFERENT path must update the watcher baseline —
    the next tick must not redundantly reload-and-flush the new file."""
    import time

    from melogan_tpu.serving.app import watch_checkpoint

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    a, b = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")
    _gan_final_ckpt_from(sampler, a)
    _gan_final_ckpt_from(Sampler(cfg, seed=9), b)
    state = AppState(cfg, sampler, ckpt_path=a)
    watcher = watch_checkpoint(state, interval_secs=0.05)
    try:
        state.reload_checkpoint(b)  # what POST /reload calls
        time.sleep(0.5)  # ~10 watcher ticks
        counts = [v for (name, _), v in state.metrics._counters.items()
                  if name == "melogan_reloads_total"]
        assert counts == [1.0], f"watcher redundantly reloaded: {counts}"
        assert state.ckpt_path == b and state.loaded_version[0] == b
    finally:
        watcher.stop.set()


def test_video_feed_from_y4m_file(tmp_path):
    """Real-footage source: /video_feed streams annotated MJPEG from a .y4m
    clip through the full detect→classify→annotate pipeline."""
    from melogan_tpu.imaging.y4m import write_y4m
    from melogan_tpu.serving.video import SyntheticFrameSource
    from melogan_tpu.imaging.y4m import Y4MFrameSource

    # author a 3-frame clip from the synthetic webcam pattern (face-like blob)
    frames = []
    for i, frame in enumerate(SyntheticFrameSource(n_frames=3)):
        frames.append(frame)
    clip = tmp_path / "cam.y4m"
    with open(clip, "wb") as f:
        write_y4m(f, frames, colorspace="420")

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    state = AppState(cfg, Sampler(cfg, seed=0),
                     frame_source=Y4MFrameSource(str(clip), loop=False))
    httpd = make_server("127.0.0.1", 0, build_app(state), server_class=ThreadingWSGIServer)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        resp = urllib.request.urlopen(f"http://127.0.0.1:{port}/video_feed", timeout=120)
        assert resp.status == 200
        raw = resp.read()  # non-looping clip -> stream terminates
        parts = _read_mjpeg_parts(raw)
        assert len(parts) == 3
        for p in parts:
            assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
        # the pipeline classified the clip and updated the shared state
        assert state.camera_emotion in ("happy", "sad", "angry", "calm",
                                        "surprised", "neutral", "fearful", "disgusted")
    finally:
        httpd.shutdown()


def test_generate_stays_green_across_hot_swaps(tmp_path):
    """Sustained /generate load with checkpoint hot-swaps landing mid-stream:
    every request must succeed (200) — a swap must never surface as a 5xx or
    a torn sample — and post-swap output must come from the new weights."""
    import time

    from melogan_tpu.serving.pool import SamplePool

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    ckpts = []
    for i, seed in enumerate((0, 5, 9)):
        p = str(tmp_path / f"v{i}.ckpt")
        _gan_final_ckpt_from(Sampler(cfg, seed=seed), p)
        ckpts.append(p)
    pool = SamplePool(sampler, target=8, refill_batch=16)
    state = AppState(cfg, sampler, pool=pool, ckpt_path=ckpts[0])
    httpd = make_server("127.0.0.1", 0, build_app(state), server_class=ThreadingWSGIServer)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    results = {"codes": [], "errors": []}
    stop = threading.Event()

    def load():
        while not stop.is_set():
            try:
                status, _, body = req(base, "/generate", {"emotion": "happy"})
                results["codes"].append(status)
                if status == 200:
                    assert body[:4] == b"MThd"  # a whole, valid SMF
            except Exception as e:  # noqa: BLE001
                results["errors"].append(repr(e))

    workers = [threading.Thread(target=load, daemon=True) for _ in range(4)]
    for w in workers:
        w.start()
    try:
        for p in (ckpts[1], ckpts[2], ckpts[1]):
            time.sleep(0.4)
            status, _, body = req(base, "/reload", {"checkpoint": p})
            assert status == 200, body
        time.sleep(0.4)
    finally:
        stop.set()
        for w in workers:
            w.join(timeout=30)
        httpd.shutdown()
        pool.close()
    assert not results["errors"], results["errors"]
    assert results["codes"] and set(results["codes"]) <= {200, 503}, set(results["codes"])
    # 503 only on a pool deadline, which a healthy CPU sampler shouldn't hit
    assert results["codes"].count(503) == 0, f"{results['codes'].count(503)} deadline misses"
    # the served weights really are the last swap target
    want = Sampler(cfg, seed=5).sample_notes(["happy"], seed=77)
    np.testing.assert_allclose(sampler.sample_notes(["happy"], seed=77), want,
                               rtol=1e-5, atol=1e-7)


def test_reload_with_use_ema_serves_ema_weights(tmp_path):
    """AppState(use_ema=True) hot-swaps the EMA generator (G_ema) from a
    checkpoint, not the live weights — and refuses ema-less checkpoints with
    the current weights kept serving."""
    from melogan_tpu.utils.checkpoint import save_checkpoint

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    live_donor = Sampler(cfg, seed=7)
    ema_donor = Sampler(cfg, seed=11)  # stands in for the EMA stream
    ckpt = str(tmp_path / "gan_final.ckpt")
    save_checkpoint(ckpt, {
        "G": {"params": live_donor.gen_variables["params"],
              "batch_stats": live_donor.gen_variables.get("batch_stats", {})},
        "G_ema": {"params": ema_donor.gen_variables["params"],
                  "batch_stats": live_donor.gen_variables.get("batch_stats", {})},
        "E_num": {"params": live_donor.fe_variables["params"]},
    })

    state = AppState(cfg, sampler, ckpt_path=None, use_ema=True)
    state.reload_checkpoint(ckpt)
    got = sampler.sample_notes(["happy"], seed=123)
    want = Sampler(cfg, gen_variables={
        "params": ema_donor.gen_variables["params"],
        "batch_stats": live_donor.gen_variables.get("batch_stats", {})},
        fe_variables=live_donor.fe_variables).sample_notes(["happy"], seed=123)
    assert np.allclose(got, want)

    plain = str(tmp_path / "plain.ckpt")
    _gan_final_ckpt_from(live_donor, plain)
    before = sampler.sample_notes(["happy"], seed=5)
    with pytest.raises(KeyError, match="ema_decay"):
        state.reload_checkpoint(plain)
    after = sampler.sample_notes(["happy"], seed=5)
    assert np.allclose(before, after)  # swap never happened
