"""HTTP serving app.

Route-for-route parity with the reference Flask app (app.py:71-119) on a
dependency-free WSGI stack (Flask is not in this image):

- ``GET  /``                   web UI
- ``POST /get_text_emotion``   {"text": ...} → {"emotion": ...}
- ``GET  /video_feed``         MJPEG camera stream (multipart/x-mixed-replace
                               of annotated JPEG frames from the configured
                               frame source; 503 when no source is configured)
- ``GET  /get_camera_emotion`` latest camera-detected emotion
- ``POST /generate``           {"emotion": ...} → audio/midi download
- ``POST /camera_frame``       raw grayscale frame → emotion (the
                               camera-inference path exposed over HTTP for
                               headless deployments)
- ``GET  /healthz``            liveness + model/backend status

Beyond-reference production surface:

- ``GET  /metrics``            Prometheus text exposition (request counters,
                               latency histograms, pool gauges)
- ``POST /reload``             checkpoint hot-swap into the running sampler
                               (no restart/recompile; pool flushed)

Generation math matches the reference serving path exactly: per-emotion
feature base + N(0, 0.15²) jitter, zeros latent, emotion→bpm/scale maps
(app.py:53-65, 109-110). The generator runs as one jitted XLA program; the
threaded WSGI server shares it safely (JAX dispatch is thread-safe).
"""
from __future__ import annotations

import json
import os
import threading
import time
from typing import Dict, Optional
from wsgiref.simple_server import WSGIServer, make_server
from socketserver import ThreadingMixIn

import numpy as np

from melogan_tpu.config import GANConfig
from melogan_tpu.midi.codec import render_to_bytes
from melogan_tpu.models.text_emotion import backend_info, backend_name, predict_emotion
from melogan_tpu.sampling import EMOTION_BPM, Sampler, emotion_scale


def init_watchdog(what: str, timeout_secs: float) -> threading.Event:
    """Start a daemon timer that prints a diagnostic if the returned event is
    not set within ``timeout_secs``. Device-backend initialization through a
    TPU tunnel can hang indefinitely when the backend is unavailable (no
    exception, no log) — without this, `melogan serve` sits silent and the
    operator has nothing to act on. Set the event once the guarded step
    completes; 0 disables. If the step DOES finish after the warning fired,
    an all-clear is printed — a slow first-ever cold compile (minutes through
    a remote compiler is routine) must not read as a wedged device, and the
    printed guidance must never tempt an operator into killing a healthy
    startup (killing a TPU client can itself wedge the device)."""
    done = threading.Event()
    if timeout_secs <= 0:
        return done

    def watch():
        if done.wait(timeout_secs):
            return
        print(
            f"[WARN] {what} still not finished after {timeout_secs:.0f} s. "
            "Either this is a first-ever COLD COMPILE (routinely minutes "
            "through a remote compiler — wait, an all-clear prints when it "
            "finishes) or the device backend is unavailable (a wedged TPU "
            "tunnel initializes forever without erroring; it self-recovers "
            "— do NOT kill the process to retry, that can wedge the device "
            "further). Serving has NOT started. For degraded CPU serving, "
            "restart with jax_platforms=cpu."
        )
        done.wait()
        print(f"[INFO] all clear: {what} finished — the warning above was a "
              "slow compile, not an unavailable device; serving is starting.")

    threading.Thread(target=watch, name="device-watchdog", daemon=True).start()
    return done


def _device_info() -> Dict[str, object]:
    """Platform/device summary for /healthz. By /healthz time the backend is
    initialized (serve() warmed the sampler before accepting traffic), so
    this never triggers — or blocks on — device initialization itself."""
    import jax

    devices = jax.devices()
    return {
        "platform": devices[0].platform,
        "kind": devices[0].device_kind,
        "count": len(devices),
    }


_UNSET = object()


class AppState:
    def __init__(self, cfg: GANConfig, sampler: Sampler, frame_source=None, pool=None,
                 ckpt_path: Optional[str] = None, loaded_version=_UNSET,
                 use_ema: bool = False):
        from melogan_tpu.serving.metrics import Registry

        self.cfg = cfg
        self.sampler = sampler
        # serve the EMA generator weights (G_ema) from every checkpoint this
        # process loads — startup AND hot-swaps (/reload, --watch-ckpt)
        self.use_ema = use_ema
        self.pool = pool  # optional SamplePool: batched prefetched generation
        self.ckpt_path = ckpt_path  # default target of POST /reload
        self._reload_lock = threading.Lock()  # serializes checkpoint swaps
        # (path, mtime) of the checkpoint the sampler currently serves —
        # the --watch-ckpt watcher's skip baseline, kept current by BOTH
        # reload paths so an operator POST /reload of a new path does not
        # trigger a redundant watcher reload (and pool flush) one tick later.
        # Callers that load weights THEMSELVES (serve()) must pass the
        # version they captured adjacent to the load — the constructor-time
        # getmtime fallback below is only correct when construction happens
        # right after the load (a checkpoint rewritten during a long warm-up
        # window would otherwise be recorded as served without having been
        # read, and the watcher would skip it forever).
        if loaded_version is not _UNSET:
            self.loaded_version: Optional[tuple] = loaded_version
        else:
            self.loaded_version = None
            if ckpt_path:
                try:
                    self.loaded_version = (ckpt_path, os.path.getmtime(ckpt_path))
                except OSError:
                    pass
        self.metrics = Registry()
        if pool is not None:
            # polled at /metrics render time, not on the request path
            self.metrics.gauge_fn(
                "melogan_pool_depth", lambda: pool.depth(),
                help="Pre-generated samples pooled per emotion",
            )
            self.metrics.gauge_fn(
                "melogan_pool_hits_total", lambda: pool.stats()["hits"],
                help="Pool takes served without waiting on a refill",
                typ="counter",  # monotonic; _total is counter-reserved
            )
            self.metrics.gauge_fn(
                "melogan_pool_misses_total", lambda: pool.stats()["misses"],
                help="Pool takes that found their emotion empty",
                typ="counter",
            )
        self.seed_counter = 0
        self._inflight = 0  # requests whose body is not fully written yet
        # camera state behind a lock (the reference's module-global
        # current_emotion race, camera.py:112 / app.py:87-90, fixed here)
        self._lock = threading.Lock()
        self._camera_emotion = "calm"
        self.camera = None  # optional camera inference backend
        try:
            from melogan_tpu.models.xception import load_default_fer

            self.camera = load_default_fer()
        except Exception:  # noqa: BLE001 — camera model optional
            self.camera = None
        # MJPEG source: any (re-)iterable of (H, W, 3) uint8 RGB frames
        self.frame_source = frame_source
        self.camera_pipeline = None
        if frame_source is not None and self.camera is not None:
            from melogan_tpu.camera import CameraEmotion

            self.camera_pipeline = CameraEmotion(fer=self.camera)

    @property
    def camera_emotion(self) -> str:
        with self._lock:
            return self._camera_emotion

    @camera_emotion.setter
    def camera_emotion(self, value: str) -> None:
        with self._lock:
            self._camera_emotion = value

    def next_seed(self) -> int:
        with self._lock:
            self.seed_counter += 1
            return self.seed_counter

    # -- in-flight accounting (graceful drain) ----------------------------

    def request_started(self) -> None:
        with self._lock:
            self._inflight += 1

    def request_finished(self) -> None:
        with self._lock:
            self._inflight -= 1

    def inflight(self) -> int:
        with self._lock:
            return self._inflight

    def reload_checkpoint(self, path: str) -> int:
        """Hot-swap ``path`` into the running sampler; returns how many stale
        pooled samples were flushed. Shared by POST /reload and the
        --watch-ckpt mtime watcher. Raises on unreadable/malformed files
        (the CURRENT weights keep serving — swap happens only after a
        successful load)."""
        from melogan_tpu.train.gan_loop import load_gan_final_full

        with self._reload_lock:
            # mtime read BEFORE the load: if the file is replaced again
            # mid-load, the recorded version is stale and the watcher's next
            # tick sees the newer mtime and reloads — nothing is missed
            try:
                mtime = os.path.getmtime(path)
            except OSError:
                mtime = None
            gen_vars, fe_vars, extras = load_gan_final_full(path, ema=self.use_ema)
            self.sampler.swap_variables(
                gen_vars, fe_vars,
                emotion_features=extras["emotion_features"])
            flushed = self.pool.flush() if self.pool is not None else 0
            self.ckpt_path = path
            # recorded even when the mtime read raced (mtime None): the
            # sampler DOES serve this checkpoint now (healthz provenance),
            # and (path, None) never equals a real (path, mtime), so the
            # watcher simply re-reads it once and records the proper version
            self.loaded_version = (path, mtime)
        self.metrics.counter_inc(
            "melogan_reloads_total", help="Successful checkpoint hot-swaps"
        )
        return flushed


_KNOWN_METHODS = {"GET", "POST", "HEAD", "PUT", "DELETE", "OPTIONS", "PATCH"}


def _method_label(method: str) -> str:
    """Metrics label for the request method: the known HTTP verbs pass
    through, anything else collapses to "other" — REQUEST_METHOD is a
    client-controlled string (wsgiref forwards arbitrary request-line
    tokens), and label values must be neither unbounded nor able to carry
    exposition-breaking characters."""
    return method if method in _KNOWN_METHODS else "other"


def _json_response(start_response, payload, status="200 OK"):
    body = json.dumps(payload).encode()
    start_response(
        status,
        [("Content-Type", "application/json"), ("Content-Length", str(len(body)))],
    )
    return [body]


# JSON request bodies are tiny ({"emotion": ...} / {"text": ...}); cap reads
# so an oversized body cannot balloon per-request memory. /camera_frame
# carries a whole grayscale frame as JSON numbers (~8 bytes/pixel of text,
# ~2.5 MB for 640x480), so it passes its own frame-sized limit.
MAX_JSON_BODY = 1 << 20
MAX_FRAME_BODY = 64 << 20
# how much of an over-limit body we are willing to drain (in chunks) so the
# connection closes cleanly after a 413 — unread socket bytes at close can
# RST away the buffered response. Beyond this the client is hostile; close.
_DRAIN_CAP = 8 << 20


def _read_json(environ, limit: int = MAX_JSON_BODY, strict: bool = False) -> Optional[Dict]:
    """Parse the JSON request body; ``None`` means the declared body exceeds
    ``limit`` (the route should answer 413). A negative/absent/unparsable
    Content-Length reads nothing — this server never reads to socket EOF.
    Unparseable JSON falls back to ``{}`` (read-only routes then use their
    defaults) unless ``strict``, which raises ValueError — mutating routes
    like /reload must 400 rather than silently act on defaults."""
    try:
        length = int(environ.get("CONTENT_LENGTH") or 0)
    except (TypeError, ValueError):
        length = 0
    if length > limit:
        try:
            remaining = min(length, _DRAIN_CAP)
            while remaining > 0:
                chunk = environ["wsgi.input"].read(min(remaining, 1 << 16))
                if not chunk:
                    break
                remaining -= len(chunk)
        except Exception:  # noqa: BLE001
            pass
        return None
    try:
        raw = environ["wsgi.input"].read(length) if length > 0 else b"{}"
    except Exception:  # noqa: BLE001
        # a failed body read (reset/timeout mid-body) must not let a strict
        # (mutating) route act on defaults — same contract as unparseable JSON
        if strict:
            raise ValueError("request body could not be read")
        return {}
    try:
        return json.loads(raw or b"{}")
    except Exception:  # noqa: BLE001
        if strict:
            raise ValueError("request body is not valid JSON")
        return {}


INDEX_HTML = """<!DOCTYPE html>
<html><head><title>Melo-GAN TPU</title>
<style>
 body { font-family: system-ui, sans-serif; max-width: 760px; margin: 2rem auto; }
 button { margin: .3rem; padding: .5rem 1rem; }
 #log { color: #555; white-space: pre-wrap; }
</style></head>
<body>
<h1>Melo-GAN TPU</h1>
<p>Emotion-conditioned MIDI generation. Type how you feel, or pick an emotion.</p>
<textarea id="text" rows="3" cols="60" placeholder="How are you feeling?"></textarea><br>
<button onclick="detect()">Detect emotion from text</button>
<span id="emotion">calm</span><br>
<button onclick="gen('happy')">happy</button>
<button onclick="gen('sad')">sad</button>
<button onclick="gen('angry')">angry</button>
<button onclick="gen('calm')">calm</button>
<button onclick="gen(document.getElementById('emotion').textContent)">generate (detected)</button>
<h3>Camera</h3>
<video id="cam" width="320" height="240" autoplay muted playsinline style="background:#000"></video>
<img id="feed" width="320" height="240" style="display:none;background:#000" alt="server stream"><br>
<button onclick="startCam()">start camera</button>
<button onclick="captureEmotion()">detect emotion from camera</button>
<button onclick="toggleFeed()">server stream (/video_feed)</button>
<span id="camEmotion">-</span>
<div id="log"></div>
<script>
let camStream = null;
async function startCam() {
  try {
    camStream = await navigator.mediaDevices.getUserMedia({video: true});
    document.getElementById('cam').srcObject = camStream;
  } catch (e) {
    document.getElementById('log').textContent = 'camera unavailable: ' + e;
  }
}
function toggleFeed() {
  const img = document.getElementById('feed');
  if (img.style.display === 'none') {
    img.src = '/video_feed';  // MJPEG multipart stream (reference app.py:82-85)
    img.style.display = 'inline';
  } else {
    img.removeAttribute('src');
    img.style.display = 'none';
  }
}
async function captureEmotion() {
  const video = document.getElementById('cam');
  const canvas = document.createElement('canvas');
  canvas.width = 96; canvas.height = 96;
  const ctx = canvas.getContext('2d');
  ctx.drawImage(video, 0, 0, 96, 96);
  const data = ctx.getImageData(0, 0, 96, 96).data;
  const gray = [];
  for (let y = 0; y < 96; y++) {
    const row = [];
    for (let x = 0; x < 96; x++) {
      const i = (y * 96 + x) * 4;
      row.push(0.299 * data[i] + 0.587 * data[i+1] + 0.114 * data[i+2]);
    }
    gray.push(row);
  }
  const r = await fetch('/camera_frame', {method:'POST', headers:{'Content-Type':'application/json'},
    body: JSON.stringify({frame: gray})});
  const j = await r.json();
  document.getElementById('camEmotion').textContent = j.emotion || j.error;
  if (j.emotion) document.getElementById('emotion').textContent = j.emotion;
}
</script>
<script>
async function detect() {
  const r = await fetch('/get_text_emotion', {method:'POST', headers:{'Content-Type':'application/json'},
    body: JSON.stringify({text: document.getElementById('text').value})});
  const j = await r.json();
  document.getElementById('emotion').textContent = j.emotion;
}
async function gen(emotion) {
  document.getElementById('log').textContent = 'generating ' + emotion + '...';
  const r = await fetch('/generate', {method:'POST', headers:{'Content-Type':'application/json'},
    body: JSON.stringify({emotion})});
  const blob = await r.blob();
  const a = document.createElement('a');
  a.href = URL.createObjectURL(blob);
  a.download = 'melo_' + emotion + '.mid';
  a.click();
  document.getElementById('log').textContent = 'downloaded melo_' + emotion + '.mid';
}
</script>
</body></html>
"""


def build_app(state: AppState):
    def app(environ, start_response):
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "/")

        if method == "GET" and path == "/":
            body = INDEX_HTML.encode()
            start_response("200 OK", [("Content-Type", "text/html"), ("Content-Length", str(len(body)))])
            return [body]

        if method == "GET" and path == "/healthz":
            return _json_response(
                start_response,
                {
                    "status": "ok",
                    "text_backend": backend_name(),
                    "text_backend_accuracy": backend_info().get(
                        "measured_eval_accuracy"),
                    # loud accuracy caveat when the lexicon fallback serves
                    # text emotion instead of the go_emotions model
                    "text_backend_note": backend_info()["note"],
                    "camera_backend": "xception" if state.camera else None,
                    "video_feed": state.frame_source is not None,
                    # weight provenance: a serve started before its training
                    # job (or pointed at a missing checkpoint) answers with
                    # random weights until --watch-ckpt / POST /reload swaps
                    # the real ones in — an operator must be able to see that
                    "generator": ("checkpoint" if state.loaded_version
                                  else "random-weights"),
                    "checkpoint": state.ckpt_path,
                    "ema": state.use_ema,
                    "sample_pool": state.pool.stats() if state.pool else None,
                    # which backend actually serves compute — an operator
                    # diagnosing latency (or a post-outage degraded-CPU
                    # restart) should see the platform without a device probe
                    "device": _device_info(),
                },
            )

        if method == "POST" and path == "/get_text_emotion":
            payload = _read_json(environ)
            if payload is None:
                return _json_response(
                    start_response, {"error": "request body too large"},
                    status="413 Content Too Large",
                )
            emotion = predict_emotion(payload.get("text", ""))
            return _json_response(start_response, {"emotion": emotion})

        if method == "GET" and path == "/get_camera_emotion":
            return _json_response(start_response, {"emotion": state.camera_emotion})

        if method == "GET" and path == "/video_feed":
            if state.frame_source is None:
                return _json_response(
                    start_response,
                    {"error": "no camera frame source configured; "
                              "POST grayscale frames to /camera_frame instead"},
                    status="503 Service Unavailable",
                )
            from melogan_tpu.serving.video import BOUNDARY, mjpeg_parts

            start_response(
                "200 OK",
                [("Content-Type", f"multipart/x-mixed-replace; boundary={BOUNDARY}")],
            )

            def _set_emotion(e):
                state.camera_emotion = e

            # cap the stream rate: with an infinite frame source each client
            # otherwise busy-loops detect+annotate+encode on a full host core
            return mjpeg_parts(
                iter(state.frame_source),
                state.camera_pipeline,
                on_emotion=_set_emotion,
                max_fps=float(os.environ.get("MELOGAN_VIDEO_MAX_FPS", "20")),
            )

        if method == "POST" and path == "/camera_frame":
            if state.camera is None:
                return _json_response(
                    start_response,
                    {"error": "camera emotion model not loaded"},
                    status="503 Service Unavailable",
                )
            payload = _read_json(environ, limit=MAX_FRAME_BODY)
            if payload is None:
                return _json_response(
                    start_response, {"error": "request body too large"},
                    status="413 Content Too Large",
                )
            try:
                frame = np.asarray(payload["frame"], dtype=np.float32)
                emotion = state.camera.predict_emotion(frame)
            except Exception as e:  # noqa: BLE001
                return _json_response(
                    start_response, {"error": f"bad frame: {e}"}, status="400 Bad Request"
                )
            state.camera_emotion = emotion
            return _json_response(start_response, {"emotion": emotion})

        if method == "POST" and path == "/generate":
            payload = _read_json(environ)
            if payload is None:
                return _json_response(
                    start_response, {"error": "request body too large"},
                    status="413 Content Too Large",
                )
            emotion = str(payload.get("emotion", "happy")).lower()
            if emotion not in EMOTION_BPM:
                return _json_response(
                    start_response,
                    {"error": f"unknown emotion {emotion!r}; valid: {sorted(EMOTION_BPM)}"},
                    status="400 Bad Request",
                )
            # pooled path: pop a pre-generated fresh sample (no device round
            # trip on the request path — the round-1 p50 was 32 ms of
            # dispatch for 0.55 ms of compute); direct path otherwise
            if state.pool is not None:
                from melogan_tpu.serving.pool import PoolTimeout

                try:
                    notes = state.pool.take(emotion)
                except PoolTimeout as e:
                    # bounded cold path: a persistently failing sampler turns
                    # into a 503 with the producer's last error, not a hang
                    return _json_response(
                        start_response,
                        {"error": str(e), "last_refill_error": e.last_error},
                        status="503 Service Unavailable",
                    )
            else:
                notes = state.sampler.sample_notes([emotion], seed=state.next_seed())[0]
            body = render_to_bytes(
                notes, bpm=EMOTION_BPM[emotion], scale=emotion_scale(emotion)
            )
            start_response(
                "200 OK",
                [
                    ("Content-Type", "audio/midi"),
                    ("Content-Disposition", f'attachment; filename="melo_{emotion}.mid"'),
                    ("Content-Length", str(len(body))),
                ],
            )
            return [body]

        if method == "GET" and path == "/metrics":
            body = state.metrics.render().encode()
            start_response(
                "200 OK",
                [("Content-Type", "text/plain; version=0.0.4; charset=utf-8"),
                 ("Content-Length", str(len(body)))],
            )
            return [body]

        if method == "POST" and path == "/reload":
            # checkpoint hot-swap: re-read the (possibly retrained) checkpoint
            # and swap it into the running sampler — no restart, no recompile
            # (weights are jit arguments; see Sampler.swap_variables). Pooled
            # samples from the old weights are flushed. An explicit
            # {"checkpoint": path} overrides the startup path — this server
            # is an internal ops surface (no auth anywhere, like the
            # reference app); bind accordingly.
            try:
                payload = _read_json(environ, strict=True)
            except ValueError:
                # a mutating op must not silently fall back to the default
                # checkpoint (and flush the pool) on a typo'd body
                return _json_response(
                    start_response, {"error": "request body is not valid JSON"},
                    status="400 Bad Request",
                )
            if payload is None:
                return _json_response(
                    start_response, {"error": "request body too large"},
                    status="413 Content Too Large",
                )
            path_arg = payload.get("checkpoint") or state.ckpt_path
            if not path_arg or not os.path.exists(path_arg):
                return _json_response(
                    start_response,
                    {"error": f"checkpoint not found: {path_arg!r}"},
                    status="404 Not Found",
                )
            try:
                flushed = state.reload_checkpoint(path_arg)
            except Exception as e:  # noqa: BLE001 — a bad file must not kill serving
                return _json_response(
                    start_response,
                    {"error": f"reload failed: {type(e).__name__}: {e}"},
                    status="400 Bad Request",
                )
            return _json_response(
                start_response,
                {"status": "ok", "checkpoint": path_arg, "flushed_pool_samples": flushed},
            )

        return _json_response(start_response, {"error": "not found"}, status="404 Not Found")

    # request instrumentation: counters + latency histograms per KNOWN route
    # (unknown paths collapse into "other" — client-controlled strings must
    # not mint unbounded label values; wsgiref passes ANY request-line token
    # through as REQUEST_METHOD, so methods are normalized the same way by
    # _method_label). /video_feed's handler only SETS UP
    # the stream (the body generator runs for the connection lifetime), so
    # its duration reads as setup time; it is counted but its latency is
    # not meaningful and excluded.
    _ROUTES = {
        "/", "/healthz", "/get_text_emotion", "/get_camera_emotion",
        "/video_feed", "/camera_frame", "/generate", "/metrics", "/reload",
    }

    class _TrackedBody:
        """Wraps the response iterable so in-flight accounting covers the
        whole body write — the WSGI server iterates (and for /video_feed,
        streams) AFTER the handler returns, and calls close() when done or
        when the client disconnects. Graceful drain waits on this count."""

        def __init__(self, body):
            self._body = body
            self._done = False

        def __iter__(self):
            return iter(self._body)

        def close(self):
            if not self._done:
                self._done = True
                state.request_finished()
            closer = getattr(self._body, "close", None)
            if closer is not None:
                closer()

    def instrumented(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        route = path if path in _ROUTES else "other"
        status_box = {"code": "500"}

        def recording_start_response(status, headers, exc_info=None):
            status_box["code"] = status.split(" ", 1)[0]
            return start_response(status, headers, exc_info)

        state.request_started()
        t0 = time.perf_counter()
        try:
            result = app(environ, recording_start_response)
        except BaseException:
            state.request_finished()
            raise
        finally:
            state.metrics.counter_inc(
                "melogan_http_requests_total",
                help="HTTP requests by route/method/status",
                route=route,
                method=_method_label(environ.get("REQUEST_METHOD", "-")),
                status=status_box["code"],
            )
        if route != "/video_feed":
            state.metrics.observe(
                "melogan_http_request_duration_seconds",
                time.perf_counter() - t0,
                help="Handler latency (body build included; streams excluded)",
                route=route,
            )
        return _TrackedBody(result)

    return instrumented


class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
    daemon_threads = True
    # drain policy is ours (bounded, via AppState.inflight) — server_close
    # must never block indefinitely joining a long-lived MJPEG stream thread
    block_on_close = False


def watch_checkpoint(state: AppState, interval_secs: float) -> threading.Thread:
    """Poll the served checkpoint's mtime and hot-swap it when it changes.

    Retrain-in-place deployment: a training job atomically rewrites
    gan_final.ckpt (utils/atomic.py — a partially written file is never
    visible under the final name) and the server picks it up within
    ``interval_secs``, no restart, no recompile, pool flushed. A load
    failure (e.g. a non-atomic writer torn mid-file) keeps the current
    weights serving; that (path, mtime) is recorded as failed, so the retry
    happens when the file changes AGAIN (an atomic replace always lands a
    fresh mtime) — one warning per bad file version, not a hot retry loop.

    The skip baseline is ``state.loaded_version`` — the (path, mtime) the
    sampler actually serves, kept current by BOTH reload paths. That makes
    the watcher correct across ``POST /reload`` of a *different* path: the
    tick after an operator swap sees loaded_version already pointing at the
    new file and does not redundantly reload-and-flush it.

    The returned thread carries a ``stop`` Event: set it to end the watch."""
    stop = threading.Event()

    def _watch():
        last_failed = None  # (path, mtime) of a version that failed to load
        while not stop.wait(interval_secs):
            path = state.ckpt_path
            if not path:
                continue
            try:
                mtime = os.path.getmtime(path)
            except OSError:
                continue  # vanished mid-replace; retry next tick
            version = (path, mtime)
            if version == state.loaded_version or version == last_failed:
                continue
            try:
                flushed = state.reload_checkpoint(path)
                print(f"[RELOAD] checkpoint changed on disk: hot-swapped {path} "
                      f"(flushed {flushed} pooled samples)")
            except Exception as e:  # noqa: BLE001 — keep serving old weights
                last_failed = version
                print(f"[WARN] checkpoint watch: reload of {path} failed "
                      f"({type(e).__name__}: {e}); keeping current weights "
                      f"until the file changes again")

    t = threading.Thread(target=_watch, name="ckpt-watch", daemon=True)
    t.stop = stop  # type: ignore[attr-defined]
    t.start()
    return t


def serve(
    host: str = "0.0.0.0",
    port: int = 5000,
    workdir: str = ".",
    config: str = "configs/gan.yaml",
    checkpoint: Optional[str] = None,
    fast_math: bool = False,
    camera_source: Optional[str] = None,
    dp: int = 0,
    watch_ckpt: float = 0.0,
    use_ema: bool = False,
):
    """``camera_source``: None (no /video_feed), "synthetic" (built-in test
    pattern), or a path to a YUV4MPEG2 file — real footage, looped (also via
    MELOGAN_CAMERA_SOURCE). A live capture device would plug in as any
    iterable of RGB frames.
    ``dp``: data-parallel device count for the sample step — pool refill
    batches shard over a dp-device 'data' mesh (values match single-device
    up to reduction order, deterministic run-to-run; see Sampler).
    ``watch_ckpt``: poll interval in seconds for checkpoint auto-reload
    (0 = off); see :func:`watch_checkpoint`."""
    # `config` may be an already-resolved GANConfig (the CLI resolves paths
    # workdir/repo-root-aware via _load_cfg, so `melogan precompile` and
    # `melogan serve` are guaranteed to build the SAME config — a mismatch
    # would silently waste every warmed program) or a path for direct callers
    if isinstance(config, GANConfig):
        cfg = config
    else:
        cfg = GANConfig.from_yaml(config) if os.path.exists(config) else GANConfig()
    gen_vars = fe_vars = None
    emotion_features = None
    loaded_version = None
    ckpt_path = checkpoint or os.path.join(workdir, cfg.checkpoint_dir, "gan_final.ckpt")
    if os.path.exists(ckpt_path):
        from melogan_tpu.train.gan_loop import load_gan_final_full

        # version captured ADJACENT to the load (mtime read before, same
        # convention as reload_checkpoint): warm-up below can take minutes,
        # and a checkpoint rewritten during that window must look NEW to the
        # --watch-ckpt watcher, not already-served
        try:
            loaded_version = (ckpt_path, os.path.getmtime(ckpt_path))
        except OSError:
            pass
        gen_vars, fe_vars, extras = load_gan_final_full(ckpt_path, ema=use_ema)
        emotion_features = extras["emotion_features"]
        print(f"[INIT] loaded GAN checkpoint from {ckpt_path}"
              + (" (EMA weights)" if use_ema else "")
              + ("" if emotion_features is None
                 else " (corpus-calibrated conditioning)"))
    else:
        print(f"[WARN] GAN checkpoint not found at {ckpt_path}; serving random weights"
              + (" until it appears" if watch_ckpt > 0 else ""))

    # first device touch below can hang forever on a wedged TPU tunnel —
    # surface that instead of sitting silent (MELOGAN_DEVICE_WARN_SECS=0 off;
    # default 300 s sits above routine cold-compile latency)
    try:
        warn_secs = float(os.environ.get("MELOGAN_DEVICE_WARN_SECS", "300"))
    except ValueError:  # '' / 'off' — a diagnostics knob must not kill serve
        warn_secs = 0.0
    ready = init_watchdog("device init + first XLA compile", warn_secs)
    mesh = None
    if dp:
        from melogan_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=dp)
    sampler = Sampler(cfg, gen_variables=gen_vars, fe_variables=fe_vars,
                      fast_math=fast_math, mesh=mesh,
                      emotion_features=emotion_features)
    # warm the XLA program before accepting traffic
    sampler.sample_notes(["happy"], seed=0)
    ready.set()
    source = camera_source or os.environ.get("MELOGAN_CAMERA_SOURCE")
    frame_source = None
    if source == "synthetic":
        from melogan_tpu.serving.video import SyntheticFrameSource

        frame_source = SyntheticFrameSource()
    elif source:
        # real footage: a YUV4MPEG2 file (`ffmpeg -i clip.mp4 clip.y4m`),
        # looped so a short clip behaves like a webcam. Header is validated
        # here — a bad path fails startup, not the first /video_feed viewer.
        from melogan_tpu.imaging.y4m import Y4MFrameSource

        frame_source = Y4MFrameSource(source, loop=True)
        print(f"[INIT] camera source: {source} "
              f"({frame_source.width}x{frame_source.height} y4m, looped)")
    pool = None
    if os.environ.get("MELOGAN_SAMPLE_POOL", "1") != "0":
        from melogan_tpu.serving.pool import SamplePool

        pool = SamplePool(sampler)
        pool.prefill(timeout=120.0)
        print("[INIT] sample pool prefilled:", pool.depth())
        if os.environ.get("MELOGAN_POOL_WARM", "1") != "0":
            # pre-compile the adaptive refill ladder in the background so a
            # load ramp never pays a first-contact XLA compile mid-request
            # (persistent-cached across restarts); /healthz shows progress
            pool.warm_async()
            print(f"[INIT] warming refill batch sizes {pool.warm_sizes()} in background")
    # ckpt_path stays set even when the file does not exist yet: POST /reload
    # without a body answers 404 until it appears, and the --watch-ckpt
    # watcher (whose loop already tolerates a missing file) hot-loads it the
    # moment training writes it — a serve started BEFORE its training job
    # must not silently serve random weights forever
    state = AppState(cfg, sampler, frame_source=frame_source, pool=pool,
                     ckpt_path=ckpt_path, loaded_version=loaded_version,
                     use_ema=use_ema)
    if watch_ckpt > 0:
        watch_checkpoint(state, watch_ckpt)
        print(f"[INIT] watching {state.ckpt_path} for changes every {watch_ckpt:g}s")
    httpd = make_server(host, port, build_app(state), server_class=ThreadingWSGIServer)

    # graceful shutdown: SIGTERM/SIGINT stop the accept loop, then in-flight
    # requests get a bounded drain window before the process exits — a
    # rolling restart must not cut responses mid-body. shutdown() must run
    # OFF the main thread: the handler interrupts serve_forever's own loop,
    # which is what shutdown() waits on.
    def _on_signal(signum, frame):
        print(f"[SHUTDOWN] signal {signum}: stopping accept loop, draining "
              f"in-flight requests (max {drain_secs:g}s)")
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        drain_secs = float(os.environ.get("MELOGAN_DRAIN_SECS", "10"))
    except ValueError:
        drain_secs = 10.0
    import signal as _signal

    try:
        _signal.signal(_signal.SIGTERM, _on_signal)
        _signal.signal(_signal.SIGINT, _on_signal)
    except ValueError:
        pass  # not the main thread (embedded/test callers) — no signal hooks

    print(f"[INIT] serving on http://{host}:{port} (text backend: {backend_name()})")
    httpd.serve_forever()
    deadline = time.monotonic() + drain_secs
    while state.inflight() > 0 and time.monotonic() < deadline:
        time.sleep(0.05)
    remaining = state.inflight()
    if remaining:
        print(f"[SHUTDOWN] drain window elapsed with {remaining} request(s) "
              "still streaming; closing anyway")
    else:
        print("[SHUTDOWN] all in-flight requests completed")
    if pool is not None:
        pool.close()
    httpd.server_close()
    print("[SHUTDOWN] bye")
