#!/usr/bin/env python3
"""Live serving smoke: launch `melogan serve` and validate every route.

Reproducible version of the round-2/3 ad-hoc serving smokes: starts the
real server (TPU if available) against a trained workdir, exercises the
full ops surface, runs a short sustained load, hot-swaps the checkpoint,
and prints ONE JSON summary line (exit 1 on any failure).

Routes covered (serving/app.py): GET / /healthz /get_camera_emotion
/video_feed /metrics, POST /get_text_emotion /camera_frame /generate
/reload.

Usage:
    python scripts/serve_smoke.py WORKDIR [--port 5099] [--clients 4]
        [--secs 15] [--fast-math]
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EMOTIONS = ("happy", "sad", "angry", "calm")


def req(url, data=None, timeout=30.0, raw=False):
    r = urllib.request.Request(
        url,
        data=None if data is None else json.dumps(data).encode(),
        headers={} if data is None else {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(r, timeout=timeout) as resp:
        body = resp.read()
        return resp.status, (body if raw else json.loads(body) if body[:1] in (b"{", b"[") else body)


def read_mjpeg_frames(url, n=3, timeout=60.0):
    """Pull n JPEG frames off the multipart stream; returns frame sizes."""
    sizes = []
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        buf = b""
        deadline = time.time() + timeout
        while len(sizes) < n and time.time() < deadline:
            chunk = resp.read(65536)
            if not chunk:
                break
            buf += chunk
            while True:
                s = buf.find(b"\xff\xd8")
                e = buf.find(b"\xff\xd9", s + 2)
                if s == -1 or e == -1:
                    break
                sizes.append(e + 2 - s)
                buf = buf[e + 2:]
    return sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--port", type=int, default=5099)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--secs", type=float, default=15.0)
    ap.add_argument("--fast-math", action="store_true")
    args = ap.parse_args()

    base = f"http://127.0.0.1:{args.port}"
    env = dict(os.environ, MELOGAN_CAMERA_SOURCE="synthetic")
    cmd = [sys.executable, "-m", "melogan_tpu.cli", "serve",
           "--host", "127.0.0.1", "--port", str(args.port),
           "--workdir", args.workdir]
    if args.fast_math:
        cmd.append("--fast-math")
    proc = subprocess.Popen(cmd, env=env, cwd=REPO,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    result = {"ok": False, "checks": {}, "load": None}
    failures = []

    def check(name, fn):
        try:
            out = fn()
            result["checks"][name] = out if out is not None else "ok"
        except Exception as e:  # noqa: BLE001
            result["checks"][name] = f"FAIL: {e}"
            failures.append(name)

    try:
        # readiness: healthz answers once the device warm-up path is up
        deadline = time.time() + 600
        last = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise SystemExit(f"server exited early rc={proc.returncode}: "
                                 f"{proc.stdout.read().decode()[-2000:]}")
            try:
                st, h = req(f"{base}/healthz", timeout=5)
                if st == 200:
                    break
            except Exception as e:  # noqa: BLE001
                last = e
            time.sleep(1.0)
        else:
            raise SystemExit(f"server never became ready: {last}")
        result["healthz"] = h

        check("index", lambda: None if req(base + "/")[0] == 200 else 1 / 0)
        check("text_emotion", lambda: req(base + "/get_text_emotion",
                                          {"text": "what a wonderful sunny day"})[1])
        check("camera_emotion", lambda: req(base + "/get_camera_emotion")[1])

        def gen_all():
            out = {}
            for e in EMOTIONS:
                st, body = req(base + "/generate", {"emotion": e}, raw=True, timeout=60)
                assert st == 200 and body[:4] == b"MThd", (e, st, body[:16])
                out[e] = len(body)
            return out
        check("generate_all_emotions", gen_all)
        check("generate_bad_emotion", lambda: (
            None if _expect_status(base + "/generate", {"emotion": "bored"}, 400) else 1 / 0))
        frame = [[((x + y) % 256) / 255.0 for x in range(48)] for y in range(48)]
        check("camera_frame", lambda: req(base + "/camera_frame",
                                          {"frame": frame}, timeout=120)[1])
        check("video_feed", lambda: read_mjpeg_frames(base + "/video_feed", n=3))
        check("metrics", lambda: _metrics_has(base))

        # sustained load
        stop = time.time() + args.secs
        lat, errs = [], [0]

        def worker(i):
            n = 0
            while time.time() < stop:
                t0 = time.perf_counter()
                try:
                    st, body = req(base + "/generate",
                                   {"emotion": EMOTIONS[n % 4]}, raw=True, timeout=30)
                    if st != 200 or body[:4] != b"MThd":
                        errs[0] += 1
                except Exception:  # noqa: BLE001
                    errs[0] += 1
                lat.append((time.perf_counter() - t0) * 1e3)
                n += 1

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(args.clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dur = time.time() - t0
        lat.sort()
        if lat:
            result["load"] = {
                "requests": len(lat), "errors": errs[0],
                "req_per_sec": round(len(lat) / dur, 1),
                "p50_ms": round(lat[len(lat) // 2], 2),
                "p90_ms": round(lat[int(len(lat) * 0.9)], 2),
                "p99_ms": round(lat[min(int(len(lat) * 0.99), len(lat) - 1)], 2),
            }
        if errs[0]:
            failures.append("load_errors")

        # checkpoint hot-swap under the same process
        ckpt = os.path.join(args.workdir, "experiments", "gan", "checkpoints",
                            "gan_final.ckpt")
        if os.path.exists(ckpt):
            os.utime(ckpt)
            check("reload", lambda: req(base + "/reload", {})[1])
            check("generate_after_reload", gen_all)

        result["ok"] = not failures
        result["failures"] = failures
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


def _expect_status(url, data, want):
    try:
        st, _ = req(url, data)
        return st == want
    except urllib.error.HTTPError as e:
        return e.code == want


def _metrics_has(base):
    st, body = req(base + "/metrics", raw=True)
    text = body.decode()
    assert st == 200 and "melogan_http_requests_total" in text, text[:200]
    return sum(1 for line in text.splitlines() if line and not line.startswith("#"))


if __name__ == "__main__":
    main()
