"""Persistent txt2img serving daemon (warm-jit, fixed serving shape).

The reference repo has no serving story beyond one-shot CLIs; on TPU the
expensive part of a request is the program compile, so a production server
must pin ONE serving configuration (resolution, steps, sampler, batch) at
startup, compile once, and keep the program warm. This daemon does exactly
that:

    python scripts/serve.py --tiny --stdio            # JSONL on stdin/stdout
    python scripts/serve.py --http 8000 --ckpt ...    # stdlib HTTP endpoint

Requests are JSON objects:
{"prompt": "...", "seed": 1234, "n": 1, "negative_prompt": "...",
 "steps": 20, "height": 256, "width": 256}
(``n`` up to --max-batch; the fixed-batch program is padded so every
request hits the same compiled executable). ``steps``/``height``/``width``
must name a warm bucket: the startup configuration is bucket 0 and each
repeatable ``--bucket HxW@STEPS`` adds another, compiled once at warmup
(the pipeline's program cache keys on the static shape, so buckets stay
warm side by side). Concurrent requests within ``--batch-window`` ms
coalesce per bucket into ONE padded execution (per-request seeds
preserved via per-request host-drawn ``x_T`` noise); responses carry
``exec_id``/``batched_requests``/``bucket`` so clients can observe
sharing.
Responses carry the written PNG paths plus safety-checker flags. Safety
checker + invisible watermark run by default, matching the reference
output contract (``scripts/txt2img.py:69-95,317-343``).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--stdio", action="store_true",
                   help="serve JSONL requests on stdin, responses on stdout")
    p.add_argument("--http", type=int, default=0, metavar="PORT",
                   help="serve HTTP POST /txt2img on this port")
    p.add_argument("--outdir", type=str, default="outputs/serve")
    p.add_argument("--H", "--height", dest="H", type=int, default=512)
    p.add_argument("--W", "--width", dest="W", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sampler", choices=["plms", "ddim", "dpm"],
                   default="plms")
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--max-batch", dest="max_batch", type=int, default=1,
                   help="fixed serving batch; requests are padded to it")
    p.add_argument("--bucket", action="append", default=None,
                   metavar="HxW@STEPS",
                   help="additional warm serving bucket (repeatable), e.g. "
                        "--bucket 256x256@20. '@STEPS' alone keeps the "
                        "default resolution; 'HxW' alone keeps --steps. "
                        "Requests may pick a bucket via height/width/steps "
                        "fields; each bucket compiles once at warmup.")
    p.add_argument("--batch-window", dest="batch_window", type=float,
                   default=10.0,
                   help="ms to wait coalescing concurrent requests into one "
                        "padded-batch execution")
    p.add_argument("--config", type=str, default=None,
                   help="model config yaml (default: the run dir's dumped "
                        "config for run-dir --ckpt, else "
                        "configs/stable-diffusion/v1-inference.yaml)")
    p.add_argument("--ckpt", type=str)
    p.add_argument("--tiny", action="store_true",
                   help="bundled tiny random-weight model (testing)")
    p.add_argument("--no-warmup", dest="warmup", action="store_false",
                   help="skip the compile-warming request at startup")
    p.add_argument("--no-watermark", dest="watermark", action="store_false")
    p.add_argument("--no-safety", dest="safety", action="store_false")
    p.add_argument("--safety_ckpt", type=str)
    return p.parse_args()


def parse_buckets(opt):
    """Warm serving buckets [(H, W, steps), ...]; the --H/--W/--steps
    configuration is always bucket 0. '--bucket 256x256@20' adds one;
    '@20' keeps the default resolution, '256x256' keeps --steps."""
    buckets = [(opt.H, opt.W, opt.steps)]
    for spec in opt.bucket or []:
        hw, _, st = spec.partition("@")
        h, w = (opt.H, opt.W)
        if hw:
            hs, _, ws = hw.partition("x")
            h, w = int(hs), int(ws or hs)
        steps = int(st) if st else opt.steps
        if (h, w, steps) not in buckets:
            buckets.append((h, w, steps))
    return buckets


def build_pipeline(opt):
    from sd_tpu.pipelines.build import build_txt2img_pipeline

    opt.buckets = parse_buckets(opt)
    # watermark applied in Server.handle AFTER slicing off batch padding
    # (host-side DWT on discarded pad images is pure waste)
    pipe, tiny_hw = build_txt2img_pipeline(
        tiny=opt.tiny, config=opt.config, ckpt=opt.ckpt,
        safety=opt.safety, safety_ckpt=opt.safety_ckpt,
        watermark=False, min_hw=min(min(h, w) for h, w, _ in opt.buckets))
    if tiny_hw:
        # clamp every bucket to the tiny model's resolution, dedupe in order
        seen, clamped = set(), []
        for h, w, s in opt.buckets:
            b = (min(h, tiny_hw), min(w, tiny_hw), s)
            if b not in seen:
                seen.add(b)
                clamped.append(b)
        opt.buckets = clamped
        opt.H, opt.W = opt.buckets[0][:2]
    return pipe


class Server:
    """Fixed-shape warm server with request coalescing.

    Concurrent requests arriving within ``--batch-window`` ms are packed
    into ONE padded ``--max-batch`` execution (a dedicated worker thread
    owns the device; HTTP handler threads block on their slot). Per-request
    seeds are preserved under coalescing: each request's initial latent
    noise ``x_T`` is drawn host-side from ITS seed and concatenated, so the
    same (prompt, seed) reproduces the same image regardless of which other
    requests shared the batch. The in-loop sampler rng (eta>0 DDIM) uses
    the first request's seed — PLMS/DDIM-eta0 defaults are unaffected.
    """

    def __init__(self, opt):
        import queue
        import threading

        import jax

        self.opt = opt
        self.pipe = build_pipeline(opt)
        self.jax = jax
        self.watermark_opt = opt.watermark  # per-bucket DWT floor in _run_batch
        os.makedirs(opt.outdir, exist_ok=True)
        # continue numbering after any previous run's images (restart must
        # not clobber paths already handed to clients) — use max numeric stem,
        # not the file count: gaps or foreign files would otherwise reuse an
        # index that still exists on disk
        stems = [int(os.path.splitext(f)[0]) for f in os.listdir(opt.outdir)
                 if os.path.splitext(f)[0].isdigit()]
        self.count = max(stems) + 1 if stems else 0
        self.exec_count = 0
        self._queue = queue.Queue()
        self._pending = None  # overflow item held for the next batch
        self._worker = threading.Thread(target=self._work, daemon=True)
        self._worker.start()
        if opt.warmup:
            for bucket in opt.buckets:
                t0 = time.perf_counter()
                self._run_batch([{"prompt": "warmup", "n": opt.max_batch,
                                  "seed": 0, "negative": None,
                                  "bucket": bucket,
                                  "event": None, "resp": {}}])
                h, w, s = bucket
                print(f"serve: warm bucket {h}x{w}@{s} (compile+first "
                      f"batch {time.perf_counter() - t0:.1f}s)",
                      file=sys.stderr, flush=True)
            self.exec_count = 0

    # ------------------------------------------------------------- request
    def handle(self, req: dict) -> dict:
        import threading

        # the serving configurations are fixed at startup (the warm
        # --bucket list plus sampler/scale) — reject requests that try to
        # override anything else rather than silently serving them with the
        # pinned settings
        unsupported = sorted(set(req)
                             - {"prompt", "seed", "n", "negative_prompt",
                                "height", "width", "steps"})
        if unsupported:
            return {"ok": False,
                    "error": f"unsupported request fields {unsupported}; "
                    f"this server pins the sampling configuration at startup",
                    "config": self.effective_config()}
        d_h, d_w, d_s = self.opt.buckets[0]
        bucket = (int(req.get("height", d_h)), int(req.get("width", d_w)),
                  int(req.get("steps", d_s)))
        if bucket not in self.opt.buckets:
            return {"ok": False,
                    "error": f"no warm bucket {bucket[0]}x{bucket[1]}@"
                    f"{bucket[2]}; configure it at startup with --bucket",
                    "config": self.effective_config()}
        n_req = int(req.get("n", 1))
        n = max(1, min(n_req, self.opt.max_batch))
        item = {"prompt": req.get("prompt", ""), "n": n,
                "seed": int(req.get("seed", 42)),
                "negative": req.get("negative_prompt"), "bucket": bucket,
                "event": threading.Event(), "resp": {}}
        self._queue.put(item)
        item["event"].wait()
        resp = item["resp"]
        if n != n_req:
            resp["n_clamped"] = n
        return resp

    # -------------------------------------------------------------- worker
    def _work(self):
        while True:
            first = self._pending or self._queue.get()
            self._pending = None
            batch, slots = [first], first["n"]
            deadline = time.monotonic() + self.opt.batch_window / 1000.0
            while slots < self.opt.max_batch:
                wait = deadline - time.monotonic()
                if wait <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=wait)
                except Exception:  # queue.Empty
                    break
                if (slots + nxt["n"] > self.opt.max_batch
                        or nxt["bucket"] != first["bucket"]):
                    self._pending = nxt  # head of the next batch
                    break
                batch.append(nxt)
                slots += nxt["n"]
            try:
                self._run_batch(batch)
            except Exception as e:  # noqa: BLE001 — serve loop must survive
                for it in batch:
                    it["resp"] = {"ok": False,
                                  "error": f"{type(e).__name__}: {e}"}
                    if it["event"] is not None:
                        it["event"].set()

    def _noise(self, seed, n, h, w):
        pipe = self.pipe
        shape = (n, h // pipe.downsample, w // pipe.downsample,
                 pipe.latent_channels)
        return self.jax.random.normal(self.jax.random.PRNGKey(seed), shape)

    def _run_batch(self, batch):
        import numpy as np

        from sd_tpu.utils.image import save_image

        opt = self.opt
        jnp = self.jax.numpy
        h, w, steps = batch[0]["bucket"]
        prompts, negs, noises = [], [], []
        for it in batch:
            prompts += [it["prompt"]] * it["n"]
            negs += [it["negative"] or ""] * it["n"]
            noises.append(self._noise(it["seed"], it["n"], h, w))
        pad = opt.max_batch - len(prompts)
        if pad:
            prompts += [""] * pad
            negs += [""] * pad
            noises.append(self._noise(0, pad, h, w))
        t0 = time.perf_counter()
        imgs = self.pipe(
            prompts, self.jax.random.PRNGKey(batch[0]["seed"]),
            negative_prompts=negs, height=h, width=w,
            steps=steps, guidance_scale=opt.scale, sampler=opt.sampler,
            x_T=jnp.concatenate(noises, axis=0))
        dt = time.perf_counter() - t0
        self.exec_count += 1
        flags = getattr(self.pipe, "last_safety_flags", None)
        off = 0
        for it in batch:
            n = it["n"]
            sl = imgs[off:off + n]
            if self.watermark_opt and min(h, w) >= 32:  # DWT capacity floor
                from sd_tpu.utils.watermark import embed_watermark_batch

                sl = embed_watermark_batch(np.asarray(sl))
            paths = []
            for img in sl:
                path = os.path.join(opt.outdir, f"{self.count:06}.png")
                save_image(img, path)
                paths.append(path)
                self.count += 1
            it["resp"] = {
                "ok": True, "paths": paths, "seconds": round(dt, 3),
                "safety_flagged": [bool(f) for f in flags[off:off + n]]
                if flags is not None else [],
                "config": self.effective_config(),
                "bucket": {"H": h, "W": w, "steps": steps},
                "exec_id": self.exec_count,
                "batched_requests": len(batch),
            }
            off += n
            if it["event"] is not None:
                it["event"].set()

    def effective_config(self) -> dict:
        opt = self.opt
        return {"H": opt.H, "W": opt.W, "steps": opt.steps,
                "sampler": opt.sampler, "scale": opt.scale,
                "max_batch": opt.max_batch,
                "batch_window_ms": opt.batch_window,
                "buckets": [f"{h}x{w}@{s}" for h, w, s in opt.buckets]}


def serve_stdio(server):
    print("serve: ready", file=sys.stderr, flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line == "quit":
            break
        try:
            req = json.loads(line)
            resp = server.handle(req)
        except Exception as e:  # noqa: BLE001 — protocol boundary
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(resp), flush=True)


def serve_http(server, port):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/txt2img":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                resp = server.handle(req)
            except Exception as e:  # noqa: BLE001 — protocol boundary
                resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            body = json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    print(f"serve: http on :{port}", file=sys.stderr, flush=True)
    # threading server: handler threads block on their batch slot while the
    # worker coalesces concurrent requests into one padded execution
    ThreadingHTTPServer(("127.0.0.1", port), Handler).serve_forever()


def main():
    opt = parse_args()
    server = Server(opt)
    if opt.http:
        serve_http(server, opt.http)
    else:
        serve_stdio(server)


if __name__ == "__main__":
    main()
