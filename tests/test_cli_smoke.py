"""End-to-end CLI smoke tests for the L5 application scripts (SURVEY §2.8).

Each reference script has a rebuilt CLI; txt2img already has a dedicated
safety/watermark test — these drive the remaining four with the bundled tiny
random-weight models through a real subprocess (argument parsing, IO layout,
artifact writing), matching the reference's file contracts:

- img2img: SDEdit from an init image (img2img.py:235-262)
- inpaint: *_mask.png pair discovery + composite (inpaint.py:11-98)
- sample_diffusion: bulk npz + throughput log (sample_diffusion.py:108-140)
- knn2img: retrieval-augmented sampling with a local npz index
  (knn2img.py:61-164,357-375)
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, SD_TPU_PLATFORM="cpu")


def run_cli(args, timeout=600):
    proc = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=ENV,
    )
    assert proc.returncode == 0, (proc.stdout[-1500:], proc.stderr[-1500:])
    return proc


def _write_png(path, arr_u8):
    from PIL import Image

    Image.fromarray(arr_u8).save(path)


def test_img2img_cli(tmp_path):
    rng = np.random.default_rng(0)
    init = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    _write_png(tmp_path / "init.png", init)
    run_cli(["scripts/img2img.py", "--tiny", "--steps", "4",
             "--strength", "0.5", "--init-img", str(tmp_path / "init.png"),
             "--outdir", str(tmp_path / "out")])
    outs = list((tmp_path / "out").rglob("*.png"))
    assert outs, "img2img wrote no samples"


def test_inpaint_cli(tmp_path):
    rng = np.random.default_rng(1)
    indir = tmp_path / "in"
    indir.mkdir()
    img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    mask = np.zeros((64, 64, 3), np.uint8)
    mask[16:48, 16:48] = 255
    _write_png(indir / "example.png", img)
    _write_png(indir / "example_mask.png", mask)
    run_cli(["scripts/inpaint.py", "--tiny", "--steps", "2",
             "--indir", str(indir), "--outdir", str(tmp_path / "out")])
    outs = list((tmp_path / "out").rglob("*.png"))
    assert outs, "inpaint wrote no composites"
    # known region must be preserved by the final composite (inpaint.py:96)
    from PIL import Image

    out = np.asarray(Image.open(outs[0]))
    np.testing.assert_array_equal(out[:8, :8], img[:8, :8])


def test_sample_diffusion_cli(tmp_path):
    proc = run_cli(["scripts/sample_diffusion.py", "--tiny", "-n", "4",
                    "--batch_size", "2", "--custom_steps", "2",
                    "-l", str(tmp_path / "out")])
    npz = list((tmp_path / "out").rglob("*.npz"))
    assert npz, "sample_diffusion wrote no npz"
    arr = np.load(npz[0])
    key = list(arr.keys())[0]
    assert arr[key].shape[0] == 4
    assert "throughput" in proc.stdout.lower() or "samples/sec" in proc.stdout


def test_sample_diffusion_class_cond(tmp_path):
    """Class-conditional DDIM sampling with CFG through sample_diffusion —
    the cin256-v2 recipe (ClassEmbedder cond stage, uncond = extra embedding
    row). BASELINE benchmark config: class-cond ImageNet LDM DDIM via
    sample_diffusion."""
    proc = run_cli(["scripts/sample_diffusion.py", "--tiny", "-n", "4",
                    "--batch_size", "2", "--custom_steps", "2",
                    "--classes", "3,7", "--scale", "2.0",
                    "-l", str(tmp_path / "out")])
    npz = list((tmp_path / "out").rglob("*.npz"))
    assert npz, "class-cond sample_diffusion wrote no npz"
    key = "arr_0"
    assert np.load(npz[0])[key].shape[0] == 4
    assert "samples/sec" in proc.stdout.lower()


def test_knn2img_cli_with_index(tmp_path):
    # build a small embedding index the Searcher can load (the tiny RDM
    # config uses a 24-dim context/embedding space)
    from sd_tpu.pipelines.retrieval import build_index

    rng = np.random.default_rng(2)
    part = tmp_path / "part0.npz"
    np.savez(part, embedding=rng.standard_normal((32, 24)).astype(np.float32))
    index_path = tmp_path / "index.npz"
    build_index([str(part)], str(index_path))
    run_cli(["scripts/knn2img.py", "--tiny", "--ddim_steps", "2",
             "--knn", "4", "--use_neighbors",
             "--database", str(index_path),
             "--outdir", str(tmp_path / "out")])
    outs = list((tmp_path / "out").rglob("*.png"))
    assert outs, "knn2img wrote no samples"


def test_serve_stdio(tmp_path):
    """Warm-jit serving daemon: two JSONL requests through one fixed-shape
    compiled program (scripts/serve.py)."""
    import json

    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--tiny", "--stdio",
         "--steps", "2", "--max-batch", "2",
         "--outdir", str(tmp_path / "serve")],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd=REPO, env=ENV,
    )
    reqs = [{"prompt": "a red fox", "seed": 7, "n": 2},
            {"prompt": "a blue bird", "seed": 8}]
    inp = "\n".join(json.dumps(r) for r in reqs) + "\nquit\n"
    out, err = proc.communicate(inp, timeout=540)
    assert proc.returncode == 0, err[-1500:]
    lines = [json.loads(l) for l in out.strip().splitlines()]
    assert len(lines) == 2
    assert lines[0]["ok"] and len(lines[0]["paths"]) == 2
    assert lines[1]["ok"] and len(lines[1]["paths"]) == 1
    assert lines[0]["safety_flagged"] == [False, False]
    for r in lines:
        for p in r["paths"]:
            assert os.path.exists(p)


def test_serve_http_coalescing(tmp_path):
    """Two concurrent HTTP clients coalesce into ONE padded-batch execution
    (scripts/serve.py request batching): same exec_id, batched_requests=2."""
    import json
    import socket
    import threading
    import time as _time
    import urllib.request

    # pick a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--tiny", "--http", str(port),
         "--steps", "2", "--max-batch", "2", "--batch-window", "2000",
         "--outdir", str(tmp_path / "serve")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=ENV,
    )
    try:
        deadline = _time.time() + 420
        while _time.time() < deadline:
            try:
                urllib.request.urlopen(
                    urllib.request.Request(
                        f"http://127.0.0.1:{port}/txt2img",
                        data=json.dumps({"prompt": "warm probe"}).encode(),
                        headers={"Content-Type": "application/json"}),
                    timeout=300).read()
                break
            except OSError:
                _time.sleep(2.0)
        else:
            raise AssertionError("server never came up")

        results = [None, None]

        def client(i, prompt, seed):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/txt2img",
                data=json.dumps({"prompt": prompt, "seed": seed}).encode(),
                headers={"Content-Type": "application/json"})
            results[i] = json.loads(
                urllib.request.urlopen(req, timeout=300).read())

        t1 = threading.Thread(target=client, args=(0, "a red fox", 7))
        t2 = threading.Thread(target=client, args=(1, "a blue bird", 8))
        t1.start(); t2.start(); t1.join(300); t2.join(300)

        a, b = results
        assert a and b and a["ok"] and b["ok"], (a, b)
        assert a["exec_id"] == b["exec_id"], (a["exec_id"], b["exec_id"])
        assert a["batched_requests"] == 2 and b["batched_requests"] == 2
        assert a["paths"] != b["paths"]
        for r in results:
            for p in r["paths"]:
                assert os.path.exists(p)
    finally:
        proc.kill()
        proc.wait()


def test_serve_multi_bucket(tmp_path):
    """Multi-bucket warm serving (scripts/serve.py --bucket): a second
    steps bucket serves without recompile-at-request-time semantics; a
    request naming an unconfigured bucket is rejected with the warm list."""
    import json

    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--tiny", "--stdio",
         "--steps", "2", "--bucket", "@3", "--max-batch", "1",
         "--outdir", str(tmp_path / "serve")],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd=REPO, env=ENV,
    )
    reqs = [{"prompt": "a red fox", "seed": 7},             # default bucket
            {"prompt": "a blue bird", "seed": 8, "steps": 3},  # second bucket
            {"prompt": "nope", "seed": 9, "steps": 4}]      # not configured
    inp = "\n".join(json.dumps(r) for r in reqs) + "\nquit\n"
    out, err = proc.communicate(inp, timeout=540)
    assert proc.returncode == 0, err[-1500:]
    # both buckets were warmed at startup
    assert err.count("serve: warm bucket") == 2, err[-1500:]
    lines = [json.loads(l) for l in out.strip().splitlines()]
    assert len(lines) == 3
    assert lines[0]["ok"] and lines[0]["bucket"]["steps"] == 2
    assert lines[1]["ok"] and lines[1]["bucket"]["steps"] == 3
    assert not lines[2]["ok"] and "no warm bucket" in lines[2]["error"]
    assert "64x64@3" in lines[2]["config"]["buckets"][1]


def test_bench_serve_latency_tool(tmp_path):
    """tools/bench_serve_latency.py drives the real serve.py stdio daemon
    and emits one JSON line with warm min/median latency (the flagship
    serving-latency methodology, smoke-tested on the tiny CPU path)."""
    import json

    env = dict(ENV, SERVE_TINY="1", SERVE_HW="64", SERVE_STEPS="2",
               SERVE_SAMPLER="plms", SERVE_OUTDIR=str(tmp_path / "serve"))
    proc = subprocess.run(
        [sys.executable, "tools/bench_serve_latency.py", "2"],
        capture_output=True, text=True, timeout=540, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-1500:], proc.stderr[-1500:])
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["unit"] == "s/image"
    assert result["value"] > 0
    assert len(result["detail"]["all_s"]) == 2
    assert (tmp_path / "serve").exists()
