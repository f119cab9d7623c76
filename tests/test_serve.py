"""HTTP inference server (cli/serve.py): healthz, binary and JSON infer
round-trips over a real socket against a tiny pipeline."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
from PIL import Image

from genpercept_tpu.cli.serve import build_parser, make_server
from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

from test_pipeline import tiny_models


def _start_server():
    models = tiny_models()
    cfg = PipelineConfig(mode="depth", processing_res=64)
    pipe = GenPerceptPipeline(models, cfg)
    args = build_parser().parse_args(
        ["--checkpoint", "unused", "--mode", "depth", "--port", "0"]
    )
    server = make_server(args, pipe=pipe)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


def _png_bytes(h=48, w=40):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue(), (h, w)


def test_serve_endpoints():
    server, url = _start_server()
    try:
        with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["mode"] == "depth"

        png, (h, w) = _png_bytes()

        # binary npy round-trip
        req = urllib.request.Request(
            url + "/v1/infer?format=npy", data=png,
            headers={"Content-Type": "image/png"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            pred = np.load(io.BytesIO(r.read()))
        assert pred.shape == (h, w)
        assert 0.0 <= float(pred.min()) and float(pred.max()) <= 1.0

        # 16-bit png
        req = urllib.request.Request(
            url + "/v1/infer?format=png16", data=png,
            headers={"Content-Type": "image/png"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            depth_png = np.asarray(Image.open(io.BytesIO(r.read())))
        assert depth_png.shape == (h, w)
        assert depth_png.dtype in (np.uint16, np.int32)  # PIL I;16 readback

        # JSON round-trip
        body = json.dumps({"image_b64": base64.b64encode(png).decode()}).encode()
        req = urllib.request.Request(url + "/v1/infer_json", data=body)
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        arr = np.frombuffer(
            base64.b64decode(out["pred_b64"]), np.float32
        ).reshape(out["shape"])
        np.testing.assert_allclose(arr, pred, atol=1e-6)

        # error path: bad payload -> 500 with JSON error
        req = urllib.request.Request(url + "/v1/infer", data=b"not an image")
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.loads(e.read())
    finally:
        server.shutdown()


def test_serve_data_parallel_micro_batching():
    """VERDICT r2 #8: the serve data-parallel path — a mesh-backed pipeline
    + micro-batching worker — exercised on the virtual 8-device CPU mesh.
    Concurrent requests fuse into one sharded device batch; every request
    still gets its own correctly-shaped prediction."""
    import concurrent.futures

    import jax

    models = tiny_models()
    cfg = PipelineConfig(mode="depth", processing_res=64)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    pipe = GenPerceptPipeline(models, cfg, mesh=mesh)
    args = build_parser().parse_args(
        ["--checkpoint", "unused", "--mode", "depth", "--port", "0",
         "--data_parallel", "--max_batch", "8"]
    )
    server = make_server(args, pipe=pipe)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        png, (h, w) = _png_bytes()

        def post(_):
            req = urllib.request.Request(
                url + "/v1/infer?format=npy", data=png,
                headers={"Content-Type": "image/png"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return np.load(io.BytesIO(r.read()))
        with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
            preds = list(ex.map(post, range(6)))
        for pred in preds:
            assert pred.shape == (h, w)
            assert np.isfinite(pred).all()
        # identical inputs must give identical outputs regardless of how
        # the requests were grouped into device batches
        for pred in preds[1:]:
            np.testing.assert_allclose(pred, preds[0], atol=1e-5)
    finally:
        server.shutdown()
