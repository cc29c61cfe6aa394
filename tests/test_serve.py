"""HTTP serving front end (mies_tpu/serve.py): warm-compiled /enhance,
health/config introspection, per-request fault isolation."""

import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

from mies_tpu.pipeline.config import PipelineConfig


@pytest.fixture(scope="module")
def server():
    from mies_tpu.serve import make_server

    cfg = PipelineConfig.make(
        [("clahe", {"clip_limit": 2.0, "grid_size": (4, 4)}),
         ("adjust_gamma", {"gamma": 0.9})],
        name="serve-test",
    )
    srv = make_server(cfg, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _png_bytes(rng, shape=(64, 64)) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (rng.random(shape) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, body, ctype="image/png"):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    return urllib.request.urlopen(req, timeout=120)


def test_healthz_and_config(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["pipeline"] == "serve-test"
    with urllib.request.urlopen(server + "/config", timeout=30) as r:
        c = json.loads(r.read())
    assert c["pipeline"][0]["op"] == "clahe"


def test_enhance_png_roundtrip(server, rng):
    from PIL import Image

    from mies_tpu.pipeline.compiler import compile_pipeline
    import jax.numpy as jnp

    png = _png_bytes(rng)
    with _post(server + "/enhance", png) as r:
        assert r.headers["Content-Type"] == "image/png"
        out = np.asarray(Image.open(io.BytesIO(r.read())))
    assert out.shape == (64, 64) and out.dtype == np.uint8

    # same pixels as the library path (the server IS enhance_image)
    src = np.asarray(Image.open(io.BytesIO(png))).astype(np.float32)
    cfg = PipelineConfig.make(
        [("clahe", {"clip_limit": 2.0, "grid_size": (4, 4)}),
         ("adjust_gamma", {"gamma": 0.9})],
        name="serve-test",
    )
    # raw-uint8 ingest path: the compiled chain normalizes on device
    ref = np.asarray(
        compile_pipeline(cfg, donate=False)(
            jnp.asarray(src.astype(np.uint8))
        )
    )
    np.testing.assert_array_equal(out, ref)

    # the shape is now recorded in /healthz
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert [64, 64] in json.loads(r.read())["compiled_shapes"]


def test_enhance_metrics_header(server, rng):
    with _post(
        server + "/enhance?metrics=psnr,ssim", _png_bytes(rng)
    ) as r:
        m = json.loads(r.headers["X-Mies-Metrics"])
    assert set(m) == {"psnr", "ssim"} and np.isfinite(m["psnr"])


def test_enhance_dicom_by_filename(server, rng, tmp_path):
    from mies_tpu.io.dicom import write_dicom

    hu = rng.integers(-200, 1200, (32, 32)).astype(np.int16)
    p = tmp_path / "s.dcm"
    write_dicom(p, hu)
    with _post(
        server + "/enhance?filename=s.dcm", p.read_bytes(),
        ctype="application/octet-stream",
    ) as r:
        assert r.headers["Content-Type"] == "image/png"
        assert len(r.read()) > 0


def test_bad_requests_isolated(server, rng):
    # garbage body -> 400 with an error payload, server stays up
    try:
        _post(server + "/enhance", b"not an image")
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())
    # empty body
    try:
        _post(server + "/enhance", b"")
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown route
    try:
        urllib.request.urlopen(server + "/nope", timeout=30)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    # and a good request still works after the failures
    with _post(server + "/enhance", _png_bytes(rng)) as r:
        assert r.status == 200


class TestArtifactMode:
    @pytest.fixture(scope="class")
    def artifact_server(self, tmp_path_factory):
        from mies_tpu.pipeline.export import export_pipeline, load_exported
        from mies_tpu.serve import make_server

        cfg = PipelineConfig.make(
            [("adjust_gamma", {"gamma": 0.9}),
             ("unsharp_mask", {"radius": 1.0, "amount": 0.5})],
            name="artifact-test",
        )
        p = export_pipeline(
            cfg, tmp_path_factory.mktemp("a") / "c.mies", shape=(64, 64))
        fn, hdr = load_exported(p)
        srv = make_server(cfg, host="127.0.0.1", port=0,
                          artifact_fn=fn, artifact_header=hdr)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()
        srv.server_close()

    def test_enhance_via_artifact(self, artifact_server, rng):
        from PIL import Image

        r = _post(artifact_server + "/enhance", _png_bytes(rng))
        assert r.status == 200
        out = np.asarray(Image.open(io.BytesIO(r.read())))
        assert out.shape == (64, 64) and out.dtype == np.uint8

    def test_healthz_reports_artifact_mode(self, artifact_server):
        with urllib.request.urlopen(
                artifact_server + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["mode"] == "artifact"

    def test_shape_mismatch_is_400_with_guidance(self, artifact_server, rng):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(artifact_server + "/enhance", _png_bytes(rng, (32, 32)))
        assert ei.value.code == 400
        assert b"re-export" in ei.value.read()

    def test_metrics_rejected_in_artifact_mode(self, artifact_server, rng):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(artifact_server + "/enhance?metrics=psnr",
                  _png_bytes(rng))
        assert ei.value.code == 400

    def test_unservable_artifacts_rejected_at_startup(self, tmp_path, rng):
        """A batched / volume / unquantized artifact must fail at serve
        startup, not per request (a healthy-looking server that 400s
        everything — review finding)."""
        from mies_tpu.pipeline.export import export_pipeline, load_exported
        from mies_tpu.serve import validate_servable_artifact

        cfg = PipelineConfig.make(
            [("adjust_gamma", {"gamma": 0.9})], name="bad")
        batched = export_pipeline(
            cfg, tmp_path / "b.mies", shape=(32, 32), batch_size=4)
        with pytest.raises(ValueError, match="--batch 1"):
            validate_servable_artifact(load_exported(batched)[1])
        unq = export_pipeline(
            cfg, tmp_path / "u.mies", shape=(32, 32), quantize=False)
        with pytest.raises(ValueError, match="quantize"):
            validate_servable_artifact(load_exported(unq)[1])

    def test_uint8_artifact_serves_raw_ingest(self, tmp_path, rng):
        """An artifact exported with input_dtype='uint8' receives RAW
        pixels (the jit server's ingest contract) and matches the
        float32-spec artifact bit-for-bit."""
        import jax.numpy as jnp

        from mies_tpu.pipeline.export import export_pipeline, load_exported
        from mies_tpu.serve import make_server

        cfg = PipelineConfig.make(
            [("clahe", {"clip_limit": 2.0, "grid_size": (4, 4)})],
            name="u8art")
        p8 = export_pipeline(cfg, tmp_path / "u8.mies", shape=(64, 64),
                             input_dtype="uint8")
        fn, hdr = load_exported(p8)
        assert hdr["input_dtype"] == "uint8"
        srv = make_server(cfg, host="127.0.0.1", port=0,
                          artifact_fn=fn, artifact_header=hdr)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            png = _png_bytes(rng)
            r = _post(url + "/enhance", png)
            assert r.status == 200
            from PIL import Image

            out = np.asarray(Image.open(io.BytesIO(r.read())))
            # reference: the float artifact on the same normalized input
            pf = export_pipeline(cfg, tmp_path / "f.mies", shape=(64, 64))
            ffn, _ = load_exported(pf)
            src = np.asarray(Image.open(io.BytesIO(png)))
            ref = np.asarray(ffn(jnp.asarray(
                src.astype(np.float32) / 255.0)))
            np.testing.assert_array_equal(out, ref)
        finally:
            srv.shutdown()
            srv.server_close()

    def test_int16_ct_artifact_serves_dicom(self, tmp_path, rng):
        """A CT chain exported with input_dtype='int16' serves a raw
        .dcm slice: HU pixels ship unconverted and window_hu ingests
        them in-program (the fixed-modality CT deployment)."""
        from mies_tpu.io.dicom import write_dicom
        from mies_tpu.pipeline.export import export_pipeline, load_exported
        from mies_tpu.serve import make_server

        cfg = PipelineConfig.make(
            [("window_hu", {"center": 40.0, "width": 400.0}),
             ("adjust_gamma", {"gamma": 0.9})],
            name="ct-art")
        p = export_pipeline(cfg, tmp_path / "ct.mies", shape=(64, 64),
                            input_dtype="int16")
        fn, hdr = load_exported(p)
        srv = make_server(cfg, host="127.0.0.1", port=0,
                          artifact_fn=fn, artifact_header=hdr)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            dcm = tmp_path / "s.dcm"
            write_dicom(dcm, rng.integers(
                -500, 1500, (64, 64)).astype(np.int16))
            r = _post(url + "/enhance", dcm.read_bytes(),
                      ctype="application/dicom")
            assert r.status == 200
            from PIL import Image

            out = np.asarray(Image.open(io.BytesIO(r.read())))
            assert out.shape == (64, 64) and out.dtype == np.uint8
            assert out.std() > 0  # windowing produced real contrast
        finally:
            srv.shutdown()
            srv.server_close()


class TestBodyCap:
    """VERDICT r3 weak #5: a request body above the cap is a 413
    decided from Content-Length ALONE — no body byte is read, so an
    oversized POST cannot make the server allocate host memory."""

    @pytest.fixture(scope="class")
    def small_server(self):
        from mies_tpu.serve import make_server

        cfg = PipelineConfig.make(
            [("adjust_gamma", {"gamma": 0.9})], name="cap-test"
        )
        srv = make_server(cfg, host="127.0.0.1", port=0,
                          max_body_bytes=4096)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv.server_address[1]
        srv.shutdown()
        srv.server_close()

    def test_oversized_body_is_413(self, small_server, rng):
        try:
            _post(f"http://127.0.0.1:{small_server}/enhance",
                  _png_bytes(rng, (256, 256)))
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 413
            assert "max-body-mb" in json.loads(e.read())["error"]

    def test_huge_declared_length_rejected_without_body(self, small_server):
        """Headers claim a terabyte; NO body follows. The server must
        answer 413 from the header alone — if it tried to read the
        body this would hang until the socket timeout."""
        import socket

        with socket.create_connection(
            ("127.0.0.1", small_server), timeout=30
        ) as s:
            s.sendall(
                b"POST /enhance HTTP/1.1\r\n"
                b"Host: x\r\nContent-Type: image/png\r\n"
                b"Content-Length: 1099511627776\r\n\r\n"
            )
            s.settimeout(30)
            resp = s.recv(4096).decode()
        assert resp.split()[1] == "413", resp[:80]

    def test_invalid_content_length_is_400(self, small_server):
        import socket

        with socket.create_connection(
            ("127.0.0.1", small_server), timeout=30
        ) as s:
            s.sendall(
                b"POST /enhance HTTP/1.1\r\n"
                b"Host: x\r\nContent-Length: banana\r\n\r\n"
            )
            resp = s.recv(4096).decode()
        assert resp.split()[1] == "400", resp[:80]

    def test_small_body_still_served(self, small_server, rng):
        with _post(f"http://127.0.0.1:{small_server}/enhance",
                   _png_bytes(rng, (32, 32))) as r:
            assert r.status == 200
