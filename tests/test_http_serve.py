"""HTTP serving endpoint tests (SURVEY.md L9; infer/http_serve.py): a real
ThreadingHTTPServer on an ephemeral port, oracle models — asserts the wire
path (NIfTI bytes in, gzipped labelmap + JSON report out) is byte-faithful
to the in-process predict functions."""

import gzip
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from runet_tpu.config import CascadeConfig, InferConfig
from runet_tpu.infer.cascade import ModelBundle, predict_case, predict_volume
from runet_tpu.infer.http_serve import InferenceService, make_server
from runet_tpu.io.nifti import volume_from_bytes, volume_to_bytes
from tests.test_cascade import (
    _binary_oracle,
    _class_oracle,
    _identity_pp,
    _make_label_image,
)


@pytest.fixture(scope="module")
def server():
    coarse = ModelBundle(
        apply_fn=_binary_oracle(), params={}, num_classes=2,
        preprocess=_identity_pp((2.0, 2.0, 2.0)),
        infer=InferConfig(patch_size=(32, 32, 32), overlap=0.5),
    )
    fine = ModelBundle(
        apply_fn=_class_oracle(3), params={}, num_classes=3,
        preprocess=_identity_pp((1.0, 1.0, 1.0)),
        infer=InferConfig(patch_size=(32, 32, 32), overlap=0.5),
    )
    cascade = CascadeConfig(roi_margin_mm=6.0, roi_bucket=16, max_components=2)
    srv = make_server(InferenceService(fine, coarse, cascade), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", coarse, fine, cascade
    srv.shutdown()
    t.join(timeout=5)


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, headers=headers or {})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, dict(resp.headers), resp.read()


def test_healthz(server):
    base, *_ = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        h = json.loads(resp.read())
    assert h["status"] == "ok"
    assert h["cascade"] is True
    assert h["num_classes"] == 3


def test_predict_matches_in_process(server):
    base, coarse, fine, cascade = server
    img, seg = _make_label_image()
    body = volume_to_bytes(img, spacing=(1.0, 1.0, 1.5), gz=True)
    status, headers, payload = _post(base + "/v1/predict", body)
    assert status == 200
    assert headers["Content-Type"] == "application/gzip"
    got = volume_from_bytes(payload)
    want = predict_case(coarse, fine, img, (1.0, 1.0, 1.5), cascade)
    np.testing.assert_array_equal(got.data, want)
    assert got.spacing == (1.0, 1.0, 1.5)
    report = json.loads(headers["X-Runet-Report"])
    assert report["shape"] == list(img.shape)
    assert report["volume_ml_c1"] > 0
    assert report["latency_s"] >= 0


def test_report_only(server):
    base, *_ = server
    img, _ = _make_label_image()
    # Plain (non-gz) NIfTI bodies are accepted too — magic-sniffed.
    body = volume_to_bytes(img, spacing=(1.0, 1.0, 1.5), gz=False)
    status, headers, payload = _post(base + "/v1/report", body)
    assert status == 200
    assert headers["Content-Type"] == "application/json"
    report = json.loads(payload)
    assert "volume_ml_c2" in report and "latency_s" in report


def test_bad_body_is_400_and_survivable(server):
    base, coarse, fine, cascade = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/predict", b"this is not a nifti volume")
    assert ei.value.code == 400
    assert "unparseable" in json.loads(ei.value.read())["error"]
    # Truncated gzip: sniffs as gz, fails inside decompress — still 400.
    trunc = gzip.compress(b"x" * 64)[:20]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/report", trunc)
    assert ei.value.code == 400
    # The server thread survived both: a good request still works.
    img, _ = _make_label_image()
    status, _, payload = _post(
        base + "/v1/predict", volume_to_bytes(img, spacing=(1.0, 1.0, 1.5))
    )
    assert status == 200
    want = predict_case(coarse, fine, img, (1.0, 1.0, 1.5), cascade)
    np.testing.assert_array_equal(volume_from_bytes(payload).data, want)


def test_unknown_route_404(server):
    base, *_ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/nope", b"x")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert ei.value.code == 404


def test_plain_fine_only_service():
    # No coarse model: /v1/predict routes through predict_volume.
    fine = ModelBundle(
        apply_fn=_class_oracle(3), params={}, num_classes=3,
        preprocess=_identity_pp((1.0, 1.0, 1.0)),
        infer=InferConfig(patch_size=(32, 32, 32), overlap=0.5),
    )
    srv = make_server(InferenceService(fine), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address[:2]
        img, _ = _make_label_image()
        status, headers, payload = _post(
            f"http://{host}:{port}/v1/predict",
            volume_to_bytes(img, spacing=(1.0, 1.0, 1.5)),
        )
        assert status == 200
        assert json.loads(headers["X-Runet-Report"])["shape"] == list(img.shape)
        want = predict_volume(fine, img, (1.0, 1.0, 1.5))
        np.testing.assert_array_equal(volume_from_bytes(payload).data, want)
    finally:
        srv.shutdown()
        t.join(timeout=5)
