"""Demo server end-to-end: HTTP session lifecycle + streamed propagation."""

import json
import urllib.request

import numpy as np
import pytest

import jax

from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.models.model import SAM2Model
from sam2_opt_tpu.predictors.video import SAM2VideoPredictor
from sam2_opt_tpu.serve.inference_api import InferenceAPI
from sam2_opt_tpu.serve.server import DemoServer


@pytest.fixture(scope="module")
def server(tiny128_cfg, tiny128_params):
    cfg = tiny128_cfg
    model = SAM2Model(tiny128_params, cfg)
    predictor = SAM2VideoPredictor(model, fill_hole_area=0)
    api = InferenceAPI(predictor)
    srv = DemoServer(api, port=0).start_background()
    yield srv
    srv.shutdown()


def _post(server, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return resp.status, resp.read()


def test_http_session_flow(server, tmp_path):
    # 3-frame synthetic video as a jpeg dir
    from PIL import Image

    rng = np.random.default_rng(0)
    vdir = tmp_path / "vid"
    vdir.mkdir()
    for t in range(3):
        Image.fromarray((rng.random((96, 128, 3)) * 255).astype(np.uint8)).save(
            vdir / f"{t}.jpg"
        )

    status, body = _post(server, "/start_session", {"video_path": str(vdir)})
    assert status == 200
    sid = json.loads(body)["sessionId"]

    status, body = _post(
        server, "/add_points",
        {"sessionId": sid, "frameIndex": 0, "objectId": 1,
         "points": [[60, 40]], "labels": [1]},
    )
    assert status == 200
    out = json.loads(body)
    assert out["frameIndex"] == 0 and out["results"][0]["objectId"] == 1
    assert out["results"][0]["mask"]["size"] == [96, 128]

    # streamed propagation: one NDJSON line per frame
    status, body = _post(
        server, "/propagate_in_video", {"sessionId": sid, "startFrameIndex": 0}
    )
    assert status == 200
    frames = [json.loads(l) for l in body.decode().strip().split("\n")]
    assert [f["frameIndex"] for f in frames] == [0, 1, 2]

    # error path: unknown session -> 404 (urllib raises HTTPError)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server, "/add_points", {
            "sessionId": "nope", "frameIndex": 0, "objectId": 1,
            "points": [[1, 1]], "labels": [1]})
    assert exc.value.code == 404

    status, _ = _post(server, "/close_session", {"sessionId": sid})
    assert status == 200


def test_healthy(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthy", timeout=30
    ) as resp:
        assert resp.status == 200
        assert json.loads(resp.read())["ok"] is True


def test_propagation_blocks_same_session_mutation(tiny128_cfg, tiny128_params):
    """A streamed propagation holds the SESSION lock: a concurrent
    add_points on the same session must wait for the stream to finish
    (mutating inference_state mid-stream re-indexes what the loop iterates);
    cancellation is not blocked."""
    import threading
    import time

    model = SAM2Model(tiny128_params, tiny128_cfg)
    predictor = SAM2VideoPredictor(model, fill_hole_area=0)
    api = InferenceAPI(predictor)

    rng = np.random.default_rng(0)
    video = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    sid = api.start_session(video)
    api.add_points(sid, 0, 1, points=[[32.0, 32.0]], labels=[1])

    stream = api.propagate_in_video(sid)
    next(stream)  # stream open: session lock held

    events = []

    def mutate():
        api.add_points(sid, 0, 2, points=[[10.0, 10.0]], labels=[1])
        events.append("mutated")

    t = threading.Thread(target=mutate)
    t.start()
    time.sleep(0.5)
    assert events == [], "mutation ran while the stream held the session"
    # cancel is NOT blocked by the running stream
    assert api.cancel_propagate_in_video(sid)
    # the canceled stream terminates, releasing the session lock
    assert list(stream) == []
    t.join(timeout=60)
    assert events == ["mutated"]
    api.close_session(sid)


def test_cancel_survives_restart(tiny128_cfg, tiny128_params):
    """Cancel-then-restart: the cancel aimed at the in-flight stream must
    stop it even though a NEW stream starts before the old one observes the
    cancel (regression: the new stream used to reset the shared `canceled`
    flag, so the old stream ran the whole video while holding the session
    lock)."""
    import threading
    import time

    model = SAM2Model(tiny128_params, tiny128_cfg)
    predictor = SAM2VideoPredictor(model, fill_hole_area=0)
    api = InferenceAPI(predictor)

    rng = np.random.default_rng(0)
    video = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    sid = api.start_session(video)
    api.add_points(sid, 0, 1, points=[[32.0, 32.0]], labels=[1])

    stream_a = api.propagate_in_video(sid)
    next(stream_a)  # A holds the session lock

    assert api.cancel_propagate_in_video(sid)

    # restart BEFORE A has observed the cancel; B blocks on the session lock
    b_frames = []

    def run_b():
        for frame in api.propagate_in_video(sid):
            b_frames.append(frame["frameIndex"])

    t = threading.Thread(target=run_b)
    t.start()
    time.sleep(0.2)

    # A terminates at its next frame despite B's restart...
    t0 = time.time()
    assert list(stream_a) == []
    assert time.time() - t0 < 30
    # ...and B (started after the cancel) streams the full video
    t.join(timeout=120)
    assert not t.is_alive()
    assert b_frames, "restarted stream was wrongly canceled"
    api.close_session(sid)
