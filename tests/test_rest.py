"""REST API integration tests (aiohttp test client, no real server)."""
import base64
import json
import os

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")
import asyncio  # noqa: E402
import contextlib  # noqa: E402
import functools  # noqa: E402
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402


@contextlib.asynccontextmanager
async def make_client(tmp_path):
    from easevoice_trainer_tpu.service.session import SessionManager
    SessionManager.reset()
    import easevoice_trainer_tpu.service.session as sess_mod
    sess_mod.session_manager = SessionManager()
    from easevoice_trainer_tpu.rest import app as app_mod
    app_mod.session_manager = sess_mod.session_manager
    application = app_mod.build_app(frontend_dir=str(tmp_path / "nodist"))
    client = TestClient(TestServer(application))
    await client.start_server()
    try:
        yield client
    finally:
        await client.close()


def async_client_test(fn):
    """Run an ``async def test(client, tmp_path, ...)`` without a plugin."""

    # NOTE: no functools.wraps — pytest would introspect the wrapped
    # coroutine's signature and look for a 'client' fixture
    def wrapper(tmp_path, monkeypatch):
        monkeypatch.setenv("EASEVOICE_TRAINER_NAMESPACES_ROOT",
                           str(tmp_path / "namespaces"))
        monkeypatch.chdir(tmp_path)

        async def run():
            async with make_client(tmp_path) as client:
                await fn(client, tmp_path)

        asyncio.run(run())

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


@async_client_test
async def test_namespace_lifecycle(client, tmp_path):
    r = await client.get("/apis/v1/namespaces")
    assert r.status == 200
    assert (await r.json())["namespaces"] == []

    r = await client.post("/apis/v1/namespaces", json={"name": "proj1"})
    assert r.status == 200
    ns = await r.json()
    assert ns["name"] == "proj1"
    home = ns["homePath"]
    for sub in ("voices", "outputs", "training-audios",
                "models/sovits_train", "models/gpt_train"):
        assert os.path.isdir(os.path.join(home, sub)), sub
    assert os.path.exists(os.path.join(home, ".metadata.json"))

    # duplicate -> 409
    r = await client.post("/apis/v1/namespaces", json={"name": "proj1"})
    assert r.status == 409

    # rename
    r = await client.put("/apis/v1/namespaces/proj1", json={"name": "proj2"})
    assert r.status == 200
    assert (await r.json())["name"] == "proj2"

    # delete
    r = await client.delete("/apis/v1/namespaces/proj2")
    assert r.status == 204
    r = await client.delete("/apis/v1/namespaces/ghost")
    assert r.status == 404


@async_client_test
async def test_namespaces_root(client, tmp_path):
    r = await client.get("/apis/v1/namespaces-root")
    meta = await r.json()
    assert "namespaces-root" in meta and meta["setOnce"] is False
    new_root = str(tmp_path / "other_root")
    r = await client.post("/apis/v1/namespaces-root",
                          json={"namespaces-root": new_root})
    assert r.status == 200
    meta = await (await client.get("/apis/v1/namespaces-root")).json()
    assert meta["namespaces-root"] == new_root and meta["setOnce"] is True


@async_client_test
async def test_file_endpoints(client, tmp_path):
    d = str(tmp_path / "data" / "sub")
    r = await client.post("/apis/v1/directories", json={"directoryPath": d})
    assert r.status == 200
    r = await client.post("/apis/v1/directories", json={"directoryPath": d})
    assert r.status == 409

    content = base64.b64encode(b"hello audio").decode()
    r = await client.post("/apis/v1/files", json={
        "directoryPath": d, "fileName": "a.txt", "fileContent": content})
    assert r.status == 200

    r = await client.get("/apis/v1/directories",
                         params={"directoryPath": d})
    listing = await r.json()
    assert listing["files"][0]["fileName"] == "a.txt"
    assert listing["files"][0]["fileSize"] == 11

    r = await client.get("/apis/v1/files",
                         params={"filePath": os.path.join(d, "a.txt")})
    assert r.status == 200
    assert await r.read() == b"hello audio"

    r = await client.post("/apis/v1/delete-dirs-files",
                          json={"paths": [d, "/no/such/path"]})
    result = await r.json()
    assert result["hasFailure"] is True
    statuses = {p["path"]: p["status"] for p in result["paths"]}
    assert statuses[d] == "directory deleted"


@async_client_test
async def test_session_endpoints(client, tmp_path):
    r = await client.get("/apis/v1/session")
    assert r.status == 200
    info = await r.json()
    assert "monitor_metrics" in info
    r = await client.get("/apis/v1/session/current")
    assert r.status == 200


@async_client_test
async def test_voiceclone_models_empty(client, tmp_path):
    r = await client.get("/apis/v1/voiceclone/models",
                         params={"project_dir": str(tmp_path)})
    body = await r.json()
    assert body["gpts"] == ["default"]
    assert body["sovits"] == ["default"]


@async_client_test
async def test_refinement_endpoints(client, tmp_path):
    out = tmp_path / "proj"
    (out / "asrs").mkdir(parents=True)
    (out / "asrs" / "asr.list").write_text("a.wav|zh|text one\n",
                                           encoding="utf8")
    r = await client.post("/apis/v1/audio/refinement/reload", json={
        "source_dir": str(tmp_path), "output_dir": str(out)})
    assert r.status == 200
    body = await r.json()
    assert body["status"] == "success"
    assert "a.wav" in body["data"]

    r = await client.post("/apis/v1/audio/refinement", json={
        "source_dir": str(tmp_path), "output_dir": str(out),
        "source_file_path": "a.wav", "language": "ZH",
        "text_content": "fixed text"})
    body = await r.json()
    assert body["data"]["a.wav"]["text_content"] == "fixed text"
    assert body["data"]["a.wav"]["language"] == "zh"

    r = await client.delete("/apis/v1/audio/refinement", json={
        "source_dir": str(tmp_path), "output_dir": str(out),
        "source_file_path": "a.wav"})
    body = await r.json()
    assert body["data"] == {}


@async_client_test
async def test_train_start_conflict_and_stop(client, tmp_path):
    """Start a (failing-fast) training subprocess: session turns RUNNING then
    FAILED; a second start while running returns 409."""
    import easevoice_trainer_tpu.service.session as sess

    # make the subprocess a no-op that fails instantly (missing data dir)
    r = await client.post("/apis/v1/train/sovits/start", json={
        "train_input_dir": str(tmp_path / "missing"),
        "project_dir": str(tmp_path), "output_model_name": "m1",
        "total_epochs": 1})
    assert r.status == 200
    body = await r.json()
    assert body["status"] == "success" and body["uuid"]

    # wait for the child to fail
    import asyncio
    for _ in range(100):
        info = sess.session_manager.get_session_info().get(body["uuid"], {})
        if str(info.get("status")) in ("Status.FAILED", "Status.COMPLETED"):
            break
        await asyncio.sleep(0.3)
    assert str(info.get("status")) == "Status.FAILED"


@async_client_test
async def test_builtin_panel_served_without_dist(client, tmp_path):
    r = await client.get("/")
    assert r.status == 200
    body = await r.text()
    assert "EaseVoice Trainer" in body and "/apis/v1" in body
