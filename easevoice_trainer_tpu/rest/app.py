"""REST API server (aiohttp): the full /apis/v1 surface of the reference.

Route-for-route rebuild of the reference FastAPI app
(reference: src/rest/rest.py:136-673, SURVEY §1.1) on aiohttp (FastAPI is
not available in the target image; aiohttp is):

  /namespaces[...]          NamespaceAPI
  /directories /files /delete-dirs-files     FileAPI
  /session /session/current                  SessionAPI
  /voiceclone/clone /voiceclone/models       VoiceCloneAPI
  /train/{gpt,sovits}/{start,stop}           TrainAPI
  /normalize/{start,stop}                    NormalizeAPI
  /audio/{uvr5,slicer,denoise,asr}/{start,stop} + /audio/refinement[...]
  /easevoice/{start,stop}                    EaseVoiceAPI (one-click)
  /tensorboard/{path}                        reverse proxy to :6006
  /  /assets/*                               SPA static (./dist)

Responses keep the reference envelope: start endpoints return
EaseVoiceResponse JSON; conflicts are HTTP 409 with {"detail": ...}.
"""
from __future__ import annotations

import asyncio
import dataclasses
import json
import os
import uuid as uuid_mod
from enum import Enum
from typing import Any

from aiohttp import ClientSession, web

from ..service import session as session_mod
from ..service.audio import (
    AudioService, AudioUVR5Params, AudioSlicerParams, AudioDenoiseParams,
    AudioASRParams)
from ..service.file import FileService
from ..service.namespace import NamespaceService
from ..service.normalize import NormalizeParams
from ..service.session import (
    SessionConflictError, backtask_with_session_guard, session_manager,
    start_task_with_subprocess, stop_task_with_subprocess)
from ..service.tensorboard import TENSORBOARD_PORT, TensorBoardService
from ..service.voice import VoiceCloneService, list_train_gpts, list_train_sovits
from ..train.gpt import GPTTrainParams, get_gpt_train_dir
from ..train.sovits import SovitsTrainParams, get_sovits_train_dir
from ..normalization import random_choice
from ..utils.logger import logger
from ..utils.response import EaseVoiceResponse, ResponseStatus
from .types import TaskCMD, TaskType

API_PREFIX = "/apis/v1"


def _json(data: Any, status: int = 200) -> web.Response:
    def default(o):
        if isinstance(o, EaseVoiceResponse):
            return o.to_dict()
        if isinstance(o, Enum):
            return o.value
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        return str(o)

    return web.json_response(
        json.loads(json.dumps(data, default=default)), status=status)


def _resp(r: EaseVoiceResponse, status: int = 200) -> web.Response:
    return _json(r.to_dict(), status)


def _error(status: int, detail: Any) -> web.Response:
    return _json({"detail": detail}, status)


def _conflict() -> web.Response:
    return _error(409, {"error": "There is an another task running."})


def _generate_name() -> str:
    import datetime

    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


def _start_subprocess_task(task_type: str, cmd_module: str, request_obj,
                           extra_data: dict | None = None) -> web.Response:
    if session_manager.exist_running_session():
        return _conflict()
    uid = str(uuid_mod.uuid4())
    try:
        backtask_with_session_guard(
            uid, task_type,
            dataclasses.asdict(request_obj)
            if dataclasses.is_dataclass(request_obj) else request_obj,
            start_task_with_subprocess,
            uid=uid, cmd_module=cmd_module, request=request_obj)
    except SessionConflictError:
        return _conflict()
    return _resp(EaseVoiceResponse(
        ResponseStatus.SUCCESS, f"{task_type} started", uuid=uid,
        data=extra_data))


def _stop_subprocess_task(task_type: str, request: web.Request
                          ) -> web.Response:
    uid = request.query.get("uid", "")
    try:
        return _resp(stop_task_with_subprocess(uid, task_type))
    except Exception as e:
        logger.exception("failed to stop %s", task_type)
        return _error(500, {"error": f"failed to stop {task_type}: {e}"})


def _dataclass_from(params: dict, cls):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in params.items() if k in names})


def build_app(frontend_dir: str | None = None,
              require_frontend: bool = False) -> web.Application:
    app = web.Application(client_max_size=1024 ** 3)
    routes = web.RouteTableDef()
    file_service = FileService()
    namespace_service = NamespaceService()
    tensorboard_service = TensorBoardService()

    # ---- namespaces --------------------------------------------------------

    @routes.get(f"{API_PREFIX}/namespaces")
    async def list_namespaces(request):
        return _json({"namespaces": namespace_service.get_namespaces()})

    @routes.post(f"{API_PREFIX}/namespaces")
    async def new_namespace(request):
        body = await request.json()
        name = body.get("name", "")
        if not name or "/" in name or "\0" in name or name in (".", ".."):
            return _error(400, "invalid namespace name")
        try:
            return _json(namespace_service.create_namespace(name))
        except FileExistsError:
            return _error(409, "Namespace already exists")
        except ValueError as e:
            return _error(400, str(e))

    @routes.put(f"{API_PREFIX}/namespaces/{{name}}")
    async def change_namespace(request):
        body = await request.json()
        try:
            return _json(namespace_service.update_namespace(
                request.match_info["name"], body["name"]))
        except FileExistsError:
            return _error(409, "Namespace already exists")
        except ValueError as e:
            return _error(404, str(e))

    @routes.delete(f"{API_PREFIX}/namespaces/{{name}}")
    async def remove_namespace(request):
        try:
            namespace_service.delete_namespace(request.match_info["name"])
            return web.Response(status=204)
        except ValueError as e:
            return _error(404, str(e))

    @routes.get(f"{API_PREFIX}/namespaces-root")
    async def get_ns_root(request):
        return _json(namespace_service.get_namespaces_root_metadata())

    @routes.post(f"{API_PREFIX}/namespaces-root")
    async def set_ns_root(request):
        body = await request.json()
        try:
            namespace_service.set_namespaces_root(body["namespaces-root"])
            return _json({"message": "ok"})
        except (KeyError, ValueError) as e:
            return _error(400, str(e))

    # ---- files ---------------------------------------------------------------

    @routes.post(f"{API_PREFIX}/directories")
    async def create_directory(request):
        body = await request.json()
        try:
            file_service.create_directory(body["directoryPath"])
            return _json({"message": "Directory created successfully"})
        except ValueError as e:
            return _error(409 if "Conflict" in str(e) else 400, str(e))

    @routes.get(f"{API_PREFIX}/directories")
    async def list_directory(request):
        try:
            return _json(file_service.list_directory(
                request.query.get("directoryPath", "")))
        except ValueError as e:
            return _error(404 if "Not Found" in str(e) else 400, str(e))

    @routes.post(f"{API_PREFIX}/files")
    async def upload_file(request):
        body = await request.json()
        try:
            file_service.upload_file(body["directoryPath"], body["fileName"],
                                     body["fileContent"])
            return _json({"message": "File uploaded successfully"})
        except (KeyError, ValueError) as e:
            return _error(400, str(e))

    @routes.get(f"{API_PREFIX}/files")
    async def download_file(request):
        path = request.query.get("filePath", "")
        if not os.path.exists(path):
            return _error(404, "File not found")
        if os.path.isdir(path):
            return _error(400, "Path is a directory, not a file")
        return web.FileResponse(path)

    @routes.post(f"{API_PREFIX}/delete-dirs-files")
    async def delete_dirs_files(request):
        body = await request.json()
        return _json(file_service.delete_dirs_files(body.get("paths", [])))

    # ---- session ---------------------------------------------------------------

    @routes.get(f"{API_PREFIX}/session")
    async def get_sessions(request):
        return _json(session_manager.get_session_info())

    @routes.get(f"{API_PREFIX}/session/current")
    async def get_current_session(request):
        return _json(session_manager.get_current_session_info())

    # ---- voice clone --------------------------------------------------------------

    @routes.get(f"{API_PREFIX}/voiceclone/models")
    async def voiceclone_models(request):
        project_dir = request.query.get("project_dir", "")
        try:
            return _json({
                "gpts": ["default"] + sorted(list_train_gpts(project_dir)),
                "sovits": ["default"] + sorted(list_train_sovits(project_dir)),
            })
        except Exception as e:
            return _error(500, {"error": f"failed to get available models: {e}"})

    @routes.post(f"{API_PREFIX}/voiceclone/clone")
    async def voiceclone_clone(request):
        body = await request.json()
        if session_manager.exist_running_session():
            return _conflict()
        uid = str(uuid_mod.uuid4())

        def do_clone(uid: str, task: dict):
            service = VoiceCloneService(session_manager)
            try:
                service.clone(uid, task)
            except Exception as e:
                logger.exception("voice clone failed")
                session_manager.end_session_with_response(
                    uid, EaseVoiceResponse(ResponseStatus.FAILED, str(e)))

        try:
            backtask_with_session_guard(uid, TaskType.voice_clone, body,
                                        do_clone, uid=uid, task=body)
        except SessionConflictError:
            return _conflict()
        return _resp(EaseVoiceResponse(ResponseStatus.SUCCESS,
                                       "Voice clone started", uuid=uid))

    # ---- training ---------------------------------------------------------------

    @routes.post(f"{API_PREFIX}/train/gpt/start")
    async def train_gpt(request):
        params = _dataclass_from(await request.json(), GPTTrainParams)
        if not params.output_model_name:
            params.output_model_name = "gpt_" + _generate_name()
        model_path = get_gpt_train_dir(params.project_dir,
                                       params.output_model_name)
        return _start_subprocess_task(TaskType.train_gpt, TaskCMD.train_gpt,
                                      params, {"model_path": model_path})

    @routes.delete(f"{API_PREFIX}/train/gpt/stop")
    async def train_gpt_stop(request):
        return _stop_subprocess_task(TaskType.train_gpt, request)

    @routes.post(f"{API_PREFIX}/train/sovits/start")
    async def train_sovits(request):
        params = _dataclass_from(await request.json(), SovitsTrainParams)
        if not params.output_model_name:
            params.output_model_name = "sovits_" + _generate_name()
        model_path = get_sovits_train_dir(params.project_dir,
                                          params.output_model_name)
        return _start_subprocess_task(TaskType.train_sovits,
                                      TaskCMD.train_sovits, params,
                                      {"model_path": model_path})

    @routes.delete(f"{API_PREFIX}/train/sovits/stop")
    async def train_sovits_stop(request):
        return _stop_subprocess_task(TaskType.train_sovits, request)

    # ---- normalize -----------------------------------------------------------------

    @routes.post(f"{API_PREFIX}/normalize/start")
    async def normalize_start(request):
        params = _dataclass_from(await request.json(), NormalizeParams)
        params.predefined_output_path = random_choice()
        base = params.processing_path or params.output_dir
        return _start_subprocess_task(
            TaskType.normalize, TaskCMD.normalize, params,
            {"normalize_path": os.path.join(base,
                                            params.predefined_output_path)})

    @routes.delete(f"{API_PREFIX}/normalize/stop")
    async def normalize_stop(request):
        return _stop_subprocess_task(TaskType.normalize, request)

    # ---- audio ----------------------------------------------------------------------

    for task_name, cmd_name, cls in (
            (TaskType.audio_uvr5, TaskCMD.audio_uvr5, AudioUVR5Params),
            (TaskType.audio_slicer, TaskCMD.audio_slicer, AudioSlicerParams),
            (TaskType.audio_denoise, TaskCMD.audio_denoise,
             AudioDenoiseParams),
            (TaskType.audio_asr, TaskCMD.audio_asr, AudioASRParams)):
        short = task_name.replace("audio_", "")

        def make_start(task_name=task_name, cmd_name=cmd_name, cls=cls):
            async def start(request):
                params = _dataclass_from(await request.json(), cls)
                return _start_subprocess_task(task_name, cmd_name, params)
            return start

        def make_stop(task_name=task_name):
            async def stop(request):
                return _stop_subprocess_task(task_name, request)
            return stop

        routes.post(f"{API_PREFIX}/audio/{short}/start")(make_start())
        routes.delete(f"{API_PREFIX}/audio/{short}/stop")(make_stop())

    @routes.get(f"{API_PREFIX}/audio/refinement")
    async def refinement_list(request):
        service = AudioService(request.query.get("input_dir", ""),
                               request.query.get("output_dir", ""))
        return _resp(service.refinement_load_source())

    @routes.post(f"{API_PREFIX}/audio/refinement")
    async def refinement_submit(request):
        body = await request.json()
        service = AudioService(body.get("source_dir", ""),
                               body.get("output_dir", ""))
        return _resp(service.refinement_submit_text(
            body["source_file_path"], body["language"],
            body["text_content"]))

    @routes.delete(f"{API_PREFIX}/audio/refinement")
    async def refinement_delete(request):
        body = await request.json()
        service = AudioService(body.get("source_dir", ""),
                               body.get("output_dir", ""))
        return _resp(service.refinement_delete_text(body["source_file_path"]))

    @routes.post(f"{API_PREFIX}/audio/refinement/reload")
    async def refinement_reload(request):
        body = await request.json()
        service = AudioService(body.get("source_dir", ""),
                               body.get("output_dir", ""))
        return _resp(service.refinement_reload_source())

    # ---- one-click -----------------------------------------------------------------

    @routes.post(f"{API_PREFIX}/easevoice/start")
    async def easevoice_start(request):
        body = await request.json()
        body["gpt_output_name"] = "gpt_" + _generate_name()
        body["sovits_output_name"] = "sovits_" + _generate_name()
        return _start_subprocess_task(
            TaskType.ease_voice, TaskCMD.ease_voice, body,
            {"sovits_output": body["sovits_output_name"],
             "gpt_output": body["gpt_output_name"]})

    @routes.delete(f"{API_PREFIX}/easevoice/stop")
    async def easevoice_stop(request):
        return _stop_subprocess_task(TaskType.ease_voice, request)

    # ---- profiler (SURVEY §5.1: jax.profiler trace endpoints) ---------------------------

    @routes.post(f"{API_PREFIX}/profiler/start")
    async def profiler_start(request):
        try:
            import jax

            trace_dir = os.path.join(
                __import__("easevoice_trainer_tpu.utils.paths",
                           fromlist=["tb_log_dir"]).tb_log_dir(), "profile")
            jax.profiler.start_trace(trace_dir)
            return _json({"message": "profiler started",
                          "trace_dir": trace_dir})
        except Exception as e:
            return _error(500, str(e))

    @routes.post(f"{API_PREFIX}/profiler/stop")
    async def profiler_stop(request):
        try:
            import jax

            jax.profiler.stop_trace()
            return _json({"message": "profiler stopped"})
        except Exception as e:
            return _error(500, str(e))

    # ---- tensorboard proxy ------------------------------------------------------------

    @routes.route("*", f"{API_PREFIX}/tensorboard/{{path:.*}}")
    async def tensorboard_proxy(request):
        target = (f"http://localhost:{TENSORBOARD_PORT}/"
                  f"{request.match_info['path']}")
        if request.query_string:
            target += "?" + request.query_string
        try:
            async with ClientSession() as client:
                async with client.request(
                        request.method, target,
                        data=await request.read() or None,
                        headers={k: v for k, v in request.headers.items()
                                 if k.lower() not in ("host",)}) as upstream:
                    body = await upstream.read()
                    return web.Response(
                        status=upstream.status, body=body,
                        content_type=upstream.content_type)
        except Exception as e:
            return _error(502, f"tensorboard unavailable: {e}")

    app.add_routes(routes)

    # ---- frontend static (reference hard-fails without ./dist; here a
    # vendored single-file panel serves as fallback) ------------------------------------
    fdir = frontend_dir or os.path.join(os.getcwd(), "dist")
    if not os.path.isdir(fdir):
        builtin = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "panel")
        if os.path.isdir(builtin) and not require_frontend:
            logger.info("no ./dist build; serving the built-in panel")
            fdir = builtin
    if os.path.isdir(fdir):
        async def index(request):
            return web.FileResponse(os.path.join(fdir, "index.html"))

        app.router.add_get("/", index)
        assets = os.path.join(fdir, "assets")
        if os.path.isdir(assets):
            app.router.add_static("/assets", assets)
    elif require_frontend:
        raise FileNotFoundError(
            f"Frontend build directory '{fdir}' not found. "
            "Please build the frontend first.")
    else:
        logger.warning("frontend dist/ not found; SPA routes disabled")

    # ---- tensorboard lifecycle ---------------------------------------------------------

    async def on_startup(app):
        tensorboard_service.start()

    async def on_cleanup(app):
        tensorboard_service.stop()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app
