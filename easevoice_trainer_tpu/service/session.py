"""Session manager: single-task guard, session registry, subprocess jobs.

Behavior-compatible rebuild of the reference SessionManager
(reference: src/service/session.py:33-325):

* singleton; one running task at a time (409-conflict upstream);
* ring buffer of MAX_SESSIONS=10 sessions, never evicting the running one;
* per-session loss history capped at MAX_LOSS=50;
* monitor metrics injected into reads (here: host CPU% + TPU device kind
  instead of torch.cuda counters);
* heavy jobs run as ``python -m easevoice_trainer_tpu.cmd.<task> -c <json>``
  subprocesses whose stdout streams the connector protocol;
* stop = SIGTERM the whole process tree.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
from pathlib import Path
from dataclasses import asdict, is_dataclass
from datetime import datetime
from enum import Enum
from typing import Any, Callable, Dict, Optional

import psutil

from ..utils.connector import (
    ConnectorDataLoss, ConnectorDataType, MultiProcessOutputConnector)
from ..utils.logger import logger
from ..utils.response import EaseVoiceResponse, ResponseStatus


class Status(Enum):
    RUNNING = "Running"
    COMPLETED = "Completed"
    FAILED = "Failed"


class SessionConflictError(RuntimeError):
    """Raised when a second task is submitted while one is running."""


class SessionManager:
    _instance: Optional["SessionManager"] = None
    _lock = threading.Lock()
    MAX_SESSIONS = 10
    MAX_LOSS = 50

    def __new__(cls):
        if cls._instance is None:
            psutil.cpu_percent()  # prime the sampler
            with cls._lock:
                if cls._instance is None:
                    inst = super().__new__(cls)
                    inst.session_list = {}
                    inst.session_uuids = []
                    inst.session_subprocess = {}
                    inst.exist_session = None
                    inst.last_runned_session = None
                    inst._state_lock = threading.RLock()
                    cls._instance = inst
        return cls._instance

    @classmethod
    def reset(cls):
        """Testing hook."""
        with cls._lock:
            cls._instance = None

    # ---- lifecycle --------------------------------------------------------

    def start_session(self, uuid: str, task_name: str,
                      request: Optional[Any] = None) -> None:
        with self._state_lock:
            if self.exist_session is not None:
                raise SessionConflictError(
                    "A task is already running. Cannot submit another task!")
            if is_dataclass(request):
                request = asdict(request)
            self.session_list[uuid] = {
                "uuid": uuid,
                "task_name": task_name,
                "request": request,
                "status": Status.RUNNING,
                "created_at": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
                "error": None,
            }
            self.session_uuids.append(uuid)
            self._evict_over_limit()
            self.exist_session = uuid

    def _evict_over_limit(self) -> None:
        while len(self.session_uuids) > self.MAX_SESSIONS:
            if (self.exist_session is not None
                    and self.exist_session == self.session_uuids[0]):
                uuid = self.session_uuids.pop(1)
            else:
                uuid = self.session_uuids.pop(0)
            self.session_list.pop(uuid, None)

    def end_session_with_response(self, uuid: str,
                                  result: EaseVoiceResponse) -> None:
        with self._state_lock:
            session = self.session_list.get(uuid)
            if session is not None:
                if result.status == ResponseStatus.SUCCESS:
                    session["status"] = Status.COMPLETED
                else:
                    session["status"] = Status.FAILED
                    session["error"] = result.message
                session["message"] = result.message
                if result.data:
                    session["data"] = result.data
            self._clear_running(uuid)

    def fail_session(self, uuid: str, error: str) -> None:
        with self._state_lock:
            session = self.session_list.get(uuid)
            if session is not None:
                session["status"] = Status.FAILED
                session["error"] = error
            self._clear_running(uuid)

    def _clear_running(self, uuid: str) -> None:
        if self.exist_session == uuid:
            self.exist_session = None
            self.last_runned_session = uuid

    # ---- updates ----------------------------------------------------------

    def update_session_info(self, uuid: str, info: Dict[str, Any]) -> None:
        with self._state_lock:
            if uuid not in self.session_list:
                raise RuntimeError("No active task to update session info!")
            self.session_list[uuid].update(info)

    def update_session_loss(self, uuid: str, loss: ConnectorDataLoss) -> None:
        with self._state_lock:
            if uuid not in self.session_list:
                raise RuntimeError("No active task to update session loss!")
            losses = self.session_list[uuid].setdefault("losses", [])
            losses.append(asdict(loss))
            if len(losses) > self.MAX_LOSS:
                losses.pop(0)

    # ---- reads ------------------------------------------------------------

    def get_session_info(self) -> Dict[str, Any]:
        with self._state_lock:
            out = dict(self.session_list)
        out.update(self._monitor_metrics())
        return out

    def get_current_session_info(self) -> Dict[str, Any]:
        with self._state_lock:
            uuid = self.exist_session or self.last_runned_session
            if uuid is None:
                return {}
            session = dict(self.session_list.get(uuid, {}))
        metrics = self._monitor_metrics()
        metrics.update(session)
        return metrics

    def exist_running_session(self) -> bool:
        return self.exist_session is not None

    # ---- subprocess registry ----------------------------------------------

    def add_session_subprocess(self, uuid: str, pid: int) -> None:
        self.session_subprocess[uuid] = pid

    def remove_session_subprocess(self, uuid: str) -> None:
        self.session_subprocess.pop(uuid, None)

    def get_session_subprocess(self, uuid: str) -> Optional[int]:
        return self.session_subprocess.get(uuid)

    # ---- monitoring -------------------------------------------------------

    @staticmethod
    def _monitor_metrics() -> Dict[str, Any]:
        metrics: Dict[str, Any] = {
            "cpu_percentage": f"{psutil.cpu_percent()}%",
        }
        try:
            import jax

            devices = jax.devices()
            metrics["accelerator"] = devices[0].device_kind
            stats = getattr(devices[0], "memory_stats", lambda: None)()
            if stats and stats.get("bytes_limit"):
                used = stats.get("bytes_in_use", 0)
                metrics["memory_allocated_percentage"] = (
                    f"{used / stats['bytes_limit'] * 100:.2f}%")
        except Exception:
            pass
        return {"monitor_metrics": metrics}


session_manager = SessionManager()


def _manager() -> SessionManager:
    """Resolve the current singleton (robust to SessionManager.reset())."""
    return SessionManager()


def backtask_with_session_guard(uuid: str, task_name: str,
                                request_params: Any, func: Callable,
                                **kwargs) -> None:
    """Run ``func`` on a daemon thread under the single-task guard.

    Raises SessionConflictError (mapped to HTTP 409 by the REST layer) if a
    task is already running.
    """
    _manager().start_session(uuid, task_name, request_params)

    def wrapper():
        try:
            func(**kwargs)
        except Exception as e:
            logger.exception("task %s failed", task_name)
            _manager().fail_session(uuid, str(e))
        finally:
            _manager().remove_session_subprocess(uuid)

    threading.Thread(target=wrapper, daemon=True).start()


def start_task_with_subprocess(uid: str, cmd_module: str, request: Any) -> None:
    """Serialize params to a temp JSON file and run the cmd module.

    The child is ``python -m easevoice_trainer_tpu.cmd.<name> -c <file>``;
    its stdout is consumed with the connector protocol and routed into the
    session (reference: session.py:234-253).
    """
    params = asdict(request) if is_dataclass(request) else dict(request)
    with tempfile.NamedTemporaryFile(mode="w+", encoding="utf-8",
                                     suffix=".json", delete=False) as fp:
        json.dump(params, fp)
        temp_file_path = fp.name

    # The child resolves the package by import, not cwd: prepend the package
    # parent dir to PYTHONPATH so spawning works from any working directory.
    env = dict(os.environ)
    pkg_parent = str(Path(__file__).resolve().parents[2])
    env["PYTHONPATH"] = (pkg_parent + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else pkg_parent)
    proc = subprocess.Popen(
        [sys.executable, "-m", f"easevoice_trainer_tpu.cmd.{cmd_module}",
         "-c", temp_file_path],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    _manager().add_session_subprocess(uid, proc.pid)
    connector = MultiProcessOutputConnector()
    saw_response = False
    for data in connector.read_data(proc):
        if data.dataType == ConnectorDataType.RESP:
            saw_response = True
            _manager().end_session_with_response(uid, data.response)
        elif data.dataType == ConnectorDataType.SESSION_DATA:
            _manager().update_session_info(uid, data.session_data)
        elif data.dataType == ConnectorDataType.LOSS:
            _manager().update_session_loss(uid, data.loss)
    # a child that dies without its final response (crash, external SIGKILL,
    # interpreter abort) must not leave the session "Running" forever — it
    # would block every future task behind the single-task guard
    if not saw_response:
        rc = proc.poll()
        tail = " | ".join(connector.tail[-5:])
        _manager().fail_session(
            uid, f"training subprocess exited (rc={rc}) without reporting a "
                 f"result{('; last output: ' + tail[:500]) if tail else ''}")


def _check_session(uid: str, task_name: str) -> Optional[EaseVoiceResponse]:
    info = _manager().get_session_info()
    current = info.get(uid, {})
    if (current.get("task_name") != task_name
            or current.get("status") != Status.RUNNING):
        response = EaseVoiceResponse(ResponseStatus.FAILED,
                                     "Task name does not match.")
        _manager().end_session_with_response(uid, response)
        return response
    return None


def stop_task_with_subprocess(uuid: str, task_name: str) -> EaseVoiceResponse:
    check = _check_session(uuid, task_name)
    if check:
        return check
    pid = _manager().get_session_subprocess(uuid)
    if pid:
        kill_proc_tree(pid)
        _manager().remove_session_subprocess(uuid)
        response = EaseVoiceResponse(ResponseStatus.SUCCESS,
                                     "Task stopped by user.")
    else:
        response = EaseVoiceResponse(ResponseStatus.FAILED, "No task to stop.")
    _manager().end_session_with_response(uuid, response)
    return response


def kill_proc_tree(pid: int, including_parent: bool = True) -> None:
    try:
        parent = psutil.Process(pid)
    except psutil.NoSuchProcess:
        return
    for child in parent.children(recursive=True):
        try:
            os.kill(child.pid, signal.SIGTERM)
        except OSError:
            pass
    if including_parent:
        try:
            os.kill(parent.pid, signal.SIGTERM)
        except OSError:
            pass
