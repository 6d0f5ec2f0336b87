"""Subprocess CLI entrypoints.

Each module is invoked as ``python -m easevoice_trainer_tpu.cmd.<task> -c
<params.json>`` by the session manager (reference: src/cmd/*.py); it runs
the task and emits the final EaseVoiceResponse (plus loss/session-data
lines) over the stdout connector protocol.
"""
from __future__ import annotations

import argparse
import json
import os
import traceback
from typing import Any, Callable, Dict

# honor JAX_PLATFORMS in subprocesses: with an out-of-tree TPU plugin
# installed the env var alone is ignored at backend init, so a child told
# to run on CPU would still try (and possibly hang) initializing the TPU
# plugin — the config update is honored (same workaround as
# tests/conftest.py)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from ..utils.connector import MultiProcessOutputConnector
from ..utils.logger import logger
from ..utils.response import EaseVoiceResponse, ResponseStatus


def read_params() -> Dict[str, Any]:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True,
                        help="path to the JSON params file")
    args = parser.parse_args()
    with open(args.config, encoding="utf-8") as f:
        return json.load(f)


def run_task(fn: Callable[[Dict[str, Any]], EaseVoiceResponse]) -> None:
    connector = MultiProcessOutputConnector()
    try:
        params = read_params()
        resp = fn(params)
    except Exception as e:
        logger.error("task failed: %s", traceback.format_exc())
        resp = EaseVoiceResponse(ResponseStatus.FAILED, str(e))
    connector.write_response(resp)


def filter_fields(params: Dict[str, Any], dataclass_type) -> Dict[str, Any]:
    import dataclasses

    names = {f.name for f in dataclasses.fields(dataclass_type)}
    return {k: v for k, v in params.items() if k in names}
