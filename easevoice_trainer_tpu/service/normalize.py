"""Normalize service: runs the 3-stage pipeline, short-circuits on failure
(reference: src/service/normalize.py:16-38)."""
from __future__ import annotations

import dataclasses

from ..normalization import Normalize
from ..utils.response import EaseVoiceResponse, ResponseStatus


@dataclasses.dataclass
class NormalizeParams:
    processing_path: str = ""
    output_dir: str = ""
    predefined_output_path: str = ""


class NormalizeService:
    def __init__(self, processing_path: str,
                 predefine_output_path: str = ""):
        self.normalize = Normalize(processing_path, predefine_output_path)

    def run(self) -> EaseVoiceResponse:
        for stage in (self.normalize.text, self.normalize.ssl,
                      self.normalize.token):
            resp = stage()
            if resp.status == ResponseStatus.FAILED:
                return resp
        return EaseVoiceResponse(
            ResponseStatus.SUCCESS, "normalize success",
            {"output_path": self.normalize.output_path})
