"""Thin training-service wrapper (reference: src/service/train.py:14-25)."""
from __future__ import annotations

from ..train.gpt import GPTTrain, GPTTrainParams
from ..utils.response import EaseVoiceResponse


class TrainGPTService:
    def do_train_gpt(self, params: GPTTrainParams) -> EaseVoiceResponse:
        return GPTTrain(params).train()
