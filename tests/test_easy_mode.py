"""Easy-mode orchestration (cmd/easy_mode.py) with stubbed stages.

The 7-step chain (reference: src/cmd/easy_mode.py:67-131) is sequencing +
failure-propagation logic; the stages themselves are e2e-tested
elsewhere (audio service, normalize, trainers).  Here each stage is a
stub so the orchestration contract is checked hermetically: step order,
progress writes, nested-train response forwarding, and fail-fast.
"""
import dataclasses

import pytest

from easevoice_trainer_tpu.cmd import easy_mode
from easevoice_trainer_tpu.utils.response import (EaseVoiceResponse,
                                                  ResponseStatus)


def _ok(msg="ok", data=None):
    return EaseVoiceResponse(ResponseStatus.SUCCESS, msg, data=data or {})


class _AudioStub:
    calls = []

    def __init__(self, source_dir, output_dir):
        self.output_dir = output_dir

    def uvr5(self):
        self.calls.append("uvr5"); return _ok()

    def slicer(self):
        self.calls.append("slicer"); return _ok()

    def denoise(self):
        self.calls.append("denoise"); return _ok()

    def asr(self):
        self.calls.append("asr"); return _ok()


class _NormStub:
    def __init__(self, processing_path):
        pass

    def run(self):
        _AudioStub.calls.append("normalize")
        return _ok(data={"output_path": "/tmp/normed"})


@pytest.fixture
def stubbed(monkeypatch, tmp_path):
    _AudioStub.calls = []
    import easevoice_trainer_tpu.service.audio as audio_mod
    import easevoice_trainer_tpu.service.normalize as norm_mod
    monkeypatch.setattr(audio_mod, "AudioService", _AudioStub)
    monkeypatch.setattr(norm_mod, "NormalizeService", _NormStub)

    trains = []

    def fake_run_train(module, request):
        trains.append((module, request.train_input_dir))
        _AudioStub.calls.append(module)
        return _ok(data={"model_path": f"/models/{module}"})

    monkeypatch.setattr(easy_mode, "_run_train", fake_run_train)

    session_writes = []
    monkeypatch.setattr(easy_mode._connector, "write_session_data",
                        session_writes.append)
    return tmp_path, trains, session_writes


def test_easy_mode_runs_all_steps_in_order(stubbed):
    tmp_path, trains, session_writes = stubbed
    resp = easy_mode.main({"source_dir": str(tmp_path),
                           "project_dir": str(tmp_path)})
    assert resp.status == ResponseStatus.SUCCESS
    assert _AudioStub.calls == ["uvr5", "slicer", "denoise", "asr",
                                "normalize", "train_sovits", "train_gpt"]
    # both trainers got the normalize output dir
    assert trains == [("train_sovits", "/tmp/normed"),
                      ("train_gpt", "/tmp/normed")]
    assert resp.data == {"sovits_output": "/models/train_sovits",
                         "gpt_output": "/models/train_gpt"}
    # progress reached 100% at step 7
    progresses = [w.get("progress") for w in session_writes
                  if "progress" in w]
    assert progresses[-1] == 100.0


def test_easy_mode_fails_fast(stubbed, monkeypatch):
    tmp_path, trains, session_writes = stubbed
    monkeypatch.setattr(
        _AudioStub, "denoise",
        lambda self: EaseVoiceResponse(ResponseStatus.FAILED, "boom"))
    with pytest.raises(easy_mode._StepFailed, match="Audio Denoise"):
        easy_mode.main({"source_dir": str(tmp_path)})
    # ASR and everything after never ran
    assert "asr" not in _AudioStub.calls
    assert trains == []
    # the failure description was surfaced to the session stream
    descs = [w.get("current_step_description", "") for w in session_writes]
    assert any("failed: boom" in d for d in descs)
