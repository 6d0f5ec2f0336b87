"""Voice-clone service e2e: session guard -> TTS -> WAV on disk."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the default fast run

from easevoice_trainer_tpu.models.sovits import SynthesizerTrn, SovitsConfig
from easevoice_trainer_tpu.models.gpt import Text2SemanticDecoder, T2SConfig
from easevoice_trainer_tpu.models.cnhubert import CNHubert, HubertConfig
from easevoice_trainer_tpu.inference.tts import TTS, TTSConfig
from easevoice_trainer_tpu.service.session import (
    SessionManager, backtask_with_session_guard, SessionConflictError)
from easevoice_trainer_tpu.service.voice import VoiceCloneService
from easevoice_trainer_tpu.utils import audio_io
from easevoice_trainer_tpu.utils.response import ResponseStatus


@pytest.fixture
def tiny_tts(tmp_path):
    key = jax.random.PRNGKey(0)
    vits_cfg = SovitsConfig(
        spec_channels=1025, segment_size=2560, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        upsample_initial_channel=32, gin_channels=32, ssl_dim=64,
        n_symbols=732, p_dropout=0.0)
    vits = SynthesizerTrn(vits_cfg)
    vvars = vits.init(
        {"params": key, "slice": key, "latent": key, "dropout": key},
        jnp.zeros((1, 8, 64)), jnp.zeros((1, 8, 1025)), jnp.array([8]),
        jnp.zeros((1, 4), jnp.int32), jnp.array([4]))
    t2s_cfg = T2SConfig(vocab_size=1025, phoneme_vocab_size=732,
                        embedding_dim=32, hidden_dim=32, n_heads=4,
                        n_layers=2, ffn_dim=64, dropout=0.0, eos_id=1024)
    t2s = Text2SemanticDecoder(t2s_cfg)
    tvars = t2s.init(key, jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
                     jnp.zeros((1, 6), jnp.int32), jnp.array([6]),
                     jnp.zeros((1, 4, 1024)))
    hcfg = HubertConfig(conv_dim=(16,) * 7, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128,
                        pos_conv_kernel=16, pos_conv_groups=4)
    hubert = CNHubert(hcfg)
    hvars = hubert.init(key, jnp.zeros((1, 16000)))
    cfg = TTSConfig(str(tmp_path / "tts_infer.yaml"))
    return TTS(cfg, models=dict(
        vits=vits, vits_cfg=vits_cfg, vits_params=vvars["params"],
        t2s=t2s, t2s_cfg=t2s_cfg, t2s_params=tvars["params"],
        cnhubert=hubert, cnhubert_params=hvars, bert=None))


def test_voice_clone_through_session(tiny_tts, tmp_path, rng):
    SessionManager.reset()
    manager = SessionManager()
    service = VoiceCloneService(manager, tts=tiny_tts)

    ref = rng.uniform(-0.3, 0.3, 32000 * 4).astype(np.float32)
    ref_path = str(tmp_path / "ref.wav")
    audio_io.write_wav(ref_path, ref, 32000)
    out_dir = str(tmp_path / "outputs")

    task = {
        "text": "Hello there.", "text_lang": "en",
        "ref_audio_path": ref_path, "prompt_text": "",
        "text_split_method": "by_english_period", "batch_size": 1,
        "output_dir": out_dir, "project_dir": str(tmp_path),
    }

    uid = "test-uid-1"
    backtask_with_session_guard(uid, "voice_clone", task,
                                lambda: service.clone(uid, task))
    # second task while running must conflict (if still running)
    for _ in range(600):
        info = manager.get_session_info().get(uid, {})
        status = str(info.get("status"))
        if status in ("Status.COMPLETED", "Status.FAILED"):
            break
        time.sleep(0.5)
    assert status == "Status.COMPLETED", info.get("error")
    files = os.listdir(out_dir)
    assert len(files) == 1 and files[0].startswith("voice_")
    wav, sr = audio_io.read_wav(os.path.join(out_dir, files[0]))
    assert sr == 32000 and len(wav) > 3200

    # session cleared; a new task may start
    assert not manager.exist_running_session()
    models = service.models(str(tmp_path))
    assert models == {"gpts": [], "sovits": []}
