"""Dataset normalization: text -> BERT, audio -> SSL, SSL -> semantic tokens.

Rebuild of the reference 3-stage Normalize pipeline
(reference: src/normalization/normalize.py:22-211), producing the exact
artifact formats downstream trainers read:

  2-name2text.txt        name\tphones\tword2ph\tnorm_text
  3-bert/{name}.pt       (1024, n_phones) phone-level BERT features (zh)
  4-cnhubert/{name}.pt   (1, 768, T) SSL features
  5-wav32k/{name}        int16 32 kHz audio
  6-name2semantic.tsv    item_name\tsemantic_audio

Quirk preserved on purpose: the reference feeds hubert a waveform scaled by
the 1145.14 amplitude-mix formula (normalize.py:155-163) rather than [-1,1];
the pretrained cnhubert expects that.  NaN outputs trigger an fp32 retry in
the reference; here compute is fp32 already, so NaN simply fails the item.

Features are written as torch .pt tensors for byte-compat with reference
trainers, with .npy twins skipped (the torch file is canonical).
"""
from __future__ import annotations

import os
import random
import string
import traceback
from typing import List, Optional

import numpy as np

from .utils import audio_io, paths
from .utils.logger import logger
from .utils.response import EaseVoiceResponse, ResponseStatus


def random_choice(k: int = 8) -> str:
    return "".join(random.choices(string.ascii_lowercase + string.digits,
                                  k=k))


class Normalize:
    MAXX = 0.95
    ALPHA = 0.5

    def __init__(self, processing_path: str, predefine_output_path: str = ""):
        self.source_path = processing_path
        self.refinement_list = os.path.join(
            processing_path, paths.REFINEMENTS_OUTPUT, paths.REFINEMENT_FILE)
        self.denoises_dir = os.path.join(processing_path,
                                         paths.DENOISES_OUTPUT)
        out_name = predefine_output_path or random_choice()
        self.output_path = os.path.join(processing_path, out_name)
        os.makedirs(self.output_path, exist_ok=True)
        self.text_output_path = os.path.join(self.output_path,
                                             paths.TEXT_OUTPUT_NAME)
        self.bert_dir = os.path.join(self.output_path, paths.BERT_OUTPUT)
        self.hubert_dir = os.path.join(self.output_path, paths.SSL_OUTPUT)
        self.wav_dir = os.path.join(self.output_path, paths.WAV_OUTPUT)
        self.semantic_output_path = os.path.join(self.output_path,
                                                 paths.SEMANTIC_OUTPUT)
        for d in (self.bert_dir, self.hubert_dir, self.wav_dir):
            os.makedirs(d, exist_ok=True)
        for f in (self.text_output_path, self.semantic_output_path):
            if os.path.exists(f):
                os.remove(f)

        from .utils.config import GlobalCFG

        cfg = GlobalCFG()
        self.bert_path = cfg.bert_path
        self.cnhubert_path = cfg.cnhubert_path
        self.s2g_path = cfg.sovits_path

    # ---- helpers -------------------------------------------------------------

    def _read_refinements(self) -> List[List[str]]:
        with open(self.refinement_list, encoding="utf8") as f:
            lines = f.read().strip("\n").split("\n")
        out = []
        for line in lines:
            parts = line.split("|", 2)
            if len(parts) == 3:
                out.append(parts)
        return out

    @staticmethod
    def _save_pt(array: np.ndarray, path: str) -> None:
        import torch

        torch.save(torch.from_numpy(np.ascontiguousarray(array)), path)

    # ---- stage 1: text ---------------------------------------------------------

    def text(self) -> EaseVoiceResponse:
        from .text.cleaner import clean_text
        from .models.bert import BertFeatureExtractor

        bert = BertFeatureExtractor(self.bert_path)
        rows = []
        for wav_name, lan, text in self._read_refinements():
            try:
                name = os.path.basename(wav_name.replace("\\", "/"))
                phones, word2ph, norm_text = clean_text(
                    text.replace("%", "-").replace("￥", ","), lan)
                if lan == "zh":
                    path_bert = os.path.join(self.bert_dir, name + ".pt")
                    if not os.path.exists(path_bert):
                        if not bert.available:
                            return EaseVoiceResponse(
                                ResponseStatus.FAILED,
                                f"BERT model unavailable at {self.bert_path}")
                        feature = bert.phone_features(norm_text, word2ph)
                        if feature.shape[-1] != len(phones):
                            return EaseVoiceResponse(
                                ResponseStatus.FAILED,
                                "bert_feature and phones not match")
                        self._save_pt(feature, path_bert)
                rows.append((name, " ".join(phones), word2ph, norm_text))
            except Exception:
                logger.error("text normalize failed for %s\n%s", wav_name,
                             traceback.format_exc())
                return EaseVoiceResponse(ResponseStatus.FAILED,
                                         "failed to process text")
        with open(self.text_output_path, "w", encoding="utf8") as f:
            f.write("\n".join("%s\t%s\t%s\t%s" % r for r in rows) + "\n")
        return EaseVoiceResponse(ResponseStatus.SUCCESS, "success")

    # ---- stage 2: ssl ------------------------------------------------------------

    def ssl(self) -> EaseVoiceResponse:
        from .models.cnhubert import load_cnhubert

        model, params = load_cnhubert(self.cnhubert_path)
        if params is None:
            return EaseVoiceResponse(
                ResponseStatus.FAILED,
                f"cnhubert weights unavailable at {self.cnhubert_path}")
        self.hubert_cfg = model.cfg
        import jax

        apply = jax.jit(model.apply)
        for wav_name, _lan, _text in self._read_refinements():
            name = os.path.basename(wav_name.replace("\\", "/"))
            if not self._ssl_one(name, apply, params):
                return EaseVoiceResponse(ResponseStatus.FAILED,
                                         f"failed to process wav {name}")
        return EaseVoiceResponse(ResponseStatus.SUCCESS, "success")

    def _ssl_one(self, name: str, apply, params) -> bool:
        hubert_path = os.path.join(self.hubert_dir, name + ".pt")
        if os.path.exists(hubert_path):
            return True
        wav_path = os.path.join(self.denoises_dir, name)
        if not os.path.exists(wav_path):
            logger.warning("missing wav %s", wav_path)
            return True
        audio = audio_io.load_audio(wav_path, 32000)
        peak = np.abs(audio).max()
        if peak <= 0 or peak > 2.2:
            return True  # reference skips clipped/silent items
        # amplitude-mix (normalize.py:155-163): int16-scale for the wav file,
        # 1145.14-scale for the hubert input
        audio32 = (audio / peak * (self.MAXX * self.ALPHA * 32768)
                   + (1 - self.ALPHA) * 32768 * audio)
        audio_b = (audio / peak * (self.MAXX * self.ALPHA * 1145.14)
                   + (1 - self.ALPHA) * 1145.14 * audio)
        wav16 = audio_io.resample(audio_b.astype(np.float32), 32000, 16000)
        # Pad to a 0.5 s bucket so XLA compiles once per bucket instead of
        # once per distinct clip length (each compile is ~30 s on a TPU).
        # CNHubert masks padded frames out of attention and zeroes their
        # inputs, so valid frames are bit-identical to the unpadded run.
        from .models.cnhubert import feat_output_lengths

        true_len = wav16.shape[0]
        bucket = max(8000, -(-true_len // 8000) * 8000)
        padded = np.zeros((bucket,), np.float32)
        padded[:true_len] = wav16
        ssl = np.asarray(apply(params, padded[None, :],
                               np.asarray([true_len], np.int32)))
        frames = int(feat_output_lengths(np.asarray(true_len),
                                         self.hubert_cfg))
        ssl = ssl[:, :frames, :]                          # (1, T, 768)
        if np.isnan(ssl).any():
            return False
        audio_io.write_wav(os.path.join(self.wav_dir, name),
                           np.clip(audio32, -32768, 32767).astype(np.int16),
                           32000)
        # store (1, 768, T) like the reference
        self._save_pt(ssl.transpose(0, 2, 1).astype(np.float32), hubert_path)
        return True

    # ---- stage 3: token -------------------------------------------------------------

    def token(self) -> EaseVoiceResponse:
        from .models.sovits import SynthesizerTrn, SovitsConfig
        from .train import ckpt as ckpt_io
        import jax
        import json

        if not os.path.exists(self.s2g_path):
            return EaseVoiceResponse(
                ResponseStatus.FAILED,
                f"pretrained s2G unavailable at {self.s2g_path}")
        with open(paths.s2_config_path(), encoding="utf8") as f:
            cfg = SovitsConfig.from_json_dict(json.load(f))
        model = SynthesizerTrn(cfg)
        tree, _ = ckpt_io.load_sovits_pretrained(self.s2g_path)
        apply = jax.jit(
            lambda p, ssl: model.apply({"params": p}, ssl,
                                       method=SynthesizerTrn.extract_latent))

        rows = ["item_name\tsemantic_audio"]
        import torch

        for wav_name, _lan, _text in self._read_refinements():
            name = os.path.basename(wav_name.replace("\\", "/"))
            hubert_path = os.path.join(self.hubert_dir, name + ".pt")
            if not os.path.exists(hubert_path):
                continue
            ssl = torch.load(hubert_path, map_location="cpu",
                             weights_only=False)
            ssl = ssl.to(torch.float32).numpy().transpose(0, 2, 1)  # (1,T,768)
            # bucket the time axis (ssl_proj is a VALID k=2 s=2 conv and the
            # quantizer is per-frame, so codes for real frames are exact;
            # the padded tail is sliced off)
            t = ssl.shape[1]
            bucket = max(32, -(-t // 32) * 32)
            if bucket != t:
                ssl = np.pad(ssl, ((0, 0), (0, bucket - t), (0, 0)))
            n_codes = t // 2 if cfg.semantic_frame_rate == "25hz" else t
            codes = np.asarray(apply(tree, ssl))[0][:n_codes]
            rows.append("%s\t%s" % (name, " ".join(str(int(i))
                                                   for i in codes)))
        with open(self.semantic_output_path, "w", encoding="utf8") as f:
            f.write("\n".join(rows) + "\n")
        return EaseVoiceResponse(ResponseStatus.SUCCESS, "success")
