"""Validate the REAL released checkpoints against this framework.

Closes the "replica-only validation" caveat (docs/PARITY.md): the
converters are parity-tested against torch replicas and layout-tested
against vendored manifests, but this environment has no egress, so no
converter has seen actual published weights.  This tool runs the moment
weights are available (fetched by tools/fetch_pretrained.py, or any
--base dir in the same layout) and, per checkpoint:

1. **layout** — the real file's key->shape map must equal the vendored
   manifest (easevoice_trainer_tpu/assets/manifests/*.json), modulo a
   documented allow-list of torch-version buffers (position_ids etc.);
2. **convert** — the converter must consume it with only the documented
   unmatched keys (same allow-lists as tests/test_manifests.py);
3. **smoke** — a real numeric forward through the converted JAX model
   must return finite values.

Reference load sites being validated:
  s2G/s2D/s1  reference: src/easevoice/inference/tts.py:268-310
  cnhubert    reference: src/easevoice/feature_extractor/cnhubert.py:20
  roberta     reference: src/normalization/normalize.py:67
  uvr5        reference: src/audiokit/uvr5/separate.py:93-99,291-296
  whisper     openai/whisper-small (our yue/multilingual ASR substitute)

Usage:
    python tools/validate_released.py [--base models] [--only NAME ...]
    python tools/validate_released.py --list

Offline (weights absent) each entry reports SKIP, exit code 0; a present
checkpoint that fails any check exits 1.  The CI-style hook is
tests/test_released_weights.py (marker: ``released``) which calls the
same validators and pytest-skips when weights are absent.
"""
from __future__ import annotations

import argparse
import fnmatch
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

MANIFEST_DIR = os.path.join(REPO, "easevoice_trainer_tpu", "assets",
                            "manifests")

# torch/transformers version-dependent buffers that may appear in real
# files but carry no weights (and vice versa)
_LAYOUT_IGNORE = [
    "*position_ids",              # transformers <4.31 registered buffer
    "*num_batches_tracked",       # BN counters: count pinned, value free
]


class CheckFailure(AssertionError):
    pass


def _manifest(name: str) -> dict:
    with open(os.path.join(MANIFEST_DIR, name + ".json"),
              encoding="utf8") as f:
        return json.load(f)["keys"]


def _ignored(key: str, extra: tuple = ()) -> bool:
    return any(fnmatch.fnmatch(key, pat)
               for pat in list(_LAYOUT_IGNORE) + list(extra))


def check_layout(state: dict, manifest_name: str,
                 allow: tuple = ()) -> None:
    """Real key->shape map == vendored manifest (modulo allow-list)."""
    want = _manifest(manifest_name)
    got = {k: list(np.asarray(v).shape) for k, v in state.items()}
    missing = [k for k in want if k not in got and not _ignored(k, allow)]
    extra = [k for k in got if k not in want and not _ignored(k, allow)]
    bad = [(k, got[k], want[k]) for k in want
           if k in got and got[k] != want[k] and not _ignored(k, allow)]
    problems = []
    if missing:
        problems.append(f"missing keys: {missing[:8]}")
    if extra:
        problems.append(f"unexpected keys: {extra[:8]}")
    if bad:
        problems.append(f"shape mismatches: {bad[:4]}")
    if problems:
        raise CheckFailure(f"{manifest_name} layout drift — "
                           + "; ".join(problems))


def _finite(x, what: str) -> None:
    arr = np.asarray(x, np.float32)
    if not np.isfinite(arr).all():
        raise CheckFailure(f"{what}: non-finite output")


# ---------------------------------------------------------------------------
# per-checkpoint validators: fn(path) -> None or raise CheckFailure
# ---------------------------------------------------------------------------


def validate_s2g(path: str) -> None:
    import jax
    from easevoice_trainer_tpu.train import ckpt

    state = ckpt.load_torch_state(path)
    check_layout(state, "s2G")
    tree, unmatched = ckpt.torch_to_flax(state,
                                         ckpt.sovits_generator_rules())
    allowed = {"quantizer.vq.layers.0._codebook.cluster_size",
               "quantizer.vq.layers.0._codebook.embed_avg",
               "quantizer.vq.layers.0._codebook.inited"}
    stray = sorted(set(unmatched) - allowed)
    if stray:
        raise CheckFailure(f"s2G converter left real keys: {stray[:8]}")

    from easevoice_trainer_tpu.models.sovits import (SovitsConfig,
                                                     SynthesizerTrn)

    synth = SynthesizerTrn(SovitsConfig())
    ssl = np.random.default_rng(0).normal(
        size=(1, 32, 768)).astype(np.float32)
    codes = jax.jit(lambda p, s: synth.apply(
        {"params": p}, s, method=SynthesizerTrn.extract_latent))(tree, ssl)
    codes = np.asarray(codes)
    if not ((codes >= 0) & (codes < 1024)).all():
        raise CheckFailure("s2G extract_latent produced out-of-range codes")


def validate_s2d(path: str) -> None:
    import jax
    from easevoice_trainer_tpu.train import ckpt
    from easevoice_trainer_tpu.models.sovits import MultiPeriodDiscriminator

    state = ckpt.load_torch_state(path)
    check_layout(state, "s2D")
    tree, unmatched = ckpt.torch_to_flax(
        state, ckpt.sovits_discriminator_rules())
    if unmatched:
        raise CheckFailure(f"s2D converter left real keys: {unmatched[:8]}")
    disc = MultiPeriodDiscriminator()
    y = np.random.default_rng(0).uniform(
        -0.5, 0.5, (1, 2560, 1)).astype(np.float32)
    outs = jax.jit(lambda p: disc.apply({"params": p}, y, y))(tree)
    _finite(np.concatenate([np.ravel(o) for o in outs[0]]), "s2D forward")


def validate_s1(path: str) -> None:
    import jax
    from easevoice_trainer_tpu.train import ckpt
    from easevoice_trainer_tpu.models.gpt import (T2SConfig,
                                                  Text2SemanticDecoder)

    meta = ckpt.load_torch_meta(path)
    state = ckpt.load_torch_state(path)
    check_layout(state, "s1_gpt")
    if "config" not in meta:
        raise CheckFailure("s1 ckpt missing the 'config' dict "
                           "(reference tts.py:306 reads it)")
    tree, unmatched = ckpt.torch_to_flax(state, ckpt.gpt_rules())
    if unmatched:
        raise CheckFailure(f"s1 converter left real keys: {unmatched[:8]}")
    model = Text2SemanticDecoder(T2SConfig())
    rng = np.random.default_rng(0)
    out = jax.jit(lambda p: model.apply(
        {"params": p},
        rng.integers(0, 732, (1, 8)).astype(np.int32),
        np.array([8], np.int32),
        rng.integers(0, 1024, (1, 10)).astype(np.int32),
        np.array([10], np.int32),
        rng.normal(size=(1, 8, 1024)).astype(np.float32)))(tree)
    _finite(out["logits"], "s1 forward")


def validate_cnhubert(path: str) -> None:
    import jax
    from easevoice_trainer_tpu.models.cnhubert import load_cnhubert

    state_path = os.path.join(path, "pytorch_model.bin")
    from easevoice_trainer_tpu.train import ckpt

    check_layout(ckpt.load_torch_state(state_path), "cnhubert",
                 allow=("masked_spec_embed",))
    hubert, params = load_cnhubert(path)
    wav = np.random.default_rng(0).uniform(
        -0.3, 0.3, (1, 16000)).astype(np.float32)
    feats = jax.jit(hubert.apply)(params, wav)
    if np.asarray(feats).shape[-1] != 768:
        raise CheckFailure("cnhubert features not 768-d")
    _finite(feats, "cnhubert forward")


def validate_roberta(path: str) -> None:
    from easevoice_trainer_tpu.models.bert import BertFeatureExtractor
    from easevoice_trainer_tpu.train import ckpt

    check_layout(ckpt.load_torch_state(
        os.path.join(path, "pytorch_model.bin")), "roberta_large",
        allow=("cls.*",))
    bert = BertFeatureExtractor(path)
    if not bert.available:
        raise CheckFailure("BertFeatureExtractor did not come up")
    feats = bert.phone_features("今天天气真好", [2] * 6)
    if feats.shape != (1024, 12):
        raise CheckFailure(f"roberta phone features wrong: {feats.shape}")
    _finite(feats, "roberta forward")


def _validate_vr(path: str, manifest: str, layout: dict) -> None:
    import jax
    from easevoice_trainer_tpu.audiokit import uvr5
    from easevoice_trainer_tpu.train import ckpt

    state = ckpt.load_torch_state(path)
    check_layout(state, manifest)
    params, batch_stats, got_layout = uvr5.convert_vr_weights(state)
    if got_layout != layout:
        raise CheckFailure(f"VR capacity sniff {got_layout} != {layout}")
    net = uvr5.CascadedASPPNet(n_fft=1344, **got_layout)
    x = np.abs(np.random.default_rng(0).normal(
        size=(1, 673, 64, 2))).astype(np.float32)
    mask = jax.jit(net.apply)(
        {"params": params, "batch_stats": batch_stats}, x)
    _finite(mask, f"{manifest} forward")


def validate_uvr5_vr(path: str) -> None:
    _validate_vr(path, "uvr5_vr",
                 {"ch1": 32, "ch2": 16, "ch3": 32, "enlarge": False})


def _validate_deecho(path: str, manifest: str, nout: int) -> None:
    import jax
    from easevoice_trainer_tpu.audiokit import uvr5_deecho
    from easevoice_trainer_tpu.train import ckpt

    state = ckpt.load_torch_state(path)
    check_layout(state, manifest)
    params, batch_stats = uvr5_deecho.convert_deecho_weights(state)
    net = uvr5_deecho.CascadedNet(n_fft=1344, nout=nout)
    x = np.abs(np.random.default_rng(0).normal(
        size=(1, 673, 64, 2))).astype(np.float32)
    mask = jax.jit(net.apply)(
        {"params": params, "batch_stats": batch_stats}, x)
    _finite(mask, f"{manifest} forward")


def validate_uvr5_deecho(path: str) -> None:
    _validate_deecho(path, "uvr5_deecho", 48)


def validate_uvr5_dereverb(path: str) -> None:
    _validate_deecho(path, "uvr5_dereverb", 64)


def validate_whisper(path: str) -> None:
    import jax
    from easevoice_trainer_tpu.audiokit import asr_whisper as w
    from easevoice_trainer_tpu.train import ckpt

    state = ckpt.load_torch_state(os.path.join(path, "pytorch_model.bin"))
    check_layout(state, "whisper_small", allow=("proj_out.weight",))
    with open(os.path.join(path, "config.json"), encoding="utf8") as f:
        cfg = w.WhisperConfig.from_hf(json.load(f))
    enc_p, dec_p, cross_p = w.convert_whisper_weights(state, cfg)
    mel = np.random.default_rng(0).normal(
        size=(1, cfg.num_mel_bins, 3000)).astype(np.float32)
    enc, _dec, _cross = w.build_model(cfg)
    feats = jax.jit(lambda p, m: enc.apply({"params": p}, m))(enc_p, mel)
    _finite(feats, "whisper encoder forward")
    assert dec_p and cross_p


def validate_frcrn(path: str) -> None:
    from easevoice_trainer_tpu.audiokit import frcrn

    state = frcrn.load_torch_state(path)
    check_layout(state, "frcrn")
    den = frcrn.FRCRNDenoiser(path)      # adapts + converts + jits
    wav = np.random.default_rng(0).uniform(
        -0.3, 0.3, 16000).astype(np.float32)
    out = den.process(wav, 16000)
    _finite(out, "frcrn denoise")


# name -> (relative path under --base/models, validator)
VALIDATORS = {
    "s2G": ("pretrained/gsv-v2final-pretrained/s2G2333k.pth", validate_s2g),
    "s2D": ("pretrained/gsv-v2final-pretrained/s2D2333k.pth", validate_s2d),
    "s1_gpt": ("pretrained/gsv-v2final-pretrained/"
               "s1bert25hz-5kh-longer-epoch=12-step=369668.ckpt",
               validate_s1),
    "cnhubert": ("pretrained/chinese-hubert-base", validate_cnhubert),
    "roberta": ("pretrained/chinese-roberta-wwm-ext-large",
                validate_roberta),
    "uvr5_vr": ("uvr5_weights/HP2_all_vocals.pth", validate_uvr5_vr),
    "uvr5_deecho": ("uvr5_weights/VR-DeEchoNormal.pth",
                    validate_uvr5_deecho),
    "uvr5_dereverb": ("uvr5_weights/VR-DeEchoDeReverb.pth",
                      validate_uvr5_dereverb),
    "whisper": ("pretrained/whisper-small", validate_whisper),
    "frcrn": ("pretrained/speech_frcrn_ans_cirm_16k/pytorch_model.bin",
              validate_frcrn),
}


def run(base: str, only=None) -> dict:
    """Run every (available) validator; returns {name: 'ok'|'skip'|error}."""
    results = {}
    for name, (rel, fn) in VALIDATORS.items():
        if only and name not in only:
            continue
        path = os.path.join(base, "models", rel)
        if not os.path.exists(path):
            results[name] = "skip"
            continue
        try:
            fn(path)
            results[name] = "ok"
        except Exception as exc:
            results[name] = f"FAIL {type(exc).__name__}: {exc}"
    return results


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default=REPO,
                    help="dir containing models/ (fetch_pretrained layout)")
    ap.add_argument("--only", action="append", choices=sorted(VALIDATORS))
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        for name, (rel, _) in VALIDATORS.items():
            print(f"{name:15s} models/{rel}")
        return 0
    results = run(args.base, args.only)
    failed = 0
    for name, res in results.items():
        print(f"{name:15s} {res}")
        if res.startswith("FAIL"):
            failed += 1
    n_ok = sum(1 for r in results.values() if r == "ok")
    n_skip = sum(1 for r in results.values() if r == "skip")
    print(f"\n{n_ok} ok, {n_skip} skipped (weights absent), {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
