"""Fetch the released model weights this framework loads at runtime.

The nets and converters are all in-repo; the *released weights* are not
vendored (multi-GB, upstream-licensed).  This tool downloads them into
the layout `utils/config.py` / `audiokit/uvr5.py` expect (the same
layout the reference documents: README.md:39 -> GPT-SoVITS pretrained
models dropped into `models/`).

Usage:
    python tools/fetch_pretrained.py --list
    python tools/fetch_pretrained.py [--base PATH] [--only core|uvr5|asr]

Needs network access + huggingface_hub (installed with transformers).
The FRCRN denoiser checkpoint lives on modelscope
(damo/speech_frcrn_ans_cirm_16k) — fetch it with the modelscope CLI or
pass its local path via the service config; everything else is on HF.
"""
from __future__ import annotations

import argparse
import os
import sys

# (hf repo, file in repo, local path under {base}/models)
MANIFEST = {
    "core": [
        # s1 GPT + s2 SoVITS pretrained (reference README.md:39)
        ("lj1995/GPT-SoVITS",
         "gsv-v2final-pretrained/s1bert25hz-5kh-longer-epoch=12-step=369668.ckpt",
         "pretrained/gsv-v2final-pretrained/s1bert25hz-5kh-longer-epoch=12-step=369668.ckpt"),
        ("lj1995/GPT-SoVITS", "gsv-v2final-pretrained/s2G2333k.pth",
         "pretrained/gsv-v2final-pretrained/s2G2333k.pth"),
        ("lj1995/GPT-SoVITS", "gsv-v2final-pretrained/s2D2333k.pth",
         "pretrained/gsv-v2final-pretrained/s2D2333k.pth"),
        # text/ssl encoders
        ("lj1995/GPT-SoVITS", "chinese-roberta-wwm-ext-large/config.json",
         "pretrained/chinese-roberta-wwm-ext-large/config.json"),
        ("lj1995/GPT-SoVITS",
         "chinese-roberta-wwm-ext-large/pytorch_model.bin",
         "pretrained/chinese-roberta-wwm-ext-large/pytorch_model.bin"),
        ("lj1995/GPT-SoVITS",
         "chinese-roberta-wwm-ext-large/tokenizer.json",
         "pretrained/chinese-roberta-wwm-ext-large/tokenizer.json"),
        ("lj1995/GPT-SoVITS", "chinese-hubert-base/config.json",
         "pretrained/chinese-hubert-base/config.json"),
        ("lj1995/GPT-SoVITS", "chinese-hubert-base/pytorch_model.bin",
         "pretrained/chinese-hubert-base/pytorch_model.bin"),
        ("lj1995/GPT-SoVITS",
         "chinese-hubert-base/preprocessor_config.json",
         "pretrained/chinese-hubert-base/preprocessor_config.json"),
        # G2PW polyphone model (text/g2pw loads from this dir when present)
        ("lj1995/GPT-SoVITS", "G2PWModel/g2pW.onnx",
         "pretrained/G2PWModel/g2pW.onnx"),
    ],
    "uvr5": [
        ("lj1995/VoiceConversionWebUI", f"uvr5_weights/{name}",
         f"uvr5_weights/{name}")
        for name in (
            "HP2_all_vocals.pth", "HP3_all_vocals.pth",
            "HP5_only_main_vocal.pth",
            "VR-DeEchoNormal.pth", "VR-DeEchoAggressive.pth",
            "VR-DeEchoDeReverb.pth",
            "onnx_dereverb_By_FoxJoy/vocals.onnx",
        )
    ],
    "asr": [
        # JAX Whisper fallback reads any HF whisper checkpoint dir
        ("openai/whisper-small", "config.json", "asr/whisper-small/config.json"),
        ("openai/whisper-small", "pytorch_model.bin",
         "asr/whisper-small/pytorch_model.bin"),
        ("openai/whisper-small", "tokenizer.json",
         "asr/whisper-small/tokenizer.json"),
        # zh Paraformer (audiokit/asr_paraformer.py) — funasr's HF mirror
        # of the modelscope repo the reference uses
        # (iic/speech_paraformer-large_asr_nat-zh-cn-16k-common-vocab8404)
        ("funasr/paraformer-zh", "model.pt", "asr/paraformer-zh/model.pt"),
        ("funasr/paraformer-zh", "config.yaml",
         "asr/paraformer-zh/config.yaml"),
        ("funasr/paraformer-zh", "am.mvn", "asr/paraformer-zh/am.mvn"),
        ("funasr/paraformer-zh", "tokens.json",
         "asr/paraformer-zh/tokens.json"),
        # zh VAD + punctuation (audiokit/vad_fsmn.py, audiokit/punc_ct.py) —
        # funasr's HF mirrors of the modelscope repos the reference uses
        # (iic/speech_fsmn_vad_zh-cn-16k-common-pytorch,
        #  iic/punc_ct-transformer_zh-cn-common-vocab272727-pytorch)
        ("funasr/fsmn-vad", "model.pt", "asr/fsmn-vad/model.pt"),
        ("funasr/fsmn-vad", "config.yaml", "asr/fsmn-vad/config.yaml"),
        ("funasr/fsmn-vad", "am.mvn", "asr/fsmn-vad/am.mvn"),
        ("funasr/ct-punc", "model.pt", "asr/ct-punc/model.pt"),
        ("funasr/ct-punc", "config.yaml", "asr/ct-punc/config.yaml"),
        ("funasr/ct-punc", "tokens.json", "asr/ct-punc/tokens.json"),
    ],
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default=os.environ.get("EASEVOICE_BASE_PATH", "."),
                    help="install root; weights land under {base}/models")
    ap.add_argument("--only", choices=sorted(MANIFEST), action="append",
                    help="restrict to a group (repeatable); default: all")
    ap.add_argument("--list", action="store_true",
                    help="print the manifest and exit")
    args = ap.parse_args()

    groups = args.only or sorted(MANIFEST)
    entries = [e for g in groups for e in MANIFEST[g]]
    if args.list:
        for repo, src, dst in entries:
            print(f"{repo:35s} {src:70s} -> models/{dst}")
        return 0

    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("huggingface_hub is required (pip install huggingface_hub)",
              file=sys.stderr)
        return 1

    root = os.path.join(os.path.abspath(args.base), "models")
    failures = []
    for repo, src, dst in entries:
        target = os.path.join(root, dst)
        if os.path.exists(target):
            print(f"have     {dst}")
            continue
        os.makedirs(os.path.dirname(target), exist_ok=True)
        try:
            got = hf_hub_download(repo_id=repo, filename=src)
            import shutil
            shutil.copy2(got, target)
            print(f"fetched  {dst}")
        except Exception as exc:
            failures.append((dst, str(exc)[:120]))
            print(f"FAILED   {dst}: {exc}", file=sys.stderr)
    if failures:
        print(f"\n{len(failures)} file(s) failed — upstream repos may have "
              "moved; check the manifest paths.", file=sys.stderr)
        return 2
    print("\nAll weights in place under", root)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
