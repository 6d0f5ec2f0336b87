"""FRCRN speech denoiser in JAX (complex CRED + frequency recurrence).

The reference delegates noise suppression to modelscope's
``speech_frcrn_ans_cirm_16k`` pipeline (reference:
src/audiokit/denoise/denoise.py:9-21) — the FRCRN model of Zhao et al.,
"FRCRN: Boosting Feature Representation using Frequency Recurrence for
Monaural Speech Enhancement" (ICASSP 2022).  modelscope ships the
architecture with the weights; it is not part of the reference repo.  This
module is a from-scratch TPU-native implementation of that architecture:

* analysis/synthesis "ConvSTFT" with a sqrt-Hann dual window
  (win 640 / hop 320 / fft 640 @ 16 kHz — the released model's config);
* two cascaded complex U-Nets (CRED): complex Conv2d encoder blocks with
  stride-2 frequency downsampling, a single-layer complex FSMN applied
  along the *frequency* axis after every (de)convolution block (the
  paper's "frequency recurrence"), and a two-layer complex FSMN over time
  between encoder and decoder;
* complex ideal-ratio-mask (cIRM) output: ``mask = tanh(unet1) +
  tanh(unet2(unet1))`` applied by complex multiplication, then iSTFT.

Everything is expressed as batched matmuls/convs in NHWC-ish layouts so
XLA tiles it onto the MXU; the FSMN memory is a depthwise temporal conv.

Weights: :func:`convert_frcrn_weights` maps a torch state dict in the
canonical naming used by our torch replica (tests/test_frcrn.py — also a
key-map superset of the modelscope checkpoint names) onto flax params.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils import audio_io
from ..utils.logger import logger


# ---------------------------------------------------------------------------
# ConvSTFT / ConviSTFT (sqrt-Hann dual window, matches modelscope conv_stft)
# ---------------------------------------------------------------------------


def _sqrt_hann(win_len: int) -> np.ndarray:
    # periodic Hann ** 0.5 (fftbins=True in scipy.get_window terms)
    n = np.arange(win_len)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / win_len)
    return np.sqrt(hann).astype(np.float32)


def stft(wav: jnp.ndarray, win_len: int = 640, hop: int = 320,
         fft_len: int = 640) -> jnp.ndarray:
    """(B, S) -> complex (B, F, T) with F = fft_len//2 + 1.

    Input is padded by (win_len - hop) on both sides, like the reference
    pipeline's ConvSTFT.
    """
    window = jnp.asarray(_sqrt_hann(win_len))
    pad = win_len - hop
    x = jnp.pad(wav, ((0, 0), (pad, pad)))
    n_frames = 1 + (x.shape[1] - win_len) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(win_len)[None, :])
    frames = x[:, idx] * window                       # (B, T, win)
    spec = jnp.fft.rfft(frames, n=fft_len, axis=-1)   # (B, T, F)
    return spec.transpose(0, 2, 1)                    # (B, F, T)


def istft(spec: jnp.ndarray, out_len: int, win_len: int = 640,
          hop: int = 320, fft_len: int = 640) -> jnp.ndarray:
    """complex (B, F, T) -> (B, out_len); dual-window overlap-add."""
    window = jnp.asarray(_sqrt_hann(win_len))
    frames = jnp.fft.irfft(spec.transpose(0, 2, 1), n=fft_len, axis=-1)
    frames = frames[..., :win_len] * window           # (B, T, win)
    b, t = frames.shape[0], frames.shape[1]
    total = (t - 1) * hop + win_len
    # overlap-add via scatter-add on a flat index map
    idx = (np.arange(t)[:, None] * hop + np.arange(win_len)[None, :]).ravel()
    out = jnp.zeros((b, total), frames.dtype).at[:, idx].add(
        frames.reshape(b, -1))
    wsum = jnp.zeros((total,), frames.dtype).at[idx].add(
        jnp.tile(window ** 2, (t,)))
    out = out / jnp.maximum(wsum, 1e-8)
    pad = win_len - hop
    return out[:, pad:pad + out_len]


# ---------------------------------------------------------------------------
# complex building blocks.  Complex tensors are (..., 2): [real, imag].
# ---------------------------------------------------------------------------


def _cmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    re = a[..., 0] * b[..., 0] - a[..., 1] * b[..., 1]
    im = a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0]
    return jnp.stack([re, im], -1)


class ComplexConv(nn.Module):
    """Complex conv2d over (B, F, T, C, 2) feature maps.

    Frequency axis: kernel kf, stride sf, symmetric pad (kf//2).
    Time axis: kernel kt, stride 1, left (causal) pad kt-1.
    """

    features: int
    kf: int = 5
    kt: int = 2
    sf: int = 2

    @nn.compact
    def __call__(self, x):
        pads = [(self.kf // 2, self.kf // 2), (self.kt - 1, 0)]
        conv_re = nn.Conv(self.features, (self.kf, self.kt),
                          strides=(self.sf, 1), padding=pads, name="conv_re")
        conv_im = nn.Conv(self.features, (self.kf, self.kt),
                          strides=(self.sf, 1), padding=pads, name="conv_im")
        re = conv_re(x[..., 0]) - conv_im(x[..., 1])
        im = conv_re(x[..., 1]) + conv_im(x[..., 0])
        return jnp.stack([re, im], -1)


class ComplexConvTranspose(nn.Module):
    """Complex transposed conv: frequency upsample x2, time preserved."""

    features: int
    kf: int = 5
    kt: int = 2
    sf: int = 2

    @nn.compact
    def __call__(self, x, out_f: int):
        conv_re = nn.ConvTranspose(self.features, (self.kf, self.kt),
                                   strides=(self.sf, 1), padding="VALID",
                                   transpose_kernel=True, name="conv_re")
        conv_im = nn.ConvTranspose(self.features, (self.kf, self.kt),
                                   strides=(self.sf, 1), padding="VALID",
                                   transpose_kernel=True, name="conv_im")
        re = conv_re(x[..., 0]) - conv_im(x[..., 1])
        im = conv_re(x[..., 1]) + conv_im(x[..., 0])
        y = jnp.stack([re, im], -1)
        # crop frequency to the skip connection's size and undo the time
        # expansion of the VALID transpose (kt-1 extra frames, causal side)
        f0 = (y.shape[1] - out_f) // 2
        t_extra = y.shape[2] - x.shape[2]
        return y[:, f0:f0 + out_f, :y.shape[2] - t_extra]


class ComplexBatchNorm(nn.Module):
    """Per-part (naive complex) batch norm, inference statistics."""

    @nn.compact
    def __call__(self, x):
        bn_re = nn.BatchNorm(use_running_average=True, name="bn_re")
        bn_im = nn.BatchNorm(use_running_average=True, name="bn_im")
        return jnp.stack([bn_re(x[..., 0]), bn_im(x[..., 1])], -1)


class UniDeepFsmn(nn.Module):
    """FSMN memory block (modelscope UniDeepFsmn semantics).

    (B, L, D) -> (B, L, D): linear->relu->project (no bias) -> depthwise
    temporal conv (2*lorder-1 taps, symmetric) residual-added to the
    projection, then residual-added to the input.
    """

    dim: int
    hidden: int
    lorder: int = 20

    @nn.compact
    def __call__(self, x):
        f1 = nn.relu(nn.Dense(self.hidden, name="linear")(x))
        p1 = nn.Dense(self.dim, use_bias=False, name="project")(f1)
        taps = 2 * self.lorder - 1
        mem = nn.Conv(self.dim, (taps,), padding=[(self.lorder - 1,
                                                   self.lorder - 1)],
                      feature_group_count=self.dim, use_bias=False,
                      name="conv1")(p1)
        return x + p1 + mem


class ComplexFsmn(nn.Module):
    """One complex FSMN layer: re/im submodules combined complex-wise."""

    dim: int
    hidden: int
    lorder: int = 20

    @nn.compact
    def __call__(self, x):
        # x: (B, L, D, 2)
        f_re = UniDeepFsmn(self.dim, self.hidden, self.lorder, name="re")
        f_im = UniDeepFsmn(self.dim, self.hidden, self.lorder, name="im")
        re = f_re(x[..., 0]) - f_im(x[..., 1])
        im = f_re(x[..., 1]) + f_im(x[..., 0])
        return jnp.stack([re, im], -1)


class FreqFsmn(nn.Module):
    """Frequency recurrence: complex FSMN along the frequency axis."""

    dim: int
    hidden: int
    lorder: int = 20

    @nn.compact
    def __call__(self, x):
        # x: (B, F, T, C, 2) -> sequence axis = F, batch = B*T
        b, f, t, c, _ = x.shape
        y = x.transpose(0, 2, 1, 3, 4).reshape(b * t, f, c, 2)
        y = ComplexFsmn(self.dim, self.hidden, self.lorder, name="fsmn")(y)
        return y.reshape(b, t, f, c, 2).transpose(0, 2, 1, 3, 4)


@dataclasses.dataclass(frozen=True)
class FRCRNConfig:
    """Paper/released-model configuration."""

    win_len: int = 640
    hop: int = 320
    fft_len: int = 640
    channels: int = 128        # complex channels per conv block
    depth: int = 6             # encoder (= decoder) blocks per U-Net
    fsmn_hidden: int = 128
    lorder: int = 20
    kf: int = 5
    kt: int = 2

    @property
    def n_bins(self) -> int:
        return self.fft_len // 2 + 1


class CREDUNet(nn.Module):
    """One complex U-Net with frequency recurrence (paper Fig. 1)."""

    cfg: FRCRNConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        skips: List[jnp.ndarray] = []
        for i in range(c.depth):
            x = ComplexConv(c.channels, c.kf, c.kt, name=f"enc{i}_conv")(x)
            x = ComplexBatchNorm(name=f"enc{i}_bn")(x)
            x = nn.leaky_relu(x, 0.1)
            x = FreqFsmn(c.channels, c.fsmn_hidden, c.lorder,
                         name=f"enc{i}_fr")(x)
            skips.append(x)

        # bottleneck: two-layer complex FSMN over time
        b, f, t, ch, _ = x.shape
        y = x.transpose(0, 1, 3, 2, 4).reshape(b * f, ch, t, 2)
        y = y.transpose(0, 2, 1, 3)                   # (B*F, T, C, 2)
        y = ComplexFsmn(ch, c.fsmn_hidden, c.lorder, name="bottleneck0")(y)
        y = ComplexFsmn(ch, c.fsmn_hidden, c.lorder, name="bottleneck1")(y)
        x = y.transpose(0, 2, 1, 3).reshape(b, f, ch, t, 2)
        x = x.transpose(0, 1, 3, 2, 4)

        for i in range(c.depth):
            skip = skips[c.depth - 1 - i]
            x = jnp.concatenate([x, skip], axis=3)
            out_f = (skips[c.depth - 2 - i].shape[1] if i < c.depth - 1
                     else c.n_bins)
            x = ComplexConvTranspose(c.channels, c.kf, c.kt,
                                     name=f"dec{i}_conv")(x, out_f)
            x = ComplexBatchNorm(name=f"dec{i}_bn")(x)
            x = nn.leaky_relu(x, 0.1)
            x = FreqFsmn(c.channels, c.fsmn_hidden, c.lorder,
                         name=f"dec{i}_fr")(x)

        # 1x1 complex conv to a single-channel mask
        x = ComplexConv(1, 1, 1, sf=1, name="mask_conv")(x)
        return x                                       # (B, F, T, 1, 2)


class FRCRN(nn.Module):
    """Cascaded two U-Nets with cIRM masking (modelscope frcrn.forward)."""

    cfg: FRCRNConfig

    @nn.compact
    def __call__(self, spec_ri):
        # spec_ri: (B, F, T, 1, 2) complex input spectrogram
        u1 = CREDUNet(self.cfg, name="unet")(spec_ri)
        mask1 = jnp.tanh(u1)
        u2 = CREDUNet(self.cfg, name="unet2")(u1)
        mask2 = jnp.tanh(u2) + mask1
        est = _cmul(spec_ri, mask2)
        return est, mask2


def si_snr_loss(est: jnp.ndarray, ref: jnp.ndarray,
                eps: float = 1e-8) -> jnp.ndarray:
    """Negative SI-SNR (paper's training objective), (B, S) inputs."""
    ref = ref - ref.mean(-1, keepdims=True)
    est = est - est.mean(-1, keepdims=True)
    proj = (jnp.sum(est * ref, -1, keepdims=True)
            / (jnp.sum(ref * ref, -1, keepdims=True) + eps)) * ref
    noise = est - proj
    snr = 10 * jnp.log10((jnp.sum(proj ** 2, -1) + eps)
                         / (jnp.sum(noise ** 2, -1) + eps))
    return -snr.mean()


# ---------------------------------------------------------------------------
# torch state-dict converter
# ---------------------------------------------------------------------------


def _t(state, key):
    v = state[key]
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _conv2d_w(state, key):
    # torch OIHW -> flax HWIO
    return _t(state, key).transpose(2, 3, 1, 0)


def _convT2d_w(state, key):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose with
    # transpose_kernel=True expects (kh, kw, out, in)
    return _t(state, key).transpose(2, 3, 1, 0)


def _fsmn(state, p):
    w = _t(state, p + ".conv1.weight")       # (D, 1, taps, 1) depthwise
    return {
        "linear": {"kernel": _t(state, p + ".linear.weight").T,
                   "bias": _t(state, p + ".linear.bias")},
        "project": {"kernel": _t(state, p + ".project.weight").T},
        "conv1": {"kernel": w[:, 0, :, 0].T[:, None, :]},  # (taps, 1, D)
    }


def _complex_fsmn(state, p):
    return {"re": _fsmn(state, p + ".re"), "im": _fsmn(state, p + ".im")}


def _complex_conv(state, p, transpose=False):
    load = _convT2d_w if transpose else _conv2d_w
    out = {"conv_re": {"kernel": load(state, p + ".conv_re.weight")},
           "conv_im": {"kernel": load(state, p + ".conv_im.weight")}}
    if p + ".conv_re.bias" in state:
        out["conv_re"]["bias"] = _t(state, p + ".conv_re.bias")
        out["conv_im"]["bias"] = _t(state, p + ".conv_im.bias")
    return out


def _complex_bn(state, p):
    out = {}
    for part in ("re", "im"):
        out[f"bn_{part}"] = {
            "scale": _t(state, f"{p}.bn_{part}.weight"),
            "bias": _t(state, f"{p}.bn_{part}.bias")}
    return out


def _complex_bn_stats(state, p):
    out = {}
    for part in ("re", "im"):
        out[f"bn_{part}"] = {
            "mean": _t(state, f"{p}.bn_{part}.running_mean"),
            "var": _t(state, f"{p}.bn_{part}.running_var")}
    return out


def convert_frcrn_weights(state: Dict, cfg: FRCRNConfig):
    """Map a torch FRCRN state dict onto (params, batch_stats).

    Expected naming (our torch replica; modelscope checkpoints are adapted
    by the caller via a key map before this): ``{unet,unet2}.enc{i}_conv.*``
    etc., mirroring the flax module tree one-to-one.
    """
    params: Dict = {}
    stats: Dict = {}
    for net in ("unet", "unet2"):
        n_params: Dict = {}
        n_stats: Dict = {}
        for i in range(cfg.depth):
            for kind in ("enc", "dec"):
                p = f"{net}.{kind}{i}"
                n_params[f"{kind}{i}_conv"] = _complex_conv(
                    state, p + "_conv", transpose=(kind == "dec"))
                n_params[f"{kind}{i}_bn"] = _complex_bn(state, p + "_bn")
                n_stats[f"{kind}{i}_bn"] = _complex_bn_stats(state,
                                                             p + "_bn")
                n_params[f"{kind}{i}_fr"] = {
                    "fsmn": _complex_fsmn(state, p + "_fr.fsmn")}
        for j in range(2):
            n_params[f"bottleneck{j}"] = _complex_fsmn(
                state, f"{net}.bottleneck{j}")
        n_params["mask_conv"] = _complex_conv(state, f"{net}.mask_conv")
        params[net] = n_params
        stats[net] = n_stats
    return params, stats


# ---------------------------------------------------------------------------
# runtime denoiser
# ---------------------------------------------------------------------------

_MODELSCOPE_PREFIXES = ("model.", "module.", "")


def load_torch_state(path: str) -> Dict:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict):
        for key in ("state_dict", "model", "weight"):
            if key in blob and isinstance(blob[key], dict):
                blob = blob[key]
                break
    state = {}
    for k, v in blob.items():
        for pref in _MODELSCOPE_PREFIXES:
            if pref and k.startswith(pref):
                k = k[len(pref):]
                break
        state[k] = v
    return state


def adapt_modelscope_state(state: Dict):
    """Rename a modelscope ``speech_frcrn_ans_cirm_16k`` state dict onto the
    replica key scheme consumed by :func:`convert_frcrn_weights`.

    Documented modelscope layout (modelscope/models/audio/ans/{frcrn,unet,
    complex_nn}.py; the released ``pytorch_model.bin`` carries bare FRCRN
    keys — FRCRNDecorator loads it with ``self.model.load_state_dict``):

    ==============================================  =========================
    modelscope key family                           replica key
    ==============================================  =========================
    ``stft.weight`` / ``istft.weight``              dropped (framing is
                                                    computed functionally)
    ``{net}.encoder{i}.conv.conv_{re,im}.*``        ``{net}.enc{i}_conv.*``
    ``{net}.encoder{i}.bn.bn_{re,im}.*``            ``{net}.enc{i}_bn.*``
    ``{net}.decoder{i}.{conv,bn}.*``                ``{net}.dec{i}_...*``
    per-stage ``...fsmn_{re,im}_L1.{linear,         ``{net}.{enc,dec}{i}_fr.
    project,conv1}.*`` (ComplexUniDeepFsmn_L1)      fsmn.{re,im}.*``
    net-level ``...fsmn_{re,im}_L{1,2}.*``          ``{net}.bottleneck{0,1}.
    (two-layer ComplexUniDeepFsmn)                  {re,im}.*``
    ``{net}.linear.conv_{re,im}.*``                 ``{net}.mask_conv.*``
    ==============================================  =========================

    The frequency-recurrence wrapper names vary across modelscope
    revisions, so FSMN keys are matched structurally (stage index +
    encoder/decoder side + leg name) rather than by exact module path.
    Returns ``(adapted, leftovers)``; the caller decides whether leftover
    keys are fatal.
    """
    import re as _re

    adapted: Dict = {}
    leftovers = []
    for k, v in state.items():
        if k.startswith(("stft.", "istft.")) or k.endswith(".window"):
            continue
        m = _re.match(r"(unet2|unet)\.(.*)$", k)
        if not m:
            leftovers.append(k)
            continue
        net, rest = m.group(1), m.group(2)

        fs = _re.search(
            r"fsmn_(re|im)_L([12])\.(linear|project|conv1)\.(weight|bias)$",
            rest)
        if fs:
            part, layer, sub, wb = fs.groups()
            stage = _re.search(r"(encoder|decoder|enc|dec|en|de)[._]?(\d+)",
                               rest)
            if stage:
                kind = "enc" if stage.group(1).startswith("en") else "dec"
                if layer != "1":
                    leftovers.append(k)  # per-stage FR has a single layer
                    continue
                adapted[f"{net}.{kind}{stage.group(2)}_fr.fsmn."
                        f"{part}.{sub}.{wb}"] = v
            else:
                adapted[f"{net}.bottleneck{int(layer) - 1}."
                        f"{part}.{sub}.{wb}"] = v
            continue

        m2 = _re.match(
            r"(encoder|decoder)(\d+)\.(conv|bn)\."
            r"((?:conv|bn)_(?:re|im))\.(.+)$", rest)
        if m2:
            kind = "enc" if m2.group(1) == "encoder" else "dec"
            adapted[f"{net}.{kind}{m2.group(2)}_{m2.group(3)}."
                    f"{m2.group(4)}.{m2.group(5)}"] = v
            continue

        m3 = _re.match(r"linear\.conv_(re|im)\.(weight|bias)$", rest)
        if m3:
            adapted[f"{net}.mask_conv.conv_{m3.group(1)}.{m3.group(2)}"] = v
            continue
        leftovers.append(k)
    return adapted, leftovers


class FRCRNDenoiser:
    """File-to-file denoiser over the JAX FRCRN net (16 kHz, like the
    reference's modelscope pipeline).  Accepts checkpoints in either the
    replica naming or the released modelscope naming (adapted via
    :func:`adapt_modelscope_state`)."""

    SR = 16000

    def __init__(self, model_path: str, cfg: Optional[FRCRNConfig] = None):
        state = load_torch_state(model_path)
        if "unet.enc0_conv.conv_re.weight" not in state:
            adapted, leftovers = adapt_modelscope_state(state)
            if "unet.enc0_conv.conv_re.weight" in adapted:
                if leftovers:
                    logger.info("frcrn: %d unmapped modelscope keys "
                                "(e.g. %s)", len(leftovers), leftovers[:3])
                state = adapted
            else:
                sample = sorted(state)[:8]
                raise RuntimeError(
                    "FRCRN checkpoint %r uses an unrecognized key scheme; "
                    "expected replica keys (unet.enc0_conv.conv_re.weight "
                    "...) or modelscope speech_frcrn_ans_cirm_16k keys "
                    "(unet.encoder0.conv.conv_re.weight ...). Found e.g. %s"
                    % (model_path, sample))
        self.cfg = cfg or infer_frcrn_config(state)
        params, stats = convert_frcrn_weights(state, self.cfg)
        self._init(params, stats)

    @classmethod
    def from_params(cls, params, batch_stats, cfg=None) -> "FRCRNDenoiser":
        obj = cls.__new__(cls)
        obj.cfg = cfg or FRCRNConfig()
        obj._init(params, batch_stats)
        return obj

    def _init(self, params, batch_stats):
        cfg = self.cfg
        model = FRCRN(cfg)
        variables = {"params": params, "batch_stats": batch_stats}

        def run(wav):
            spec = stft(wav, cfg.win_len, cfg.hop, cfg.fft_len)
            spec_ri = jnp.stack([spec.real, spec.imag], -1)[..., None, :]
            est, _ = model.apply(variables, spec_ri)
            est_c = est[..., 0, 0] + 1j * est[..., 0, 1]
            return istft(est_c, wav.shape[1], cfg.win_len, cfg.hop,
                         cfg.fft_len)

        self._run = jax.jit(run)

    def process(self, wav: np.ndarray, sr: int) -> np.ndarray:
        if sr != self.SR:
            wav = audio_io.resample(wav.astype(np.float32), sr, self.SR)
        # pad to a hop multiple inside a small bucket family to bound the
        # number of compiled shapes (one per 2-second step)
        bucket = 2 * self.SR
        n = max(1, int(np.ceil(len(wav) / bucket))) * bucket
        padded = np.zeros((1, n), np.float32)
        padded[0, :len(wav)] = wav
        out = np.asarray(self._run(padded))[0, :len(wav)]
        return out.astype(np.float32)

    def denoise(self, input_path: str, output_path: str) -> None:
        wav, sr = audio_io.read_wav(input_path)
        out = self.process(wav, sr)
        # the reference's modelscope pipeline writes 16 kHz output
        audio_io.write_wav(output_path, out, self.SR)


def infer_frcrn_config(state: Dict, win_len: int = 640, hop: int = 320,
                       fft_len: int = 640) -> FRCRNConfig:
    """Derive the net hyperparameters from a checkpoint's shapes.

    STFT framing is kernel-free here, so win/hop/fft stay caller-supplied
    (override via ``EASEVOICE_FRCRN_STFT=win,hop,fft``).
    """
    env = os.environ.get("EASEVOICE_FRCRN_STFT")
    if env:
        win_len, hop, fft_len = (int(v) for v in env.split(","))
    depth = len({k.split("_")[0] for k in state
                 if k.startswith("unet.enc") and k.endswith("conv_re.weight")
                 and ".fr." not in k})
    w = np.asarray(state["unet.enc0_conv.conv_re.weight"].shape)
    channels, _, kf, kt = (int(v) for v in w)
    lin = state["unet.enc0_fr.fsmn.re.linear.weight"].shape
    hidden = int(lin[0])
    taps = int(state["unet.enc0_fr.fsmn.re.conv1.weight"].shape[2])
    return FRCRNConfig(win_len=win_len, hop=hop, fft_len=fft_len,
                       channels=channels, depth=depth, fsmn_hidden=hidden,
                       lorder=(taps + 1) // 2, kf=kf, kt=kt)


def default_model_path() -> Optional[str]:
    env = os.environ.get("EASEVOICE_FRCRN_PATH")
    if env:
        return env if os.path.exists(env) else None
    from ..utils import paths

    root = os.path.join(paths.get_base_path(), paths.MODEL_ROOT, "denoise",
                        "speech_frcrn_ans_cirm_16k")
    for name in ("pytorch_model.bin", "model.pt", "frcrn.pth"):
        cand = os.path.join(root, name)
        if os.path.exists(cand):
            return cand
    return None
