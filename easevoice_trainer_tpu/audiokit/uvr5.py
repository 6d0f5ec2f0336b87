"""UVR5 vocal separation: VR-architecture CascadedASPPNet in JAX.

Rebuild of the reference VR separation path (reference:
src/audiokit/uvr5/separate.py:78-273, lib_v5/vr_network/{nets,layers}.py):

* multiband analysis: per-band STFT at band-specific sr/hop/n_fft, cropped
  and stacked into one magnitude "combined spectrogram" (spec_utils.py:91);
* a three-stage cascaded U-Net with ASPP predicts a sigmoid vocal mask over
  512-frame windows (batched, overlapping by a 128-frame offset);
* mask * spec -> per-band iSTFT with low/high-pass fades -> waveform.

The model layout table (by parameter count: 16983/33966/61968/123812/537227)
and the band-config JSONs are vendored verbatim — they are released model
metadata.  Weights load from the standard UVR5 ``.pth`` files
(models/uvr5_weights).  MDX-Net (onnx) and BS-Roformer variants are separate
follow-ups [[uvr5-mdx-roformer]].

Dispatcher (reference: src/service/audio.py:98-106): model names containing
"MDX" or "roformer" route to those engines; "DeEcho" to the nets_new variant;
everything else to this VR net.
"""
from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils import audio_io, paths
from ..utils.logger import logger

PARAMS_DIR = os.path.join(os.path.dirname(__file__), "uvr5_params")

def _bilinear_x2_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C), torch align_corners=True semantics."""
    b, h, w, c = x.shape

    def resize_axis(arr, axis, new):
        old = arr.shape[axis]
        if old == 1:
            return jnp.repeat(arr, new, axis=axis)
        pos = jnp.linspace(0.0, old - 1.0, new)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, old - 1)
        hi = jnp.clip(lo + 1, 0, old - 1)
        wgt = (pos - lo).astype(arr.dtype)
        shape = [1] * arr.ndim
        shape[axis] = new
        wgt = wgt.reshape(shape)
        return (jnp.take(arr, lo, axis=axis) * (1 - wgt)
                + jnp.take(arr, hi, axis=axis) * wgt)

    return resize_axis(resize_axis(x, 1, 2 * h), 2, 2 * w)


class ConvBNActiv(nn.Module):
    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    separable: bool = False
    leaky: bool = False

    @nn.compact
    def __call__(self, x):
        if self.separable:
            nin = x.shape[-1]
            x = nn.Conv(nin, (self.ksize, self.ksize),
                        strides=(self.stride, self.stride),
                        padding=[(self.pad, self.pad)] * 2,
                        kernel_dilation=(self.dilation, self.dilation),
                        feature_group_count=nin, use_bias=False,
                        name="depthwise")(x)
            x = nn.Conv(self.nout, (1, 1), use_bias=False, name="pointwise")(x)
        else:
            x = nn.Conv(self.nout, (self.ksize, self.ksize),
                        strides=(self.stride, self.stride),
                        padding=[(self.pad, self.pad)] * 2,
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn")(x)
        return jnp.where(x >= 0, x, x * 0.01) if self.leaky else nn.relu(x)


class VREncoder(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x):
        skip = ConvBNActiv(self.nout, 3, 1, 1, leaky=True, name="conv1")(x)
        h = ConvBNActiv(self.nout, 3, 2, 1, leaky=True, name="conv2")(skip)
        return h, skip


class VRDecoder(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = _bilinear_x2_align_corners(x)
        if skip is not None:
            # center-crop the skip to x (spec_utils.crop_center)
            sh, sw = skip.shape[1], skip.shape[2]
            th, tw = x.shape[1], x.shape[2]
            top = (sh - th) // 2
            left = (sw - tw) // 2
            skip = skip[:, top:top + th, left:left + tw]
            x = jnp.concatenate([x, skip], axis=-1)
        return ConvBNActiv(self.nout, 3, 1, 1, name="conv")(x)


class ASPPModule(nn.Module):
    nout: int
    dilations: Tuple[int, int, int] = (4, 8, 16)
    enlarge: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pooled = jnp.mean(x, axis=1, keepdims=True)       # pool the freq axis
        feat1 = ConvBNActiv(c, 1, 1, 0, name="conv1")(pooled)
        feat1 = jnp.broadcast_to(feat1, (b, h, w, feat1.shape[-1]))
        feats = [feat1, ConvBNActiv(c, 1, 1, 0, name="conv2")(x)]
        names = ["conv3", "conv4", "conv5"]
        dils = list(self.dilations)
        if self.enlarge:
            names += ["conv6", "conv7"]
            dils += [self.dilations[2], self.dilations[2]]
        for name, d in zip(names, dils):
            feats.append(ConvBNActiv(c, 3, 1, d, dilation=d, separable=True,
                                     name=name)(x))
        out = jnp.concatenate(feats, axis=-1)
        return ConvBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class BaseASPPNet(nn.Module):
    ch: int
    enlarge: bool = False

    @nn.compact
    def __call__(self, x):
        ch = self.ch
        h, e1 = VREncoder(ch, name="enc1")(x)
        h, e2 = VREncoder(ch * 2, name="enc2")(h)
        h, e3 = VREncoder(ch * 4, name="enc3")(h)
        h, e4 = VREncoder(ch * 8, name="enc4")(h)
        h = ASPPModule(ch * 16, enlarge=self.enlarge, name="aspp")(h)
        h = VRDecoder(ch * 8, name="dec4")(h, e4)
        h = VRDecoder(ch * 4, name="dec3")(h, e3)
        h = VRDecoder(ch * 2, name="dec2")(h, e2)
        h = VRDecoder(ch, name="dec1")(h, e1)
        return h


class CascadedASPPNet(nn.Module):
    """Input (B, bins, frames, 2) magnitude; output sigmoid mask."""

    n_fft: int
    ch1: int = 32
    ch2: int = 16
    ch3: int = 32
    enlarge: bool = False

    @nn.compact
    def __call__(self, x):
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        mix = x
        x = x[:, :max_bin]
        bandw = x.shape[1] // 2
        aux1 = jnp.concatenate([
            BaseASPPNet(self.ch1, self.enlarge, name="stg1_low")(x[:, :bandw]),
            BaseASPPNet(self.ch1, self.enlarge, name="stg1_high")(x[:, bandw:]),
        ], axis=1)
        h = jnp.concatenate([x, aux1], axis=-1)
        h = ConvBNActiv(self.ch2, 1, 1, 0, name="stg2_bridge")(h)
        aux2 = BaseASPPNet(self.ch2 * 2, self.enlarge, name="stg2_full")(h)
        h = jnp.concatenate([x, aux1, aux2], axis=-1)
        h = ConvBNActiv(self.ch3, 1, 1, 0, name="stg3_bridge")(h)
        h = BaseASPPNet(self.ch3 * 2, self.enlarge, name="stg3_full")(h)
        mask = nn.sigmoid(nn.Conv(2, (1, 1), use_bias=False, name="out")(h))
        pad = output_bin - mask.shape[1]
        mask = jnp.concatenate(
            [mask, jnp.repeat(mask[:, -1:], pad, axis=1)], axis=1)
        return mask * mix


# ---------------------------------------------------------------------------
# torch .pth -> flax conversion
# ---------------------------------------------------------------------------


def _convert_convbn(state, tprefix, out, fprefix, separable=False):
    if separable:
        out[f"{fprefix}/depthwise/kernel"] = state[
            f"{tprefix}.conv.0.weight"].transpose(2, 3, 1, 0)
        out[f"{fprefix}/pointwise/kernel"] = state[
            f"{tprefix}.conv.1.weight"].transpose(2, 3, 1, 0)
        bn = f"{tprefix}.conv.2"
    else:
        out[f"{fprefix}/conv/kernel"] = state[
            f"{tprefix}.conv.0.weight"].transpose(2, 3, 1, 0)
        bn = f"{tprefix}.conv.1"
    out[f"{fprefix}/bn?scale"] = state[f"{bn}.weight"]
    out[f"{fprefix}/bn?bias"] = state[f"{bn}.bias"]
    out[f"{fprefix}/bn?mean"] = state[f"{bn}.running_mean"]
    out[f"{fprefix}/bn?var"] = state[f"{bn}.running_var"]


def _convert_asppnet(state, tprefix, out, fprefix, enlarge):
    for enc in ("enc1", "enc2", "enc3", "enc4"):
        _convert_convbn(state, f"{tprefix}.{enc}.conv1", out,
                        f"{fprefix}/{enc}/conv1")
        _convert_convbn(state, f"{tprefix}.{enc}.conv2", out,
                        f"{fprefix}/{enc}/conv2")
    # ASPP: conv1 is Sequential(AdaptiveAvgPool2d, Conv2DBNActiv)
    _convert_convbn(state, f"{tprefix}.aspp.conv1.1", out,
                    f"{fprefix}/aspp/conv1")
    _convert_convbn(state, f"{tprefix}.aspp.conv2", out,
                    f"{fprefix}/aspp/conv2")
    convs = ["conv3", "conv4", "conv5"] + (["conv6", "conv7"]
                                           if enlarge else [])
    for cv in convs:
        _convert_convbn(state, f"{tprefix}.aspp.{cv}", out,
                        f"{fprefix}/aspp/{cv}", separable=True)
    _convert_convbn(state, f"{tprefix}.aspp.bottleneck.0", out,
                    f"{fprefix}/aspp/bottleneck")
    for dec in ("dec4", "dec3", "dec2", "dec1"):
        _convert_convbn(state, f"{tprefix}.{dec}.conv", out,
                        f"{fprefix}/{dec}/conv")


def infer_vr_layout(state: Dict[str, np.ndarray]) -> dict:
    """Derive the CascadedASPPNet layout from state-dict shapes.

    Robust for any released checkpoint (the reference keys its layout table
    by model-file size in KB, nets.py:125-206; shapes are unambiguous):
    ch1/ch2/ch3 are the stage output widths, ``enlarge`` is flagged by the
    presence of the 4th/5th ASPP branch.
    """
    return dict(
        ch1=int(state["stg1_low_band_net.enc1.conv1.conv.0.weight"].shape[0]),
        ch2=int(state["stg2_bridge.conv.0.weight"].shape[0]),
        ch3=int(state["stg3_bridge.conv.0.weight"].shape[0]),
        enlarge="stg1_low_band_net.aspp.conv6.conv.0.weight" in state,
    )


def convert_vr_weights(state: Dict[str, np.ndarray]):
    """torch CascadedASPPNet state -> (params, batch_stats, layout)."""
    layout = infer_vr_layout(state)
    flat: Dict[str, np.ndarray] = {}
    _convert_asppnet(state, "stg1_low_band_net", flat, "stg1_low",
                     layout["enlarge"])
    _convert_asppnet(state, "stg1_high_band_net", flat, "stg1_high",
                     layout["enlarge"])
    _convert_convbn(state, "stg2_bridge", flat, "stg2_bridge")
    _convert_asppnet(state, "stg2_full_band_net", flat, "stg2_full",
                     layout["enlarge"])
    _convert_convbn(state, "stg3_bridge", flat, "stg3_bridge")
    _convert_asppnet(state, "stg3_full_band_net", flat, "stg3_full",
                     layout["enlarge"])
    flat["out/kernel"] = state["out.weight"].transpose(2, 3, 1, 0)

    from ..train.ckpt import unflatten_tree

    params = {}
    batch_stats = {}
    for k, v in flat.items():
        if "?" in k:
            base, stat = k.split("?")
            if stat in ("scale", "bias"):
                params[f"{base}/{stat}"] = v
            else:
                batch_stats[f"{base}/{stat}"] = v
        else:
            params[k] = v
    return (unflatten_tree(params), unflatten_tree(batch_stats), layout)


# ---------------------------------------------------------------------------
# multiband spectrogram utilities (spec_utils.py semantics)
# ---------------------------------------------------------------------------


def load_band_params(name: str = "4band_v2.json") -> dict:
    with open(os.path.join(PARAMS_DIR, name), encoding="utf8") as f:
        mp = json.load(f)
    if "bins" not in mp and "n_bins" in mp:   # 4band_v3_sn spelling
        mp["bins"] = mp["n_bins"]
    # defaults the reference's ModelParameters fills in
    for key, val in (("mid_side", False), ("mid_side_b2", False),
                     ("reverse", False), ("pre_filter_start", 0),
                     ("pre_filter_stop", 0)):
        mp.setdefault(key, val)
    return mp


def _fft_lp_filter(spec: np.ndarray, start: int, stop: int) -> np.ndarray:
    """Linear fade-out over [start, stop), zero above (spec_utils.py:434)."""
    spec = spec.copy()
    n = stop - start
    if n > 0:
        gains = 1.0 - (np.arange(1, n + 1) / n)
        spec[:, start:stop] *= gains[None, :, None]
    spec[:, stop:] = 0
    return spec


def _fft_hp_filter(spec: np.ndarray, start: int, stop: int) -> np.ndarray:
    """Linear fade-out downward over (stop, start], zero at/below stop
    (spec_utils.py:445; called with stop = hpf_stop - 1)."""
    spec = spec.copy()
    n = start - stop
    if n > 0:
        gains = 1.0 - (np.arange(1, n + 1) / n)
        spec[:, start:stop:-1] *= gains[None, :, None]
    spec[:, :stop + 1] = 0
    return spec


def _encode_channels(wav: np.ndarray, mp: dict) -> np.ndarray:
    """Stereo pre-transform before analysis (spec_utils.py:31-46)."""
    if mp.get("reverse"):
        return np.stack([np.flip(wav[0]), np.flip(wav[1])])
    if mp.get("mid_side"):
        return np.stack([(wav[0] + wav[1]) / 2, wav[0] - wav[1]])
    if mp.get("mid_side_b2"):
        return np.stack([wav[1] + wav[0] * 0.5, wav[0] - wav[1] * 0.5])
    return wav


def _decode_channels(wav: np.ndarray, mp: dict) -> np.ndarray:
    """Inverse stereo transform after synthesis (spec_utils.py:297-320)."""
    if mp.get("reverse"):
        return np.stack([np.flip(wav[0]), np.flip(wav[1])])
    if mp.get("mid_side"):
        return np.stack([wav[0] + wav[1] / 2, wav[0] - wav[1] / 2])
    if mp.get("mid_side_b2"):
        return np.stack([wav[1] / 1.25 + 0.4 * wav[0],
                         wav[0] / 1.25 - 0.4 * wav[1]])
    return wav


def _stft(wav: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Complex STFT, centered (librosa-style), (2, bins, frames) for stereo."""
    if wav.ndim == 1:
        wav = np.stack([wav, wav])
    pad = n_fft // 2
    out = []
    for ch in wav:
        y = np.pad(ch, (pad, pad), mode="reflect")
        frames = 1 + (len(y) - n_fft) // hop
        idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
        win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
        out.append(np.fft.rfft(y[idx] * win, axis=-1).T)
    return np.stack(out)


def _istft(spec: np.ndarray, hop: int) -> np.ndarray:
    """(2, bins, frames) complex -> (2, samples), hann overlap-add."""
    n_fft = (spec.shape[1] - 1) * 2
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    out = []
    for ch in spec:
        frames = np.fft.irfft(ch.T, n=n_fft, axis=-1)
        total = n_fft + hop * (frames.shape[0] - 1)
        y = np.zeros(total, np.float32)
        norm = np.zeros(total, np.float32)
        for i in range(frames.shape[0]):
            y[i * hop:i * hop + n_fft] += frames[i] * win
            norm[i * hop:i * hop + n_fft] += win ** 2
        y /= np.maximum(norm, 1e-8)
        out.append(y[n_fft // 2:-(n_fft // 2)])
    return np.stack(out)


class VRSeparator:
    """Windowed inference over the combined multiband spectrogram.

    ``agg`` (aggressiveness, reference default 10) raises the vocal mask to
    a power >1 below/above a split bin (separate.py aggressiveness dict);
    ``tta`` runs a second, half-window-shifted pass and averages.
    """

    WINDOW = 512
    OFFSET = 128

    def __init__(self, model_path: str, band_config: str = "4band_v2.json",
                 is_half: bool = False, agg: int = 10, tta: bool = False):
        import torch

        raw = torch.load(model_path, map_location="cpu", weights_only=False)
        state = {k: v.detach().to(torch.float32).numpy()
                 for k, v in raw.items() if hasattr(v, "detach")}
        params, batch_stats, layout = convert_vr_weights(state)
        self.mp = load_band_params(band_config)
        self.model = CascadedASPPNet(
            n_fft=self.mp["bins"] * 2, ch1=layout["ch1"], ch2=layout["ch2"],
            ch3=layout["ch3"], enlarge=layout["enlarge"])
        self.variables = {"params": params, "batch_stats": batch_stats}
        self._apply = jax.jit(self.model.apply)
        self.agg = agg
        self.tta = tta

    # ---- multiband analysis ------------------------------------------------

    def _band_specs(self, wav44: np.ndarray) -> List[np.ndarray]:
        """Per-band STFTs, resampling progressively DOWN the band chain
        (separate.py:110-136: top band at native sr, each lower band
        resampled from the one above it)."""
        bands = self.mp["band"]
        order = sorted(bands, key=int)
        waves: Dict[str, np.ndarray] = {}
        prev = None
        for b in reversed(order):
            bp = bands[b]
            if prev is None:
                waves[b] = wav44
            else:
                prev_bp = bands[prev]
                waves[b] = (waves[prev] if bp["sr"] == prev_bp["sr"]
                            else audio_io.resample(
                                waves[prev], prev_bp["sr"], bp["sr"]))
            prev = b
        return [_stft(waves[b], bands[b]["n_fft"], bands[b]["hl"])
                for b in order]

    def _combine(self, specs: List[np.ndarray]) -> np.ndarray:
        """Stack cropped band bins -> (2, bins, frames) complex, with the
        reference's pre-filter roll-off above pre_filter_start
        (spec_utils.py:91-127)."""
        bands = self.mp["band"]
        frames = min(s.shape[2] for s in specs)
        rows = []
        for s, b in zip(specs, sorted(bands, key=int)):
            bp = bands[b]
            rows.append(s[:, bp["crop_start"]:bp["crop_stop"], :frames])
        comb = np.concatenate(rows, axis=1)
        pad = self.mp["bins"] + 1 - comb.shape[1]
        if pad > 0:
            comb = np.pad(comb, ((0, 0), (0, pad), (0, 0)))
        comb = comb[:, :self.mp["bins"] + 1]
        pfs, pfe = self.mp["pre_filter_start"], self.mp["pre_filter_stop"]
        if pfs > 0:
            if len(bands) == 1:
                comb = _fft_lp_filter(comb, pfs, pfe)
            else:
                gp = 1.0
                for b in range(pfs + 1, pfe):
                    g = 10 ** (-(b - pfs) * (3.5 - gp) / 20.0)
                    gp = g
                    comb[:, b] *= g
        return comb

    def _split_mask(self, masked: np.ndarray,
                    specs: List[np.ndarray]) -> List[np.ndarray]:
        """Un-stack a combined complex spec back into per-band specs."""
        bands = self.mp["band"]
        out = []
        offset = 0
        for s, b in zip(specs, sorted(bands, key=int)):
            bp = bands[b]
            width = bp["crop_stop"] - bp["crop_start"]
            band = np.zeros_like(s[:, :, :masked.shape[2]])
            band[:, bp["crop_start"]:bp["crop_stop"]] = \
                masked[:, offset:offset + width]
            offset += width
            out.append(band)
        return out

    # ---- inference -------------------------------------------------------------

    def _predict_mag(self, mag_norm: np.ndarray) -> np.ndarray:
        """(2, bins+1, frames) normalized magnitude -> masked magnitude."""
        n_frames = mag_norm.shape[2]
        window, offset = self.WINDOW, self.OFFSET
        step = window - 2 * offset
        pad_total = step - (n_frames % step) if n_frames % step else 0
        x = np.pad(mag_norm, ((0, 0), (0, 0), (offset, offset + pad_total)),
                   mode="constant")
        chunks = []
        starts = list(range(0, x.shape[2] - window + 1, step))
        for s in starts:
            chunks.append(x[:, :, s:s + window])
        batch = np.stack([c.transpose(1, 2, 0) for c in chunks])  # (N,bins,W,2)
        masked = np.asarray(self._apply(self.variables,
                                        jnp.asarray(batch, jnp.float32)))
        masked = masked[:, :, offset:window - offset]              # trim edges
        out = np.concatenate(list(masked), axis=1)[:, :n_frames]   # (bins,T,2)
        return out.transpose(2, 0, 1)

    def _apply_aggressiveness(self, masked: np.ndarray,
                              mag: np.ndarray) -> np.ndarray:
        """mask^(1+agg-dependent power), split at 2/3 of the reduction bins
        (reference: separate.py aggressiveness + nets.py:111-121)."""
        if not self.agg:
            return masked
        value = self.agg / 100.0
        split = int(self.mp.get("reduction_bins", 0) * 2 / 3)
        if split <= 0:
            return masked
        mask = masked / np.maximum(mag, 1e-10)
        mask[:, :split] = np.power(np.clip(mask[:, :split], 0, 1),
                                   1 + value / 3)
        mask[:, split:] = np.power(np.clip(mask[:, split:], 0, 1), 1 + value)
        return mask * mag

    def separate(self, wav: np.ndarray, sr: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """mono/stereo float wav -> (vocals, accompaniment) stereo (2, T)
        (reference writes true stereo, separate.py:48-76)."""
        if sr != self.mp["sr"]:
            wav = audio_io.resample(wav, sr, self.mp["sr"])
        if wav.ndim == 1:
            wav = np.stack([wav, wav])
        wav = _encode_channels(wav, self.mp)
        specs = self._band_specs(wav)
        comb = self._combine(specs)
        mag = np.abs(comb).astype(np.float32)
        coef = max(mag.max(), 1e-6)
        masked_mag = self._predict_mag(mag / coef)
        if self.tta:
            # second pass shifted by half a step, averaged (reference TTA)
            shift = (self.WINDOW - 2 * self.OFFSET) // 2
            shifted = np.pad(mag, ((0, 0), (0, 0), (shift, 0)))[:, :, :mag.shape[2]]
            masked2 = self._predict_mag(shifted / coef)
            masked2 = np.concatenate(
                [masked2[:, :, shift:],
                 masked_mag[:, :, masked_mag.shape[2] - shift:]], axis=2)
            masked_mag = 0.5 * (masked_mag + masked2)
        masked_mag = self._apply_aggressiveness(masked_mag * coef, mag)
        phase = np.exp(1.0j * np.angle(comb))
        vocal_spec = masked_mag * phase

        inst_spec = comb - vocal_spec
        vocal = self._multiband_to_wave(self._split_mask(vocal_spec, specs))
        inst = self._multiband_to_wave(self._split_mask(inst_spec, specs))
        n = min(vocal.shape[-1], inst.shape[-1])
        return vocal[:, :n], inst[:, :n]

    def _multiband_to_wave(self, band_specs: List[np.ndarray]) -> np.ndarray:
        """Progressive synthesis up the band chain with the reference's
        band-edge fades (spec_utils.py cmb_spectrogram_to_wave:356-431):
        lowest band low-pass-faded, mid bands band-pass-faded, the running
        sum resampled up to each next band's rate, the top band
        high-pass-faded.  Returns stereo (2, T)."""
        bands = self.mp["band"]
        order = sorted(bands, key=int)
        bands_n = len(order)
        wave: Optional[np.ndarray] = None
        for d, (spec, b) in enumerate(zip(band_specs, order), start=1):
            bp = bands[b]
            if d == bands_n:
                if bp.get("hpf_start", 0) > 0:
                    spec = _fft_hp_filter(spec, bp["hpf_start"],
                                          bp["hpf_stop"] - 1)
                band_wave = _istft(spec, bp["hl"])
                if bands_n == 1:
                    wave = band_wave
                else:
                    n = min(wave.shape[-1], band_wave.shape[-1])
                    wave = wave[:, :n] + band_wave[:, :n]
            elif d == 1:
                spec = _fft_lp_filter(spec, bp["lpf_start"], bp["lpf_stop"])
                next_sr = bands[order[d]]["sr"]
                wave = _istft(spec, bp["hl"])
                if next_sr != bp["sr"]:
                    wave = audio_io.resample(wave, bp["sr"], next_sr)
            else:
                spec = _fft_hp_filter(spec, bp["hpf_start"],
                                      bp["hpf_stop"] - 1)
                spec = _fft_lp_filter(spec, bp["lpf_start"], bp["lpf_stop"])
                band_wave = _istft(spec, bp["hl"])
                n = min(wave.shape[-1], band_wave.shape[-1])
                wave = wave[:, :n] + band_wave[:, :n]
                next_sr = bands[order[d]]["sr"]
                if next_sr != bp["sr"]:
                    wave = audio_io.resample(wave, bp["sr"], next_sr)
        if wave is None:
            return np.zeros((2, 1), np.float32)
        return _decode_channels(np.atleast_2d(wave), self.mp)


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------


class DeEchoSeparator(VRSeparator):
    """DeEcho/DeReverb: nets_new CascadedNet over 4band_v3
    (reference: separate.py:276-299)."""

    def __init__(self, model_path: str, is_half: bool = False):
        import torch

        from .uvr5_deecho import CascadedNet, convert_deecho_weights

        raw = torch.load(model_path, map_location="cpu", weights_only=False)
        state = {k: v.detach().to(torch.float32).numpy()
                 for k, v in raw.items() if hasattr(v, "detach")}
        params, batch_stats = convert_deecho_weights(state)
        self.mp = load_band_params("4band_v3.json")
        nout = 64 if "DeReverb" in model_path else 48
        self.model = CascadedNet(n_fft=self.mp["bins"] * 2, nout=nout)
        self.variables = {"params": params, "batch_stats": batch_stats}
        mask_apply = jax.jit(self.model.apply)
        # CascadedNet emits the MASK; masked magnitude = mask * input
        self._apply = lambda v, x: mask_apply(v, x) * x
        self.OFFSET = 64   # reference CascadedNet offset (nets_new.py:52)
        self.agg = 0       # reference applies no mask power for DeEcho
        self.tta = False


def get_separator(model_name: str):
    """Pick a separation engine by model name (service/audio.py:98-106)."""
    lowered = model_name.lower()
    weights_root = os.path.join(paths.get_base_path(), "models",
                                "uvr5_weights")
    if "roformer" in lowered:
        from .bs_roformer import BSRoformerSeparator, MelBandRoformerSeparator

        cls = (MelBandRoformerSeparator if "mel" in lowered
               else BSRoformerSeparator)
        for cand in (model_name + ".ckpt", model_name + ".pth", model_name):
            path = os.path.join(weights_root, cand)
            if os.path.exists(path):
                return cls(path)
        raise FileNotFoundError(
            f"Roformer weights not found under {weights_root}")
    if "mdx" in lowered or "onnx" in lowered:
        from .mdxnet import MDXSeparator

        for cand in (model_name + ".onnx", model_name + ".pth", model_name,
                     "vocals.onnx"):
            path = os.path.join(weights_root, "onnx_dereverb_By_FoxJoy"
                                if "reverb" in lowered else "", cand)
            if os.path.exists(path):
                return MDXSeparator(path)
        raise FileNotFoundError(
            f"MDX-Net weights not found under {weights_root}")
    path = os.path.join(weights_root, model_name + ".pth")
    if not os.path.exists(path):
        raise FileNotFoundError(f"UVR5 weights not found: {path}")
    if "DeEcho" in model_name:
        return DeEchoSeparator(path)
    return VRSeparator(path)
