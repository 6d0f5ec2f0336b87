"""DeEcho / DeReverb separation net (VR "nets_new" CascadedNet) in JAX.

Rebuild of the reference CascadedNet
(reference: src/audiokit/uvr5/lib_v5/vr_network/nets_new.py:8-133,
layers_new.py:8-133): a two-band, three-stage U-Net stack with 2-D-dilated
ASPP and a bidirectional-LSTM bottleneck on the last decoder, predicting a
sigmoid echo/reverb mask.  ``nout`` = 64 for DeReverb models, 48 for DeEcho
(reference: separate.py:291); band config 4band_v3.json.

Conversion from the released torch weights mirrors uvr5.convert_vr_weights;
the LSTM maps torch's (i,f,g,o) gate layout onto flax LSTMCell kernels.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .uvr5 import _bilinear_x2_align_corners


class ConvBN2(nn.Module):
    """Conv2DBNActiv of layers_new (supports 2-D dilation/padding)."""

    nout: int
    ksize: int = 3
    stride: int = 1
    pad: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    leaky: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.nout, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=[(self.pad[0], self.pad[0]),
                             (self.pad[1], self.pad[1])],
                    kernel_dilation=self.dilation, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn")(x)
        return jnp.where(x >= 0, x, 0.01 * x) if self.leaky else nn.relu(x)


class NewEncoder(nn.Module):
    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        h = ConvBN2(self.nout, 3, self.stride, leaky=True, name="conv1")(x)
        return ConvBN2(self.nout, 3, 1, leaky=True, name="conv2")(h)


class NewDecoder(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = _bilinear_x2_align_corners(x)
        if skip is not None:
            th, tw = x.shape[1], x.shape[2]
            top = (skip.shape[1] - th) // 2
            left = (skip.shape[2] - tw) // 2
            skip = skip[:, top:top + th, left:left + tw]
            x = jnp.concatenate([x, skip], axis=-1)
        return ConvBN2(self.nout, 3, 1, name="conv1")(x)


class NewASPP(nn.Module):
    nout: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pooled = jnp.mean(x, axis=1, keepdims=True)
        feat1 = ConvBN2(self.nout, 1, 1, (0, 0), name="conv1")(pooled)
        feat1 = jnp.broadcast_to(feat1, (b, h, w, self.nout))
        feats = [feat1, ConvBN2(self.nout, 1, 1, (0, 0), name="conv2")(x)]
        for i, d in enumerate(self.dilations):
            feats.append(ConvBN2(self.nout, 3, 1, pad=d, dilation=d,
                                 name=f"conv{i + 3}")(x))
        out = jnp.concatenate(feats, axis=-1)
        return ConvBN2(self.nout, 1, 1, (0, 0), name="bottleneck")(out)


class BiLSTMModule(nn.Module):
    """conv -> bidirectional LSTM over time -> dense+BN+relu per frame."""

    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        # x: (B, bins, frames, C)
        b, bins, frames, _ = x.shape
        h = ConvBN2(1, 1, 1, (0, 0), name="conv")(x)[..., 0]  # (B,bins,frames)
        seq = h.transpose(0, 2, 1)                            # (B, frames, bins)
        half = self.nout_lstm // 2
        fwd = nn.RNN(nn.LSTMCell(half, name="cell_fwd"))(seq)
        bwd = nn.RNN(nn.LSTMCell(half, name="cell_bwd"), reverse=True,
                     keep_order=True)(seq)
        hcat = jnp.concatenate([fwd, bwd], axis=-1)           # (B,frames,nout)
        d = nn.Dense(self.nin_lstm, name="dense")(hcat)
        d = nn.BatchNorm(use_running_average=True, name="dense_bn")(d)
        d = nn.relu(d)                                        # (B,frames,bins)
        return d.transpose(0, 2, 1)[..., None]                # (B,bins,frames,1)


class NewBaseNet(nn.Module):
    nout: int
    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        e1 = ConvBN2(self.nout, 3, 1, name="enc1")(x)
        e2 = NewEncoder(self.nout * 2, name="enc2")(e1)
        e3 = NewEncoder(self.nout * 4, name="enc3")(e2)
        e4 = NewEncoder(self.nout * 6, name="enc4")(e3)
        e5 = NewEncoder(self.nout * 8, name="enc5")(e4)
        h = NewASPP(self.nout * 8, name="aspp")(e5)
        h = NewDecoder(self.nout * 6, name="dec4")(h, e4)
        h = NewDecoder(self.nout * 4, name="dec3")(h, e3)
        h = NewDecoder(self.nout * 2, name="dec2")(h, e2)
        lstm = BiLSTMModule(self.nin_lstm, self.nout_lstm,
                            name="lstm_dec2")(h)
        h = jnp.concatenate([h, lstm], axis=-1)
        return NewDecoder(self.nout, name="dec1")(h, e1)


class CascadedNet(nn.Module):
    """DeEcho/DeReverb mask net; input (B, bins, frames, 2) magnitude."""

    n_fft: int
    nout: int = 32
    nout_lstm: int = 128

    @nn.compact
    def __call__(self, x):
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        nin_lstm = max_bin // 2
        nout = self.nout
        x = x[:, :max_bin]
        bandw = x.shape[1] // 2
        l1_in, h1_in = x[:, :bandw], x[:, bandw:]

        l1 = NewBaseNet(nout // 2, nin_lstm // 2, self.nout_lstm,
                        name="stg1_low")(l1_in)
        l1 = ConvBN2(nout // 4, 1, 1, (0, 0), name="stg1_low_post")(l1)
        h1 = NewBaseNet(nout // 4, nin_lstm // 2, self.nout_lstm // 2,
                        name="stg1_high")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=1)

        l2 = NewBaseNet(nout, nin_lstm // 2, self.nout_lstm,
                        name="stg2_low")(jnp.concatenate([l1_in, l1], -1))
        l2 = ConvBN2(nout // 2, 1, 1, (0, 0), name="stg2_low_post")(l2)
        h2 = NewBaseNet(nout // 2, nin_lstm // 2, self.nout_lstm // 2,
                        name="stg2_high")(jnp.concatenate([h1_in, h1], -1))
        aux2 = jnp.concatenate([l2, h2], axis=1)

        f3_in = jnp.concatenate([x, aux1, aux2], axis=-1)
        f3 = NewBaseNet(nout, nin_lstm, self.nout_lstm, name="stg3_full")(f3_in)
        mask = nn.sigmoid(nn.Conv(2, (1, 1), use_bias=False, name="out")(f3))
        pad = output_bin - mask.shape[1]
        return jnp.concatenate(
            [mask, jnp.repeat(mask[:, -1:], pad, axis=1)], axis=1)


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------


def _cbn(state, t, out, f):
    out[f"{f}/conv/kernel"] = state[f"{t}.conv.0.weight"].transpose(2, 3, 1, 0)
    out[f"{f}/bn?scale"] = state[f"{t}.conv.1.weight"]
    out[f"{f}/bn?bias"] = state[f"{t}.conv.1.bias"]
    out[f"{f}/bn?mean"] = state[f"{t}.conv.1.running_mean"]
    out[f"{f}/bn?var"] = state[f"{t}.conv.1.running_var"]


def _lstm_cell(state, t, out, f, reverse: bool):
    sfx = "_reverse" if reverse else ""
    w_ih = state[f"{t}.weight_ih_l0{sfx}"]       # (4H, nin)
    w_hh = state[f"{t}.weight_hh_l0{sfx}"]       # (4H, H)
    b = state[f"{t}.bias_ih_l0{sfx}"] + state[f"{t}.bias_hh_l0{sfx}"]
    H = w_hh.shape[1]
    # torch gate order i,f,g,o; flax LSTMCell has per-gate dense pairs where
    # the input-side kernels (i*) carry no bias — fold both torch biases
    # into the hidden-side (h*) bias.
    names = {"i": 0, "f": 1, "g": 2, "o": 3}
    for gate, idx in names.items():
        out[f"{f}/i{gate}/kernel"] = w_ih[idx * H:(idx + 1) * H].T
        out[f"{f}/h{gate}/kernel"] = w_hh[idx * H:(idx + 1) * H].T
        out[f"{f}/h{gate}/bias"] = b[idx * H:(idx + 1) * H]


def _basenet(state, t, out, f):
    _cbn(state, f"{t}.enc1", out, f"{f}/enc1")
    for enc in ("enc2", "enc3", "enc4", "enc5"):
        _cbn(state, f"{t}.{enc}.conv1", out, f"{f}/{enc}/conv1")
        _cbn(state, f"{t}.{enc}.conv2", out, f"{f}/{enc}/conv2")
    _cbn(state, f"{t}.aspp.conv1.1", out, f"{f}/aspp/conv1")
    for i in range(2, 6):
        _cbn(state, f"{t}.aspp.conv{i}", out, f"{f}/aspp/conv{i}")
    _cbn(state, f"{t}.aspp.bottleneck", out, f"{f}/aspp/bottleneck")
    for dec in ("dec4", "dec3", "dec2", "dec1"):
        _cbn(state, f"{t}.{dec}.conv1", out, f"{f}/{dec}/conv1")
    _cbn(state, f"{t}.lstm_dec2.conv", out, f"{f}/lstm_dec2/conv")
    _lstm_cell(state, f"{t}.lstm_dec2.lstm", out,
               f"{f}/lstm_dec2/cell_fwd", reverse=False)
    _lstm_cell(state, f"{t}.lstm_dec2.lstm", out,
               f"{f}/lstm_dec2/cell_bwd", reverse=True)
    out[f"{f}/lstm_dec2/dense/kernel"] = \
        state[f"{t}.lstm_dec2.dense.0.weight"].T
    out[f"{f}/lstm_dec2/dense/bias"] = state[f"{t}.lstm_dec2.dense.0.bias"]
    out[f"{f}/lstm_dec2/dense_bn?scale"] = state[f"{t}.lstm_dec2.dense.1.weight"]
    out[f"{f}/lstm_dec2/dense_bn?bias"] = state[f"{t}.lstm_dec2.dense.1.bias"]
    out[f"{f}/lstm_dec2/dense_bn?mean"] = \
        state[f"{t}.lstm_dec2.dense.1.running_mean"]
    out[f"{f}/lstm_dec2/dense_bn?var"] = \
        state[f"{t}.lstm_dec2.dense.1.running_var"]


def convert_deecho_weights(state: Dict[str, np.ndarray]):
    """torch CascadedNet state dict -> (params, batch_stats)."""
    flat: Dict[str, np.ndarray] = {}
    _basenet(state, "stg1_low_band_net.0", flat, "stg1_low")
    _cbn(state, "stg1_low_band_net.1", flat, "stg1_low_post")
    _basenet(state, "stg1_high_band_net", flat, "stg1_high")
    _basenet(state, "stg2_low_band_net.0", flat, "stg2_low")
    _cbn(state, "stg2_low_band_net.1", flat, "stg2_low_post")
    _basenet(state, "stg2_high_band_net", flat, "stg2_high")
    _basenet(state, "stg3_full_band_net", flat, "stg3_full")
    flat["out/kernel"] = state["out.weight"].transpose(2, 3, 1, 0)

    from ..train.ckpt import unflatten_tree

    params, batch_stats = {}, {}
    for k, v in flat.items():
        if "?" in k:
            base, stat = k.split("?")
            (params if stat in ("scale", "bias") else batch_stats)[
                f"{base}/{stat}"] = np.asarray(v, np.float32)
        else:
            params[k] = np.asarray(v, np.float32)
    return unflatten_tree(params), unflatten_tree(batch_stats)
