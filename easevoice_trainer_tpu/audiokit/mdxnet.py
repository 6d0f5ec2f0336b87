"""MDX-Net (Conv-TDF) separator in JAX.

Reference behavior: src/audiokit/uvr5/separate.py:300-441 (SeparateMDXNet —
chunked demix with margins, +/- spectrogram denoise trick) and
src/audiokit/uvr5/lib_v5/vr_network/mdxnet.py:32-139 (ConvTDFNet net,
ConvTDFNetTrim stft/istft packing).  The reference runs the network itself
through onnxruntime (``vocals.onnx``); here the network is a flax module
and the released ONNX file's initializers are read directly from the
protobuf (no onnxruntime dependency) and mapped onto the flax params.

Layout: the flax net works in NHWC — input (B, T, F, C) after the
reference's channel-first (B, C, F, T) plus its internal transpose(-1, -2)
are folded together.  The TDF branch mixes frequencies with a dense layer,
which lands on the penultimate axis here (einsum, MXU-friendly).
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.logger import logger


# ---------------------------------------------------------------------------
# network
# ---------------------------------------------------------------------------


def _norm(kind: str, name: str):
    if kind == "group":
        return nn.GroupNorm(num_groups=2, epsilon=1e-5, name=name)
    return nn.BatchNorm(use_running_average=True, name=name)


class TFC(nn.Module):
    """l x (conv kxk -> norm -> relu), channel-preserving."""

    c: int
    l: int
    k: int
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        for i in range(self.l):
            x = nn.Conv(self.c, (self.k, self.k),
                        padding=[(self.k // 2, self.k // 2)] * 2,
                        name=f"conv_{i}")(x)
            x = _norm(self.norm, f"norm_{i}")(x)
            x = nn.relu(x)
        return x


class TFCTDF(nn.Module):
    """TFC + residual time-distributed-fully-connected over frequency."""

    c: int
    l: int
    f: int
    k: int
    bn: int
    bias: bool = False
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, C)
        x = TFC(self.c, self.l, self.k, self.norm, name="tfc")(x)
        y = x.transpose(0, 1, 3, 2)                       # (B, T, C, F)
        y = nn.Dense(self.f // self.bn, use_bias=self.bias, name="tdf0")(y)
        y = _norm(self.norm, "tdf_norm0")(y.transpose(0, 1, 3, 2)
                                          ).transpose(0, 1, 3, 2)
        y = nn.relu(y)
        y = nn.Dense(self.f, use_bias=self.bias, name="tdf1")(y)
        y = _norm(self.norm, "tdf_norm1")(y.transpose(0, 1, 3, 2)
                                          ).transpose(0, 1, 3, 2)
        y = nn.relu(y).transpose(0, 1, 3, 2)              # back to (B,T,F,C)
        return x + y


@dataclasses.dataclass(frozen=True)
class MDXConfig:
    """UVR 'Conv-TDF' deployment config (separate.py:308-320)."""

    num_blocks: int = 11          # L
    g: int = 48                   # channel growth
    k: int = 3
    l: int = 3                    # convs per TFC
    bn: int = 8                   # TDF bottleneck factor
    bias: bool = False
    norm: str = "group"
    dim_c: int = 4                # 2 channels x re/im
    dim_f: int = 3072
    dim_t: int = 512              # 2**9 stft frames per window
    n_fft: int = 6144
    hop: int = 1024

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def chunk_size(self) -> int:
        return self.hop * (self.dim_t - 1)


class ConvTDFNet(nn.Module):
    cfg: MDXConfig = MDXConfig()

    @nn.compact
    def __call__(self, x):
        """x: (B, T, F, dim_c) -> same shape (predicted target spec)."""
        c = self.cfg
        n = c.num_blocks // 2
        x = nn.Conv(c.g, (1, 1), name="first_conv")(x)
        x = _norm(c.norm, "first_norm")(x)
        x = nn.relu(x)

        f, ch = c.dim_f, c.g
        skips = []
        for i in range(n):
            x = TFCTDF(ch, c.l, f, c.k, c.bn, c.bias, c.norm,
                       name=f"enc_{i}")(x)
            skips.append(x)
            x = nn.Conv(ch + c.g, (2, 2), strides=(2, 2), padding="VALID",
                        name=f"ds_{i}")(x)
            x = _norm(c.norm, f"ds_norm_{i}")(x)
            x = nn.relu(x)
            f //= 2
            ch += c.g

        x = TFCTDF(ch, c.l, f, c.k, c.bn, c.bias, c.norm, name="bottleneck")(x)

        for i in range(n):
            x = nn.ConvTranspose(ch - c.g, (2, 2), strides=(2, 2),
                                 padding="VALID", transpose_kernel=True,
                                 name=f"us_{i}")(x)
            x = _norm(c.norm, f"us_norm_{i}")(x)
            x = nn.relu(x)
            f *= 2
            ch -= c.g
            x = x * skips[-i - 1]                       # multiplicative skip
            x = TFCTDF(ch, c.l, f, c.k, c.bn, c.bias, c.norm,
                       name=f"dec_{i}")(x)

        return nn.Conv(c.dim_c, (1, 1), name="final_conv")(x)


# ---------------------------------------------------------------------------
# torch-name -> flax conversion
# ---------------------------------------------------------------------------


def _conv_w(state, key):
    return state[key].transpose(2, 3, 1, 0)


def _put_norm(state, tprefix, out, fprefix):
    """GroupNorm (weight/bias) or BatchNorm (plus running stats)."""
    out[f"{fprefix}/scale"] = state[f"{tprefix}.weight"]
    out[f"{fprefix}/bias"] = state[f"{tprefix}.bias"]
    if f"{tprefix}.running_mean" in state:
        out[f"{fprefix}?mean"] = state[f"{tprefix}.running_mean"]
        out[f"{fprefix}?var"] = state[f"{tprefix}.running_var"]


def _put_tfctdf(state, t, out, f, cfg: MDXConfig):
    for i in range(cfg.l):
        out[f"{f}/tfc/conv_{i}/kernel"] = _conv_w(state, f"{t}.tfc.H.{i}.0.weight")
        out[f"{f}/tfc/conv_{i}/bias"] = state[f"{t}.tfc.H.{i}.0.bias"]
        _put_norm(state, f"{t}.tfc.H.{i}.1", out, f"{f}/tfc/norm_{i}")
    out[f"{f}/tdf0/kernel"] = state[f"{t}.tdf.0.weight"].T
    if cfg.bias:
        out[f"{f}/tdf0/bias"] = state[f"{t}.tdf.0.bias"]
    _put_norm(state, f"{t}.tdf.1", out, f"{f}/tdf_norm0")
    out[f"{f}/tdf1/kernel"] = state[f"{t}.tdf.3.weight"].T
    if cfg.bias:
        out[f"{f}/tdf1/bias"] = state[f"{t}.tdf.3.bias"]
    _put_norm(state, f"{t}.tdf.4", out, f"{f}/tdf_norm1")


def infer_mdx_config(state: Dict[str, np.ndarray],
                     dim_f: int = 3072, dim_t: int = 512,
                     n_fft: int = 6144) -> MDXConfig:
    """Derive net hyperparameters from weight shapes."""
    g = int(state["first_conv.0.weight"].shape[0])
    n = 0
    while f"ds.{n}.0.weight" in state:
        n += 1
    l = 0
    while f"encoding_blocks.0.tfc.H.{l}.0.weight" in state:
        l += 1
    k = int(state["encoding_blocks.0.tfc.H.0.0.weight"].shape[-1])
    tdf_in, tdf_out = state["encoding_blocks.0.tdf.0.weight"].shape[1], \
        state["encoding_blocks.0.tdf.0.weight"].shape[0]
    bias = "encoding_blocks.0.tdf.0.bias" in state
    norm = "batch" if "first_conv.1.running_mean" in state else "group"
    dim_c = int(state["first_conv.0.weight"].shape[1])
    return MDXConfig(num_blocks=2 * n + 1, g=g, k=k, l=l,
                     bn=int(tdf_in) // int(tdf_out), bias=bias, norm=norm,
                     dim_c=dim_c, dim_f=int(tdf_in), dim_t=dim_t,
                     n_fft=n_fft)


def convert_mdx_weights(state: Dict[str, np.ndarray], cfg: MDXConfig
                        ) -> Tuple[dict, dict]:
    """torch/onnx state (torch names) -> (params, batch_stats) trees."""
    n = cfg.num_blocks // 2
    flat: Dict[str, np.ndarray] = {}
    flat["first_conv/kernel"] = _conv_w(state, "first_conv.0.weight")
    flat["first_conv/bias"] = state["first_conv.0.bias"]
    _put_norm(state, "first_conv.1", flat, "first_norm")
    for i in range(n):
        _put_tfctdf(state, f"encoding_blocks.{i}", flat, f"enc_{i}", cfg)
        flat[f"ds_{i}/kernel"] = _conv_w(state, f"ds.{i}.0.weight")
        flat[f"ds_{i}/bias"] = state[f"ds.{i}.0.bias"]
        _put_norm(state, f"ds.{i}.1", flat, f"ds_norm_{i}")
    _put_tfctdf(state, "bottleneck_block", flat, "bottleneck", cfg)
    for i in range(n):
        # torch ConvTranspose2d weight (Cin, Cout, kH, kW) ->
        # flax transpose_kernel=True expects (kH, kW, Cout, Cin)
        flat[f"us_{i}/kernel"] = state[f"us.{i}.0.weight"].transpose(2, 3, 1, 0)
        flat[f"us_{i}/bias"] = state[f"us.{i}.0.bias"]
        _put_norm(state, f"us.{i}.1", flat, f"us_norm_{i}")
        _put_tfctdf(state, f"decoding_blocks.{i}", flat, f"dec_{i}", cfg)
    flat["final_conv/kernel"] = _conv_w(state, "final_conv.0.weight")
    flat["final_conv/bias"] = state["final_conv.0.bias"]

    from ..train.ckpt import unflatten_tree

    params, batch_stats = {}, {}
    for key, v in flat.items():
        if "?" in key:
            base, stat = key.split("?")
            batch_stats[f"{base}/{stat}"] = np.asarray(v, np.float32)
        else:
            params[key] = np.asarray(v, np.float32)
    return unflatten_tree(params), unflatten_tree(batch_stats)


# ---------------------------------------------------------------------------
# minimal ONNX protobuf reader (initializers only; no onnx/onnxruntime dep)
# ---------------------------------------------------------------------------

_ONNX_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
                7: np.int64, 10: np.float16, 11: np.float64}


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:                       # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:                     # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:                     # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:                     # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    """TensorProto: dims=1, data_type=2, float_data=4, int64_data=7,
    name=8, raw_data=9."""
    dims: List[int] = []
    dtype = 1
    name = ""
    raw: Optional[memoryview] = None
    floats: List[float] = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            dims.append(val)
        elif field == 1 and wire == 2:      # packed dims
            p = 0
            while p < len(val):
                d, p = _read_varint(val, p)
                dims.append(d)
        elif field == 2:
            dtype = val
        elif field == 4:
            if wire == 2:                   # packed floats
                floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
            else:
                floats.append(struct.unpack("<f", val)[0])
        elif field == 8:
            name = bytes(val).decode("utf8")
        elif field == 9:
            raw = val
    np_dtype = _ONNX_DTYPES.get(dtype, np.float32)
    if raw is not None:
        arr = np.frombuffer(bytes(raw), dtype=np_dtype)
    else:
        arr = np.asarray(floats, np.float32)
    return name, arr.reshape(dims).astype(np.float32, copy=False)


def load_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """Read {initializer name: array} out of an .onnx file.

    ModelProto.graph = field 7; GraphProto.initializer = field 5.
    """
    with open(path, "rb") as f:
        model = memoryview(f.read())
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _fields(model):
        if field == 7 and wire == 2:        # graph
            for gfield, gwire, gval in _fields(val):
                if gfield == 5 and gwire == 2:   # initializer
                    name, arr = _parse_tensor(gval)
                    out[name] = arr
    return out


# ---------------------------------------------------------------------------
# separator (chunked demix with margins, separate.py:330-413)
# ---------------------------------------------------------------------------


class MDXSeparator:
    SR = 44100

    def __init__(self, model_path: str, chunks: int = 15,
                 margin: int = 44100, denoise: bool = True):
        state = self._load_state(model_path)
        self.cfg = infer_mdx_config(state)
        params, batch_stats = convert_mdx_weights(state, self.cfg)
        self._init(params, batch_stats, chunks, margin, denoise)

    @staticmethod
    def _load_state(model_path: str) -> Dict[str, np.ndarray]:
        if model_path.endswith(".onnx"):
            state = load_onnx_initializers(model_path)
            if "first_conv.0.weight" not in state:
                raise ValueError(
                    f"{model_path}: ONNX initializers do not carry torch "
                    "parameter names; cannot map weights")
            return state
        import torch
        raw = torch.load(model_path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        return {k: v.detach().to(torch.float32).numpy()
                for k, v in raw.items() if hasattr(v, "detach")}

    def _init(self, params, batch_stats, chunks, margin, denoise):
        self.model = ConvTDFNet(self.cfg)
        self.variables = {"params": params}
        if batch_stats:
            self.variables["batch_stats"] = batch_stats
        self.chunks = chunks
        self.margin = margin
        self.denoise = denoise
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def from_params(cls, params: dict, batch_stats: dict, cfg: MDXConfig,
                    chunks: int = 15, margin: int = 44100,
                    denoise: bool = True) -> "MDXSeparator":
        self = cls.__new__(cls)
        self.cfg = cfg
        self._init(params, batch_stats, chunks, margin, denoise)
        return self

    # -- stft packing (mdxnet.py ConvTDFNetTrim.stft/istft) -----------------

    def _window(self) -> np.ndarray:
        # torch.hann_window(periodic=True)
        n = self.cfg.n_fft
        return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(
            np.float64)

    def _stft(self, waves: np.ndarray) -> np.ndarray:
        """(B, 2, chunk_size) -> (B, dim_t, dim_f, 4)."""
        c = self.cfg
        b = waves.shape[0]
        x = waves.reshape(-1, c.chunk_size)
        pad = c.n_fft // 2
        win = self._window()
        specs = []
        for chan in x:
            y = np.pad(chan, (pad, pad), mode="reflect")
            frames = 1 + (len(y) - c.n_fft) // c.hop
            idx = (np.arange(frames)[:, None] * c.hop
                   + np.arange(c.n_fft)[None, :])
            specs.append(np.fft.rfft(y[idx] * win, axis=-1).T)  # (bins, T)
        s = np.stack(specs)                                # (B*2, bins, T)
        s = s[:, :, :c.dim_t]
        out = np.stack([s.real, s.imag], axis=1)           # (B*2, 2, bins, T)
        out = out.reshape(b, c.dim_c, c.n_bins, -1)[:, :, :c.dim_f]
        return out.transpose(0, 3, 2, 1).astype(np.float32)  # (B,T,F,C)

    def _istft(self, spec: np.ndarray) -> np.ndarray:
        """(B, dim_t, dim_f, 4) -> (B, 2, chunk_size)."""
        c = self.cfg
        b = spec.shape[0]
        x = spec.transpose(0, 3, 2, 1)                     # (B, C, F, T)
        x = np.concatenate(
            [x, np.zeros((b, c.dim_c, c.n_bins - c.dim_f, x.shape[-1]))], 2)
        x = x.reshape(b * 2, 2, c.n_bins, -1)
        comp = x[:, 0] + 1j * x[:, 1]                      # (B*2, bins, T)
        win = self._window()
        hop, n_fft = c.hop, c.n_fft
        outs = []
        for ch in comp:
            frames = np.fft.irfft(ch.T, n=n_fft, axis=-1)
            total = n_fft + hop * (frames.shape[0] - 1)
            y = np.zeros(total)
            norm = np.zeros(total)
            for i in range(frames.shape[0]):
                y[i * hop:i * hop + n_fft] += frames[i] * win
                norm[i * hop:i * hop + n_fft] += win ** 2
            y /= np.maximum(norm, 1e-8)
            outs.append(y[n_fft // 2:n_fft // 2 + c.chunk_size])
        return np.stack(outs).reshape(b, 2, c.chunk_size).astype(np.float32)

    def _run_model(self, spec: np.ndarray) -> np.ndarray:
        out = np.asarray(self._apply(self.variables, jnp.asarray(spec)))
        if self.denoise:
            neg = np.asarray(self._apply(self.variables, jnp.asarray(-spec)))
            out = 0.5 * out - 0.5 * neg
        return out

    def _demix_segment(self, cmix: np.ndarray) -> np.ndarray:
        """One margin-padded segment (2, n) -> separated (2, n)."""
        c = self.cfg
        n_sample = cmix.shape[1]
        trim = c.n_fft // 2
        gen_size = c.chunk_size - 2 * trim
        pad = gen_size - n_sample % gen_size
        mix_p = np.concatenate(
            [np.zeros((2, trim)), cmix, np.zeros((2, pad)),
             np.zeros((2, trim))], axis=1)
        waves = []
        i = 0
        while i < n_sample + pad:
            waves.append(mix_p[:, i:i + c.chunk_size])
            i += gen_size
        batch = np.stack(waves).astype(np.float32)          # (W, 2, chunk)
        spec = self._stft(batch)
        pred = self._run_model(spec)
        tar = self._istft(pred)                             # (W, 2, chunk)
        sig = tar[:, :, trim:-trim].transpose(1, 0, 2).reshape(2, -1)
        return sig[:, :-pad]

    def demix(self, mix: np.ndarray) -> np.ndarray:
        """(2, samples) -> target stem (2, samples)."""
        samples = mix.shape[-1]
        chunk = self.chunks * self.SR
        margin = self.margin
        if margin > chunk:
            margin = chunk
        if self.chunks == 0 or samples < chunk:
            chunk = samples
        outs = []
        skip = 0
        counter = 0
        while skip < samples:
            s_margin = 0 if counter == 0 else margin
            end = min(skip + chunk + margin, samples)
            seg = self._demix_segment(mix[:, skip - s_margin:end].copy())
            start = 0 if counter == 0 else margin
            stop = None if end == samples else -margin
            if margin == 0:
                stop = None
            outs.append(seg[:, start:stop])
            counter += 1
            if end == samples:
                break
            skip += chunk
        return np.concatenate(outs, axis=-1)

    def separate(self, wav: np.ndarray, sr: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (vocal, instrumental) at 44.1k, matching separate.py:415-441
        (model output 'opt' is the non-vocal stem; vocal = mix - opt)."""
        from ..utils import audio_io

        if sr != self.SR:
            wav = audio_io.resample(wav, sr, self.SR)
        if wav.ndim == 1:
            wav = np.stack([wav, wav])
        opt = self.demix(wav)
        # true stereo out (2, T) — reference writes stereo stems
        # (separate.py:48-76)
        vocal = wav[:, :opt.shape[1]] - opt
        return vocal, opt
