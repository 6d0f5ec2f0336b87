"""BS-Roformer band-split source separator in JAX.

Rebuild of the reference BSRoformer (reference:
src/audiokit/uvr5/lib_v5/vr_network/bs_roformer.py:40-606): a centered STFT
whose 1025 bins (x stereo x complex) are grouped into 62 bands, each
band projected to a shared feature dim; ``depth`` axial blocks alternate a
time transformer (per frequency band) and a frequency transformer (per
frame), both RMSNorm pre-norm with rotary positions and per-head sigmoid
output gates; per-band GLU MLPs estimate a complex mask multiplied into the
STFT and inverted.

TPU-native notes: axial attention maps to two dense (B*F, T) / (B*T, F)
attention batches — ideal MXU shapes; the inference path (`separate`) uses
the reference's 352800-sample windows with linear crossfades.  Weights load
from the released torch checkpoints via `convert_bs_roformer`.
Rotary follows rotary_embedding_torch's interleaved-pair convention.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DEFAULT_FREQS_PER_BANDS = (
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    12, 12, 12, 12, 12, 12, 12, 12,
    24, 24, 24, 24, 24, 24, 24, 24,
    48, 48, 48, 48, 48, 48, 48, 48,
    128, 129,
)


@dataclasses.dataclass(frozen=True)
class BSRoformerConfig:
    """The released Bs_Roformer checkpoint config (separate.py:455-490)."""

    dim: int = 512
    depth: int = 12
    stereo: bool = True
    num_stems: int = 1
    time_transformer_depth: int = 1
    freq_transformer_depth: int = 1
    freqs_per_bands: Tuple[int, ...] = DEFAULT_FREQS_PER_BANDS
    dim_head: int = 64
    heads: int = 8
    stft_n_fft: int = 2048
    stft_hop_length: int = 441
    stft_win_length: int = 2048
    mask_estimator_depth: int = 2

    @property
    def audio_channels(self) -> int:
        return 2 if self.stereo else 1


def rms_norm(x, gamma, dim):
    normed = x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    return normed * (dim ** 0.5) * gamma


class RMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        return rms_norm(x, gamma, self.dim)


def rotary_freqs(dim_head: int, length: int) -> jnp.ndarray:
    """Interleaved rotary angles, rotary_embedding_torch 'lang' convention."""
    inv = 1.0 / (10000.0 ** (np.arange(0, dim_head, 2,
                                       dtype=np.float64) / dim_head))
    t = np.arange(length, dtype=np.float64)
    freqs = np.einsum("t,d->td", t, inv)          # (T, dim/2)
    return jnp.asarray(np.repeat(freqs, 2, axis=-1), jnp.float32)  # (T, dim)


def apply_rotary(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """x: (..., T, d); rotate interleaved pairs by freqs (T, d)."""
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos + rotated * sin


class RoformerAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    use_rotary: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (B, N, dim)."""
        b, n, _ = x.shape
        h, dk = self.heads, self.dim_head
        inner = h * dk
        y = RMSNorm(self.dim, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda z: z.reshape(b, n, h, dk).transpose(0, 2, 1, 3)
        q, k, v = reshape(q), reshape(k), reshape(v)
        if self.use_rotary:
            freqs = rotary_freqs(dk, n)
            q = apply_rotary(q, freqs)
            k = apply_rotary(k, freqs)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / (dk ** 0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        gates = nn.Dense(h, use_bias=True, name="to_gates")(y)  # (B, N, H)
        out = out * nn.sigmoid(gates).transpose(0, 2, 1)[..., None]
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class RoformerFFN(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        y = RMSNorm(self.dim, name="norm")(x)
        y = nn.Dense(self.dim * self.mult, name="ff1")(y)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, name="ff2")(y)


class RoformerTransformer(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    use_rotary: bool = True
    norm_output: bool = False   # BSRoformer: False; MelBandRoformer: True

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = RoformerAttention(self.dim, self.heads, self.dim_head,
                                  self.use_rotary, name=f"attn_{i}")(x) + x
            x = RoformerFFN(self.dim, name=f"ff_{i}")(x) + x
        if self.norm_output:
            x = RMSNorm(self.dim, name="norm")(x)
        return x


class BandSplit(nn.Module):
    dim: int
    dim_inputs: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        """x: (B, T, sum(dim_inputs)) -> (B, T, n_bands, dim)."""
        outs = []
        offset = 0
        for i, d_in in enumerate(self.dim_inputs):
            chunk = x[..., offset:offset + d_in]
            offset += d_in
            y = RMSNorm(d_in, name=f"norm_{i}")(chunk)
            outs.append(nn.Dense(self.dim, name=f"proj_{i}")(y))
        return jnp.stack(outs, axis=-2)


class MaskEstimator(nn.Module):
    dim: int
    dim_inputs: Tuple[int, ...]
    depth: int = 2
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        """x: (B, T, n_bands, dim) -> (B, T, sum(dim_inputs))."""
        outs = []
        hidden = self.dim * self.expansion
        for i, d_in in enumerate(self.dim_inputs):
            y = x[..., i, :]
            dims = [hidden] * (self.depth - 1) + [d_in * 2]
            for j, d_out in enumerate(dims):
                y = nn.Dense(d_out, name=f"mlp_{i}_{j}")(y)
                if j < len(dims) - 1:
                    y = jnp.tanh(y)
            a, b = jnp.split(y, 2, axis=-1)   # GLU
            outs.append(a * nn.sigmoid(b))
        return jnp.concatenate(outs, axis=-1)


class BSRoformer(nn.Module):
    cfg: BSRoformerConfig = BSRoformerConfig()

    @nn.compact
    def __call__(self, spec_in: jnp.ndarray) -> jnp.ndarray:
        """spec_in: (B, F*S, T, 2) real/imag STFT (stereo folded into freq,
        frequency-major: index = f * S + s).  Returns the complex mask of the
        same shape (separation happens in the caller: mask x stft -> istft).
        """
        c = self.cfg
        bands = tuple(2 * f * c.audio_channels for f in c.freqs_per_bands)
        b, fs, t, _ = spec_in.shape
        x = spec_in.transpose(0, 2, 1, 3).reshape(b, t, fs * 2)  # (B,T,(F C))
        x = BandSplit(c.dim, bands, name="band_split")(x)        # (B,T,NB,D)
        nb = x.shape[2]

        for layer in range(c.depth):
            # time transformer: fold bands into batch
            y = x.transpose(0, 2, 1, 3).reshape(b * nb, t, c.dim)
            y = RoformerTransformer(c.dim, c.time_transformer_depth, c.heads,
                                    c.dim_head, name=f"time_{layer}")(y)
            x = y.reshape(b, nb, t, c.dim).transpose(0, 2, 1, 3)
            # freq transformer: fold time into batch
            y = x.reshape(b * t, nb, c.dim)
            y = RoformerTransformer(c.dim, c.freq_transformer_depth, c.heads,
                                    c.dim_head, name=f"freq_{layer}")(y)
            x = y.reshape(b, t, nb, c.dim)

        x = RMSNorm(c.dim, name="final_norm")(x)
        mask = MaskEstimator(c.dim, bands, c.mask_estimator_depth,
                             name="mask_0")(x)                   # (B,T,(F C))
        return mask.reshape(b, t, fs, 2).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------


def convert_bs_roformer(state: Dict[str, np.ndarray],
                        cfg: BSRoformerConfig = BSRoformerConfig()) -> dict:
    from ..train.ckpt import unflatten_tree

    p: Dict[str, np.ndarray] = {}

    def lin(tkey, fkey, bias_key=None):
        p[f"{fkey}/kernel"] = state[tkey].T
        if bias_key:
            p[f"{fkey}/bias"] = state[bias_key]

    n_bands = len(cfg.freqs_per_bands)
    for i in range(n_bands):
        p[f"band_split/norm_{i}/gamma"] = state[
            f"band_split.to_features.{i}.0.gamma"]
        lin(f"band_split.to_features.{i}.1.weight",
            f"band_split/proj_{i}",
            f"band_split.to_features.{i}.1.bias")

    # transformer layers: torch layers.{L}.{0,1} are time/freq Transformers,
    # each with layers.{d}.{0,1} = (Attention, FeedForward)
    for L in range(cfg.depth):
        for idx, (name, depth) in enumerate(
                (("time", cfg.time_transformer_depth),
                 ("freq", cfg.freq_transformer_depth))):
            for d in range(depth):
                t = f"layers.{L}.{idx}.layers.{d}"
                f = f"{name}_{L}/attn_{d}"
                p[f"{f}/norm/gamma"] = state[f"{t}.0.norm.gamma"]
                lin(f"{t}.0.to_qkv.weight", f"{f}/to_qkv")
                lin(f"{t}.0.to_gates.weight", f"{f}/to_gates",
                    f"{t}.0.to_gates.bias")
                lin(f"{t}.0.to_out.0.weight", f"{f}/to_out")
                f = f"{name}_{L}/ff_{d}"
                p[f"{f}/norm/gamma"] = state[f"{t}.1.net.0.gamma"]
                lin(f"{t}.1.net.1.weight", f"{f}/ff1", f"{t}.1.net.1.bias")
                lin(f"{t}.1.net.4.weight", f"{f}/ff2", f"{t}.1.net.4.bias")

    p["final_norm/gamma"] = state["final_norm.gamma"]
    for i in range(n_bands):
        t = f"mask_estimators.0.to_freqs.{i}.0"
        for j in range(cfg.mask_estimator_depth):
            tj = 2 * j   # Sequential: Linear, activation, Linear, ...
            lin(f"{t}.{tj}.weight", f"mask_0/mlp_{i}_{j}",
                f"{t}.{tj}.bias")
    return unflatten_tree(p)


# ---------------------------------------------------------------------------
# separator (reference SeparateMDXC windowed demix, separate.py:492-607)
# ---------------------------------------------------------------------------


class BSRoformerSeparator:
    CHUNK = 352800
    FADE = CHUNK // 10
    SR = 44100

    def __init__(self, model_path: str):
        import torch

        raw = torch.load(model_path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        state = {k: v.detach().to(torch.float32).numpy()
                 for k, v in raw.items() if hasattr(v, "detach")}
        cfg = BSRoformerConfig()
        self._init_from_params(convert_bs_roformer(state, cfg), cfg)

    def _init_from_params(self, params: dict, cfg: BSRoformerConfig) -> None:
        self.cfg = cfg
        self.model = BSRoformer(cfg)
        self.params = {"params": params}
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def from_params(cls, params: dict,
                    cfg: BSRoformerConfig) -> "BSRoformerSeparator":
        """Build a separator from already-converted params (tests, custom
        configs)."""
        self = cls.__new__(cls)
        self._init_from_params(params, cfg)
        return self

    # centered stft/istft (torch.stft default center=True)
    def _stft(self, wav: np.ndarray) -> np.ndarray:
        c = self.cfg
        pad = c.stft_n_fft // 2
        out = []
        for ch in wav:
            y = np.pad(ch, (pad, pad), mode="reflect")
            frames = 1 + (len(y) - c.stft_n_fft) // c.stft_hop_length
            idx = (np.arange(frames)[:, None] * c.stft_hop_length
                   + np.arange(c.stft_n_fft)[None, :])
            win = np.hanning(c.stft_n_fft + 1)[:-1]
            out.append(np.fft.rfft(y[idx] * win, axis=-1).T)
        return np.stack(out)                       # (S, F, T) complex

    def _istft(self, spec: np.ndarray, length: int) -> np.ndarray:
        c = self.cfg
        hop = c.stft_hop_length
        n_fft = c.stft_n_fft
        win = np.hanning(n_fft + 1)[:-1]
        out = []
        for ch in spec:
            frames = np.fft.irfft(ch.T, n=n_fft, axis=-1)
            total = n_fft + hop * (frames.shape[0] - 1)
            y = np.zeros(total)
            norm = np.zeros(total)
            for i in range(frames.shape[0]):
                y[i * hop:i * hop + n_fft] += frames[i] * win
                norm[i * hop:i * hop + n_fft] += win ** 2
            y /= np.maximum(norm, 1e-8)
            out.append(y[n_fft // 2:n_fft // 2 + length])
        return np.stack(out).astype(np.float32)

    def _run_chunk(self, chunk: np.ndarray) -> np.ndarray:
        """(2, CHUNK) -> separated (2, CHUNK)."""
        s = self.cfg.audio_channels
        spec = self._stft(chunk)                                   # (S,F,T)
        S, F, T = spec.shape
        folded = np.zeros((1, F * s, T), np.complex128)
        for f in range(F):
            for ch in range(s):
                folded[0, f * s + ch] = spec[ch, f]
        x = np.stack([folded.real, folded.imag], axis=-1).astype(np.float32)
        mask = np.asarray(self._apply(self.params, x))             # same shape
        m = mask[..., 0] + 1j * mask[..., 1]
        sep = folded * m
        unfolded = np.zeros_like(spec)
        for f in range(F):
            for ch in range(s):
                unfolded[ch, f] = sep[0, f * s + ch]
        return self._istft(unfolded, chunk.shape[-1])

    def separate(self, wav: np.ndarray, sr: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
        from ..utils import audio_io

        if sr != self.SR:
            wav = audio_io.resample(wav, sr, self.SR)
        if wav.ndim == 1:
            wav = np.stack([wav, wav])
        n = wav.shape[-1]
        step = self.CHUNK - 2 * self.FADE
        out = np.zeros_like(wav)
        weight = np.zeros(n, np.float32)
        window = np.ones(self.CHUNK, np.float32)
        window[:self.FADE] = np.linspace(0, 1, self.FADE)
        window[-self.FADE:] = np.linspace(1, 0, self.FADE)
        pos = 0
        while pos < n:
            chunk = wav[:, pos:pos + self.CHUNK]
            valid = chunk.shape[-1]
            if valid < self.CHUNK:
                chunk = np.pad(chunk, ((0, 0), (0, self.CHUNK - valid)))
            sep = self._run_chunk(chunk)[:, :valid]
            out[:, pos:pos + valid] += sep * window[:valid]
            weight[pos:pos + valid] += window[:valid]
            pos += step
        out /= np.maximum(weight, 1e-8)
        # true stereo out (2, T) — reference writes stereo stems
        vocal = out
        inst = wav[:, :vocal.shape[-1]] - vocal
        return vocal, inst


# ---------------------------------------------------------------------------
# MelBandRoformer (reference: lib_v5/vr_network/mel_band_roformer.py:244-480)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MelBandRoformerConfig:
    """Mel-banded variant: overlapping mel-filter bands instead of the fixed
    freq split; per-transformer trailing RMSNorm, no final_norm; MLP in the
    mask estimator has depth+1 linears (mel_band_roformer.py:184-243)."""

    dim: int = 384
    depth: int = 6
    stereo: bool = True
    num_stems: int = 1
    time_transformer_depth: int = 1
    freq_transformer_depth: int = 1
    num_bands: int = 60
    dim_head: int = 64
    heads: int = 8
    sample_rate: int = 44100
    stft_n_fft: int = 2048
    stft_hop_length: int = 441
    stft_win_length: int = 2048
    mask_estimator_depth: int = 1

    @property
    def audio_channels(self) -> int:
        return 2 if self.stereo else 1


def mel_band_membership(cfg: MelBandRoformerConfig):
    """(freq_indices, dim_inputs, num_bands_per_freq) from the slaney mel
    bank, corner bins pinned (mel_band_roformer.py:314-341)."""
    from ..ops.mel import mel_filterbank

    fb = mel_filterbank(cfg.sample_rate, cfg.stft_n_fft, cfg.num_bands)
    fb = fb.copy()
    fb[0, 0] = 1.0
    fb[-1, -1] = 1.0
    member = fb > 0                                   # (bands, freqs)
    assert member.any(axis=0).all(), "every freq must belong to some band"
    freqs = member.shape[1]
    idx_rows = [np.nonzero(row)[0] for row in member]
    flat = np.concatenate(idx_rows)
    if cfg.stereo:
        flat = (np.repeat(flat, 2) * 2
                + np.tile(np.arange(2), len(flat)))   # (f s) fold
    dim_inputs = tuple(2 * len(r) * cfg.audio_channels for r in idx_rows)
    num_bands_per_freq = member.sum(axis=0).astype(np.float32)
    return flat.astype(np.int32), dim_inputs, num_bands_per_freq


class MelMaskEstimator(nn.Module):
    """Like MaskEstimator but with depth+1 linears per MLP."""

    dim: int
    dim_inputs: Tuple[int, ...]
    depth: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        outs = []
        hidden = self.dim * self.expansion
        for i, d_in in enumerate(self.dim_inputs):
            y = x[..., i, :]
            dims = [hidden] * self.depth + [d_in * 2]
            for j, d_out in enumerate(dims):
                y = nn.Dense(d_out, name=f"mlp_{i}_{j}")(y)
                if j < len(dims) - 1:
                    y = jnp.tanh(y)
            a, b = jnp.split(y, 2, axis=-1)           # GLU
            outs.append(a * nn.sigmoid(b))
        return jnp.concatenate(outs, axis=-1)


class MelBandRoformer(nn.Module):
    cfg: MelBandRoformerConfig = MelBandRoformerConfig()

    @nn.compact
    def __call__(self, spec_in: jnp.ndarray) -> jnp.ndarray:
        """spec_in: (B, F*S, T, 2) stereo-folded STFT (freq-major, like
        BSRoformer). Returns the band-averaged complex mask, same shape."""
        c = self.cfg
        freq_idx, dim_inputs, nbpf = mel_band_membership(c)
        b, fs, t, _ = spec_in.shape

        gathered = jnp.take(spec_in, jnp.asarray(freq_idx), axis=1)
        x = gathered.transpose(0, 2, 1, 3).reshape(b, t, -1)  # (B,T,(M C))
        x = BandSplit(c.dim, dim_inputs, name="band_split")(x)
        nb = x.shape[2]

        for layer in range(c.depth):
            y = x.transpose(0, 2, 1, 3).reshape(b * nb, t, c.dim)
            y = RoformerTransformer(c.dim, c.time_transformer_depth, c.heads,
                                    c.dim_head, norm_output=True,
                                    name=f"time_{layer}")(y)
            x = y.reshape(b, nb, t, c.dim).transpose(0, 2, 1, 3)
            y = x.reshape(b * t, nb, c.dim)
            y = RoformerTransformer(c.dim, c.freq_transformer_depth, c.heads,
                                    c.dim_head, norm_output=True,
                                    name=f"freq_{layer}")(y)
            x = y.reshape(b, t, nb, c.dim)

        masks = MelMaskEstimator(c.dim, dim_inputs, c.mask_estimator_depth,
                                 name="mask_0")(x)     # (B, T, sum(M C))
        m = masks.reshape(b, t, -1, 2).transpose(0, 2, 1, 3)  # (B, M, T, 2)
        # scatter-add overlapping band masks back onto freq bins, average
        summed = jax.ops.segment_sum(
            m.transpose(1, 0, 2, 3), jnp.asarray(freq_idx),
            num_segments=fs)                            # (FS, B, T, 2)
        summed = summed.transpose(1, 0, 2, 3)
        denom = np.repeat(nbpf, c.audio_channels)       # folded (f s)
        return summed / jnp.maximum(
            jnp.asarray(denom)[None, :, None, None], 1e-8)


def convert_mel_band_roformer(state: Dict[str, np.ndarray],
                              cfg: MelBandRoformerConfig) -> dict:
    from ..train.ckpt import unflatten_tree

    p: Dict[str, np.ndarray] = {}

    def lin(tkey, fkey, bias_key=None):
        p[f"{fkey}/kernel"] = state[tkey].T
        if bias_key:
            p[f"{fkey}/bias"] = state[bias_key]

    _, dim_inputs, _ = mel_band_membership(cfg)
    for i in range(len(dim_inputs)):
        p[f"band_split/norm_{i}/gamma"] = state[
            f"band_split.to_features.{i}.0.gamma"]
        lin(f"band_split.to_features.{i}.1.weight", f"band_split/proj_{i}",
            f"band_split.to_features.{i}.1.bias")

    for L in range(cfg.depth):
        for idx, (name, depth) in enumerate(
                (("time", cfg.time_transformer_depth),
                 ("freq", cfg.freq_transformer_depth))):
            for d in range(depth):
                t = f"layers.{L}.{idx}.layers.{d}"
                f = f"{name}_{L}/attn_{d}"
                p[f"{f}/norm/gamma"] = state[f"{t}.0.norm.gamma"]
                lin(f"{t}.0.to_qkv.weight", f"{f}/to_qkv")
                lin(f"{t}.0.to_gates.weight", f"{f}/to_gates",
                    f"{t}.0.to_gates.bias")
                lin(f"{t}.0.to_out.0.weight", f"{f}/to_out")
                f = f"{name}_{L}/ff_{d}"
                p[f"{f}/norm/gamma"] = state[f"{t}.1.net.0.gamma"]
                lin(f"{t}.1.net.1.weight", f"{f}/ff1", f"{t}.1.net.1.bias")
                lin(f"{t}.1.net.4.weight", f"{f}/ff2", f"{t}.1.net.4.bias")
            p[f"{name}_{L}/norm/gamma"] = state[
                f"layers.{L}.{idx}.norm.gamma"]

    for i in range(len(dim_inputs)):
        t = f"mask_estimators.0.to_freqs.{i}.0"
        for j in range(cfg.mask_estimator_depth + 1):
            lin(f"{t}.{2 * j}.weight", f"mask_0/mlp_{i}_{j}",
                f"{t}.{2 * j}.bias")
    return unflatten_tree(p)


class MelBandRoformerSeparator(BSRoformerSeparator):
    """Windowed demix with the mel-banded model (same chunking as
    BSRoformerSeparator; the model emits the already-averaged mask)."""

    def __init__(self, model_path: str):
        import torch

        raw = torch.load(model_path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        state = {k: v.detach().to(torch.float32).numpy()
                 for k, v in raw.items() if hasattr(v, "detach")}
        cfg = MelBandRoformerConfig()
        self._init_mel(convert_mel_band_roformer(state, cfg), cfg)

    def _init_mel(self, params: dict, cfg: MelBandRoformerConfig) -> None:
        self.cfg = cfg
        self.model = MelBandRoformer(cfg)
        self.params = {"params": params}
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def from_params(cls, params: dict,
                    cfg: MelBandRoformerConfig) -> "MelBandRoformerSeparator":
        self = cls.__new__(cls)
        self._init_mel(params, cfg)
        return self
