"""s2 SoVITS synthesizer: the end-to-end VITS model.

Rebuild of SynthesizerTrn (reference: src/easevoice/module/models.py:803-1018).
Pipeline (training forward):

  cnhubert SSL (B, T50, 768) --ssl_proj k2s2--> 25 Hz --RVQ--> quantized
  --x2 nearest--> TextEncoder(+MRTE, ge) --> prior (m_p, logs_p)
  spec --MelStyleEncoder(first 704 bins)--> ge
  spec --PosteriorEncoder--> z --flow--> z_p
  z --random 32-frame slice--> HiFi-GAN --> 20480-sample waveform

Everything is channels-last and static-shape; random slicing uses gathers.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import rand_slice_segments, sequence_mask
from .flow import ResidualCouplingBlock
from .generator import Generator
from .mel_style import MelStyleEncoder
from .posterior import PosteriorEncoder
from .quantize import ResidualVectorQuantizer
from .text_encoder import TextEncoder


@dataclasses.dataclass(frozen=True)
class SovitsConfig:
    """Model hyperparameters (mirrors configs/s2.json "model" + "data")."""

    spec_channels: int = 1025          # n_fft // 2 + 1
    segment_size: int = 20480          # samples per GAN slice
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (10, 8, 2, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 8, 2, 2)
    gin_channels: int = 512
    ssl_dim: int = 768
    semantic_frame_rate: str = "25hz"
    freeze_quantizer: bool = True
    n_symbols: int = 732
    sampling_rate: int = 32000
    hop_length: int = 640

    @property
    def segment_frames(self) -> int:
        return self.segment_size // self.hop_length

    @classmethod
    def from_json_dict(cls, d: dict) -> "SovitsConfig":
        model = d.get("model", {})
        data = d.get("data", {})
        kw: dict[str, Any] = {}
        for f in dataclasses.fields(cls):
            if f.name in model:
                kw[f.name] = model[f.name]
        if "filter_length" in data:
            kw["spec_channels"] = data["filter_length"] // 2 + 1
        if "sampling_rate" in data:
            kw["sampling_rate"] = data["sampling_rate"]
        if "hop_length" in data:
            kw["hop_length"] = data["hop_length"]
        if "segment_size" in d.get("train", {}):
            kw["segment_size"] = d["train"]["segment_size"]
        for seq_key in ("resblock_kernel_sizes", "upsample_rates",
                        "upsample_kernel_sizes"):
            if seq_key in kw:
                kw[seq_key] = tuple(kw[seq_key])
        if "resblock_dilation_sizes" in kw:
            kw["resblock_dilation_sizes"] = tuple(
                tuple(x) for x in kw["resblock_dilation_sizes"])
        return cls(**kw)


class SynthesizerTrn(nn.Module):
    cfg: SovitsConfig = SovitsConfig()
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        c = self.cfg
        self.enc_p = TextEncoder(
            c.inter_channels, c.hidden_channels, c.filter_channels, c.n_heads,
            c.n_layers, c.kernel_size, c.p_dropout, n_symbols=c.n_symbols,
            ssl_dim=c.ssl_dim, gin_channels=c.gin_channels, dtype=self.dtype)
        self.dec = Generator(
            c.inter_channels, c.resblock, tuple(c.resblock_kernel_sizes),
            tuple(tuple(d) for d in c.resblock_dilation_sizes),
            tuple(c.upsample_rates), c.upsample_initial_channel,
            tuple(c.upsample_kernel_sizes), gin_channels=c.gin_channels,
            dtype=self.dtype)
        self.enc_q = PosteriorEncoder(
            c.spec_channels, c.inter_channels, c.hidden_channels, 5, 1, 16,
            gin_channels=c.gin_channels, dtype=self.dtype)
        self.flow = ResidualCouplingBlock(
            c.inter_channels, c.hidden_channels, 5, 1, 4,
            gin_channels=c.gin_channels, dtype=self.dtype)
        self.ref_enc = MelStyleEncoder(
            704, out_dim=c.gin_channels, dtype=self.dtype)
        # 50 Hz SSL -> 25 Hz semantic rate (k=2, s=2), identity-rate otherwise
        if c.semantic_frame_rate == "25hz":
            self.ssl_proj = nn.Conv(c.ssl_dim, (2,), strides=(2,), padding="VALID",
                                    dtype=self.dtype, param_dtype=jnp.float32)
        else:
            self.ssl_proj = nn.Conv(c.ssl_dim, (1,), padding="VALID",
                                    dtype=self.dtype, param_dtype=jnp.float32)
        self.quantizer = ResidualVectorQuantizer(dim=c.ssl_dim, n_q=1, bins=1024)

    # ---- shared helpers -------------------------------------------------

    def _style(self, spec, spec_mask):
        """Global style vector from the first 704 spectrogram bins (v2)."""
        return self.ref_enc(spec[..., :704] * spec_mask, spec_mask)

    def _quantize_ssl(self, ssl):
        """SSL (B, T50, 768) -> (quantized (B, T50, 768), codes, commit)."""
        h = self.ssl_proj(ssl)
        if self.cfg.freeze_quantizer:
            h = jax.lax.stop_gradient(h)
        quantized, codes, commit = self.quantizer(
            h, n_layers=1, freeze=self.cfg.freeze_quantizer)
        if self.cfg.semantic_frame_rate == "25hz":
            quantized = jnp.repeat(quantized, 2, axis=1)  # nearest x2
        return quantized, codes, commit

    # ---- training forward ------------------------------------------------

    def __call__(self, ssl, spec, spec_lengths, text, text_lengths, *,
                 train: bool = True):
        """Training forward.

        ssl: (B, T50, 768) with T50 == 2 * ceil(frames/2); spec: (B, F, 1025);
        returns (y_hat, commit_loss, slice_starts, spec_mask, latents tuple).
        """
        c = self.cfg
        dtype = self.dtype or spec.dtype
        spec_mask = sequence_mask(spec_lengths, spec.shape[1])[:, :, None].astype(dtype)
        ge = self._style(spec, spec_mask)

        quantized, codes, commit_loss = self._quantize_ssl(ssl)

        x, m_p, logs_p, y_mask = self.enc_p(
            quantized, spec_lengths, text, text_lengths, ge,
            deterministic=not train)
        z, m_q, logs_q, _ = self.enc_q(
            spec, spec_lengths, g=ge,
            rng=self.make_rng("latent") if train else None,
            deterministic=not train)
        z_p = self.flow(z, spec_mask, g=ge, deterministic=not train)

        z_slice, ids_slice = rand_slice_segments(
            self.make_rng("slice"), z, spec_lengths, c.segment_frames)
        y_hat = self.dec(z_slice, g=ge)
        return (y_hat, commit_loss, ids_slice, y_mask,
                (z, z_p, m_p, logs_p, m_q, logs_q), quantized)

    # ---- inference -------------------------------------------------------

    def infer(self, ssl, spec, spec_lengths, text, text_lengths,
              noise_scale: float = 0.5, rng: Optional[jax.Array] = None):
        c = self.cfg
        dtype = self.dtype or spec.dtype
        spec_mask = sequence_mask(spec_lengths, spec.shape[1])[:, :, None].astype(dtype)
        ge = self._style(spec, spec_mask)
        quantized, codes, _ = self._quantize_ssl(ssl)
        x, m_p, logs_p, y_mask = self.enc_p(
            quantized, spec_lengths, text, text_lengths, ge)
        noise = (jax.random.normal(rng, m_p.shape, m_p.dtype)
                 if rng is not None else jnp.zeros_like(m_p))
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=ge, reverse=True)
        return self.dec(z * y_mask, g=ge), y_mask

    def decode(self, codes, text, text_lengths, refer_spec, refer_lengths,
               noise_scale: float = 0.5, speed: float = 1.0,
               rng: Optional[jax.Array] = None, codes_lengths=None):
        """Synthesis from semantic codes (reference: models.py:975-1013).

        codes: (B, Tc) single-layer semantic tokens (may be padded —
        ``codes_lengths`` masks the padding); refer_spec: (R, Tr, 1025)
        reference spectrogram(s) whose style vectors are averaged.
        """
        dtype = self.dtype or refer_spec.dtype
        refer_mask = sequence_mask(
            refer_lengths, refer_spec.shape[1])[:, :, None].astype(dtype)
        ges = self._style(refer_spec, refer_mask)        # (R, 1, gin)
        ge = jnp.mean(ges, axis=0, keepdims=True)        # (1, 1, gin)

        quantized = self.quantizer.decode(codes[None])   # (B, Tc, 768)
        if self.cfg.semantic_frame_rate == "25hz":
            quantized = jnp.repeat(quantized, 2, axis=1)
        if codes_lengths is None:
            y_lengths = jnp.full((codes.shape[0],), quantized.shape[1],
                                 jnp.int32)
        else:
            y_lengths = codes_lengths * 2

        x, m_p, logs_p, y_mask = self.enc_p(
            quantized.astype(dtype), y_lengths, text, text_lengths, ge,
            speed=speed)
        noise = (jax.random.normal(rng, m_p.shape, m_p.dtype)
                 if rng is not None else jnp.zeros_like(m_p))
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=ge, reverse=True)
        return self.dec(z * y_mask, g=ge)

    def extract_latent(self, ssl):
        """SSL features -> semantic codes (B, T25) for 6-name2semantic.tsv."""
        h = self.ssl_proj(ssl)
        codes = self.quantizer.encode(h, n_layers=1)
        return codes[0]
