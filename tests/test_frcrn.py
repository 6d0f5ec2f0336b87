"""FRCRN denoiser: torch-replica parity for the converter, STFT duality,
and the file-level denoise path (reference behavior:
src/audiokit/denoise/denoise.py:9-21 via modelscope FRCRN)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from easevoice_trainer_tpu.audiokit import frcrn as J

TINY = J.FRCRNConfig(win_len=64, hop=32, fft_len=64, channels=6, depth=3,
                     fsmn_hidden=6, lorder=3, kf=5, kt=2)


# ---------------------------------------------------------------------------
# torch replica (same module tree / state-dict naming as the converter)
# ---------------------------------------------------------------------------


class TUniDeepFsmn(tnn.Module):
    def __init__(self, dim, hidden, lorder):
        super().__init__()
        self.lorder = lorder
        self.linear = tnn.Linear(dim, hidden)
        self.project = tnn.Linear(hidden, dim, bias=False)
        # depthwise temporal conv, modelscope weight layout (D,1,taps,1)
        self.conv1 = tnn.Conv2d(dim, dim, (2 * lorder - 1, 1), (1, 1),
                                groups=dim, bias=False)

    def forward(self, x):                       # (B, L, D)
        f1 = F.relu(self.linear(x))
        p1 = self.project(f1)
        y = p1.unsqueeze(1).permute(0, 3, 2, 1)  # (B, D, L, 1)
        y_pad = F.pad(y, [0, 0, self.lorder - 1, self.lorder - 1])
        out = y + self.conv1(y_pad)
        return x + p1 + (out - y).permute(0, 3, 2, 1).squeeze(1)


class TComplexFsmn(tnn.Module):
    def __init__(self, dim, hidden, lorder):
        super().__init__()
        self.re = TUniDeepFsmn(dim, hidden, lorder)
        self.im = TUniDeepFsmn(dim, hidden, lorder)

    def forward(self, x):                       # (B, L, D, 2)
        re = self.re(x[..., 0]) - self.im(x[..., 1])
        im = self.re(x[..., 1]) + self.im(x[..., 0])
        return torch.stack([re, im], -1)


class TComplexConv(tnn.Module):
    def __init__(self, cin, cout, kf, kt, sf):
        super().__init__()
        self.kf, self.kt, self.sf = kf, kt, sf
        self.conv_re = tnn.Conv2d(cin, cout, (kf, kt), (sf, 1))
        self.conv_im = tnn.Conv2d(cin, cout, (kf, kt), (sf, 1))

    def forward(self, x):                       # (B, F, T, C, 2)
        y = x.permute(0, 3, 1, 2, 4)            # (B, C, F, T, 2)
        y = F.pad(y, [0, 0, self.kt - 1, 0, self.kf // 2, self.kf // 2])
        re = self.conv_re(y[..., 0]) - self.conv_im(y[..., 1])
        im = self.conv_re(y[..., 1]) + self.conv_im(y[..., 0])
        return torch.stack([re, im], -1).permute(0, 2, 3, 1, 4)


class TComplexConvT(tnn.Module):
    def __init__(self, cin, cout, kf, kt, sf):
        super().__init__()
        self.kt = kt
        self.conv_re = tnn.ConvTranspose2d(cin, cout, (kf, kt), (sf, 1))
        self.conv_im = tnn.ConvTranspose2d(cin, cout, (kf, kt), (sf, 1))

    def forward(self, x, out_f):
        y = x.permute(0, 3, 1, 2, 4)
        re = self.conv_re(y[..., 0]) - self.conv_im(y[..., 1])
        im = self.conv_re(y[..., 1]) + self.conv_im(y[..., 0])
        z = torch.stack([re, im], -1).permute(0, 2, 3, 1, 4)
        f0 = (z.shape[1] - out_f) // 2
        return z[:, f0:f0 + out_f, :z.shape[2] - (self.kt - 1)]


class TComplexBN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.bn_re = tnn.BatchNorm2d(c)
        self.bn_im = tnn.BatchNorm2d(c)

    def forward(self, x):                       # (B, F, T, C, 2)
        y = x.permute(0, 3, 1, 2, 4)
        out = torch.stack([self.bn_re(y[..., 0]), self.bn_im(y[..., 1])], -1)
        return out.permute(0, 2, 3, 1, 4)


class TFreqFsmn(tnn.Module):
    def __init__(self, dim, hidden, lorder):
        super().__init__()
        self.fsmn = TComplexFsmn(dim, hidden, lorder)

    def forward(self, x):                       # (B, F, T, C, 2)
        b, f, t, c, _ = x.shape
        y = x.permute(0, 2, 1, 3, 4).reshape(b * t, f, c, 2)
        y = self.fsmn(y)
        return y.reshape(b, t, f, c, 2).permute(0, 2, 1, 3, 4)


class TCREDUNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        cin = 1
        for i in range(cfg.depth):
            setattr(self, f"enc{i}_conv",
                    TComplexConv(cin, cfg.channels, cfg.kf, cfg.kt, 2))
            setattr(self, f"enc{i}_bn", TComplexBN(cfg.channels))
            setattr(self, f"enc{i}_fr",
                    TFreqFsmn(cfg.channels, cfg.fsmn_hidden, cfg.lorder))
            cin = cfg.channels
        self.bottleneck0 = TComplexFsmn(cfg.channels, cfg.fsmn_hidden,
                                        cfg.lorder)
        self.bottleneck1 = TComplexFsmn(cfg.channels, cfg.fsmn_hidden,
                                        cfg.lorder)
        for i in range(cfg.depth):
            setattr(self, f"dec{i}_conv",
                    TComplexConvT(2 * cfg.channels, cfg.channels, cfg.kf,
                                  cfg.kt, 2))
            setattr(self, f"dec{i}_bn", TComplexBN(cfg.channels))
            setattr(self, f"dec{i}_fr",
                    TFreqFsmn(cfg.channels, cfg.fsmn_hidden, cfg.lorder))
        self.mask_conv = TComplexConv(cfg.channels, 1, 1, 1, 1)

    def forward(self, x):
        cfg = self.cfg
        skips = []
        for i in range(cfg.depth):
            x = getattr(self, f"enc{i}_conv")(x)
            x = getattr(self, f"enc{i}_bn")(x)
            x = F.leaky_relu(x, 0.1)
            x = getattr(self, f"enc{i}_fr")(x)
            skips.append(x)
        b, f, t, c, _ = x.shape
        y = x.permute(0, 1, 3, 2, 4).reshape(b * f, c, t, 2)
        y = y.permute(0, 2, 1, 3)
        y = self.bottleneck0(y)
        y = self.bottleneck1(y)
        x = y.permute(0, 2, 1, 3).reshape(b, f, c, t, 2).permute(0, 1, 3, 2, 4)
        for i in range(cfg.depth):
            skip = skips[cfg.depth - 1 - i]
            x = torch.cat([x, skip], dim=3)
            out_f = (skips[cfg.depth - 2 - i].shape[1] if i < cfg.depth - 1
                     else cfg.n_bins)
            x = getattr(self, f"dec{i}_conv")(x, out_f)
            x = getattr(self, f"dec{i}_bn")(x)
            x = F.leaky_relu(x, 0.1)
            x = getattr(self, f"dec{i}_fr")(x)
        return self.mask_conv(x)


class TFRCRN(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.unet = TCREDUNet(cfg)
        self.unet2 = TCREDUNet(cfg)

    def forward(self, spec_ri):
        u1 = self.unet(spec_ri)
        mask1 = torch.tanh(u1)
        u2 = self.unet2(u1)
        mask2 = torch.tanh(u2) + mask1
        re = (spec_ri[..., 0] * mask2[..., 0]
              - spec_ri[..., 1] * mask2[..., 1])
        im = (spec_ri[..., 0] * mask2[..., 1]
              + spec_ri[..., 1] * mask2[..., 0])
        return torch.stack([re, im], -1), mask2


def _random_replica(seed=0):
    torch.manual_seed(seed)
    net = TFRCRN(TINY).eval()
    # randomize batch-norm stats so the parity test covers them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    return net


def test_frcrn_converter_full_net_parity(rng):
    net = _random_replica()
    params, stats = J.convert_frcrn_weights(net.state_dict(), TINY)
    spec = rng.normal(size=(2, TINY.n_bins, 9, 1, 2)).astype(np.float32)
    with torch.no_grad():
        t_est, t_mask = net(torch.from_numpy(spec))
    j_est, j_mask = J.FRCRN(TINY).apply(
        {"params": params, "batch_stats": stats}, spec)
    np.testing.assert_allclose(np.asarray(j_mask), t_mask.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_est), t_est.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_stft_istft_roundtrip(rng):
    wav = rng.uniform(-0.8, 0.8, (1, 4000)).astype(np.float32)
    spec = J.stft(wav, 640, 320, 640)
    out = np.asarray(J.istft(spec, 4000, 640, 320, 640))
    np.testing.assert_allclose(out[0], wav[0], atol=1e-3)


def test_denoiser_end_to_end_file(tmp_path, rng, monkeypatch):
    from easevoice_trainer_tpu.utils import audio_io

    net = _random_replica()
    ckpt = tmp_path / "frcrn.pth"
    torch.save(net.state_dict(), str(ckpt))

    den = J.FRCRNDenoiser(str(ckpt), TINY)
    wav = rng.uniform(-0.5, 0.5, 24000).astype(np.float32)
    src, dst = tmp_path / "in.wav", tmp_path / "out.wav"
    audio_io.write_wav(str(src), wav, 16000)
    den.denoise(str(src), str(dst))
    out, sr = audio_io.read_wav(str(dst))
    assert sr == den.SR and len(out) == len(wav)
    assert np.isfinite(out).all()

    # config inference from checkpoint shapes matches the tiny config
    state = J.load_torch_state(str(ckpt))
    monkeypatch.setenv("EASEVOICE_FRCRN_STFT", "64,32,64")
    assert J.infer_frcrn_config(state) == TINY

    # Denoise facade routes to the FRCRN backend when weights are present
    monkeypatch.setenv("EASEVOICE_FRCRN_PATH", str(ckpt))
    from easevoice_trainer_tpu.audiokit.denoise import Denoise

    d = Denoise()
    assert d.backend == "frcrn-jax"
    d.denoise(str(src), str(dst))
    out2, sr2 = audio_io.read_wav(str(dst))
    np.testing.assert_allclose(out2, out, atol=1e-4)


def test_si_snr_loss_sane(rng):
    ref = rng.normal(size=(2, 1600)).astype(np.float32)
    assert float(J.si_snr_loss(np.copy(ref), ref)) < -50  # perfect estimate
    noisy = ref + rng.normal(size=ref.shape).astype(np.float32)
    assert float(J.si_snr_loss(noisy, ref)) > float(
        J.si_snr_loss(np.copy(ref), ref))


# ---------------------------------------------------------------------------
# modelscope checkpoint naming adapter
# ---------------------------------------------------------------------------


def _to_modelscope_names(state):
    """Inverse-render the replica state dict into the released modelscope
    speech_frcrn_ans_cirm_16k key scheme (frcrn_modelscope manifest in
    audiokit/frcrn.py:adapt_modelscope_state)."""
    import re

    out = {}
    for k, v in state.items():
        m = re.match(r"(unet2|unet)\.(.*)$", k)
        net, rest = m.group(1), m.group(2)
        m = re.match(r"(enc|dec)(\d+)_conv\.(conv_(?:re|im))\.(.+)$", rest)
        if m:
            kind = "encoder" if m.group(1) == "enc" else "decoder"
            out[f"{net}.{kind}{m.group(2)}.conv.{m.group(3)}.{m.group(4)}"] = v
            continue
        m = re.match(r"(enc|dec)(\d+)_bn\.(bn_(?:re|im))\.(.+)$", rest)
        if m:
            kind = "encoder" if m.group(1) == "enc" else "decoder"
            out[f"{net}.{kind}{m.group(2)}.bn.{m.group(3)}.{m.group(4)}"] = v
            continue
        m = re.match(r"(enc|dec)(\d+)_fr\.fsmn\.(re|im)\.(.+)$", rest)
        if m:
            kind = "encoder" if m.group(1) == "enc" else "decoder"
            out[f"{net}.{kind}{m.group(2)}.fsmn.fsmn_{m.group(3)}_L1."
                f"{m.group(4)}"] = v
            continue
        m = re.match(r"bottleneck([01])\.(re|im)\.(.+)$", rest)
        if m:
            out[f"{net}.cfsmn.fsmn_{m.group(2)}_L{int(m.group(1)) + 1}."
                f"{m.group(3)}"] = v
            continue
        m = re.match(r"mask_conv\.conv_(re|im)\.(.+)$", rest)
        if m:
            out[f"{net}.linear.conv_{m.group(1)}.{m.group(2)}"] = v
            continue
        raise AssertionError(f"unmapped replica key {k}")
    # fixed conv-DFT kernels present in the released blob; must be dropped
    out["stft.weight"] = torch.zeros(3, 1, 3)
    out["istft.weight"] = torch.zeros(3, 1, 3)
    return out


def test_modelscope_adapter_full_net_parity(rng):
    net = _random_replica(seed=3)
    ms_state = _to_modelscope_names(net.state_dict())
    adapted, leftovers = J.adapt_modelscope_state(ms_state)
    assert leftovers == []
    params, stats = J.convert_frcrn_weights(adapted, TINY)
    spec = rng.normal(size=(1, TINY.n_bins, 7, 1, 2)).astype(np.float32)
    with torch.no_grad():
        t_est, _ = net(torch.from_numpy(spec))
    j_est, _ = J.FRCRN(TINY).apply(
        {"params": params, "batch_stats": stats}, spec)
    np.testing.assert_allclose(np.asarray(j_est), t_est.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_modelscope_adapter_via_denoiser(tmp_path, monkeypatch):
    net = _random_replica(seed=4)
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(_to_modelscope_names(net.state_dict()), str(ckpt))
    monkeypatch.setenv("EASEVOICE_FRCRN_STFT", "64,32,64")
    den = J.FRCRNDenoiser(str(ckpt))  # config inferred post-adaptation
    assert den.cfg == TINY


def test_unrecognized_scheme_raises(tmp_path):
    torch.save({"alien.weight": torch.zeros(3)}, str(tmp_path / "x.bin"))
    with pytest.raises(RuntimeError, match="unrecognized key scheme"):
        J.FRCRNDenoiser(str(tmp_path / "x.bin"))
