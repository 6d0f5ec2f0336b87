"""MDX-Net (Conv-TDF) tests: full-net torch parity, stft packing parity,
ONNX initializer parsing, demix smoke."""
import os
import struct
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from easevoice_trainer_tpu.audiokit import mdxnet as jm

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference checkout not available")

SMALL = jm.MDXConfig(num_blocks=5, g=8, k=3, l=2, bn=4, bias=False,
                     norm="group", dim_c=4, dim_f=64, dim_t=32,
                     n_fft=512, hop=128)


def _ref_torch_net(cfg):
    """Instantiate the reference ConvTDFNet (mdxnet.py:32) read-only."""
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = pl
    sys.path.insert(0, REF)
    try:
        from src.audiokit.uvr5.lib_v5.vr_network.mdxnet import ConvTDFNet
    finally:
        sys.path.remove(REF)
    return ConvTDFNet(
        target_name="vocals", lr=1e-3, optimizer="adamw", dim_c=cfg.dim_c,
        dim_f=cfg.dim_f, dim_t=cfg.dim_t, n_fft=cfg.n_fft, hop_length=cfg.hop,
        num_blocks=cfg.num_blocks, l=cfg.l, g=cfg.g, k=cfg.k, bn=cfg.bn,
        bias=cfg.bias, overlap=0)


@needs_ref
def test_mdx_net_parity(rng):
    import jax.numpy as jnp

    torch.manual_seed(0)
    tnet = _ref_torch_net(SMALL).eval()
    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()
             if "window" not in k and "freq_pad" not in k}

    inferred = jm.infer_mdx_config(state, dim_f=SMALL.dim_f,
                                   dim_t=SMALL.dim_t, n_fft=SMALL.n_fft)
    assert inferred.g == SMALL.g and inferred.num_blocks == SMALL.num_blocks
    assert inferred.l == SMALL.l and inferred.bn == SMALL.bn
    assert inferred.norm == "group" and inferred.dim_f == SMALL.dim_f

    params, batch_stats = jm.convert_mdx_weights(state, SMALL)
    jnet = jm.ConvTDFNet(SMALL)

    x = rng.normal(size=(2, SMALL.dim_c, SMALL.dim_f, SMALL.dim_t)
                   ).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    # reference layout (B, C, F, T) -> flax (B, T, F, C)
    ours = np.asarray(jnet.apply(variables,
                                 jnp.asarray(x.transpose(0, 3, 2, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 2, 1), ref,
                               atol=1e-4, rtol=1e-3)


@needs_ref
def test_mdx_stft_packing_parity(rng):
    """Our numpy stft/istft packing == reference ConvTDFNetTrim.stft/istft."""
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = pl
    sys.path.insert(0, REF)
    try:
        from src.audiokit.uvr5.lib_v5.vr_network.mdxnet import ConvTDFNetTrim
    finally:
        sys.path.remove(REF)
    trim = ConvTDFNetTrim(device="cpu", model_name="Conv-TDF",
                          target_name="vocals", L=SMALL.num_blocks,
                          dim_f=SMALL.dim_f, dim_t=5,  # 2**5 = 32 frames
                          n_fft=SMALL.n_fft, hop=SMALL.hop)
    sep = jm.MDXSeparator.from_params({}, {}, SMALL)

    waves = rng.uniform(-0.5, 0.5, (3, 2, SMALL.chunk_size)).astype(np.float32)
    ref_spec = trim.stft(torch.from_numpy(waves)).numpy()   # (B, 4, F, T)
    ours_spec = sep._stft(waves)                            # (B, T, F, 4)
    np.testing.assert_allclose(ours_spec.transpose(0, 3, 2, 1), ref_spec,
                               atol=1e-4)

    ref_wav = trim.istft(torch.from_numpy(ref_spec)).numpy()
    ours_wav = sep._istft(ours_spec)
    np.testing.assert_allclose(ours_wav, ref_wav, atol=1e-4)


def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _field(num, wire, payload):
    tag = _varint((num << 3) | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def _tensor_proto(name, arr):
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    msg += _field(2, 0, _varint(1))                      # float32
    msg += _field(8, 2, name.encode())
    msg += _field(9, 2, arr.astype("<f4").tobytes())
    return msg


def test_onnx_initializer_parser(tmp_path, rng):
    a = rng.normal(size=(3, 4)).astype(np.float32)
    b = rng.normal(size=(2, 1, 5)).astype(np.float32)
    graph = _field(5, 2, _tensor_proto("first_conv.0.weight", a)) + \
        _field(5, 2, _tensor_proto("ds.0.0.bias", b)) + \
        _field(2, 2, b"g")                               # graph name
    model = _field(1, 0, _varint(8)) + _field(7, 2, graph)  # ir_version+graph
    path = tmp_path / "tiny.onnx"
    path.write_bytes(model)

    out = jm.load_onnx_initializers(str(path))
    assert set(out) == {"first_conv.0.weight", "ds.0.0.bias"}
    np.testing.assert_array_equal(out["first_conv.0.weight"], a)
    np.testing.assert_array_equal(out["ds.0.0.bias"], b)


def test_mdx_demix_smoke(rng):
    """Chunked demix keeps length, stays finite, splices without NaN."""
    import jax

    cfg = SMALL
    jnet = jm.ConvTDFNet(cfg)
    x0 = np.zeros((1, cfg.dim_t, cfg.dim_f, cfg.dim_c), np.float32)
    variables = jnet.init(jax.random.PRNGKey(0), x0)
    sep = jm.MDXSeparator.from_params(
        variables["params"], variables.get("batch_stats", {}), cfg,
        chunks=0, denoise=True)
    # ~1.2 chunks worth of audio to exercise padding
    n = int(cfg.chunk_size * 1.2)
    wav = rng.uniform(-0.3, 0.3, (2, n)).astype(np.float32)
    out = sep.demix(wav)
    assert out.shape == wav.shape
    assert np.isfinite(out).all()
    vocal, inst = sep.separate(wav[0], jm.MDXSeparator.SR)
    assert vocal.shape[0] == 2 and inst.shape[0] == 2  # true stereo out
    assert np.isfinite(vocal).all() and np.isfinite(inst).all()
