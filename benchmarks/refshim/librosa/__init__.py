"""Minimal `librosa` stand-in for running the reference recipe as a
baseline benchmark.  The reference s2 train path uses exactly one symbol:
``librosa.filters.mel`` (/root/reference/src/easevoice/module/
mel_processing.py:3), satisfied here by the repo's own Slaney filterbank
(easevoice_trainer_tpu/ops/mel.py, torch/librosa-parity-tested in
tests/test_stft.py)."""
from . import filters  # noqa: F401
