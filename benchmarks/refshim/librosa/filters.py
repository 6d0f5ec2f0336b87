import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kwargs):
    """librosa.filters.mel signature subset (htk=False/slaney norm defaults,
    which is what the reference calls with).  Non-default htk/norm would
    silently change the baseline's filterbank — fail loudly instead."""
    if kwargs.get("htk", False):
        raise NotImplementedError("mel shim only supports htk=False")
    if kwargs.get("norm", "slaney") != "slaney":
        raise NotImplementedError("mel shim only supports norm='slaney'")
    from easevoice_trainer_tpu.ops.mel import mel_filterbank

    return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
