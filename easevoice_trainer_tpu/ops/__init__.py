from .mel import mel_filterbank
from .stft import spectrogram, spec_to_mel, mel_spectrogram, MelConfig
