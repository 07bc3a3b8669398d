from .mel import log_mel_spectrogram, mel_filterbank

__all__ = ["log_mel_spectrogram", "mel_filterbank"]
