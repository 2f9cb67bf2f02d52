from openvoice_tpu.audio.io import load_audio, save_wav, read_wav, write_wav  # noqa: F401
from openvoice_tpu.audio.stft import linear_spectrogram, stft_basis  # noqa: F401
from openvoice_tpu.audio.mel import mel_filterbank, spec_to_mel, mel_spectrogram  # noqa: F401
