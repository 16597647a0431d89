from .resnet9 import AudioResNet9, import_gdt_audio_weights  # noqa: F401
from .spectrogram import (  # noqa: F401
    log_spectrogram,
    stft_magnitude,
    video_audio_clips,
)
