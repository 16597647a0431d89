"""Audio -> log-spectrogram, matching the GDT preprocessing the reference
uses for its audio tower (``scripts/get_audio_embeddings.py:88-112``):
2-second clips at 24 kHz, STFT with 20 ms window / 10 ms hop / n_fft=512
-> (1, 257, 199) log-magnitude spectrograms; missing audio falls back to
all-ones.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

SAMPLE_RATE = 24000
NUM_SEC = 2
N_FFT = 512
WIN_LENGTH = 480  # 20 ms
HOP_LENGTH = 240  # 10 ms
N_FREQ = N_FFT // 2 + 1  # 257
N_FRAMES = (NUM_SEC * SAMPLE_RATE - WIN_LENGTH) // HOP_LENGTH + 1  # 199
TIME_POINTS = (0.15, 0.3, 0.45, 0.6, 0.85)
FALLBACK = np.ones((1, N_FREQ, N_FRAMES), np.float32)


def stft_magnitude(wav: np.ndarray) -> np.ndarray:
    """[n_samples] -> [257, n_frames] magnitude STFT (Hann window)."""
    window = np.hanning(WIN_LENGTH).astype(np.float32)
    n_frames = (len(wav) - WIN_LENGTH) // HOP_LENGTH + 1
    if n_frames <= 0:
        return np.zeros((N_FREQ, 0), np.float32)
    idx = (
        np.arange(WIN_LENGTH)[None, :]
        + HOP_LENGTH * np.arange(n_frames)[:, None]
    )
    frames = wav[idx] * window
    spec = np.fft.rfft(frames, n=N_FFT, axis=-1)
    return np.abs(spec).T.astype(np.float32)  # [257, n_frames]


def log_spectrogram(
    wav: np.ndarray, z_normalize: bool = False
) -> np.ndarray:
    """2-second waveform -> (1, 257, 199) log spectrogram."""
    target = NUM_SEC * SAMPLE_RATE
    if len(wav) < target:
        wav = np.pad(wav, (0, target - len(wav)))
    wav = wav[:target].astype(np.float32)
    spec = stft_magnitude(wav)
    spec = np.log(spec + 1e-6)
    if spec.shape[1] > N_FRAMES:
        spec = spec[:, :N_FRAMES]
    elif spec.shape[1] < N_FRAMES:
        spec = np.pad(spec, ((0, 0), (0, N_FRAMES - spec.shape[1])))
    if z_normalize:
        spec = (spec - spec.mean()) / (spec.std() + 1e-6)
    return spec[None]


def load_audio_clip(
    path: str, fr_sec: float, num_sec: int = NUM_SEC,
    sample_rate: int = SAMPLE_RATE,
) -> Optional[np.ndarray]:
    """Decode ``num_sec`` of mono audio at ``fr_sec`` via PyAV when
    available, else ffmpeg-through-OpenCV is not an option for audio — return
    None so callers use the all-ones fallback (the reference does the same
    for missing audio, ``get_audio_embeddings.py:111-112``)."""
    try:
        import av  # noqa: F401
    except ImportError:
        return None
    try:
        container = av.open(path)
        stream = container.streams.audio[0]
        # container-level seek takes av.time_base (1/1e6 s) units: divide by
        # the Fraction (multiplying truncated every offset to 0 and decoded
        # all clips from the file start)
        container.seek(int(fr_sec / av.time_base), any_frame=False)
        samples = []
        resampler = av.AudioResampler(format="s16", layout="mono", rate=sample_rate)
        for frame in container.decode(stream):
            for rf in resampler.resample(frame):
                samples.append(rf.to_ndarray().reshape(-1))
            if sum(len(s) for s in samples) >= num_sec * sample_rate:
                break
        if not samples:
            return None
        wav = np.concatenate(samples).astype(np.float32) / 32768.0
        return wav[: num_sec * sample_rate]
    except Exception:
        return None


def video_audio_clips(path: str, n_clips: int = 5) -> np.ndarray:
    """Spectrogram clips at the reference's relative time points
    (``get_audio_embeddings.py:90-110``); all-ones fallbacks when audio is
    unavailable."""
    from ..data.video import video_duration_sec

    duration = video_duration_sec(path)
    clips: List[np.ndarray] = []
    for tp in TIME_POINTS[:n_clips]:
        wav = load_audio_clip(path, duration * tp) if duration > 0 else None
        clips.append(FALLBACK if wav is None else log_spectrogram(wav))
    return np.concatenate(clips, axis=0)  # [n_clips, 257, 199]
