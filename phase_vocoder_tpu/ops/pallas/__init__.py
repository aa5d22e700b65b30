"""Pallas TPU fast path: fused STFT/iSTFT kernels (SURVEY.md SS7 stage 4)."""

from .stft import istft_frames, istft_frames_cart, istft_ola, stft_polar

__all__ = ["stft_polar", "istft_ola", "istft_frames", "istft_frames_cart"]
