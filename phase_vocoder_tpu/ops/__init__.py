"""Core DSP ops: framing, FFT backends, phase math, resampling, windows."""

from . import fft, framing, phase, resample, window  # noqa: F401
