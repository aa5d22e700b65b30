"""Model facades. The flagship PhaseVocoder wraps the full capability set."""

from .phase_vocoder import PhaseVocoder  # noqa: F401
