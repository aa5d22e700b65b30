"""Checkpoint/resume at segment-batch granularity (fault injection)."""

import numpy as np
import pytest

from phase_vocoder_tpu import PvocConfig
from phase_vocoder_tpu.streaming import stream_time_stretch
from phase_vocoder_tpu.utils.checkpoint import (
    StreamCheckpointer,
    checkpointed_stream_time_stretch,
)
from tests.conftest import make_test_signal

CFG = PvocConfig()


@pytest.fixture(scope="module")
def x8s():
    return make_test_signal(8.0).astype(np.float32)


def test_uninterrupted_matches_stream(tmp_path, x8s):
    y_ck = np.asarray(checkpointed_stream_time_stretch(
        x8s, 2.0, CFG, checkpoint_dir=str(tmp_path / "ck"),
        segment_frames=64, batch_segments=3,
    ))
    y = np.asarray(stream_time_stretch(x8s, 2.0, CFG, segment_frames=64))
    assert y_ck.shape == y.shape
    np.testing.assert_allclose(y_ck, y, atol=1e-6)


def test_resume_after_injected_failure(tmp_path, x8s):
    ckdir = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="injected failure"):
        checkpointed_stream_time_stretch(
            x8s, 2.0, CFG, checkpoint_dir=ckdir,
            segment_frames=64, batch_segments=3, _fail_after_batches=2,
        )
    done = StreamCheckpointer(ckdir).completed_batches()
    assert done, "no batches persisted before the failure"
    # Resume: picks up after the last committed batch, finishes the run.
    y_ck = np.asarray(checkpointed_stream_time_stretch(
        x8s, 2.0, CFG, checkpoint_dir=ckdir,
        segment_frames=64, batch_segments=3,
    ))
    y = np.asarray(stream_time_stretch(x8s, 2.0, CFG, segment_frames=64))
    np.testing.assert_allclose(y_ck, y, atol=1e-6)


def test_completed_run_is_idempotent(tmp_path, x8s):
    ckdir = str(tmp_path / "ck")
    y1 = np.asarray(checkpointed_stream_time_stretch(
        x8s, 2.0, CFG, checkpoint_dir=ckdir, segment_frames=64,
        batch_segments=3,
    ))
    y2 = np.asarray(checkpointed_stream_time_stretch(
        x8s, 2.0, CFG, checkpoint_dir=ckdir, segment_frames=64,
        batch_segments=3,
    ))
    np.testing.assert_array_equal(y1, y2)


def test_mismatched_run_rejected(tmp_path, x8s):
    ckdir = str(tmp_path / "ck")
    checkpointed_stream_time_stretch(
        x8s, 2.0, CFG, checkpoint_dir=ckdir, segment_frames=64,
        batch_segments=3,
    )
    with pytest.raises(ValueError, match="different run"):
        checkpointed_stream_time_stretch(
            x8s, 0.5, CFG, checkpoint_dir=ckdir, segment_frames=64,
            batch_segments=3,
        )


# ---------------------------------------------------------------------------
# Fused-kernel streaming checkpoints (FusedStreamState)
# ---------------------------------------------------------------------------

def test_fused_checkpoint_resume_bitwise(tmp_path, x8s):
    """Injected failure mid-run, resume completes; result is bit-identical
    to the uninterrupted fused streaming run (and hence to the monolithic
    fused kernel)."""
    from phase_vocoder_tpu.streaming import fused_stream_time_stretch
    from phase_vocoder_tpu.utils.checkpoint import (
        checkpointed_fused_stream_time_stretch,
    )

    cfg = PvocConfig(fft_backend="pallas")
    ckdir = str(tmp_path / "ck_fused")
    ref = np.asarray(
        fused_stream_time_stretch(x8s, 2.0, cfg, segment_frames=256)
    )
    with pytest.raises(RuntimeError, match="injected"):
        checkpointed_fused_stream_time_stretch(
            x8s, 2.0, cfg, checkpoint_dir=ckdir, segment_frames=256,
            batch_segments=1, _fail_after_batches=1,
        )
    out = np.asarray(checkpointed_fused_stream_time_stretch(
        x8s, 2.0, cfg, checkpoint_dir=ckdir, segment_frames=256,
        batch_segments=1,
    ))
    np.testing.assert_array_equal(out, ref)


def test_legacy_checkpoint_missing_pair_lo_restores(tmp_path, x8s):
    """A pre-pair-carry checkpoint (no psi_carry_lo) restores with lo=0
    instead of failing (ADVICE.md round 3)."""
    from phase_vocoder_tpu.utils.checkpoint import _tree_to_state

    import jax.numpy as jnp

    tree = {
        "phi_prev": np.zeros(513, np.float32),
        "psi_carry": np.ones(513, np.float32),
        "phi0": np.zeros(513, np.float32),
        "ola_tail": np.zeros(1024 - 512, np.float32),
        "norm_tail": np.zeros(1024 - 512, np.float32),
        "started": np.ones((), bool),
        "frame_offset": np.zeros((), np.int32),
    }
    state = _tree_to_state(tree)
    assert np.array_equal(np.asarray(state.psi_carry_lo), np.zeros(513))


@pytest.mark.parametrize("part_dtype", ["bfloat16", "int16"])
def test_compact_part_dtypes_resume_consistent(tmp_path, x8s, part_dtype):
    """Half-size output parts (VERDICT r04 #9: tunnel fetch volume): lossy
    vs f32 but resume-consistent — an interrupted+resumed run returns the
    same waveform as an uninterrupted run at the SAME part_dtype, and both
    stay within the encoding's own error of the f32 result."""
    from phase_vocoder_tpu.utils.checkpoint import (
        checkpointed_fused_stream_time_stretch,
    )

    cfg = PvocConfig(fft_backend="pallas")
    kw = dict(segment_frames=64, batch_segments=2, part_dtype=part_dtype)
    d1 = str(tmp_path / "a")
    y_full = np.asarray(checkpointed_fused_stream_time_stretch(
        x8s, 2.0, cfg, checkpoint_dir=d1, **kw))
    d2 = str(tmp_path / "b")
    with pytest.raises(RuntimeError, match="injected"):
        checkpointed_fused_stream_time_stretch(
            x8s, 2.0, cfg, checkpoint_dir=d2, _fail_after_batches=1, **kw)
    y_res = np.asarray(checkpointed_fused_stream_time_stretch(
        x8s, 2.0, cfg, checkpoint_dir=d2, **kw))
    np.testing.assert_array_equal(y_full, y_res)
    y_f32 = np.asarray(checkpointed_fused_stream_time_stretch(
        x8s, 2.0, cfg, checkpoint_dir=str(tmp_path / "c"),
        segment_frames=64, batch_segments=2))
    tol = 1e-2 if part_dtype == "bfloat16" else 1e-4
    # Interior only: the last few samples legitimately blow up (OLA edge
    # window-norm -> eps clamp). int16 additionally CLIPS legitimate
    # stretch overshoot past +-1.0 (documented PCM16 caveat), so its
    # quantization bound applies only where |y| < 1.
    sl = slice(1024, len(y_full) - 1024)
    a, b = y_full[sl], y_f32[sl]
    if part_dtype == "int16":
        keep = np.abs(b) < 1.0
        a, b = a[keep], b[keep]
    assert np.max(np.abs(a - b)) < tol
