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
