"""Golden-audio regression net: the codec decode graph must reproduce the
stored waveform for fixed synthetic weights + fixed codes. Guards against
silent numerical regressions across refactors (the reference has no such
net; its only numeric check is listening). Regenerate intentionally with
tests/make_golden.py."""

import os

import numpy as np

from make_golden import synthesize_golden

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "codec_golden.npz")


def test_codec_matches_golden():
    golden = np.load(GOLDEN)["audio"]
    audio = synthesize_golden()
    assert audio.shape == golden.shape
    # CPU XLA is deterministic per version; across versions allow float32
    # reassociation noise but nothing structural
    err = np.abs(audio - golden).max()
    scale = np.abs(golden).max()
    assert err <= 1e-4 * max(scale, 1e-3), (err, scale)
