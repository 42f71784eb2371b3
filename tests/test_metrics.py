"""Metric sanity tests."""
import numpy as np

from llmvox_tpu.codec import metrics

RNG = np.random.default_rng(0)


def test_si_snr_identity_is_high_and_noise_low():
    x = RNG.standard_normal(16000).astype(np.float32)
    assert metrics.si_snr(x, x) > 50
    assert metrics.si_snr(RNG.standard_normal(16000).astype(np.float32), x) < 1


def test_mel_distance_zero_for_identity():
    x = RNG.standard_normal(24000).astype(np.float32)
    assert metrics.mel_distance(x, x) < 1e-6
    assert metrics.mel_distance(x * 0.1, x) > 0.1


def test_pitch_metrics_detect_matching_tone():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    same = metrics.pitch_metrics(tone, tone, sr)
    assert same["pitch_rmse_cents"] < 1.0
    assert same["voicing_f1"] > 0.9
    other = np.sin(2 * np.pi * 330 * t).astype(np.float32)
    diff = metrics.pitch_metrics(other, tone, sr)
    assert diff["pitch_rmse_cents"] > 100


def test_evaluate_pair_runs():
    x = np.sin(2 * np.pi * 180 * np.arange(24000) / 24000).astype(np.float32)
    out = metrics.evaluate_pair(0.9 * x, x)
    assert "mel_distance" in out and "si_snr" in out
    assert np.isfinite(list(out.values())).all()


def test_metrics_logger(tmp_path):
    from llmvox_tpu.utils.logging import MetricsLogger
    log = MetricsLogger(str(tmp_path), "test")
    log.log(1, {"loss": 0.5})
    log.log(2, {"loss": 0.25})
    log.close()
    import json
    lines = [json.loads(l) for l in open(log.path)]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2


def test_spectrogram_image():
    from llmvox_tpu.utils.logging import spectrogram_image
    wav = np.sin(np.linspace(0, 800 * np.pi, 24000)).astype(np.float32)
    img = spectrogram_image(wav, 24000)
    assert img.dtype == np.uint8
    assert img.shape[0] == 100 and img.shape[1] > 10
    assert img.max() == 255
