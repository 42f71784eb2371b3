"""Metric sanity tests."""
import numpy as np
import pytest

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


def _write_wav(path, wav, sr=24000):
    import wave as wavemod
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    with wavemod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_plugin_scores_through_fake_models():
    """The UTMOS/PESQ/STOI plug-in paths (experiment.py:241-255,
    metrics/infer.py) run through registered fake backends."""
    from llmvox_tpu.codec import metrics as M

    M.register_plugin("pesq", lambda y_hat, y, sr: 3.5)
    M.register_plugin("stoi", lambda y_hat, y, sr: 0.91)
    M.register_plugin("utmos", lambda y_hat, sr: 4.2)
    try:
        rng = np.random.default_rng(0)
        y = rng.standard_normal(24000).astype(np.float32) * 0.1
        out = M.evaluate_pair(y + 0.01, y)
        assert out["pesq"] == 3.5
        assert out["stoi"] == 0.91
        assert out["utmos"] == 4.2
        assert np.isfinite(out["mel_distance"]) and np.isfinite(out["si_snr"])
    finally:
        for name in ("pesq", "stoi", "utmos"):
            M.register_plugin(name, None)


def test_eval_cli_over_recon_dir(tmp_path):
    """Batch evaluator over pre-decoded files (metrics/infer.py:1-115
    counterpart): filelist + recon dir -> per-file rows + mean report."""
    from llmvox_tpu.codec import eval as E
    from llmvox_tpu.codec import metrics as M

    rng = np.random.default_rng(0)
    recon_dir = tmp_path / "recon"
    recon_dir.mkdir()
    refs = []
    for i, recon_name in enumerate(["a_recon.wav", "b.wav"]):
        y = rng.standard_normal(12000).astype(np.float32) * 0.1
        ref = tmp_path / f"{'ab'[i]}.wav"
        _write_wav(ref, y)
        _write_wav(recon_dir / recon_name, y + 0.005)
        refs.append(str(ref))
    filelist = tmp_path / "files.txt"
    filelist.write_text("\n".join(refs))
    # a missing reconstruction is skipped with a warning, not a crash
    extra = tmp_path / "c.wav"
    _write_wav(extra, rng.standard_normal(6000).astype(np.float32) * 0.1)

    M.register_plugin("utmos", lambda y_hat, sr: 4.0)
    try:
        out_json = tmp_path / "report.json"
        report = E.main(["--refs", str(filelist), str(extra),
                         "--recon_dir", str(recon_dir),
                         "--out_json", str(out_json)])
    finally:
        M.register_plugin("utmos", None)
    assert report["n"] == 2
    assert {"mel_distance", "si_snr", "utmos"} <= set(report["mean"])
    assert report["mean"]["utmos"] == 4.0
    assert out_json.exists()
    import json
    saved = json.loads(out_json.read_text())
    assert saved["n"] == 2 and len(saved["per_file"]) == 2


def test_eval_mean_guards_all_nan_columns(tmp_path):
    """An all-NaN metric column (e.g. STOI on clips too short after
    silence removal) aggregates to None — no RuntimeWarning, and the
    report stays strict-JSON serializable."""
    import json
    import warnings
    from llmvox_tpu.codec import eval as E
    from llmvox_tpu.codec import metrics as M

    rng = np.random.default_rng(1)
    y = rng.standard_normal(8000).astype(np.float32) * 0.1
    ref, recon = tmp_path / "r.wav", tmp_path / "h.wav"
    _write_wav(ref, y)
    _write_wav(recon, y + 0.01)

    M.register_plugin("stoi", lambda y_hat, y, sr: float("nan"))
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            report = E.evaluate_files([(str(recon), str(ref))],
                                      log=lambda *_: None)
    finally:
        M.register_plugin("stoi", None)
    assert report["mean"]["stoi"] is None
    json.dumps(report, allow_nan=False)   # strict JSON survives


def test_eval_cli_codec_synthesis_mode(tmp_path):
    """--codec_params mode: copy-synthesize through a tiny codec, then
    score (WavTokenizer/infer.py + metrics/infer.py in one command)."""
    import jax
    from llmvox_tpu.codec import eval as E
    from llmvox_tpu.codec.codec import init_codec_params
    from llmvox_tpu.train.checkpoint import save_params_npz

    cp = tmp_path / "codec.npz"
    from llmvox_tpu.utils.config import CodecConfig
    cfg = CodecConfig(downsamples=(2, 2), n_filters=4, seanet_dimension=16,
                      vq_dim=16, vq_bins=32, backbone_input_channels=16,
                      backbone_dim=32, backbone_intermediate_dim=96,
                      backbone_num_layers=1, n_fft=16, hop_length=4)
    params = jax.device_get(
        init_codec_params(jax.random.PRNGKey(1), cfg, with_encoder=True))
    save_params_npz(str(cp), params)

    rng = np.random.default_rng(1)
    ref = tmp_path / "in.wav"
    _write_wav(ref, rng.standard_normal(800).astype(np.float32) * 0.1)

    report = E.main(["--refs", str(ref), "--codec_params", str(cp),
                     "--downsamples", "[2, 2]", "--n_filters", "4",
                     "--seanet_dimension", "16", "--vq_dim", "16",
                     "--vq_bins", "32", "--backbone_input_channels", "16",
                     "--backbone_dim", "32",
                     "--backbone_intermediate_dim", "96",
                     "--backbone_num_layers", "1",
                     "--n_fft", "16", "--hop_length", "4"])
    assert report["n"] == 1
    assert np.isfinite(report["mean"]["mel_distance"])
    assert np.isfinite(report["mean"]["si_snr"])


def test_predict_pitch_reference_pipeline():
    """predict_pitch mirrors metrics/periodicity.py:16-69: silence gating
    via A-weighted dB, unvoiced -> NaN pitch."""
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    pitch, per = metrics.predict_pitch(tone, sr)
    voiced = ~np.isnan(pitch)
    assert voiced.mean() > 0.95
    assert abs(np.nanmedian(pitch) - 220.0) < 1.0
    assert np.median(per[voiced]) > 0.9

    # digital silence: periodicity zeroed, all frames unvoiced
    ps, pers = metrics.predict_pitch(np.zeros(sr, np.float32), sr)
    assert np.isnan(ps).all() and (pers == 0).all()

    # a -100 dB tone is periodic but silent -> gated unvoiced
    pq, perq = metrics.predict_pitch((1e-5 * tone).astype(np.float32), sr)
    assert np.isnan(pq).all() and (perq == 0).all()

    # broadband noise: essentially everything unvoiced
    noise = np.random.default_rng(0).standard_normal(sr).astype(np.float32)
    pn, _ = metrics.predict_pitch(0.3 * noise, sr)
    assert (~np.isnan(pn)).mean() < 0.1


def test_yin_tracks_harmonic_rich_waves_without_octave_errors():
    sr = 16000
    t = np.arange(sr) / sr
    for f in (80.0, 110.0, 440.0, 523.0):
        w = (np.sin(2 * np.pi * f * t) + 0.5 * np.sin(4 * np.pi * f * t)
             + 0.3 * np.sin(6 * np.pi * f * t)).astype(np.float32)
        pitch, _ = metrics.predict_pitch(w, sr)
        est = np.nanmedian(pitch)
        assert abs(1200 * np.log2(est / f)) < 10, (f, est)


def test_crepe_plugin_backend_overrides_yin():
    sr = 16000
    tone = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    metrics.register_plugin(
        "crepe", lambda a, s: (np.full(10, 100.0), np.full(10, 0.9)))
    try:
        pitch, per = metrics.predict_pitch(tone, sr)
        assert len(pitch) == 10 and pitch[0] == 100.0 and per[0] == 0.9
    finally:
        metrics.register_plugin("crepe", None)


def test_builtin_stoi_tracks_snr():
    """Dependency-free STOI (codec/stoi.py): perfect on identity, falls
    monotonically with SNR on broadband modulated signals, near zero for
    unrelated noise — the published algorithm's qualitative curve."""
    from llmvox_tpu.codec.stoi import stoi
    sr = 16000
    rng = np.random.default_rng(2)
    n = 3 * sr
    carrier = rng.standard_normal(n)
    env = np.abs(rng.standard_normal(n // 800 + 2))
    env = np.interp(np.arange(n) / 800.0, np.arange(len(env)), env)
    clean = carrier * env

    assert stoi(clean, clean, sr) > 0.999
    scores = []
    for snr in (20, 10, 0, -10):
        noise = rng.standard_normal(n)
        noise *= (np.linalg.norm(clean) / np.linalg.norm(noise)
                  / (10 ** (snr / 20)))
        scores.append(stoi(clean, clean + noise, sr))
    assert scores[0] > 0.95
    assert all(a > b for a, b in zip(scores, scores[1:]))
    assert stoi(clean, rng.standard_normal(n), sr) < 0.15
    assert np.isnan(stoi(clean[:1000], clean[:1000], sr))


def test_stoi_score_uses_builtin_without_pystoi():
    """metrics.stoi_score now always returns a value: plug-in, pystoi, or
    the built-in implementation (this image has no pystoi)."""
    sr = 16000
    rng = np.random.default_rng(3)
    n = 2 * sr
    env = np.interp(np.arange(n) / 500.0,
                    np.arange(n // 500 + 2),
                    np.abs(rng.standard_normal(n // 500 + 2)))
    clean = (rng.standard_normal(n) * env).astype(np.float32)
    s = metrics.stoi_score(clean, clean, sr)
    assert s is not None and s > 0.999


def test_builtin_stoi_tiny_clip_returns_nan_not_crash():
    from llmvox_tpu.codec.stoi import stoi
    x = np.random.default_rng(0).standard_normal(300)
    assert np.isnan(stoi(x, x, 16000))


def test_builtin_pesq_identity_and_snr_ladder():
    """Dependency-free wideband PESQ (codec/pesq.py): an identical pair
    scores the package's wb maximum (4.644), additive white noise falls
    monotonically over a 40->0 dB SNR ladder with a wide spread, and the
    score is invariant to gain and small constant delay (VERDICT r4 #7)."""
    from llmvox_tpu.codec.pesq import pesq_wb
    sr = 16000
    t = np.arange(3 * sr) / sr
    x = sum(np.sin(2 * np.pi * 120 * k * t) / k for k in range(1, 9))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)
    x = x / np.abs(x).max() * 0.3

    assert abs(pesq_wb(x, x, sr) - 4.644) < 2e-3

    rng = np.random.default_rng(0)
    scores = []
    for snr in (40, 30, 20, 10, 0):
        n = rng.standard_normal(len(x))
        n *= np.sqrt(np.mean(x ** 2) / np.mean(n ** 2)) * 10 ** (-snr / 20)
        scores.append(pesq_wb(x, x + n, sr))
    assert all(a > b for a, b in zip(scores, scores[1:]))
    assert scores[0] > 4.0          # 40 dB: nearly transparent
    assert scores[-1] < 1.6         # 0 dB: bad

    # invariances the perceptual model must have
    assert pesq_wb(x, 2.0 * x, sr) > 4.6                     # level align
    delayed = np.concatenate([np.zeros(128), x])[:len(x)]
    assert pesq_wb(x, delayed, sr) > 4.5                     # time align
    # deletions are penalized through the symmetric disturbance
    cut = x.copy()
    cut[len(x) // 3:2 * len(x) // 3] = 0.0
    assert pesq_wb(x, cut, sr) < 3.0
    assert pesq_wb(x, np.zeros_like(x), sr) < 3.0


def test_builtin_pesq_tracks_quantization_depth():
    """Coarser quantization must score strictly worse — the distortion
    family codec evaluation actually cares about."""
    from llmvox_tpu.codec.pesq import pesq_wb
    sr = 16000
    t = np.arange(2 * sr) / sr
    x = sum(np.sin(2 * np.pi * 150 * k * t) / k for k in range(1, 7))
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * t)
    x = x / np.abs(x).max() * 0.4
    s = [pesq_wb(x, np.round(x * 2 ** b) / 2 ** b, sr) for b in (10, 7, 5)]
    assert s[0] > s[1] > s[2]
    assert s[0] > 4.0 and s[2] < 3.2


def test_pesq_score_uses_builtin_without_pesq_package():
    """metrics.pesq_score now always returns a value: plug-in, pesq
    package, or the built-in implementation (this image has neither
    package)."""
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    s = metrics.pesq_score(x, x, sr)
    assert s is not None and s > 4.6


def test_builtin_pesq_package_signature_shim():
    from llmvox_tpu.codec.pesq import pesq
    sr = 16000
    x = 0.2 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)
    assert pesq(sr, x, x, "wb") > 4.6
    with pytest.raises(ValueError):
        pesq(sr, x, x, "nb")
