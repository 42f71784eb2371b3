"""Codec quality metrics (reference WavTokenizer/metrics/*).

Built-in, dependency-free metrics:
- ``mel_distance`` — safe-log mel L1 (the reference's core val metric)
- ``si_snr`` — scale-invariant SNR
- ``pitch_metrics`` — periodicity/pitch/voicing-F1 via an autocorrelation
  pitch tracker (the reference uses torchcrepe, metrics/periodicity.py;
  same metric definitions over a lighter F0 estimator)

Optional plug-ins, used when their packages/models are installed (or when
a backend is registered with ``register_plugin``):
- ``pesq_score`` (pesq package), ``stoi_score`` (pystoi package),
  ``utmos_score`` (UTMOS checkpoint) — mirroring experiment.py:241-255 and
  metrics/infer.py:1-115.

Batch evaluation over a decoded test set: ``llmvox_tpu.codec.eval``.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

from llmvox_tpu.codec.mel import mel_spectrogram, safe_log

# Plug-in backends: name -> callable.  Lets deployments (and tests) inject
# a scorer without the optional package/checkpoint being importable here —
# e.g. ``register_plugin("utmos", my_predictor)`` where my_predictor takes
# (wav, sr) and returns a float.
_PLUGINS: Dict[str, Callable] = {}


def register_plugin(name: str, fn: Optional[Callable]) -> None:
    """Register (or, with ``fn=None``, remove) a metric backend.
    Names: ``"pesq"``, ``"stoi"``, ``"utmos"``."""
    if fn is None:
        _PLUGINS.pop(name, None)
    else:
        _PLUGINS[name] = fn


def mel_distance(y_hat: np.ndarray, y: np.ndarray,
                 sample_rate: int = 24000) -> float:
    import jax.numpy as jnp
    a = safe_log(mel_spectrogram(jnp.asarray(y_hat[None]),
                                 sample_rate=sample_rate))
    b = safe_log(mel_spectrogram(jnp.asarray(y[None]),
                                 sample_rate=sample_rate))
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    est = est - est.mean()
    ref = ref - ref.mean()
    t = min(len(est), len(ref))
    est, ref = est[:t], ref[:t]
    s = (np.dot(est, ref) / (np.dot(ref, ref) + 1e-9)) * ref
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + 1e-9) / (np.dot(e, e) + 1e-9)))


def _autocorr_f0(x: np.ndarray, sr: int, frame: int = 1024, hop: int = 256,
                 fmin: float = 50.0, fmax: float = 550.0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-frame (f0, voiced-probability) via normalized autocorrelation."""
    lag_min = int(sr / fmax)
    lag_max = int(sr / fmin)
    n_frames = max(0, 1 + (len(x) - frame) // hop)
    f0 = np.zeros(n_frames)
    voiced = np.zeros(n_frames)
    for i in range(n_frames):
        seg = x[i * hop: i * hop + frame].astype(np.float64)
        seg = seg - seg.mean()
        energy = np.dot(seg, seg)
        if energy < 1e-8:
            continue
        ac = np.correlate(seg, seg, mode="full")[frame - 1:]
        ac = ac / (ac[0] + 1e-12)
        window = ac[lag_min: min(lag_max, frame - 1)]
        if len(window) == 0:
            continue
        peak = int(np.argmax(window)) + lag_min
        voiced[i] = max(0.0, ac[peak])
        f0[i] = sr / peak
    return f0, voiced


def pitch_metrics(y_hat: np.ndarray, y: np.ndarray, sr: int = 16000,
                  voicing_threshold: float = 0.5) -> Dict[str, float]:
    """Periodicity RMSE, voiced-pitch RMSE (log2 cents-style), voicing F1 —
    the metric definitions of metrics/periodicity.py over an
    autocorrelation F0 tracker."""
    f0_a, v_a = _autocorr_f0(y, sr)
    f0_b, v_b = _autocorr_f0(y_hat, sr)
    t = min(len(f0_a), len(f0_b))
    f0_a, v_a, f0_b, v_b = f0_a[:t], v_a[:t], f0_b[:t], v_b[:t]
    periodicity = float(np.sqrt(np.mean((v_a - v_b) ** 2))) if t else 0.0
    va = v_a > voicing_threshold
    vb = v_b > voicing_threshold
    both = va & vb & (f0_a > 0) & (f0_b > 0)
    if both.any():
        pitch = float(np.sqrt(np.mean(
            (1200 * np.log2(f0_a[both] / f0_b[both])) ** 2)))
    else:
        pitch = 0.0
    tp = float((va & vb).sum())
    precision = tp / max(float(vb.sum()), 1.0)
    recall = tp / max(float(va.sum()), 1.0)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {"periodicity": periodicity, "pitch_rmse_cents": pitch,
            "voicing_f1": f1}


def pesq_score(y_hat: np.ndarray, y: np.ndarray,
               sr: int = 16000) -> Optional[float]:
    """Wideband PESQ (experiment.py:246-255): registered backend first,
    else the pesq package, else None."""
    if "pesq" in _PLUGINS:
        return float(_PLUGINS["pesq"](y_hat, y, sr))
    try:
        from pesq import pesq
    except ImportError:
        return None
    return float(pesq(sr, y, y_hat, "wb", on_error=1))


def stoi_score(y_hat: np.ndarray, y: np.ndarray,
               sr: int = 16000) -> Optional[float]:
    """STOI intelligibility (metrics/infer.py uses pystoi): registered
    backend first, else the pystoi package, else None."""
    if "stoi" in _PLUGINS:
        return float(_PLUGINS["stoi"](y_hat, y, sr))
    try:
        from pystoi import stoi
    except ImportError:
        return None
    t = min(len(y_hat), len(y))
    return float(stoi(y[:t], y_hat[:t], sr, extended=False))


def utmos_score(y_hat: np.ndarray, sr: int = 16000) -> Optional[float]:
    """UTMOS MOS prediction (metrics/UTMOS.py counterpart): registered
    backend first, else torch.hub's SpeechMOS checkpoint, else None."""
    if "utmos" in _PLUGINS:
        return float(_PLUGINS["utmos"](y_hat, sr))
    try:
        import torch
        predictor = torch.hub.load("tarepan/SpeechMOS:v1.2.0",
                                   "utmos22_strong", trust_repo=True)
    except Exception:
        return None
    import torch
    with torch.no_grad():
        return float(predictor(torch.from_numpy(y_hat)[None], sr).mean())


def evaluate_pair(y_hat: np.ndarray, y: np.ndarray,
                  sample_rate: int = 24000) -> Dict[str, float]:
    """Full metric sweep for one (reconstruction, reference) pair."""
    from llmvox_tpu.utils.native import resample_poly
    out = {
        "mel_distance": mel_distance(y_hat, y, sample_rate),
        "si_snr": si_snr(y_hat, y),
    }
    y16 = resample_poly(y, 16000, sample_rate)
    yh16 = resample_poly(y_hat, 16000, sample_rate)
    out.update(pitch_metrics(yh16, y16))
    p = pesq_score(yh16, y16)
    if p is not None:
        out["pesq"] = p
    s = stoi_score(yh16, y16)
    if s is not None:
        out["stoi"] = s
    u = utmos_score(yh16)
    if u is not None:
        out["utmos"] = u
    return out
