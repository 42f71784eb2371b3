"""LLMVoX-TPU: a TPU-native streaming text-to-speech framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of LLMVoX
(arXiv 2503.04724): a ~30M-parameter LLM-agnostic autoregressive streaming
TTS system.  Any streaming LLM emits text deltas; a tiny GPT-style decoder
turns byte-level text embeddings into discrete speech tokens (WavTokenizer
codes); a ConvNeXt+ISTFT neural codec turns token chunks into 24 kHz
waveforms streamed over HTTP while the LLM is still generating.

Subpackages
-----------
- ``utils``    — config system, audio I/O, tracing
- ``parallel`` — device mesh, shardings, collective helpers
- ``models``   — the GPT-style speech-token decoder (+ KV cache decode loop)
- ``codec``    — WavTokenizer-compatible neural codec (VQ, ConvNeXt, ISTFT)
- ``ops``      — Pallas/XLA kernels for the hot paths
- ``text``     — ByT5 byte tokenizer, text cleaning, embedding table
- ``streams``  — pluggable text-stream sources (LLM/VLM/ASR adapters)
- ``serve``    — TTS engine, multi-queue dual-replica scheduler, HTTP server
- ``train``    — decoder training (pjit data-parallel) and codec GAN training
"""

__version__ = "0.1.0"
