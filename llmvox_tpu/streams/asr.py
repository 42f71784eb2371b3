"""Whisper ASR adapter (voice-chat input transcription).

Counterpart of the reference ASR class (inference/asr.py:14-168): an HF
``automatic-speech-recognition`` pipeline over ``openai/whisper-<variant>``;
base64-encoded int16 PCM is normalized to float and transcribed
(task=translate iff source != target language).
"""
from __future__ import annotations

import base64
from typing import Dict, Optional

import numpy as np

from llmvox_tpu.utils.config import ServeConfig


def resolve_whisper_name(name: str) -> str:
    """A bare variant name ("small", "large-v3") maps to the openai hub
    repo like the reference (inference/asr.py:31); a path or an
    org-qualified id is used verbatim so local models work."""
    import os
    if not (os.path.sep in name or "/" in name or os.path.isdir(name)):
        name = f"openai/whisper-{name}"
    return name


def load_asr_audio(path: str, target_sr: int) -> np.ndarray:
    """File -> mono float32 at ``target_sr``, peak-normalized — the
    reference's preprocess_audio + transcribe gain (inference/asr.py:
    70-102: torchaudio load/resample, FIRST channel only, ``y /=
    max(|y|)``), built on the repo's stdlib WAV reader + polyphase
    resampler."""
    from llmvox_tpu.utils.audio import convert_audio, read_wav
    wav, sr = read_wav(path)
    wav = np.atleast_2d(wav)[:1]       # first channel, like the reference
    y = convert_audio(wav, sr, target_sr, 1).reshape(-1).astype(np.float32)
    peak = np.max(np.abs(y)) if y.size else 0.0
    return y / (peak if peak > 0 else 1.0)


class WhisperASR:
    def __init__(self, config: Optional[ServeConfig] = None):
        self.config = config or ServeConfig()
        self.transcriber = None

    def load(self) -> None:
        from transformers import pipeline
        self.transcriber = pipeline(
            "automatic-speech-recognition",
            model=resolve_whisper_name(self.config.asr_model),
            device=self.config.asr_device)
        # English-only checkpoints (*.en) have no lang_to_id and reject a
        # language kwarg entirely — only multilingual models get one
        gc = getattr(self.transcriber.model, "generation_config", None)
        self._multilingual = bool(getattr(gc, "lang_to_id", None))

    def decode_base64_audio(self, audio_base64: str) -> np.ndarray:
        """base64 int16 PCM -> float32, PEAK-normalized to [-1, 1] — the
        reference's transcribe_raw gain (inference/asr.py:126-127:
        ``y /= max(|y|)``, NOT a fixed /32768: absolute gain shifts the
        Whisper log-mel features, so this matters for parity)."""
        raw = base64.b64decode(audio_base64)
        pcm = np.frombuffer(raw, dtype=np.int16)
        y = pcm.astype(np.float32)
        peak = np.max(np.abs(y)) if y.size else 0.0
        return y / (peak if peak > 0 else 1.0)

    def run_asr(self, request: Dict) -> str:
        """Transcribe a request with audio_base64 (+ source/target_language).
        Language routing matches run_asr -> transcribe_raw
        (inference/asr.py:138-168): task = translate iff source != target,
        and the source language is passed to generation."""
        if self.transcriber is None:
            self.load()
        audio = self.decode_base64_audio(request["audio_base64"])
        source = request.get("source_language",
                             self.config.asr_default_language)
        target = request.get("target_language", source)
        task = "translate" if source != target else "transcribe"
        kwargs = {"task": task}
        if source and self._multilingual:
            kwargs["language"] = str(source).lower()
        out = self.transcriber(
            {"array": audio, "sampling_rate": int(self.config.asr_sample_rate)},
            generate_kwargs=kwargs,
        )
        return out["text"].strip()

    def transcribe_file(self, path: str, language: Optional[str] = None,
                        task: str = "transcribe") -> str:
        """Reference ``ASR.transcribe`` (inference/asr.py:88-111): load +
        resample a file, peak-normalize, transcribe."""
        if self.transcriber is None:
            self.load()
        audio = load_asr_audio(path, int(self.config.asr_sample_rate))
        kwargs = {"task": task}
        if language is not None and self._multilingual:
            kwargs["language"] = language.lower()
        out = self.transcriber(
            {"array": audio,
             "sampling_rate": int(self.config.asr_sample_rate)},
            generate_kwargs=kwargs)
        return out["text"]


class JAXWhisperASR:
    """Whisper on the TPU (``models/whisper.py``) behind the same
    ``run_asr`` interface as :class:`WhisperASR` — the full-TPU voice
    chat's third leg (ASR + LLM + TTS on one chip).  Selected with
    ``ServeConfig.asr_backend == "jax"``.

    Decoding is GREEDY and matches HF ``generate(num_beams=1)`` token for
    token: language detection from the <|startoftranscript|> logits
    restricted to the language tokens, forced prompt
    [sot, lang, task(, notimestamps)], ``begin_suppress_tokens`` applied
    to the first sampled position and ``suppress_tokens`` to all of them,
    EOS rows frozen on device (tests/test_whisper.py proves token-level
    equality vs the HF pipeline on transcribe AND translate routing).
    Whisper checkpoints' generation configs default to beam 5; beam
    search is not implemented — greedy is the standard streaming/latency
    deployment choice (whisper.cpp, faster-whisper defaults).
    """

    def __init__(self, config: Optional[ServeConfig] = None,
                 device=None, dtype=None):
        self.config = config or ServeConfig()
        self.device = device
        self.dtype = dtype
        self.params = None

    # -- loading --------------------------------------------------------
    def load(self) -> None:
        """Load weights + generation metadata.  ``asr_model`` may be an
        HF checkpoint dir/hub name (converted in memory) or a
        ``convert_ckpt whisper`` .npz artifact — the npz path keeps the
        torch checkpoint out of the serve process entirely (only the
        tokenizer files are read from ``tokenizer_src``)."""
        import os

        from llmvox_tpu.models import whisper as W

        name = self.config.asr_model
        if name.endswith(".npz") and os.path.isfile(name):
            from llmvox_tpu.train.checkpoint import (load_meta,
                                                     load_params_npz)
            meta = load_meta(name)
            params = load_params_npz(name)
            self.cfg = W.WhisperConfig(**meta["model_args"])
            gen = meta.get("generation", {})
            tok_src = meta.get("tokenizer_src")
        else:
            from transformers import WhisperForConditionalGeneration

            from llmvox_tpu.tools.convert import convert_whisper_state_dict
            name = resolve_whisper_name(name)
            model = WhisperForConditionalGeneration.from_pretrained(
                name).eval()
            hc, gc = model.config, model.generation_config
            self.cfg = W.WhisperConfig(
                vocab_size=hc.vocab_size, n_mels=hc.num_mel_bins,
                d_model=hc.d_model, enc_layers=hc.encoder_layers,
                dec_layers=hc.decoder_layers,
                enc_heads=hc.encoder_attention_heads,
                dec_heads=hc.decoder_attention_heads,
                enc_ffn=hc.encoder_ffn_dim, dec_ffn=hc.decoder_ffn_dim,
                max_source_positions=hc.max_source_positions,
                max_target_positions=hc.max_target_positions,
                decoder_start_token_id=int(gc.decoder_start_token_id),
                eos_token_id=int(gc.eos_token_id))
            params = convert_whisper_state_dict(
                model.state_dict(), hc.encoder_layers, hc.decoder_layers)
            gen = {
                "lang_to_id": dict(getattr(gc, "lang_to_id", None) or {}),
                "task_to_id": dict(getattr(gc, "task_to_id", None) or {}),
                "no_timestamps_token_id": getattr(
                    gc, "no_timestamps_token_id", None),
                "suppress_tokens": list(
                    getattr(gc, "suppress_tokens", None) or []),
                "begin_suppress_tokens": list(
                    getattr(gc, "begin_suppress_tokens", None) or []),
                "max_length": getattr(gc, "max_length", None),
            }
            tok_src = name
        self._finish_load(params, gen, tok_src)

    def _finish_load(self, params, gen: Dict, tok_src) -> None:
        import jax
        import jax.numpy as jnp
        from transformers import WhisperTokenizer

        self.tokenizer = WhisperTokenizer.from_pretrained(tok_src)
        if self.dtype is not None:
            params = jax.tree.map(lambda x: x.astype(self.dtype), params)
        if getattr(self.config, "quantize", ""):
            from llmvox_tpu.ops.quant import quantize_whisper_params
            params = quantize_whisper_params(params, self.config.quantize)
        if self.device is not None:
            params = jax.device_put(params, self.device)
        self.params = jax.tree.map(jnp.asarray, params)
        self.lang_to_id = {k: int(v)
                           for k, v in (gen.get("lang_to_id") or {}).items()}
        self.task_to_id = {k: int(v)
                           for k, v in (gen.get("task_to_id") or {}).items()}
        nt = gen.get("no_timestamps_token_id")
        self.no_timestamps_id = int(nt) if nt is not None else None
        self.suppress = tuple(int(t)
                              for t in gen.get("suppress_tokens") or ())
        self.begin_suppress = tuple(
            int(t) for t in gen.get("begin_suppress_tokens") or ())
        ml = gen.get("max_length")
        self.max_length = int(ml) if ml else self.cfg.max_target_positions
        self.decode_block_size = 16
        # encoder-context bucket ladder (mel frames); () / None = always
        # the full 30 s window.  Buckets beyond the model window are
        # clamped; the full window is always the last rung.
        raw = getattr(self.config, "asr_ctx_buckets", ()) or ()
        full = self.cfg.n_audio_frames
        self.ctx_buckets = tuple(sorted(
            {min(int(b), full) for b in raw} | ({full} if raw else set())))
        self.ctx_verify = bool(getattr(self.config, "asr_ctx_verify",
                                       False))

    def _lang_token(self, language: Optional[str]) -> Optional[int]:
        """Language name/code -> language token id, or None to detect."""
        if not language or not self.lang_to_id:
            return None
        lang = language.strip().lower()
        try:
            from transformers.models.whisper.tokenization_whisper import (
                TO_LANGUAGE_CODE)
            lang = TO_LANGUAGE_CODE.get(lang, lang)
        except Exception:
            pass
        return self.lang_to_id.get(f"<|{lang}|>")

    # -- decoding -------------------------------------------------------
    def transcribe_long(self, audio: np.ndarray, task: str = "transcribe",
                        language: Optional[str] = None,
                        max_seconds: Optional[float] = None) -> str:
        """Long-form transcription beyond the 30 s model window: split
        into disjoint 30 s windows, run them ALL through one batched
        program chain (``transcribe_batch``), join the texts.  The
        reference's HF pipeline silently truncates at the window
        (inference/asr.py caps requests at 60 s and the feature
        extractor drops the rest) — this is beyond-reference capability
        the batched TPU path makes nearly free."""
        if self.params is None:
            self.load()
        audio = np.asarray(audio, np.float32).reshape(-1)
        if max_seconds:
            audio = audio[: int(max_seconds * self.cfg.sample_rate)]
        win = self.cfg.n_audio_frames * self.cfg.hop_length
        if len(audio) <= win:
            return self.transcribe(audio, task=task, language=language)
        windows = [audio[i: i + win] for i in range(0, len(audio), win)]
        texts = self.transcribe_batch(windows, task=task, language=language)
        return " ".join(t.strip() for t in texts if t.strip())

    def warmup(self) -> None:
        """Compile the per-bucket program chains (mel/encode/cross/
        prefill/decode) before traffic.  Every bucket must actually be
        REACHED — an unwarmed bucket pays its full compile on the first
        live utterance of that length."""
        if self.params is None:
            self.load()
        hop = self.cfg.hop_length
        for b in (self.ctx_buckets or (self.cfg.n_audio_frames,)):
            n = max(int((b - 60) * hop), hop)   # lands in bucket b
            audio = np.zeros(n, np.float32)
            audio[:1600] = 0.1                  # not pure silence
            for _ in self.transcribe_stream(audio):
                pass

    def _pick_ctx(self, n_samples: int) -> Optional[int]:
        """Smallest encoder-context bucket (mel frames) that holds the
        utterance plus ~0.5 s of slack (the decoder needs some padded
        tail to place EOS), or None for the full window."""
        if not self.ctx_buckets:
            return None
        need = n_samples // self.cfg.hop_length + 50
        for b in self.ctx_buckets:
            if b >= need:
                return b if b < self.cfg.n_audio_frames else None
        return None

    def _prep_single(self, audio: np.ndarray, task: str,
                     language: Optional[str],
                     ctx_frames: Optional[int] = None):
        """Shared single-utterance setup: encode, (optional) language
        detect, forced-prefix prefill.  Returns
        ``(state, cross, forced_len, first_token)``.

        ``ctx_frames`` runs the encoder at a short bucket window
        (models/whisper.py::pad_or_trim) — the cross-KV and every decode
        program downstream shrink with it."""
        import jax.numpy as jnp

        from llmvox_tpu.models import whisper as W
        if self.params is None:
            self.load()
        cfg = self.cfg
        mel = W.log_mel(
            jnp.asarray(W.pad_or_trim(audio, cfg, ctx_frames)), cfg)
        enc = W.encode(self.params, mel, cfg)
        cross = W.make_cross_kv(self.params, enc, cfg)
        dtype = self.params["dec"]["tok_emb"].dtype
        sot = cfg.decoder_start_token_id

        lang_id = self._lang_token(language)
        if lang_id is None and self.lang_to_id:
            # HF detect_language: one [sot] forward, argmax restricted to
            # the language tokens.  (Passing ``language`` skips this — one
            # fewer serial round trip on the voice-chat path.)
            st = W.init_whisper_decode_state(cfg, 1, dtype)
            logits, _ = W.prefill(
                self.params, jnp.asarray([[sot]], jnp.int32), st, cross, cfg)
            row = np.asarray(logits[0, 0], np.float32)
            cand = np.fromiter(self.lang_to_id.values(), np.int64)
            lang_id = int(cand[np.argmax(row[cand])])

        forced = [sot]
        if lang_id is not None:
            forced.append(int(lang_id))
        if self.task_to_id:
            forced.append(int(self.task_to_id.get(
                task, next(iter(self.task_to_id.values())))))
        if self.no_timestamps_id is not None:
            forced.append(int(self.no_timestamps_id))

        state = W.init_whisper_decode_state(cfg, 1, dtype)
        logits, state = W.prefill(
            self.params, jnp.asarray([forced], jnp.int32), state, cross, cfg)
        # np.array, not np.asarray: the zero-copy view of a JAX array is
        # read-only, and every real Whisper checkpoint ships suppress
        # tokens that must be masked here
        row = np.array(logits[0, -1], np.float32)
        for t in self.suppress + self.begin_suppress:
            row[t] = -np.inf
        return state, cross, len(forced), int(np.argmax(row))

    def transcribe(self, audio: np.ndarray, task: str = "transcribe",
                   language: Optional[str] = None) -> str:
        text = ""
        for text, _done in self.transcribe_stream(audio, task=task,
                                                  language=language):
            pass
        return text

    def transcribe_stream(self, audio: np.ndarray,
                          task: str = "transcribe",
                          language: Optional[str] = None):
        """Streaming transcription: a generator yielding
        ``(text_so_far, done)`` after every decode block.  Greedy decode
        makes every emitted token FINAL (no beam to revise it), so a
        consumer may act on the prefix immediately — the overlapped
        voice-chat path feeds these stable prefixes into the LLM pool's
        streaming-prompt prefill while the tail of the utterance is
        still decoding (reference serial path:
        streaming_server.py:543-583 runs ASR to completion, THEN starts
        the LLM).

        Pipelined dispatch: block N+1 chains on block N's on-device
        last-token slice and is dispatched BEFORE block N's tokens are
        fetched, so each iteration costs max(decode, tunnel RTT) instead
        of their sum (the pool lesson, serve/pool.py::_step_loop)."""
        from llmvox_tpu.models import whisper as W
        import jax.numpy as jnp

        audio = np.asarray(audio, np.float32).reshape(-1)
        ctx = self._pick_ctx(len(audio))
        state, cross, n_forced, first = self._prep_single(
            audio, task, language, ctx_frames=ctx)
        cfg = self.cfg
        eos = cfg.eos_token_id

        def verified(text: str) -> str:
            """Optional full-window re-check of a bucketed transcript
            (the PromptRestart-style degrade): re-transcribe at the full
            30 s window and return that text — identical in the stable
            case, corrected otherwise.  Runs AFTER the partial stream
            already went out, so it costs latency only when it differs
            and the consumer must revise."""
            if ctx is None or not self.ctx_verify:
                return text
            saved, self.ctx_buckets = self.ctx_buckets, ()
            try:
                return self.transcribe(audio, task=task, language=language)
            finally:
                self.ctx_buckets = saved

        if first == eos:
            yield verified(""), True
            return
        out = [first]
        max_new = max(self.max_length - n_forced, 1)
        block = self.decode_block_size
        tok = jnp.asarray([first], jnp.int32)
        dispatched = 1

        def issue(tok, state):
            toks, state = W.decode_block(self.params, tok, state, cross,
                                         cfg, block=block,
                                         suppress=self.suppress)
            return toks, toks[:, -1], state

        pending = None
        if dispatched < max_new:
            pending, tok, state = issue(tok, state)
            dispatched += block
        while pending is not None:
            nxt = None
            if dispatched + block <= max_new:
                nxt, tok, state = issue(tok, state)   # issue-ahead
                dispatched += block
            hit_eos = False
            for t in (int(t) for t in np.asarray(pending[0])):
                if t == eos:
                    hit_eos = True
                    break
                out.append(t)
                if len(out) >= max_new:
                    hit_eos = True   # budget: stop like the eager path
                    break
            text = self.tokenizer.decode(out, skip_special_tokens=True)
            if hit_eos or nxt is None:
                yield verified(text), True
                return
            yield text, False
            pending = nxt
        yield verified(
            self.tokenizer.decode(out, skip_special_tokens=True)), True

    def transcribe_batch(self, audios, task: str = "transcribe",
                         language: Optional[str] = None):
        """Batched transcription: N utterances through ONE encoder /
        cross-KV / block-decode program chain (the TPU throughput path —
        the HF pipeline the reference uses runs utterances one by one).
        Per-row language detection; rows freeze at their own EOS on
        device.  Returns a list of N strings."""
        import jax.numpy as jnp

        from llmvox_tpu.models import whisper as W
        if self.params is None:
            self.load()
        cfg = self.cfg
        n = len(audios)
        batch = np.concatenate([W.pad_or_trim(a, cfg) for a in audios])
        mel = W.log_mel(jnp.asarray(batch), cfg)
        enc = W.encode(self.params, mel, cfg)
        cross = W.make_cross_kv(self.params, enc, cfg)
        dtype = self.params["dec"]["tok_emb"].dtype
        sot = cfg.decoder_start_token_id

        lang_id = self._lang_token(language)
        if lang_id is not None:
            lang_ids = [int(lang_id)] * n
        elif self.lang_to_id:
            st = W.init_whisper_decode_state(cfg, n, dtype)
            logits, _ = W.prefill(
                self.params, jnp.full((n, 1), sot, jnp.int32), st, cross,
                cfg)
            rows = np.asarray(logits[:, 0], np.float32)
            cand = np.fromiter(self.lang_to_id.values(), np.int64)
            lang_ids = [int(cand[np.argmax(r[cand])]) for r in rows]
        else:
            lang_ids = None

        forced = np.full((n, 1), sot, np.int32)
        if lang_ids is not None:
            forced = np.concatenate(
                [forced, np.asarray(lang_ids, np.int32)[:, None]], 1)
        if self.task_to_id:
            tid = int(self.task_to_id.get(
                task, next(iter(self.task_to_id.values()))))
            forced = np.concatenate(
                [forced, np.full((n, 1), tid, np.int32)], 1)
        if self.no_timestamps_id is not None:
            forced = np.concatenate(
                [forced, np.full((n, 1), int(self.no_timestamps_id),
                                 np.int32)], 1)

        state = W.init_whisper_decode_state(cfg, n, dtype)
        logits, state = W.prefill(self.params, jnp.asarray(forced), state,
                                  cross, cfg)
        rows = np.array(logits[:, -1], np.float32)   # copy: view is read-only
        for t in self.suppress + self.begin_suppress:
            rows[:, t] = -np.inf
        first = rows.argmax(-1).astype(np.int32)
        max_new = max(self.max_length - forced.shape[1], 1)
        outs = [[int(t)] for t in first]
        eos = cfg.eos_token_id
        # seed the device-side freeze for rows whose FIRST token is EOS
        state = state._replace(done=jnp.asarray(first == eos))
        tok = jnp.asarray(first)
        produced = 1
        while produced < max_new and not bool(np.asarray(state.done).all()):
            block = min(self.decode_block_size, max_new - produced)
            toks, state = W.decode_block(self.params, tok, state, cross,
                                         cfg, block=block,
                                         suppress=self.suppress)
            host = np.asarray(toks)
            for i in range(n):
                outs[i].extend(int(t) for t in host[i])
            produced += block
            tok = toks[:, -1]
        texts = []
        for row in outs:
            if eos in row:
                row = row[: row.index(eos)]
            texts.append(self.tokenizer.decode(row,
                                               skip_special_tokens=True))
        return texts

    def stream_supported(self, audio: np.ndarray) -> bool:
        """Streaming transcription covers a single model window (30 s);
        longer audio takes the batched multi-window path instead."""
        if self.params is None:
            self.load()
        win = self.cfg.n_audio_frames * self.cfg.hop_length
        return np.asarray(audio).reshape(-1).shape[0] <= win

    async def transcribe_stream_async(self, audio: np.ndarray,
                                      task: str = "transcribe",
                                      language: Optional[str] = None):
        """:meth:`transcribe_stream` bridged onto the event loop: the
        blocking device fetches run on a worker thread, the
        ``(text, done)`` updates flow through an asyncio queue — so the
        voice-chat handler can feed partial transcripts into the LLM
        pool without blocking the server loop."""
        import asyncio
        import threading

        loop = asyncio.get_running_loop()
        q: "asyncio.Queue" = asyncio.Queue()

        def worker():
            try:
                for item in self.transcribe_stream(audio, task=task,
                                                   language=language):
                    loop.call_soon_threadsafe(q.put_nowait, item)
                loop.call_soon_threadsafe(q.put_nowait, None)
            except BaseException as e:   # surface device errors
                loop.call_soon_threadsafe(q.put_nowait, e)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = await q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    # -- request interface (same semantics as WhisperASR) ---------------
    decode_base64_audio = WhisperASR.decode_base64_audio

    def transcribe_file(self, path: str, language: Optional[str] = None,
                        task: str = "transcribe") -> str:
        """Reference ``ASR.transcribe`` on the TPU backend."""
        if self.params is None:
            self.load()
        audio = load_asr_audio(path, int(self.config.asr_sample_rate))
        return self.transcribe(audio, task=task, language=language)

    def run_asr(self, request: Dict) -> str:
        if self.params is None:
            self.load()
        audio = self.decode_base64_audio(request["audio_base64"])
        source = request.get("source_language",
                             self.config.asr_default_language)
        target = request.get("target_language", source)
        task = "translate" if source != target else "transcribe"
        # requests cap at asr_max_audio_length like the reference (60 s
        # default), but transcribe ALL of it in 30 s batched windows
        # instead of silently truncating at the model window
        return self.transcribe_long(
            audio, task=task, language=source,
            max_seconds=float(self.config.asr_max_audio_length)).strip()


def build_asr(config: Optional[ServeConfig] = None):
    """ASR factory: ``asr_backend`` picks the host HF pipeline ("hf",
    the reference-parity default) or the TPU-hosted JAX model ("jax")."""
    config = config or ServeConfig()
    backend = getattr(config, "asr_backend", "hf")
    if backend == "jax":
        return JAXWhisperASR(config)
    return WhisperASR(config)
