"""Streaming synthesis: incremental codes -> audio with bounded lookahead.

The codec transformers use window-65 *local* attention (SURVEY §5), so a
frame's value stabilizes once enough future tokens are present. Exact
stability needs the full receptive field (~hundreds of tokens — seconds of
latency), so we re-decode growing prefixes (cheap: the whole decode is a few
ms on TPU) and emit samples more than ``lookahead_tokens`` behind the prefix
end; a short raised-cosine crossfade at each emission boundary masks the
residual sub-1e-3 boundary drift. This replaces the mobile/WASM motivation
for streaming (BASELINE.json config 4) with a TPU-native design: the jit
bucket ladder means prefix re-decodes reuse compiled executables.
"""

from __future__ import annotations

import numpy as np

from .pipeline import MioTTSPipeline


class StreamingSynthesizer:
    """Feed codes incrementally; receive stable PCM increments.

    Usage:
        ss = StreamingSynthesizer(pipeline, embedding)
        for chunk in code_chunks:
            pcm = ss.feed(chunk)      # f32 samples newly finalized
        pcm = ss.finalize()           # remaining samples
    """

    # fixed fetch-window length (static shape -> one executable per bucket):
    # must cover one feed's emission (token_chunk * spt) plus the crossfade
    # margin the NEXT boundary reads back
    WINDOW_SAMPLES = 32768

    def __init__(
        self,
        pipeline: MioTTSPipeline,
        embedding: np.ndarray | None,
        lookahead_tokens: int = 8,
        crossfade_samples: int = 128,
        min_decode_tokens: int = 4,
        synth_fn=None,
        window_samples: int | None = None,
        transfer_pcm16: bool = False,
    ):
        self.pipeline = pipeline
        self.embedding = embedding
        self.lookahead = max(0, lookahead_tokens)
        self.crossfade = max(0, crossfade_samples)
        self.min_decode = max(1, min_decode_tokens)
        self.window = window_samples or self.WINDOW_SAMPLES
        # pcm16 window transfers: halve the fetched bytes when the output
        # is served as WAV16/PCM16 anyway (the CodecMicroBatcher dequantizes
        # host-side, so emissions stay f32; requires a synth_fn that accepts
        # the pcm16 kwarg — pipeline.synthesize does not)
        self.transfer_pcm16 = bool(transfer_pcm16)
        self.codes: list[int] = []
        self.emitted = 0  # samples already returned
        self._prev_win: np.ndarray | None = None
        self._prev_start = 0
        self.sample_rate = pipeline.sample_rate
        # pluggable decode (pipeline.synthesize signature): the server passes
        # its CodecMicroBatcher so concurrent streams share device calls
        self._synth = synth_fn or pipeline.synthesize
        # first-feed priority: if the synth_fn is a micro-batcher that
        # accepts ``priority``, the TTFA-critical first window decode jumps
        # ahead of other streams' steady feeds (pipeline.synthesize does
        # not take the kwarg — detect instead of branching on type)
        try:
            import inspect

            self._synth_priority = (
                "priority" in inspect.signature(self._synth).parameters)
        except (TypeError, ValueError):
            self._synth_priority = False

    INTERP_ANCHOR = 1024  # fixed resample ratio across prefix re-decodes

    def _decode_window(self, start: int, need: int) -> tuple[np.ndarray, int]:
        """Decode the current prefix; return (win, n_total) where ``win``
        covers [start, start + len(win)) of the decode and ``n_total`` is its
        total valid sample count. Fetches only a fixed window — the emission
        is a tiny slice of the decode, and the device link is slow — unless
        the caller needs more than one window (then fetch the full tail).
        Small prefixes use the window executable too: the micro-batcher pads
        idle lanes, so a "full" fetch moves max_batch x bucket bytes while
        the window path slices both the lanes and the samples."""
        if need + self.crossfade > self.window:
            kw = ({"priority": True}
                  if self._synth_priority and self.emitted == 0 else {})
            result = self._synth(self.codes, self.embedding,
                                 interp_anchor=self.INTERP_ANCHOR,
                                 peak_normalize=False, **kw)
            total = int(result.audio.size)
            return np.asarray(result.audio[start:], np.float32), total
        kw = {"pcm16": True} if self.transfer_pcm16 else {}
        if self._synth_priority and self.emitted == 0:
            kw["priority"] = True  # first feed = the request's TTFA path
        result = self._synth(self.codes, self.embedding,
                             interp_anchor=self.INTERP_ANCHOR,
                             peak_normalize=False,
                             window=(start, self.window), **kw)
        total = result.n_total if result.n_total is not None else int(
            start + result.audio.size)
        return np.asarray(result.audio, np.float32), int(total)

    def _emit(self, win: np.ndarray, start: int, n_total: int,
              upto: int) -> np.ndarray:
        """Emit [self.emitted, upto) from ``win`` (which covers the decode
        from ``start``), crossfading against the previous window around the
        boundary."""
        upto = min(upto, n_total, start + win.size)
        if upto <= self.emitted:
            self._prev_win, self._prev_start = win, start
            return np.zeros(0, np.float32)
        out = win[self.emitted - start: upto - start].copy()
        if (self._prev_win is not None and self.crossfade > 0
                and self.emitted > 0):
            off = self.emitted - self._prev_start
            n = min(self.crossfade, out.size,
                    max(0, self._prev_win.size - off))
            if n > 0 and off >= 0:
                t = np.arange(n, dtype=np.float32) / n
                fade = 0.5 - 0.5 * np.cos(np.pi * t)  # 0 -> 1
                prev = self._prev_win[off:off + n]
                out[:n] = prev * (1.0 - fade) + out[:n] * fade
        self.emitted = upto
        self._prev_win, self._prev_start = win, start
        return out

    def feed(self, new_codes: list[int]) -> np.ndarray:
        """Append codes; return newly stabilized samples (may be empty)."""
        self.codes.extend(int(c) for c in new_codes)
        n = len(self.codes)
        stable_tokens = n - self.lookahead
        if n < self.min_decode or stable_tokens <= 0:
            return np.zeros(0, np.float32)
        spt = self.pipeline.samples_per_token
        stable_samples = stable_tokens * spt
        if stable_samples <= self.emitted:
            return np.zeros(0, np.float32)
        start = self.emitted
        win, n_total = self._decode_window(start, stable_samples - start)
        return self._emit(win, start, n_total, stable_samples)

    def finalize(self) -> np.ndarray:
        """Flush: decode the full sequence and emit everything left."""
        if not self.codes:
            return np.zeros(0, np.float32)
        spt = self.pipeline.samples_per_token
        start = self.emitted
        need = max(0, len(self.codes) * spt - start)
        win, n_total = self._decode_window(start, need)
        return self._emit(win, start, n_total, n_total)


def stream_text_to_audio(
    pipeline: MioTTSPipeline,
    llm_engine,
    text: str,
    embedding: np.ndarray | None,
    n_predict: int = 700,
    n_ctx: int = 700,
    sampler=None,
    token_chunk: int = 16,
    lookahead_tokens: int = 8,
    on_audio=None,
    on_token=None,
):
    """Full streaming pipeline: chunked LLM generation interleaved with
    incremental synthesis. Calls on_audio(np.ndarray) per stable PCM chunk
    and on_token(tok, i, eog) per token. Returns (audio, n_codes)."""
    ss = StreamingSynthesizer(pipeline, embedding, lookahead_tokens=lookahead_tokens)
    pieces: list[np.ndarray] = []
    pending: list[int] = []

    def handle(tok, index, is_eog):
        if on_token is not None and not on_token(tok, index, is_eog):
            return False
        code = llm_engine.token_to_code_or_none(tok)
        if code is not None:
            pending.append(code)
        if len(pending) >= token_chunk:
            pcm = ss.feed(pending)
            pending.clear()
            if pcm.size and on_audio is not None:
                on_audio(pcm)
            if pcm.size:
                pieces.append(pcm)
        return True

    llm_engine.generate_audio_tokens_streaming(
        text, handle, n_predict=n_predict, n_ctx=n_ctx, sampler=sampler,
        chunk=token_chunk)
    if pending:
        pcm = ss.feed(pending)
        pending.clear()
        if pcm.size:
            pieces.append(pcm)
            if on_audio is not None:
                on_audio(pcm)
    tail = ss.finalize()
    if tail.size:
        pieces.append(tail)
        if on_audio is not None:
            on_audio(tail)
    audio = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
    return audio, len(ss.codes)
