"""Serving engine: model ownership + run_tts_request flow.

Mirrors run_tts_request (tts-mio-server.cpp:2153-2453) including output JSON
fields and error strings. The reference's worker-slot pool + llm mutex
(:2713-2777, :3014-3042) is replaced by a counting semaphore for admission
(slot ids preserved for the X-Slot header) — model weights are immutable jax
arrays, so all lanes share one pipeline/engine with no runtime mutex; XLA
serializes device work per chip while the host threads overlap pre/post
processing.
"""

from __future__ import annotations

import os
import sys
import threading
import time
import uuid

import numpy as np

from ..pipeline import MioTTSPipeline
from ..runtime.codes_io import load_codes, save_codes
from .state import ReferenceCache, RequestError, RequestParams, ServerConfig


def now_ms() -> float:
    return time.perf_counter() * 1e3


class SlotPool:
    """Round-robin slot acquisition (tts-mio-server.cpp:3014-3042): slot ids
    for logging/headers + admission control."""

    def __init__(self, n: int):
        self._free = list(range(n))
        self._cv = threading.Condition()

    def acquire(self, timeout: float | None = None) -> int:
        """Blocks for a free slot; with a timeout, raises RequestError 503
        when the pool stays exhausted (overload shedding — the reference
        blocks forever on its slot condvar)."""
        deadline = None if timeout is None else time.perf_counter() + timeout
        with self._cv:
            while not self._free:
                remaining = (None if deadline is None
                             else deadline - time.perf_counter())
                if remaining is not None and remaining <= 0:
                    raise RequestError(
                        "server is overloaded: no free synthesis slot", 503)
                self._cv.wait(remaining)
            return self._free.pop(0)

    def release(self, idx: int) -> None:
        with self._cv:
            self._free.append(idx)
            self._cv.notify()


class ServingEngine:
    def __init__(self, cfg: ServerConfig):
        self.cfg = cfg
        self.pipeline = MioTTSPipeline(cfg.model_vocoder,
                                       wavlm_path=cfg.wavlm_model or None)
        # multi-chip fan-out: a (dp, tp) mesh over --mio-backend-devices.
        # Batch lanes and codec micro-batches shard over dp (the TPU-native
        # form of the reference's slot-over-backends round-robin,
        # tts-mio-server.cpp:2659-2746); --tensor-parallel > 1 additionally
        # shards the LLM megatron-style over tp for models too big per chip
        # (the codec is small and always replicates).
        self.mesh = None
        devices = None
        tp = max(1, cfg.tensor_parallel)
        if cfg.mio_backend_devices:
            from ..parallel.mesh import make_mesh, parse_backend_devices, replicate_tree

            devices = parse_backend_devices(cfg.mio_backend_devices)
        if tp > 1 and devices is None:
            raise ValueError("--tensor-parallel requires --mio-backend-devices")
        if devices is not None and (len(devices) > 1 or tp > 1):
            if len(devices) % tp != 0:
                raise ValueError(
                    f"--tensor-parallel {tp} does not divide the "
                    f"{len(devices)} backend devices")
            self.mesh = make_mesh(devices, tp=tp)
            self.pipeline.weights = replicate_tree(self.mesh, self.pipeline.weights)
        from .codec_batching import CodecMicroBatcher

        # --codec-devices: codec synthesis on its own (dp-only) mesh,
        # disjoint from the LLM devices — prefix re-decodes and full
        # synthesis then run concurrently with LLM chunk steps instead of
        # queueing behind them on the same chips
        self.codec_mesh = self.mesh
        if cfg.codec_devices:
            from ..parallel.mesh import (
                make_mesh, parse_backend_devices, replicate_tree,
            )

            cdevs = parse_backend_devices(cfg.codec_devices)
            if self.mesh is not None:
                llm_devs = set(self.mesh.devices.reshape(-1).tolist())
                overlap = llm_devs & set(cdevs)
                if overlap:
                    print(f"warning: --codec-devices overlaps the LLM mesh "
                          f"on {sorted(d.id for d in overlap)} — overlap "
                          "synthesis will contend there", file=sys.stderr)
            self.codec_mesh = make_mesh(cdevs, tp=1)
            self.pipeline.weights = replicate_tree(self.codec_mesh,
                                                   self.pipeline.weights)
        self.codec_batcher = CodecMicroBatcher(
            self.pipeline, max_batch=max(1, cfg.n_parallel),
            mesh=self.codec_mesh)
        # start the codec foreground warm NOW, overlapped with the LLM
        # GGUF read/staging below — the codec executable cache-loads are
        # relay-bandwidth work while the LLM load's first ~10 s is host
        # I/O, so the two hide each other (warmup() joins this thread).
        # ONE shared executor serves both this early warm and warmup()'s
        # fg phase, so MIOTTS_WARMUP_POOL bounds the TOTAL concurrency
        # through the relay (two independent pools would double it).
        self._codec_fg_thread = None
        self._codec_fg_taken: list = []
        self._codec_fg_error: BaseException | None = None
        self._warm_pool = None
        if cfg.warmup:
            import concurrent.futures

            width = max(1, int(os.environ.get("MIOTTS_WARMUP_POOL", "8")))
            self._warm_pool = concurrent.futures.ThreadPoolExecutor(
                width, thread_name_prefix="warmup-fg")
            self._codec_fg_taken = [
                bk for bk in self._codec_warm_calls() if self._warm_is_fg(bk)]

            def early_codec_warm():
                try:
                    list(self._warm_pool.map(self._do_warm,
                                             self._codec_fg_taken))
                except BaseException as e:  # re-raised at warmup() join
                    self._codec_fg_error = e

            self._codec_fg_thread = threading.Thread(
                target=early_codec_warm, daemon=True, name="warmup-codec-fg")
            self._codec_fg_thread.start()
        try:
            self._init_llm_and_serving_state(cfg)
        except BaseException:
            # don't leave the early codec warm mid-jit on a daemon thread
            # while the constructor unwinds, whatever raised — LLM load,
            # batcher setup, reference preload or a warm failure
            # (interpreter exit with an in-flight PJRT call crashes noisily)
            t, self._codec_fg_thread = self._codec_fg_thread, None
            if t is not None:
                t.join()
            if self._warm_pool is not None:
                self._warm_pool.shutdown(wait=True)
                self._warm_pool = None
            raise

    def _init_llm_and_serving_state(self, cfg: ServerConfig) -> None:
        self.llm = None
        self.batcher = None
        if cfg.model:
            from ..models.llm import LLMEngine
            from .batching import ContinuousBatcher

            self.llm = LLMEngine(cfg.model, quantize=(cfg.llm_quant or None))
            self.batcher = ContinuousBatcher(
                self.llm,
                n_lanes=max(1, cfg.n_parallel),
                max_ctx=cfg.n_ctx + cfg.n_predict + 64,
                # larger chunks amortize per-dispatch latency; SSE token
                # granularity stays sub-second (32 tokens = 1.3 s of audio)
                chunk=32,
                seed=cfg.seed,
                mesh=self.mesh,
            )
        self.ref_cache = ReferenceCache()
        self.slots = SlotPool(max(1, cfg.n_parallel))
        n_ref = cfg.n_parallel_reference_generation or cfg.n_parallel
        self.ref_slots = SlotPool(max(1, n_ref))
        self.inflight = 0
        self.ref_gen_inflight = 0
        self.requests_total = 0
        self.errors_total = 0
        self.codes_total = 0
        self.audio_seconds_total = 0.0
        self.llm_ms_total = 0.0
        self.synth_ms_total = 0.0
        self._counter_lock = threading.Lock()
        self.reference_init_done = True  # jit warms lazily; no separate pool
        self.warmup_bg_done = True  # set False while a warmup tail runs

        if cfg.reference_file_json:
            self._preload_references(cfg.reference_file_json)
        if cfg.warmup:
            self.warmup()

    def _codec_warm_calls(self) -> list:
        """Every (bucket, opts) codec executable a default request can land
        in: a full-length generation emits up to n_predict codes, so the
        ladder must be warm through pick_bucket(n_predict) (default 700 ->
        bucket 768) — a cold larger bucket costs the first long request its
        full compile. Each (bucket, variant) is a distinct executable."""
        from ..pipeline import pick_bucket
        from ..streaming import StreamingSynthesizer

        top = pick_bucket(max(1, self.cfg.n_predict), self.pipeline.buckets)
        warm_buckets = [b for b in self.pipeline.buckets if b <= top]
        if top not in warm_buckets:
            warm_buckets.append(top)
        warm_calls: list[tuple[int, dict]] = []
        for bucket in warm_buckets:
            # full-synthesis requests fetch device-quantized PCM16
            warm_calls.append((bucket, dict(pcm16=True)))
            # the streaming prefix re-decode variant compiles separately
            # (interp_anchor/peak_normalize are static args) and a stream
            # sweeps every bucket up to its final length — warm both its
            # fetch shapes: the pcm16 per-feed window (every feed whose
            # emission fits one window, incl. the TTFA-critical first feed;
            # see StreamingSynthesizer._decode_window) and the f32
            # full-decode fallback (oversized finalize tails)
            warm_calls.append((bucket, dict(
                interp_anchor=StreamingSynthesizer.INTERP_ANCHOR,
                peak_normalize=False, pcm16=True,
                wlen=StreamingSynthesizer.WINDOW_SAMPLES)))
            warm_calls.append((bucket, dict(
                interp_anchor=StreamingSynthesizer.INTERP_ANCHOR,
                peak_normalize=False)))
        return warm_calls

    def _llm_warm_calls(self) -> list:
        """Prompt-bucket prefill executables (single-lane + the pow2
        multi-lane burst ladder). Empty when no LLM is configured."""
        if self.batcher is None:
            return []
        # every prompt bucket a request can reach within the context
        # budget compiles its own prefill executable — warm them in the
        # same pool as the codec buckets (direct llm_prefill_jit calls;
        # token-generating submits would serialize on the chunk loop)
        from .batching import _PROMPT_BUCKETS

        max_prompt = self.batcher.max_ctx - 8
        llm_buckets = ([b for b in _PROMPT_BUCKETS if b <= max_prompt]
                       or [max(8, max_prompt)])
        warm_calls: list[tuple[int, dict | None]] = [
            (b, None) for b in llm_buckets]
        # simultaneous submits coalesce into one multi-lane prefill
        # (pow2 lane ladder, batching._prefill_group); warm the WHOLE
        # pow2 ladder for the small buckets in the background — drain
        # timing makes group sizes nondeterministic, so any un-warmed
        # intermediate size (2, 4, ...) costs the first matching burst
        # a cold compile through the relay (measured: conc=8 TTFA p50
        # 4.7 s on the first round vs 358 ms steady)
        burst = 1 << max(0, self.batcher.n_lanes - 1).bit_length()
        lanes_ladder = []
        g = 2
        while g <= burst:
            lanes_ladder.append(g)
            g *= 2
        warm_calls += [(b, {"prefill_lanes": g})
                       for b in llm_buckets if b <= 128
                       for g in lanes_ladder]
        # chunk-step executables: width-sliced steps run bursts below full
        # occupancy at pow2-width prices (batching._pick_width). Foreground:
        # width 1 (the conc=1 path) and the full width (the always-warmed
        # fallback while the tail loads); intermediate widths warm in the
        # background, burst-critical-first like the prefill groups.
        if self.batcher.slice_chunks:
            widths = [1]
            g = 2
            while g < self.batcher.n_lanes:
                widths.append(g)
                g *= 2
            widths.append(self.batcher.n_lanes)  # full-width fallback
            # ONE chunk executable per width: dispatch sizes are runtime
            # operands (step_cap) of the chunk_max-sized program, so the
            # old (ladder x width) grid collapses to the width axis
            warm_calls += [(self.batcher.chunk_max, {"chunk_width": wd})
                           for wd in widths]
        # (on a dp mesh slicing is off and the warmup submit warms the
        # full-width ladder against the real sharded state, as before)
        return warm_calls

    def _do_warm(self, bk) -> None:
        bucket, kw = bk
        if kw is None:
            self.batcher.warm_prefill(bucket)
        elif "prefill_lanes" in kw:
            self.batcher.warm_prefill(bucket, n_lanes=kw["prefill_lanes"])
        elif "chunk_width" in kw:
            self.batcher.warm_chunk(bucket, width=kw["chunk_width"])
        else:
            self.codec_batcher.warm(bucket, **kw)

    def _warm_is_fg(self, bk) -> bool:
        bucket, kw = bk
        if kw is None:
            return bucket <= 128  # interactive B=1 prompt prefills
        if "prefill_lanes" in kw:
            return False  # burst variants only matter under load
        if "chunk_width" in kw:
            # width 1 is the conc=1 decode path; the full width is the
            # always-available fallback while intermediate widths load
            return kw["chunk_width"] in (1, self.batcher.n_lanes)
        if "interp_anchor" in kw and "wlen" not in kw:
            # the f32 full-decode fallback only serves oversized streaming
            # finalize tails — rare enough that the first one may pay a
            # cache load; dropping it from the fg set cuts ~1/3 of the
            # listening-path executable bytes
            return False
        return bucket <= int(os.environ.get("MIOTTS_WARMUP_FG_BUCKET", "256"))

    def warmup(self) -> None:
        """Compile the serving-critical executables before the first request
        (TPU addition — with the persistent compilation cache this is a
        one-time cost per deployment; warm restarts replay from cache).

        Covers the codec buckets and LLM prompt buckets typical requests
        land in, not just the smallest — a cold larger bucket otherwise
        costs the first matching request its full compile.

        Even cache-warm, loading every executable through a slow device
        relay takes minutes, so the warm is SPLIT: the buckets short/typical
        requests hit (codec <= MIOTTS_WARMUP_FG_BUCKET, default 256, plus
        the small prompt buckets and the chunk/attach executables) compile
        in the foreground — the server listens after them — and the long
        tail (768-bucket codec variants, big prompt buckets) continues on a
        background thread. A long first request that races the tail merely
        waits on its compile like it would have cold.
        MIOTTS_WARMUP_BG=0 restores the all-foreground behavior."""
        import concurrent.futures

        t0 = time.perf_counter()
        warm_calls = self._codec_warm_calls() + self._llm_warm_calls()
        do_warm = self._do_warm
        is_fg = self._warm_is_fg
        bg_enabled = os.environ.get("MIOTTS_WARMUP_BG", "1") not in ("0", "off")

        fg_calls = [bk for bk in warm_calls if is_fg(bk)]
        bg_calls = [bk for bk in warm_calls if bk not in fg_calls]
        if not bg_enabled:
            fg_calls, bg_calls = warm_calls, []
        # the codec fg set may already be warming on the early thread
        # started in __init__ (overlapped with the LLM load) — don't
        # double-issue those calls here, just join the thread below
        if self._codec_fg_thread is not None:
            fg_calls = [bk for bk in fg_calls
                        if bk not in self._codec_fg_taken]
        # burst-critical first: the multi-lane prefill-group executables
        # are tiny but a conc>1 burst right after listening needs them —
        # warming them at the tail's END left a minutes-long window where
        # the first burst paid their loads (measured: TTFA p50 808 ms vs
        # 358 steady). Big codec buckets go last.
        def bg_order(bk):
            bucket, kw = bk
            if kw is not None and "chunk_width" in kw:
                # tiny executables a sub-full-occupancy burst needs NOW
                return (0, kw["chunk_width"], bucket)
            if kw is not None and "prefill_lanes" in kw:
                return (1, bucket, kw["prefill_lanes"])
            if kw is None:
                return (2, bucket, 0)
            return (3, bucket, 0)

        bg_calls.sort(key=bg_order)

        # share the __init__ executor when the early codec warm is running
        # so MIOTTS_WARMUP_POOL caps the TOTAL relay concurrency
        if self._warm_pool is not None:
            list(self._warm_pool.map(do_warm, fg_calls))
        else:
            width = max(1, int(os.environ.get("MIOTTS_WARMUP_POOL", "8")))
            with concurrent.futures.ThreadPoolExecutor(width) as ex:
                list(ex.map(do_warm, fg_calls))
        if self._codec_fg_thread is not None:
            self._codec_fg_thread.join()
            self._codec_fg_thread = None
            if self._codec_fg_error is not None:
                raise self._codec_fg_error
        if self._warm_pool is not None:
            self._warm_pool.shutdown(wait=True)
            self._warm_pool = None
        if self.batcher is not None:
            from ..models.llm import SamplerParams

            # one real submit warms the attach + chunk-step + fetch
            # executables (shared across buckets). Dispatch sizes are
            # runtime operands of the single chunk_max-sized executable,
            # so the budget only needs to reach past the fused prefill
            # into one real chunk dispatch — not walk a ladder.
            b = self.batcher
            handle = b.submit(
                "warmup", sampler=SamplerParams(),
                n_predict=b.first_chunk + 4)
            for _ in handle.tokens():
                pass
        self.warmup_bg_done = not bg_calls
        if not bg_calls and self.batcher is not None:
            self.batcher.release_warm_state()
        if bg_calls:
            def do_warm_logged(bk):
                # per-executable progress + failure isolation: one bad or
                # hung warm call must be visible in the log (a silent bg
                # tail once wedged with no way to tell which executable)
                # and must not abort the rest of the tail
                tw = time.perf_counter()
                try:
                    do_warm(bk)
                    print(f"warmup: bg {bk} in "
                          f"{time.perf_counter() - tw:.1f}s", file=sys.stderr)
                except Exception as e:
                    print(f"warmup: bg {bk} FAILED after "
                          f"{time.perf_counter() - tw:.1f}s: {e!r}",
                          file=sys.stderr)

            # background tail defaults to width 1: it is off the listening
            # path (time does not matter) and the tail carries the BIG
            # multi-lane prefill compiles — issuing several concurrently
            # through a remote-compile relay is the risky pattern (one
            # wedged relay took every device call down with it)
            width_bg = int(os.environ.get("MIOTTS_WARMUP_BG_POOL", "1"))

            # the chunk-width warms (sorted first by bg_order) are the
            # only users of the batcher's throwaway warm GenState — a
            # full KV cache on device. Release it the moment they finish
            # instead of holding dead HBM through the minutes-long
            # prefill/codec remainder while live traffic serves.
            chunk_calls = [bk for bk in bg_calls
                           if bk[1] is not None and "chunk_width" in bk[1]]
            rest_calls = [bk for bk in bg_calls
                          if not (bk[1] is not None and "chunk_width" in bk[1])]

            def bg_warm():
                tb = time.perf_counter()
                try:
                    with concurrent.futures.ThreadPoolExecutor(
                            max(1, width_bg)) as ex:
                        list(ex.map(do_warm_logged, chunk_calls))
                        if self.batcher is not None:
                            self.batcher.release_warm_state()
                        list(ex.map(do_warm_logged, rest_calls))
                finally:
                    if self.batcher is not None:
                        self.batcher.split_cold_until_warm = False
                        self.batcher.release_warm_state()
                    self.warmup_bg_done = True
                print(f"warmup: background tail ({len(bg_calls)} "
                      f"executables) done in {time.perf_counter() - tb:.1f}s",
                      file=sys.stderr)

            if self.batcher is not None:
                # bursts that race the tail split into warmed prefill-group
                # sizes instead of compiling cold mid-request
                self.batcher.split_cold_until_warm = True

            self._warmup_bg_thread = threading.Thread(
                target=bg_warm, daemon=True, name="warmup-bg")
            self._warmup_bg_thread.start()
        codec_buckets = sorted({b for b, kw in warm_calls
                                if kw is not None and "prefill_lanes" not in kw})
        print(f"warmup: {len(fg_calls) + len(self._codec_fg_taken)} "
              f"foreground executables in {time.perf_counter() - t0:.1f}s; "
              f"{len(bg_calls)} warming in background "
              f"(codec buckets {codec_buckets})", file=sys.stderr)

    # -- counters ---------------------------------------------------------------

    def _count(self, attr: str, delta) -> None:
        with self._counter_lock:
            setattr(self, attr, getattr(self, attr) + delta)

    def record_request(self, out: dict, error: bool = False) -> None:
        """Accumulate served-request totals for /metrics."""
        with self._counter_lock:
            self.requests_total += 1
            if error:
                self.errors_total += 1
            self.codes_total += int(out.get("codes", 0) or 0)
            self.audio_seconds_total += float(out.get("duration_sec", 0.0) or 0.0)
            self.llm_ms_total += float(out.get("llm_ms", 0.0) or 0.0)
            self.synth_ms_total += float(out.get("synth_ms", 0.0) or 0.0)

    def metrics_text(self) -> str:
        """Prometheus text exposition of the serving counters (capability the
        reference lacks; its only observability is stderr log lines)."""
        gauges = [
            ("miotts_inflight", self.inflight, "requests currently running"),
            ("miotts_reference_generation_inflight", self.ref_gen_inflight,
             "reference generations currently running"),
            ("miotts_reference_cache_size", len(self.ref_cache),
             "cached speaker references"),
            ("miotts_slots", self.cfg.n_parallel, "configured worker slots"),
        ]
        counters = [
            ("miotts_requests_total", self.requests_total, "served requests"),
            ("miotts_errors_total", self.errors_total, "failed requests"),
            ("miotts_codes_total", self.codes_total, "audio codes generated"),
            ("miotts_audio_seconds_total", self.audio_seconds_total,
             "seconds of audio synthesized"),
            ("miotts_llm_ms_total", self.llm_ms_total,
             "milliseconds spent in LLM generation"),
            ("miotts_synth_ms_total", self.synth_ms_total,
             "milliseconds spent in codec synthesis"),
        ]
        if self.batcher is not None:
            counters.append(
                ("miotts_device_stall_events_total",
                 self.batcher.stall_events,
                 "chunk fetches slower than MIOTTS_STALL_EVENT_S "
                 "(intermittent device-link pauses)"))
            gauges.append(
                ("miotts_longest_chunk_fetch_seconds",
                 round(self.batcher.longest_fetch_s, 3),
                 "slowest chunk fetch observed since start"))
        lines = []
        for name, val, help_ in gauges:
            lines += [f"# HELP {name} {help_}", f"# TYPE {name} gauge",
                      f"{name} {val}"]
        for name, val, help_ in counters:
            lines += [f"# HELP {name} {help_}", f"# TYPE {name} counter",
                      f"{name} {val}"]
        return "\n".join(lines) + "\n"

    # -- reference preload (tts-mio-server.cpp:2608-2629) ------------------------

    def _preload_references(self, spec: str) -> None:
        import json as _json

        data = _json.loads(spec)
        entries = data if isinstance(data, list) else [data]
        for e in entries:
            key = e.get("key") or e.get("reference_key")
            path = e.get("path") or e.get("file")
            if not key or not path:
                continue
            emb = self.pipeline.load_embedding(path)
            self.ref_cache.put(key, emb)

    # -- codes acquisition --------------------------------------------------------

    def _generate_codes(self, rp: RequestParams, out: dict,
                        on_token=None, marks: dict | None = None) -> list[int]:
        t0 = now_ms()
        if self.cfg.llm_api_enabled:
            from ..runtime.llm_api import generate_audio_codes_external_cfg

            codes = generate_audio_codes_external_cfg(self.cfg, rp)
            if not codes:
                raise RequestError("token generation failed: external LLM API returned empty codes")
        else:
            if self.llm is None:
                raise RequestError("text generation requested but LLM model is not loaded")
            from ..models.llm import SamplerParams

            sampler = SamplerParams(temp=rp.temp, top_k=rp.top_k, top_p=rp.top_p,
                                    repeat_penalty=rp.repeat_penalty, seed=rp.seed)
            # continuous batching: attach to a lane; tokens stream back as
            # the shared chunk loop advances all active requests together
            try:
                handle = self.batcher.submit(
                    rp.text, sampler=sampler, n_predict=rp.n_predict,
                    # only incremental consumers (SSE token stream,
                    # stream_audio, overlap synthesis) need the small
                    # TTFA-first chunk; binary requests start at the steady
                    # chunk so arrival churn can't pin the whole cohort's
                    # dispatch at first_chunk (each boundary pays a device
                    # fetch round trip)
                    early_tokens=on_token is not None)
                if marks is not None:
                    marks.setdefault("submit_done", now_ms())
            except ValueError as e:
                if "prompt is too long" in str(e):
                    # prompt exceeds the batcher's fixed KV budget: fall back
                    # to a dedicated per-request generation that sizes its
                    # context like the reference (max(n_ctx, T+n_predict+32),
                    # tts-mio-cli.cpp:1018) instead of erroring — oversized
                    # prompts are rare enough that a serialized one-off beats
                    # reserving worst-case lanes for everyone
                    return self._generate_codes_oversized(rp, out, sampler,
                                                          on_token, t0)
                raise RequestError(str(e))
            eog_set = set(int(t) for t in np.asarray(self.llm.eog_ids))
            tokens: list[int] = []
            try:
                for tok in handle.tokens():
                    tokens.append(tok)
                    if on_token is not None:
                        if not on_token(tok, len(tokens) - 1, tok in eog_set):
                            handle.cancel()
                            break
            except BaseException:
                # an exception from on_token (codec failure, client gone)
                # must free the lane — otherwise it keeps generating into an
                # unread queue, burning shared chunk-loop steps
                handle.cancel()
                raise
            out["n_tokens"] = len(tokens)
            codes = self.llm.tokens_to_codes(tokens)
            if not codes:
                raise RequestError("no Mio audio codes were found in token sequence")
        out["llm_ms"] = now_ms() - t0
        return codes

    def _generate_codes_oversized(self, rp: RequestParams, out: dict,
                                  sampler, on_token, t0: float) -> list[int]:
        """Dedicated generation for prompts beyond the batcher's KV budget
        (see _generate_codes); same token-callback contract."""
        eog_set = set(int(t) for t in np.asarray(self.llm.eog_ids))
        tokens: list[int] = []

        def cb(tok, index, is_eog):
            tokens.append(int(tok))
            if on_token is not None:
                return on_token(int(tok), index, int(tok) in eog_set)
            return True

        self.llm.generate_audio_tokens_streaming(
            rp.text, cb, n_predict=rp.n_predict, n_ctx=rp.n_ctx,
            sampler=sampler)
        out["n_tokens"] = len(tokens)
        codes = self.llm.tokens_to_codes(tokens)
        if not codes:
            raise RequestError("no Mio audio codes were found in token sequence")
        out["llm_ms"] = now_ms() - t0
        return codes

    # -- embedding resolution (tts-mio-server.cpp:2258-2324 order) ----------------

    def _resolve_embedding(self, rp: RequestParams) -> np.ndarray | None:
        if rp.embedding_in:
            try:
                return self.pipeline.load_embedding(rp.embedding_in)
            except Exception as e:
                raise RequestError(f"mio_tts_embedding_load_gguf failed: {e}")
        if rp.reference_key:
            embedding = self.ref_cache.get(rp.reference_key)
            if embedding is None or embedding.size == 0:
                raise RequestError(f"reference_key not found: {rp.reference_key}")
            return embedding
        if rp.reference_audio:
            raise RequestError("reference_audio is not supported in synthesis requests. "
                               "use /mio/generate_reference then reference_key")
        default_emb = rp.embedding_default_in or self.cfg.embedding_default_in
        if default_emb and self.pipeline.is_dynamic_global:
            try:
                return self.pipeline.load_embedding(default_emb)
            except Exception as e:
                raise RequestError(f"mio_tts_embedding_load_gguf (default) failed: {e}")
        return None

    # -- streaming request flow (BASELINE config 4; no reference counterpart) -----

    def run_streaming_request(self, rp: RequestParams, out: dict,
                              on_token=None, on_audio=None,
                              on_codes=None,
                              embedding: np.ndarray | None = None,
                              t_begin: float | None = None,
                              ) -> tuple[np.ndarray, int]:
        """Incremental synthesis: token generation (continuous-batcher lane)
        interleaved with prefix re-decodes, so PCM leaves the server while
        the LLM is still generating. ``on_audio(pcm: np.ndarray)`` fires per
        stabilized chunk; ``on_token`` as in ``_generate_codes``;
        ``on_codes(codes)`` fires once when code acquisition completes (the
        SSE handler emits generation_complete there). Returns (full audio
        f32, sample_rate); also fills ``out`` like ``run_tts_request`` does
        for synthesis.
        """
        from ..streaming import StreamingSynthesizer

        if embedding is None:
            embedding = self._resolve_embedding(rp)
        ss = StreamingSynthesizer(
            self.pipeline, embedding,
            synth_fn=self.codec_batcher.synthesize,
            transfer_pcm16=True)
        pieces: list[np.ndarray] = []
        pending: list[int] = []
        t_synth = 0.0
        # MIOTTS_TTFA_DEBUG=1: stderr breakdown of the first-audio critical
        # path (request start -> first token batch -> first feed ->
        # first PCM) — the serve-level TTFA decomposition
        marks = None
        if os.environ.get("MIOTTS_TTFA_DEBUG"):
            # "start" = HTTP request arrival when the handler passes its
            # t_begin — so the printed deltas cover the full served path
            marks = {"start": t_begin if t_begin is not None else now_ms(),
                     "engine_enter": now_ms()}

        def emit_pending():
            nonlocal t_synth
            if not pending:
                return
            if marks is not None:
                marks.setdefault("first_feed_start", now_ms())
            t0 = now_ms()
            pcm = ss.feed(pending)
            t_synth += now_ms() - t0
            pending.clear()
            if pcm.size:
                if marks is not None:
                    marks.setdefault("first_pcm", now_ms())
                pieces.append(pcm)
                if on_audio is not None:
                    on_audio(pcm)
                    if marks is not None:
                        marks.setdefault("first_write_done", now_ms())

        token_chunk = 16
        # first audio as early as the lookahead window allows (TTFA), then
        # steady-state chunks of token_chunk codes
        first_feed = ss.lookahead + 4

        def tok_cb(tok, index, is_eog):
            cont = True
            if marks is not None:
                marks.setdefault("first_token", now_ms())
            if on_token is not None:
                cont = on_token(tok, index, is_eog)
            code = self.llm.token_to_code_or_none(tok) if self.llm else None
            if code is not None:
                pending.append(code)
            if len(pending) >= token_chunk or (
                    ss.emitted == 0
                    and len(ss.codes) + len(pending) >= first_feed):
                emit_pending()
            return cont

        # codes either stream through tok_cb (local LLM) or arrive whole
        # (inline/codes_in/external API) — then the chunked feed below still
        # emits PCM ahead of the final full decode
        if rp.inline_codes:
            codes = list(rp.inline_codes)
            out["codes"] = len(codes)
        elif rp.codes_in:
            try:
                codes = load_codes(rp.codes_in)
            except (OSError, ValueError) as e:
                raise RequestError(f"mio_tts_codes_load failed: {e}")
            out["codes"] = len(codes)
        elif rp.text:
            codes = self._generate_codes(rp, out, on_token=tok_cb, marks=marks)
            out["codes"] = len(codes)
        else:
            raise RequestError("either text/prompt, codes, or codes_in is required")

        if on_codes is not None:
            on_codes(codes)
        if rp.codes_out:
            # same artifact contract as the non-streaming path
            try:
                save_codes(rp.codes_out, codes)
            except (OSError, ValueError) as e:
                raise RequestError(f"mio_tts_codes_save failed: {e}")
        if not ss.codes and not pending:
            # non-streamed code source: feed in chunks for incremental output
            for off in range(0, len(codes), token_chunk):
                pending.extend(codes[off:off + token_chunk])
                emit_pending()
        else:
            emit_pending()
        t0 = now_ms()
        tail = ss.finalize()
        t_synth += now_ms() - t0
        if tail.size:
            pieces.append(tail)
            if on_audio is not None:
                on_audio(tail)

        if marks is not None and "first_pcm" in marks:
            t0m = marks["start"]
            print("ttfa_debug: "
                  + " ".join(f"{k}={marks[k] - t0m:.1f}ms"
                             for k in ("engine_enter", "submit_done",
                                       "first_token", "first_feed_start",
                                       "first_pcm", "first_write_done")
                             if k in marks)
                  + f" abs_start={t0m:.1f}",
                  file=sys.stderr)
        audio = (np.concatenate(pieces) if pieces
                 else np.zeros(0, np.float32))
        sr = self.pipeline.sample_rate
        out["synth_ms"] = t_synth
        out["ok"] = True
        out["mode"] = "streaming_synthesis"
        out["sample_rate"] = sr
        out["n_audio"] = int(audio.size)
        out["duration_sec"] = audio.size / sr
        out["embedding_dim"] = int(embedding.size) if embedding is not None else 0
        out["reference_key"] = rp.reference_key
        out["key"] = rp.reference_key
        return audio, sr

    def _run_overlapped(self, rp: RequestParams, out: dict,
                        on_token=None) -> tuple[np.ndarray, int]:
        """Non-streaming response, streaming-interleaved synthesis: codec
        prefix re-decodes run while the LLM lane is still generating, so the
        full WAV is ready ~one lookahead window after the last token (the
        serial path pays full decode + PCM fetch after generation ends).
        Audio is the crossfaded incremental emission; the reference's final
        peak normalization (mio-tts-lib.cpp:1299-1310) is applied on the
        concatenated result, which the per-chunk path must skip (the global
        peak is unknown mid-stream)."""
        # the embedding must resolve before generation (the interleaved
        # decodes need it) — a bad reference therefore fails fast here,
        # before burning LLM steps, unlike the serial path which generates
        # first; the error payload is identical either way
        embedding = self._resolve_embedding(rp)
        if rp.embedding_out and (embedding is None or embedding.size == 0):
            raise RequestError(
                "--embedding_out requested but no embedding available")
        audio, sr = self.run_streaming_request(rp, out, on_token=on_token,
                                               embedding=embedding)
        if rp.embedding_out:
            # written only after generation + synthesis succeed, matching
            # the serial path's side-effect ordering
            self.pipeline.save_embedding(rp.embedding_out, embedding)
        peak = float(np.max(np.abs(audio))) if audio.size else 0.0
        if peak > 0.98:
            audio = audio * np.float32(0.95 / peak)
        out["mode"] = "synthesis_overlap"
        out["codes_out"] = rp.codes_out
        out["embedding_out"] = rp.embedding_out
        return audio, sr

    # -- main request flow (run_tts_request parity) -------------------------------

    def run_tts_request(self, rp: RequestParams, out: dict,
                        on_token=None) -> tuple[np.ndarray, int] | None:
        """Fills ``out`` with the reference's JSON fields. Returns
        (audio f32, sample_rate) for synthesis requests, None for
        codes/embedding-only."""
        if (rp.overlap_synthesis and rp.text and not rp.inline_codes
                and not rp.codes_in and not rp.codes_only
                and not rp.embedding_only and not self.cfg.llm_api_enabled
                and self.llm is not None):
            return self._run_overlapped(rp, out, on_token=on_token)
        need_codes = (not rp.embedding_only) or rp.codes_only or bool(rp.codes_out)

        codes: list[int] | None = None
        if need_codes:
            if rp.inline_codes:
                codes = list(rp.inline_codes)
            elif rp.codes_in:
                try:
                    codes = load_codes(rp.codes_in)
                except (OSError, ValueError) as e:
                    raise RequestError(f"mio_tts_codes_load failed: {e}")
            elif rp.text:
                codes = self._generate_codes(rp, out, on_token=on_token)
                if not codes:
                    raise RequestError("token generation produced no audio codes")
            else:
                raise RequestError("either text/prompt, codes, or codes_in is required")

        if rp.codes_out:
            if not codes:
                raise RequestError("--codes_out requested but no codes available")
            try:
                save_codes(rp.codes_out, codes)
            except (OSError, ValueError) as e:
                raise RequestError(f"mio_tts_codes_save failed: {e}")

        embedding = self._resolve_embedding(rp)

        if rp.embedding_out:
            if embedding is None or embedding.size == 0:
                raise RequestError("--embedding_out requested but no embedding available")
            self.pipeline.save_embedding(rp.embedding_out, embedding)

        out["codes"] = len(codes) if codes else 0
        out["embedding_dim"] = int(embedding.size) if embedding is not None else 0
        out["codes_out"] = rp.codes_out
        out["embedding_out"] = rp.embedding_out
        out["reference_key"] = rp.reference_key
        out["key"] = rp.reference_key

        if rp.codes_only or rp.embedding_only:
            if rp.codes_only and codes:
                out["codes_values"] = codes
            out["ok"] = True
            out["mode"] = ("codes+embedding-only" if rp.codes_only and rp.embedding_only
                           else "codes-only" if rp.codes_only else "embedding-only")
            return None

        if not codes:
            raise RequestError("synthesis requires codes")

        t0 = now_ms()
        try:
            # micro-batched: concurrent requests share one device call.
            # pcm16: the result is served as WAV16/PCM16 bytes either way,
            # so quantize on device and fetch half the bytes
            result = self.codec_batcher.synthesize(codes, embedding, pcm16=True)
        except ValueError as e:
            raise RequestError(f"mio_tts_synthesize failed: {e}")
        out["synth_ms"] = now_ms() - t0
        out["ok"] = True
        out["mode"] = "synthesis"
        out["sample_rate"] = result.sample_rate
        out["n_audio"] = int(result.audio.size)
        out["duration_sec"] = result.audio.size / result.sample_rate
        return result.audio, result.sample_rate

    def run_tts_request_to_file(self, rp: RequestParams, out: dict) -> None:
        """Non-stream /mio/tts: writes a wav under output_dir like the
        reference (tts-mio-server.cpp:2420-2447)."""
        res = self.run_tts_request(rp, out)
        if res is None:
            return
        audio, sr = res
        from ..runtime.audio_io import save_wav16

        output_file = rp.output_file or os.path.join(
            self.cfg.output_dir, f"mio-tts-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.wav")
        parent = os.path.dirname(output_file)
        if parent:
            os.makedirs(parent, exist_ok=True)
        save_wav16(output_file, audio, sr)
        out["output_file"] = output_file

    # -- reference generation (voice cloning) ---------------------------------------

    def generate_reference(self, audio_path: str, key: str,
                           max_reference_seconds: float) -> np.ndarray:
        emb = self.pipeline.reference_to_embedding(audio_path, max_reference_seconds)
        self.ref_cache.put(key, emb)
        if self.cfg.reference_added_output_dir:
            os.makedirs(self.cfg.reference_added_output_dir, exist_ok=True)
            self.pipeline.save_embedding(
                os.path.join(self.cfg.reference_added_output_dir, f"{key}.emb.gguf"), emb)
        return emb
