"""Continuous-batching LLM worker.

The TPU-native replacement for the reference's shared-llama-context mutex
(tts-mio-server.cpp:2752-2774, llm_gen_mutex): instead of serializing
requests on one context, a background worker owns a fixed set of batch
lanes over one batched KV cache. Requests prefill (B=1) and attach to a free
lane; every loop iteration runs one jitted chunk of decode steps over ALL
active lanes (mixed per-lane sampler settings); tokens stream back per lane.
New requests join at the next chunk boundary — no request ever waits for
another to finish. The worker runs one chunk AHEAD of result delivery
(dispatch k+1, then fetch k): the device->host fetch round trip overlaps the
next chunk's on-device compute, which matters when the device link is a
high-latency relay.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import queue
import threading
import time as _wall

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llm import (
    CHAT_TEMPLATE, GenState, LLMEngine, attach_lanes, attach_lanes_gen,
    finish_chunk_fetch, init_batched_state, llm_generate_chunk_batched,
    llm_generate_chunk_batched_sliced, llm_prefill_generate_jit,
    llm_prefill_kv_jit, set_lane_done, start_chunk_fetch,
)
from ..models.sampling import MAX_TOP_K, BatchSamplerParams, SamplerParams

_PROMPT_BUCKETS = (32, 64, 128, 256, 512)


@dataclasses.dataclass
class _Lane:
    handle: "GenerationHandle"
    n_predict: int
    generated: int = 0
    started: bool = False  # attach applied to the device state
    dispatched: int = 0  # decode steps dispatched (>= generated; see ramp)
    # whether the consumer reads tokens incrementally (SSE token stream,
    # stream_audio, overlap synthesis). Only such lanes pull the cohort's
    # dispatch down to first_chunk for TTFA; a binary request only needs
    # ALL its tokens, and under steady arrival churn a fresh lane exists
    # almost always, which pinned every dispatch at first_chunk — 10 fetch
    # round trips per 120-token request instead of 2-3 (measured 2.5 s
    # llm_ms at conc=8 on a 32-lane server, ~950 ms after this split).
    early: bool = True


class GenerationHandle:
    """Per-request stream of generated tokens."""

    def __init__(self):
        self._q: "queue.Queue[list[int] | None]" = queue.Queue()
        self.cancelled = threading.Event()
        self.error: Exception | None = None

    def cancel(self) -> None:
        self.cancelled.set()

    def tokens(self):
        """Yield tokens until generation completes. Raises the worker's
        exception if the request's lane failed (a dead worker must surface
        as a failed request, never a hang)."""
        while True:
            batch = self._q.get()
            if batch is None:
                if self.error is not None:
                    raise self.error
                return
            yield from batch

    def collect(self) -> list[int]:
        return list(self.tokens())


class ContinuousBatcher:
    def __init__(self, engine: LLMEngine, n_lanes: int = 8,
                 max_ctx: int = 1024, chunk: int = 16, seed: int = 0,
                 mesh=None, first_chunk: int | None = None):
        import os

        self.engine = engine
        self.cfg = engine.config
        self.mesh = mesh
        if mesh is not None and self.cfg.decode_attn != "xla":
            # a pallas_call is opaque to the GSPMD partitioner: sharded
            # chunk steps must run the XLA decode-attention path (same
            # lesson as sp + mel-mode, ROUND3_NOTES sixth session). cfg is
            # the static arg of every llm jit, so this pin alone routes
            # every mesh-sharded trace.
            import dataclasses

            self.cfg = dataclasses.replace(self.cfg, decode_attn="xla")
            engine.config = self.cfg
        # first-chunk ramp: a freshly attached lane's first dispatch runs a
        # SMALL chunk so its first tokens surface before a full
        # `chunk`-step boundary — the served TTFA was dominated by waiting
        # out the 32-step first chunk (~1ms/step) plus its fetch. 12 steps
        # matches the streaming path's first-feed threshold (lookahead+4
        # codes) so the first audio feed fires right after chunk one.
        # Costs one extra (smaller) executable and an occasional short
        # chunk for already-running lanes when a new request attaches.
        # MIOTTS_CHUNK_STEPS overrides the chunk size (tuning knob: larger
        # chunks amortize the per-chunk fetch RTT — the dominant serving
        # overhead on a high-latency device link — at the cost of coarser
        # token-delivery/attach granularity)
        chunk = int(os.environ.get("MIOTTS_CHUNK_STEPS", chunk))
        if first_chunk is None:
            first_chunk = int(os.environ.get("MIOTTS_FIRST_CHUNK", "12"))
        self.first_chunk = max(1, min(first_chunk or chunk, chunk))
        # growth ladder past the steady chunk: once every active lane has
        # run a steady chunk's worth of steps, dispatches double to
        # chunk_max — each chunk boundary pays a fetch RTT through the
        # device link, so long generations want FEW boundaries while fresh
        # lanes still want the small first chunk (TTFA). Measured at
        # conc=1 n-predict=120: 5 boundaries -> 4. MIOTTS_CHUNK_MAX=chunk
        # restores the flat behavior.
        self.chunk_max = max(chunk, int(
            os.environ.get("MIOTTS_CHUNK_MAX", str(2 * chunk))))
        self.ladder = tuple(sorted({self.first_chunk, chunk, self.chunk_max}))
        if mesh is not None:
            # dp fan-out over --mio-backend-devices: lanes shard across the
            # mesh (the reference round-robins slots over GGML backends,
            # tts-mio-server.cpp:2659-2746). Weights replicate per chip
            # unless the mesh carries a tp axis (--tensor-parallel), which
            # shards them megatron-style for models too big per chip.
            from ..parallel.mesh import replicate_tree, shard_llm_weights

            dp = mesh.shape["dp"]
            n_lanes = ((n_lanes + dp - 1) // dp) * dp
            if mesh.shape.get("tp", 1) > 1:
                engine.weights = shard_llm_weights(mesh, engine.weights)
            else:
                engine.weights = replicate_tree(mesh, engine.weights)
            engine.eog_ids = replicate_tree(mesh, engine.eog_ids)
        self.n_lanes = n_lanes
        self.max_ctx = max_ctx
        self.chunk = chunk
        self.seed = seed
        self.state = init_batched_state(self.cfg, n_lanes, max_ctx, seed)
        if mesh is not None:
            from ..parallel.mesh import shard_gen_state

            self.state = shard_gen_state(mesh, self.state)
        self.lanes: list[_Lane | None] = [None] * n_lanes
        # fused submit path: the prefill executable also runs the request's
        # first `first_chunk` decode steps (llm_prefill_generate_jit) and
        # the prefill thread delivers those tokens IMMEDIATELY — TTFA no
        # longer waits for the attach boundary plus a cohort-wide small
        # first chunk, and established lanes never get pulled down the
        # chunk ladder by fresh arrivals. MIOTTS_FUSED_PREFILL=0 restores
        # the unfused submit path (A/B knob).
        self.fused_prefill = os.environ.get(
            "MIOTTS_FUSED_PREFILL", "1") != "0"
        # attaches are queued and applied only by the worker loop, so the
        # post-chunk state write-back can never clobber a concurrent attach:
        # (host lane list, apply(state) -> state, finish list of
        #  (lane_idx, needs_set_lane_done) already-delivered lanes)
        self._pending: list[tuple[list[int], object, list]] = []
        # submits enqueue tokenized prompts here; a dedicated worker drains
        # the queue and prefills simultaneous arrivals as ONE batched
        # forward per prompt bucket (see _prefill_loop)
        self._prefill_q: "queue.Queue[tuple | None]" = queue.Queue()
        # (bucket, pow2 lane count) prefill executables known warm — fed by
        # warm_prefill and by successful groups. While the warmup tail is
        # still loading the multi-lane ladder (split_cold_until_warm set by
        # ServingEngine around the tail), a burst that would need a COLD
        # group size instead splits into the largest warmed size (see
        # _prefill_group) — a few warm ~100 ms dispatches beat one cold
        # multi-second compile/load through the relay. Once the tail is
        # done, cold sizes compile on demand again (a one-time cost the
        # grouped executable amortizes over every later burst).
        # immutable frozenset, replaced under a lock: readers iterate a
        # snapshot lock-free (mutating a shared set during iteration would
        # raise), and the locked read-modify-write keeps concurrent warm
        # registrations from losing each other's updates
        self._warm_prefills: frozenset[tuple[int, int]] = frozenset()
        self._warm_lock = threading.Lock()
        self.split_cold_until_warm = False
        # width-sliced chunk steps: a chunk over the full N-lane state
        # costs N-lane compute per step regardless of occupancy, so the
        # dispatch gathers the active lanes into the smallest pow2 width
        # that covers them (llm_generate_chunk_batched_sliced) — a 32-lane
        # server at occupancy <= 8 runs 8-lane-priced steps. Disabled on a
        # dp mesh (the state is sharded over lanes; gathering a width
        # slice would reshard across devices every chunk) and by
        # MIOTTS_CHUNK_SLICE=0. (size, width) warm registry mirrors
        # _warm_prefills: while the warmup tail runs, an un-warmed width
        # falls back to the next warmed one (full width is warmed in the
        # foreground, so there is always a fallback).
        self.slice_chunks = (mesh is None and n_lanes > 1
                             and os.environ.get("MIOTTS_CHUNK_SLICE", "1")
                             != "0")
        self._warm_chunks: frozenset[tuple[int, int]] = frozenset()
        self._warm_state: GenState | None = None
        self._prefill_thread = threading.Thread(
            target=self._prefill_loop, daemon=True, name="batcher-prefill")
        self._prefill_thread.start()
        # device-stall watchdog state: set when a chunk/fetch is dispatched,
        # refreshed on every delivery. A wedged device link (measured in
        # this sandbox: the relay hung and EVERY device call blocked in
        # futex-wait forever) is otherwise indistinguishable from a slow
        # request — /mio/health surfaces device_stalled so operators can
        # route away or restart instead of waiting on silent hangs.
        self._work_started: float | None = None
        self._last_progress = _wall.monotonic()
        # burst-attach hold: when MORE lanes are reserved-but-unattached
        # (submitted, prefill in flight) than are running, a cohort chunk
        # dispatched now prices full-width weight streaming for a minority
        # of live lanes AND makes the about-to-attach majority idle out the
        # whole chunk (they join only at the next boundary). Measured on
        # the 1.63B 32-request llm1bserve round: the first 64-step chunk
        # ran with 3/32 lanes attached (~400 ms of near-idle device time).
        # The worker instead waits — bounded by this cap — for the pending
        # attaches; the condition self-clears the moment the prefill
        # thread's attach lands (cv notify). TTFA is unaffected: a fresh
        # request's first tokens come from the fused prefill, not from the
        # held cohort chunk. A steady trickle (1 new vs >=1 running) never
        # holds — the condition is a strict majority of unattached lanes.
        self.attach_hold_s = float(
            os.environ.get("MIOTTS_ATTACH_HOLD_S", "1.0"))
        self._attach_hold_t0: float | None = None
        self.stall_threshold_s = float(
            os.environ.get("MIOTTS_DEVICE_STALL_S", "120"))
        # sub-watchdog stall events: chunk fetches slower than this count
        # toward stall_events (surfaced via /metrics + /mio/health)
        self.stall_event_s = float(
            os.environ.get("MIOTTS_STALL_EVENT_S", "5"))
        self.stall_events = 0
        self.longest_fetch_s = 0.0
        # per-lane sampler knobs mirrored host-side
        self._temps = np.full(n_lanes, 0.8, np.float32)
        self._top_ks = np.full(n_lanes, 50, np.int32)
        self._top_ps = np.ones(n_lanes, np.float32)
        self._pens = np.ones(n_lanes, np.float32)
        self._cv = threading.Condition()
        self._shutdown = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- submission -------------------------------------------------------------

    def submit(self, text: str, sampler: SamplerParams | None = None,
               n_predict: int = 400, timeout: float | None = None,
               early_tokens: bool = True) -> GenerationHandle:
        sampler = sampler or SamplerParams()
        prompt = CHAT_TEMPLATE.format(text=text)
        ids = self.engine.tokenizer.encode(prompt, parse_special=True)
        T = len(ids)
        if T > self.max_ctx - 8:
            raise ValueError(
                f"prompt is too long for the configured context "
                f"({T} tokens > {self.max_ctx - 8}); raise --ctx-size")
        bucket = next((b for b in _PROMPT_BUCKETS if T <= b),
                      ((T + 127) // 128) * 128)
        bucket = min(bucket, self.max_ctx)
        n_predict = min(n_predict, self.max_ctx - T - 1)

        handle = GenerationHandle()
        with self._cv:
            while (lane_idx := self._free_lane()) is None:
                if not self._cv.wait(timeout=timeout):
                    raise TimeoutError("no free generation lane")
            self.lanes[lane_idx] = _Lane(handle=handle, n_predict=n_predict,
                                         early=early_tokens)
            self._temps[lane_idx] = sampler.temp
            self._top_ks[lane_idx] = min(sampler.top_k, MAX_TOP_K) if sampler.top_k > 0 else 0
            self._top_ps[lane_idx] = sampler.top_p
            self._pens[lane_idx] = sampler.repeat_penalty
        self._prefill_q.put((lane_idx, ids, T, bucket, sampler.seed))
        return handle

    # -- batched prefill --------------------------------------------------------

    def _prefill_loop(self) -> None:
        """Drain-style coalescing: the first queued prompt is taken
        blocking, then whatever else is already waiting joins its batch
        (zero added latency for a lone request; a burst that arrives while
        a prefill is in flight accumulates and runs as one forward). A
        32-request burst previously paid 32 serialized B=1 prefills — each
        streaming ALL model weights — plus 32 full-cache attach copies;
        now it's one prefill per prompt bucket and one scatter per group
        (measured: the 1.63B int8 serving round, `bench.py llm1bserve`)."""
        while True:
            item = self._prefill_q.get()
            if item is None:
                return
            items = [item]
            while True:
                try:
                    nxt = self._prefill_q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._prefill_q.put(None)  # re-post shutdown
                    break
                items.append(nxt)
            groups: dict[int, list[tuple]] = {}
            for it in items:
                groups.setdefault(it[3], []).append(it)
            # pipeline the buckets: dispatch EVERY group's executable
            # first, then fetch/deliver each — a multi-bucket burst no
            # longer serializes group 2's device compute behind group 1's
            # relay fetch (round-4 llm1bserve residual: ~150 ms of serial
            # 2-group prefill per round)
            finishes: list = []
            for bucket in sorted(groups):
                # a daemon that dies here leaks every reserved lane and
                # hangs all future submits — fail the group, keep draining
                try:
                    finishes.extend(self._prefill_group(bucket,
                                                        groups[bucket]))
                except Exception as e:
                    import sys

                    print(f"mio: prefill group failed: {e!r}",
                          file=sys.stderr)
                    self._fail_unstarted([it[0] for it in groups[bucket]], e)
            for fin in finishes:
                fin()

    def _prefill_group(self, bucket: int, group: list[tuple]) -> list:
        """Dispatch one prompt-bucket group's prefill executable and return
        finish closures (fetch + token delivery + attach enqueue). The
        caller runs every group's dispatch before any finish, so a
        multi-bucket burst pipelines its groups through the device."""
        # pad the lane count to a power of two so executable variants stay
        # at (prompt buckets) x log2(n_lanes); pad rows carry an
        # out-of-range lane index, so their attach writes drop
        kp = 1 << max(0, len(group) - 1).bit_length()
        if (kp > 1 and self.split_cold_until_warm
                and (bucket, kp) not in self._warm_prefills):
            # this group size is cold (the warmup tail hasn't reached it
            # yet): split into the largest warmed size for this bucket
            # rather than paying a cold multi-lane compile/load mid-burst
            warmed = [n for (b, n) in self._warm_prefills
                      if b == bucket and n < kp]
            if warmed:
                sub = max(warmed)
                conts: list = []
                for i in range(0, len(group), sub):
                    conts.extend(self._prefill_group(bucket,
                                                     group[i:i + sub]))
                return conts
        toks = np.zeros((kp, bucket), np.int32)
        lens = np.ones(kp, np.int32)
        lanes = np.full(kp, self.n_lanes, np.int32)
        seeds = np.zeros(kp, np.uint32)
        for i, (lane_idx, ids, T, _b, seed) in enumerate(group):
            toks[i, :T] = ids
            lens[i] = T
            lanes[i] = lane_idx
            seeds[i] = np.uint32(int(seed) & 0xFFFFFFFF)
        import os
        import time as _t

        fused = self._use_fused(bucket)
        t0 = _t.perf_counter()
        try:
            # the host->device uploads sit inside the try too: a transient
            # relay/device failure during them is the same failure class as
            # a failed prefill dispatch and must not escape to the caller
            if self._work_started is None:
                self._work_started = _wall.monotonic()
            if fused:
                sampler = self._group_sampler(kp, group)
                out, n_new, gst = llm_prefill_generate_jit(
                    self.cfg, self.engine.weights, self.engine.eog_ids,
                    self.first_chunk, jnp.asarray(toks), jnp.asarray(lens),
                    jnp.asarray(seeds), sampler)
                lanes_j = jnp.asarray(lanes)
                # start the packed d2h copy NOW; the blocking wait happens
                # in the finish closure, after every group has dispatched
                packed = start_chunk_fetch(out, n_new, gst)
                apply_fn = functools.partial(
                    attach_lanes_gen, lanes=lanes_j, gst=gst)
            else:
                packed = None
                logits, new_k, new_v = llm_prefill_kv_jit(
                    self.cfg, self.engine.weights, jnp.asarray(toks),
                    jnp.asarray(lens))
                attach = (jnp.asarray(lanes), logits, new_k, new_v,
                          jnp.asarray(lens), jnp.asarray(seeds))
                apply_fn = lambda state: attach_lanes(state, *attach)  # noqa: E731
            if os.environ.get("MIOTTS_BATCH_DEBUG"):
                import sys

                print(f"prefill_group: bucket={bucket} k={len(group)} "
                      f"kp={kp} fused={fused} "
                      f"dispatch={(_t.perf_counter() - t0) * 1e3:.1f}ms",
                      file=sys.stderr)
        except Exception as e:  # fail this group's requests; keep serving
            import sys

            print(f"mio: batched prefill failed: {e!r}", file=sys.stderr)
            self._fail_unstarted([it[0] for it in group], e)
            return []

        def finish_group() -> None:
            try:
                out_np, n_np, done_np = (finish_chunk_fetch(packed)
                                         if fused else (None, None, None))
            except Exception as e:
                import sys

                print(f"mio: batched prefill fetch failed: {e!r}",
                      file=sys.stderr)
                self._fail_unstarted([it[0] for it in group], e)
                return
            self._last_progress = _wall.monotonic()
            with self._warm_lock:
                self._warm_prefills = self._warm_prefills | {(bucket, kp)}
            finish: list[tuple[int, bool]] = []
            with self._cv:
                if fused:
                    # deliver the fused first tokens NOW: the consumer's
                    # stream starts one dispatch+fetch after submit,
                    # independent of the cohort's chunk boundaries
                    for i, (lane_idx, _ids, _T, _b, _seed) in \
                            enumerate(group):
                        lane = self.lanes[lane_idx]
                        if lane is None:
                            continue
                        n = min(int(n_np[i]), lane.n_predict)
                        toks_out = [int(t) for t in out_np[i, :n]]
                        lane.generated = len(toks_out)
                        lane.dispatched = self.first_chunk
                        if toks_out and not lane.handle.cancelled.is_set():
                            lane.handle._q.put(toks_out)
                        if (bool(done_np[i])
                                or lane.generated >= lane.n_predict
                                or lane.handle.cancelled.is_set()):
                            # finished inside the fused steps: the worker
                            # frees the lane right after the attach applies
                            # (the attach itself writes done for EOG rows)
                            finish.append((lane_idx, not bool(done_np[i])))
                self._pending.append(([it[0] for it in group], apply_fn,
                                      finish))
                self._cv.notify_all()

        return [finish_group]

    def _use_fused(self, bucket: int) -> bool:
        # the mini cache spans bucket + first_chunk rows and scatters into
        # [*, max_ctx]: skip fusing when the prompt bucket leaves no room
        return self.fused_prefill and bucket + self.first_chunk <= self.max_ctx

    def _group_sampler(self, kp: int, group: list[tuple]) -> BatchSamplerParams:
        temps = np.full(kp, 0.8, np.float32)
        top_ks = np.full(kp, 50, np.int32)
        top_ps = np.ones(kp, np.float32)
        pens = np.ones(kp, np.float32)
        for i, (lane_idx, *_rest) in enumerate(group):
            temps[i] = self._temps[lane_idx]
            top_ks[i] = self._top_ks[lane_idx]
            top_ps[i] = self._top_ps[lane_idx]
            pens[i] = self._pens[lane_idx]
        return BatchSamplerParams.make(temps, top_ks, top_ps, pens)

    @property
    def device_stalled(self) -> bool:
        """True when device work has been in flight with no completed chunk
        for stall_threshold_s (MIOTTS_DEVICE_STALL_S, default 120 s) — the
        signature of a wedged device link, where every call blocks forever
        instead of erroring. Monitoring only; surfaced via /mio/health."""
        started = self._work_started
        if started is None:
            return False
        ref = max(started, self._last_progress)
        return _wall.monotonic() - ref > self.stall_threshold_s

    def _fail_unstarted(self, lane_idxs: list[int], exc: Exception) -> None:
        """Deliver a prefill/attach failure to not-yet-started lanes and
        free them (started lanes belong to the chunk loop's failure path)."""
        self._work_started = None
        with self._cv:
            for lane_idx in lane_idxs:
                lane = self.lanes[lane_idx]
                if lane is not None and not lane.started:
                    lane.handle.error = exc
                    lane.handle._q.put(None)
                    self.lanes[lane_idx] = None
                    self._pens[lane_idx] = 1.0
            self._cv.notify_all()

    def warm_prefill(self, bucket: int, n_lanes: int = 1) -> None:
        """Compile/load the submit-time prefill executable for this prompt
        bucket (at the given pow2 lane count) without running a generation.
        Warms the FUSED prefill+first-chunk executable when that's what
        submits will dispatch (see _use_fused). Thread-safe (jit dispatch
        on immutable weights) — ServingEngine.warmup calls this from a
        pool so the per-bucket compiles overlap in the backend instead of
        serializing through token-generating submits."""
        bucket = min(bucket, self.max_ctx)
        toks = jnp.asarray(np.ones((n_lanes, bucket), np.int32))
        lens = jnp.asarray([min(4, bucket)] * n_lanes, jnp.int32)
        if self._use_fused(bucket):
            sampler = BatchSamplerParams.make(
                np.full(n_lanes, 0.8, np.float32),
                np.full(n_lanes, 50, np.int32),
                np.ones(n_lanes, np.float32), np.ones(n_lanes, np.float32))
            out, n_new, gst = llm_prefill_generate_jit(
                self.cfg, self.engine.weights, self.engine.eog_ids,
                self.first_chunk, toks, lens,
                jnp.asarray(np.zeros(n_lanes, np.uint32)), sampler)
            finish_chunk_fetch(start_chunk_fetch(out, n_new, gst))
        else:
            logits, _, _ = llm_prefill_kv_jit(
                self.cfg, self.engine.weights, toks, lens)
            np.asarray(logits[:, :1])  # force execution through the relay
        with self._warm_lock:
            self._warm_prefills = self._warm_prefills | {(bucket, n_lanes)}

    def _pick_width(self, size: int, need: int) -> int | None:
        """Chunk-slice width for `need` active lanes, or None for the
        full-width step. The natural width is the smallest pow2 covering
        the active count; if that executable isn't compiled yet but a
        wider one is, the wider one runs instead — a compiled 2x-width
        step beats a cold compile stalling the whole cohort (occupancy
        ramps DOWN reuse what the ramp up compiled; with warmup on, the
        (ladder x width) grid is precompiled and this is always an exact
        hit). A new width compiles on demand only when nothing compiled
        covers it — and never while the warmup tail is still loading the
        grid (split_cold_until_warm): the tail will provide it, so fall
        back to the foreground-warmed full-width step meanwhile."""
        if not self.slice_chunks or need <= 0:
            return None
        w = 1
        while w < need:
            w *= 2
        if w >= self.n_lanes:
            return None
        warmed = self._warm_chunks  # immutable snapshot
        if (size, w) in warmed:
            return w
        covering = [wd for (s, wd) in warmed
                    if s == size and wd > w and wd < self.n_lanes]
        if covering:
            return min(covering)
        if (size, self.n_lanes) in warmed or self.split_cold_until_warm:
            return None
        return w

    def warm_chunk(self, size: int | None = None,
                   width: int | None = None) -> None:
        """Compile/load a chunk-step executable (width-sliced, or the
        full-width step for width None/>=n_lanes) without touching live
        generation state: runs on a throwaway GenState whose lanes are
        all done with a zero step_cap, so the in-graph loop exits before
        any step — the cost is the compile/cache-load plus one dispatch.
        The executable is always the single chunk_max-sized program the
        dispatch loop runs (``size`` is accepted for call-site symmetry
        but the step count is a runtime operand, not a shape — one warm
        per width covers every dispatch size). Thread-safe; called from
        ServingEngine.warmup's pool."""
        del size  # one executable per width; sizes are runtime operands
        with self._cv:
            ws = self._warm_state
            if ws is None:
                ws = self._warm_state = init_batched_state(
                    self.cfg, self.n_lanes, self.max_ctx, self.seed)
        sampler = BatchSamplerParams.make(
            self._temps, self._top_ks, self._top_ps, self._pens)
        cap = jnp.asarray(0, jnp.int32)
        rem = jnp.asarray(np.zeros(self.n_lanes, np.int32))
        if width is None or width >= self.n_lanes:
            out, n_new, st = llm_generate_chunk_batched(
                self.cfg, self.engine.weights, self.engine.eog_ids,
                self.chunk_max, sampler, ws, cap, rem)
            key = (self.chunk_max, self.n_lanes)
        else:
            lanes = jnp.asarray(np.full(width, self.n_lanes, np.int32))
            out, n_new, st = llm_generate_chunk_batched_sliced(
                self.cfg, self.engine.weights, self.engine.eog_ids,
                self.chunk_max, width, sampler, ws, lanes, cap, rem)
            key = (self.chunk_max, width)
        finish_chunk_fetch(start_chunk_fetch(out, n_new, st))
        with self._warm_lock:
            self._warm_chunks = self._warm_chunks | {key}

    def release_warm_state(self) -> None:
        """Drop the throwaway warm GenState (a full KV cache) once the
        warmup tail is done — it exists only to warm chunk executables."""
        with self._cv:
            self._warm_state = None

    def _free_lane(self) -> int | None:
        for i, l in enumerate(self.lanes):
            if l is None:
                return i
        return None

    def shutdown(self) -> None:
        self._prefill_q.put(None)
        with self._cv:
            self._shutdown = True
            self._cv.notify_all()
        self._thread.join(timeout=5)
        self._prefill_thread.join(timeout=5)

    def _fail_active_lanes(self, snapshot: list[int], exc: Exception) -> None:
        """Deliver a device failure to every in-flight request and rebuild
        the batched state so subsequent submits start clean."""
        import sys

        print(f"mio: generation chunk failed, resetting lanes: {exc!r}",
              file=sys.stderr)
        self._work_started = None
        with self._cv:
            for i in snapshot:
                lane = self.lanes[i]
                if lane is None:
                    continue
                lane.handle.error = exc
                lane.handle._q.put(None)
                self.lanes[i] = None
                self._pens[i] = 1.0
            self.state = init_batched_state(self.cfg, self.n_lanes,
                                            self.max_ctx, self.seed)
            if self.mesh is not None:
                from ..parallel.mesh import shard_gen_state

                self.state = shard_gen_state(self.mesh, self.state)
            self._cv.notify_all()

    # -- worker loop ---------------------------------------------------------------

    def _run(self) -> None:
        # depth-N dispatch-ahead: the GenState chain lives on device, so
        # chunk k+2 does not need chunk k+1's host-visible results — up to
        # `depth` chunks stay in flight and the oldest is fetched only once
        # the pipeline is full. One-deep overlap (round 2) still serialized
        # compute + fetch RTT per chunk (measured at 1.63B/32 lanes: 118 ms
        # compute + ~60 ms relay RTT = 180 ms per 32-step chunk); at depth 2
        # the fetch rides the NEXT chunk's compute. Costs: a lane may decode
        # up to depth*chunk steps past its budget (the delivery clamp drops
        # them; all-done chunks exit in-graph via EOG), and lane freeing
        # lags the pipeline depth under saturation.
        import os
        import time as _t
        from collections import deque

        # depth default 1: on THIS sandbox's relay, d2h fetches serialize
        # behind all queued compute, so a fetch issued with 2 chunks queued
        # waits for both (measured 180 -> 300 ms per chunk at depth 2,
        # 1.63B/32 lanes). On a direct-attached PJRT host transfers overlap
        # execution and depth 2 hides the fetch entirely — raise it there.
        depth = max(1, int(os.environ.get("MIOTTS_CHUNK_DEPTH", "1")))
        dbg = os.environ.get("MIOTTS_BATCH_DEBUG")
        inflight: deque = deque()  # (out, n_new, state_k, snapshot_k, size)
        while True:
            with self._cv:
                while (not inflight and not self._shutdown
                       and not self._pending and all(
                           l is None or not l.started for l in self.lanes)):
                    self._cv.wait()
                if self._shutdown:
                    return
                for lane_list, apply_fn, finish in self._pending:
                    # a failed attach (poisoned device arrays after a
                    # fault, relay error) must not kill the worker thread —
                    # fail just this group's requests and keep serving
                    try:
                        self.state = apply_fn(self.state)
                    except Exception as e:
                        import sys

                        print(f"mio: lane attach failed: {e!r}",
                              file=sys.stderr)
                        for lane_idx in lane_list:
                            lane = self.lanes[lane_idx]
                            if lane is not None and not lane.started:
                                lane.handle.error = e
                                lane.handle._q.put(None)
                                self.lanes[lane_idx] = None
                                self._pens[lane_idx] = 1.0
                        continue
                    for lane_idx in lane_list:
                        lane = self.lanes[lane_idx]
                        if lane is not None:
                            lane.started = True
                    # lanes that already finished inside the fused prefill
                    # steps (EOG / budget / cancel): their tokens were
                    # delivered by the prefill thread — free them now that
                    # the attach has applied (EOG rows attached done=True;
                    # budget/cancel rows need the explicit done write so
                    # the device loop never steps them)
                    for lane_idx, needs_done in finish:
                        lane = self.lanes[lane_idx]
                        if lane is None:
                            continue
                        lane.handle._q.put(None)
                        self.lanes[lane_idx] = None
                        self._pens[lane_idx] = 1.0
                        if needs_done:
                            self.state = set_lane_done(self.state,
                                                       jnp.int32(lane_idx))
                        self._cv.notify_all()
                self._pending.clear()
                sampler = BatchSamplerParams.make(
                    self._temps, self._top_ks, self._top_ps, self._pens)
                state = self.state
                # snapshot carries the lane OBJECTS: delivery later verifies
                # self.lanes[i] is still the same request — a lane freed
                # while a speculative chunk is in flight may be re-attached
                # by a new request, whose tokens start only at the next
                # chunk (the stale chunk's output for that lane is dropped)
                snapshot = [(i, l) for i, l in enumerate(self.lanes)
                            if l is not None and l.started]
                # steps already in flight per lane OBJECT (an index may have
                # been re-attached; the new request owes nothing for the old
                # one's in-flight steps)
                steps_inflight: dict[int, int] = {}
                for chk in inflight:
                    for _i, lobj in chk[1]:
                        steps_inflight[id(lobj)] = (
                            steps_inflight.get(id(lobj), 0) + chk[2])
                # would any lane still have token budget after the chunks
                # already in flight? If not, a speculative dispatch can only
                # produce tokens the budget clamp drops.
                worth_dispatching = any(
                    (l.generated + steps_inflight.get(id(l), 0)) < l.n_predict
                    for _i, l in snapshot)
                # burst-attach hold (see __init__): defer the dispatch while
                # a strict majority of reserved lanes is still mid-prefill
                n_unstarted = sum(1 for l in self.lanes
                                  if l is not None and not l.started)
                held = False
                if snapshot and n_unstarted > len(snapshot):
                    now = _wall.monotonic()
                    if self._attach_hold_t0 is None:
                        self._attach_hold_t0 = now
                    held = now - self._attach_hold_t0 < self.attach_hold_s
                else:
                    self._attach_hold_t0 = None
                # first-chunk ramp + growth ladder (see _dispatch_size).
                # `size` is a runtime operand (step_cap) of ONE compiled
                # chunk executable sized chunk_max — not a shape — so any
                # value <= chunk_max dispatches without a new compile.
                size = self._dispatch_size(snapshot)
                width = self._pick_width(self.chunk_max, len(snapshot))
                # per-lane remaining budget at dispatch: the in-graph loop
                # marks a lane done the step its budget runs out, so the
                # cohort's last chunk stops at the true remaining work
                # instead of stepping every lane to the cap. Lanes not in
                # the snapshot (free slots, zombies whose request was
                # delivered before EOG) get 0 and leave the live set on
                # their first step; a later attach rewrites their row.
                rem_np = np.zeros(self.n_lanes, np.int32)
                for i, l in snapshot:
                    rem_np[i] = max(0, l.n_predict - l.dispatched)

            t0 = _t.perf_counter()
            dispatched = False
            if held and not inflight:
                # nothing to drain while waiting for the attach: sleep on
                # the cv (the prefill thread's _pending.append notifies).
                # Sleep up to the hold's remaining budget (capped 50 ms so
                # a racing attach that missed the notify is still seen
                # promptly) instead of a 10 ms poll loop (advisor r4).
                hold_left = self.attach_hold_s
                if self._attach_hold_t0 is not None:
                    hold_left = self.attach_hold_s - (
                        _wall.monotonic() - self._attach_hold_t0)
                with self._cv:
                    if not self._pending and not self._shutdown:
                        self._cv.wait(timeout=max(0.001, min(0.05, hold_left)))
                continue
            if snapshot and worth_dispatching and not held:
                for _, l in snapshot:
                    l.dispatched += size
                try:
                    if self._work_started is None:
                        self._work_started = _wall.monotonic()
                    cap = jnp.asarray(size, jnp.int32)
                    rem = jnp.asarray(rem_np)
                    if width is not None:
                        lanes_np = np.full(width, self.n_lanes, np.int32)
                        for j, (i, _) in enumerate(snapshot):
                            lanes_np[j] = i
                        out, n_new, state = llm_generate_chunk_batched_sliced(
                            self.cfg, self.engine.weights,
                            self.engine.eog_ids, self.chunk_max, width,
                            sampler, state, jnp.asarray(lanes_np), cap, rem)
                    else:
                        out, n_new, state = llm_generate_chunk_batched(
                            self.cfg, self.engine.weights,
                            self.engine.eog_ids, self.chunk_max, sampler,
                            state, cap, rem)
                    # register the executable (full-width dispatches too:
                    # a later occupancy ramp-down prefers reusing it over
                    # a cold narrower compile). Read-check first — the
                    # set stops growing after the first few chunks, and
                    # this path runs per dispatch.
                    key_w = (self.chunk_max, width if width is not None
                             else self.n_lanes)
                    if key_w not in self._warm_chunks:
                        with self._warm_lock:
                            self._warm_chunks = self._warm_chunks | {key_w}
                    with self._cv:
                        self.state = state
                    # start the d2h copy NOW, before anything else enters
                    # the device queue — the transfer then fires as soon as
                    # this chunk's compute finishes
                    packed = start_chunk_fetch(out, n_new, state)
                    inflight.append((packed, snapshot, size))
                    dispatched = True
                except Exception as e:  # tracing/dispatch failure
                    affected = sorted({i for i, _ in snapshot}
                                      | {i for chk in inflight
                                         for i, _ in chk[1]})
                    self._fail_active_lanes(affected, e)
                    inflight.clear()
                    continue
            t1 = _t.perf_counter()

            # fetch the oldest chunk once the pipeline is full — or when
            # nothing new was dispatched (no compute left to hide the RTT
            # behind, so drain)
            if inflight and (len(inflight) > depth or not dispatched):
                packed_k, snap_k, _size_k = inflight.popleft()
                tf = _wall.monotonic()
                try:
                    # single packed fetch: three separate np.asarray calls
                    # pay three device round trips per chunk
                    out_np, n_np, done_np = finish_chunk_fetch(packed_k)
                except Exception as e:  # device failure: fail the affected
                    # requests and reset the batch state — the worker must
                    # keep serving (a dead loop would hang every submit),
                    # and the speculatively dispatched chunks built on the
                    # poisoned state are discarded with it
                    affected = sorted({i for i, _ in snap_k}
                                      | {i for chk in inflight
                                         for i, _ in chk[1]})
                    self._fail_active_lanes(affected, e)
                    inflight.clear()
                    continue
                # stall observability: the link intermittently pauses every
                # in-flight device call for seconds (measured: 11 s and
                # 133 s cohort stalls at p50 ~1 s) — too short for the
                # 120 s device_stalled watchdog but very visible to the
                # requests riding that chunk. Count them for /metrics.
                dt_fetch = _wall.monotonic() - tf
                if dt_fetch > self.stall_event_s:
                    self.stall_events += 1
                self.longest_fetch_s = max(self.longest_fetch_s, dt_fetch)
                self._deliver_chunk(out_np, n_np, done_np, snap_k)
                self._last_progress = _wall.monotonic()
                if not inflight:
                    self._work_started = None
            if dbg and (snapshot or inflight):
                import sys

                print(f"chunk: size={size} active={len(snapshot)} "
                      f"width={width or self.n_lanes} "
                      f"depth={len(inflight)} "
                      f"dispatch={(t1 - t0) * 1e3:.1f}ms "
                      f"fetch+deliver={(_t.perf_counter() - t1) * 1e3:.1f}ms",
                      file=sys.stderr)

    def _dispatch_size(self, snapshot) -> int:
        """Pick this dispatch's chunk size. Three forces:

        - a freshly attached lane wants its first tokens EARLY (TTFA), so
          any fresh lane pulls the dispatch down to ``first_chunk``;
        - established lanes want FEW dispatch boundaries (each chunk pays
          a fetch round trip through the device link), so a lane that has
          already run a steady chunk graduates to ``chunk_max``;
        - steps past the largest remaining budget are pure waste (the
          delivery clamp drops their tokens), so the size shrinks to
          exactly that remainder.

        The size is a runtime operand (step_cap) of the single
        chunk_max-sized executable — any value dispatches without a
        compile, so the ladder is pure pacing policy and the
        budget-shrink is exact instead of rounded up to a ladder entry.
        """
        # uncontended fast path: when this snapshot's lanes are the ONLY
        # reservations (no submitted-but-unattached request is waiting for
        # the next boundary), chunk boundaries buy nothing — nobody needs
        # a preemption point to join, and the fused prefill has already
        # delivered the first tokens. Skip the middle ladder rung and run
        # one budget-shrunk chunk_max dispatch: a steady solo 120-token
        # request pays prefill + ONE chunk instead of 3-4 boundaries
        # (round-4 verdict item 5). Under contention the middle rung stays
        # — long device-occupancy windows would make fresh arrivals queue
        # up to chunk_max steps behind the cohort, blowing TTFA.
        uncontended = (len(snapshot) <= 1
                       and sum(1 for l in self.lanes if l is not None)
                       <= len(snapshot)
                       and os.environ.get("MIOTTS_SOLO_FAST", "1") != "0")
        sizes = []
        remaining_max = 0
        for _, lane in snapshot:
            rem = lane.n_predict - lane.dispatched
            if rem <= 0:
                continue  # only owes in-flight delivery; don't hold size down
            remaining_max = max(remaining_max, rem)
            if not lane.early:
                # a binary/codes-only consumer reads nothing until its
                # request completes: chunk boundaries only cost it fetch
                # round trips. Vote for the cap outright — the budget
                # shrink plus the in-graph rem exit make an oversized
                # dispatch exact, and a mixed cohort is still paced by
                # its streaming lanes (cohort size is the min vote).
                sizes.append(self.chunk_max)
            elif lane.dispatched == 0:
                # consumers that read tokens incrementally get the small
                # TTFA-first chunk
                sizes.append(self.first_chunk)
            elif (lane.dispatched < self.first_chunk + self.chunk
                    and not uncontended):
                sizes.append(self.chunk)
            else:
                sizes.append(self.chunk_max)
        size = min(sizes) if sizes else self.chunk
        if 0 < remaining_max < size:
            return remaining_max
        return size

    def _deliver_chunk(self, out_np, n_np, done_np, snapshot) -> None:
        with self._cv:
            freed = False
            for i, lane_at_dispatch in snapshot:
                lane = self.lanes[i]
                if lane is None or lane is not lane_at_dispatch:
                    continue  # freed (and possibly re-attached) since dispatch
                n = int(n_np[i])
                toks = [int(t) for t in out_np[i, :n]]
                budget_left = lane.n_predict - lane.generated
                if len(toks) > budget_left:
                    toks = toks[:budget_left]
                lane.generated += len(toks)
                if toks and not lane.handle.cancelled.is_set():
                    lane.handle._q.put(toks)
                finished = (bool(done_np[i]) or lane.generated >= lane.n_predict
                            or lane.handle.cancelled.is_set())
                if finished:
                    lane.handle._q.put(None)
                    self.lanes[i] = None
                    self._pens[i] = 1.0
                    if not done_np[i]:
                        self.state = set_lane_done(self.state, jnp.int32(i))
                    freed = True
            if freed:
                self._cv.notify_all()
