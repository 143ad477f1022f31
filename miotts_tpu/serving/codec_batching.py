"""Codec micro-batcher: group concurrent synthesis calls into one batched
device call.

The reference serializes synthesis per worker slot behind the model's
runtime_mutex (mio-tts-lib.cpp:1207); here concurrent requests landing
within a small gather window are padded to a common length bucket and run
as one ``codec_synthesize`` batch — MXU efficiency scales with lanes
(measured: 8 lanes cost ~the same wall time as 1).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future

import numpy as np

from ..pipeline import MioTTSPipeline, SynthesisResult, pick_bucket


def _jit_packers():
    import functools

    import jax
    import jax.numpy as jnp

    # ``n_lanes`` (static) slices the fetch to the active lanes: the forward
    # always runs at the fixed lane count (one executable per bucket), but
    # the device->host transfer is the serving bottleneck (12-36 MB/s relay
    # here), so fetching 8 padded lanes for a single request multiplied the
    # latency-critical bytes by 8. Active requests occupy lanes 0..k-1, so a
    # prefix slice is exact; lane counts are rounded up to a power of two to
    # bound the executable variants at log2(max_batch)+1 per mode.

    @functools.partial(jax.jit, static_argnums=(2,))
    def pack_f32(audio, n, n_lanes):
        # n_samples rides in the same transfer (exact as f32: counts < 2^24)
        return jnp.concatenate([audio[:n_lanes].reshape(-1).astype(jnp.float32),
                                n[:n_lanes].astype(jnp.float32)])

    @functools.partial(jax.jit, static_argnums=(2,))
    def pack_pcm16(audio, n, n_lanes):
        # device-side 16-bit quantization, bit-identical to
        # audio_io.encode_pcm16 (clip to [-1,1], round-half-even x 32767)
        pcm = jnp.rint(jnp.clip(audio[:n_lanes], -1.0, 1.0)
                       * 32767.0).astype(jnp.int16)
        n16 = jax.lax.bitcast_convert_type(n[:n_lanes].astype(jnp.int32),
                                           jnp.int16).reshape(-1)
        return jnp.concatenate([pcm.reshape(-1), n16])

    @functools.partial(jax.jit, static_argnums=(3, 4, 5))
    def pack_window(audio, n_samples, starts, window, n_lanes, pcm16):
        # per-lane window slice (the shared pipeline._window_slice — one
        # wire layout/masking rule for B=1 and batched paths) + valid
        # counts, optionally PCM16-quantized on device: a streaming feed
        # emits a tiny slice of the decode, so this is the only data that
        # needs to cross the relay
        from ..pipeline import _window_slice

        n = n_samples[:n_lanes].astype(jnp.int32)
        win = _window_slice(audio[:n_lanes],
                            starts[:n_lanes].astype(jnp.int32), window)
        if pcm16:
            pcm = jnp.rint(jnp.clip(win, -1.0, 1.0) * 32767.0).astype(jnp.int16)
            n16 = jax.lax.bitcast_convert_type(n, jnp.int16).reshape(-1)
            return jnp.concatenate([pcm.reshape(-1), n16])
        return jnp.concatenate([win.reshape(-1).astype(jnp.float32),
                                n.astype(jnp.float32)])

    return pack_f32, pack_pcm16, pack_window


_pack_f32, _pack_pcm16, _pack_window = _jit_packers()


def _pow2_lanes(n_active: int, max_batch: int) -> int:
    return min(max_batch, 1 << max(0, n_active - 1).bit_length())


class CodecMicroBatcher:
    def __init__(self, pipeline: MioTTSPipeline, max_batch: int = 8,
                 gather_window_s: float = 0.003, mesh=None):
        self.pipeline = pipeline
        self.mesh = mesh
        self._data_sharding = None
        self._lane_sharding = None
        if mesh is not None:
            # dp fan-out: batch lanes shard over --mio-backend-devices;
            # codec weights replicate per chip (see ServingEngine)
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape["dp"]
            max_batch = ((max_batch + dp - 1) // dp) * dp
            self._data_sharding = NamedSharding(mesh, P("dp", None))
            self._lane_sharding = NamedSharding(mesh, P("dp"))
        self.max_batch = max_batch
        self.gather_window_s = gather_window_s
        self._q: "queue.Queue[tuple | None]" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def synthesize(self, codes: list[int], embedding: np.ndarray | None,
                   interp_anchor: int | None = None,
                   peak_normalize: bool = True,
                   pcm16: bool = False,
                   window: tuple[int, int] | None = None,
                   priority: bool = False) -> SynthesisResult:
        """Blocking call; batches with concurrent callers that share the same
        (interp_anchor, peak_normalize, pcm16, window-length) options — e.g.
        all streaming prefix re-decodes batch together, as do all full
        synthesis calls. ``pcm16=True`` quantizes to 16-bit PCM ON DEVICE
        (same clamp/round as audio_io.encode_pcm16) and fetches half the
        bytes — the right mode when the result is served as WAV16/PCM16
        anyway; the result's ``audio`` is then int16. ``window=(start, len)``
        fetches only that slice per lane (f32; see MioTTSPipeline.synthesize)
        — the window LENGTH is part of the batch group (static shape), the
        start is per-caller dynamic. ``priority=True`` (a fresh stream's
        FIRST feed — the TTFA-critical call) makes the group containing
        this item run before same-gather groups without one: under conc=N
        streaming, a new request's first audio otherwise queues behind up
        to N-1 steady-feed device calls (~40-85 ms each). Priority never
        splits a group — a priority item still shares its group's single
        device call. Raises like MioTTSPipeline.synthesize on invalid
        inputs."""
        codes_arr, embedding = self.pipeline.validate_request(codes, embedding)
        fut: Future = Future()
        wlen = None if window is None else int(window[1])
        wstart = 0 if window is None else int(window[0])
        opts = (interp_anchor, peak_normalize, pcm16, wlen)
        self._q.put((codes_arr.tolist(), embedding, opts, fut, wstart,
                     bool(priority)))
        return fut.result()

    def warm(self, bucket: int,
             interp_anchor: int | None = None,
             peak_normalize: bool = True,
             pcm16: bool = False,
             wlen: int | None = None,
             lanes: tuple[int, ...] | None = None) -> None:
        """Compile/load the exact executables ``_run_group`` uses for this
        (bucket, opts) — the batched forward at [max_batch, bucket] plus the
        matching packer — WITHOUT going through the gather queue. Warmup
        must not use ``synthesize``: concurrent warm calls with identical
        opts coalesce into one group padded to the largest bucket (skipping
        the smaller buckets' executables entirely), and the single batcher
        thread would serialize the compiles anyway. Direct calls are
        thread-safe (jit dispatch + immutable weights), so a warmup pool
        overlaps the backend work."""
        import jax.numpy as jnp

        cfg = self.pipeline.config
        B = self.max_batch
        tokens_j = jnp.asarray(np.ones((B, bucket), np.int32))
        lengths_j = jnp.asarray([bucket] * B, jnp.int32)
        cond_j = (jnp.zeros((B, cfg.decoder_adanorm_dim), jnp.float32)
                  if cfg.dynamic_global else None)
        if self._data_sharding is not None:
            import jax

            tokens_j = jax.device_put(tokens_j, self._data_sharding)
            lengths_j = jax.device_put(lengths_j, self._lane_sharding)
            if cond_j is not None:
                cond_j = jax.device_put(cond_j, self._data_sharding)
        audio, n_samples = self.pipeline._synth_fn(
            self.pipeline.weights, tokens_j, lengths_j, cond_j,
            interp_anchor_tokens=interp_anchor,
            peak_normalize=peak_normalize)
        # the pack executable additionally varies by active-lane count
        # (conc=1 fetches a single lane); warm the single-lane and
        # full-batch variants — mid ladder steps compile on first use and
        # persist in the compile cache
        for n_lanes in (lanes if lanes is not None
                        else sorted({1, B})):
            if wlen is not None:
                np.asarray(_pack_window(
                    audio, n_samples, jnp.asarray(np.zeros(B, np.int32)),
                    int(wlen), n_lanes, bool(pcm16)))
            elif pcm16:
                np.asarray(_pack_pcm16(audio, n_samples, n_lanes))
            else:
                np.asarray(_pack_f32(audio, n_samples, n_lanes))

    def shutdown(self) -> None:
        self._q.put(None)
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _gather(self) -> list[tuple] | None:
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        # collect whatever arrives within the window (bounded wait)
        import time

        deadline = time.monotonic() + self.gather_window_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                self._q.put(None)  # re-post shutdown for the main loop
                break
            batch.append(item)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._gather()
            if batch is None:
                return
            # one device call per distinct option set (two in practice:
            # full synthesis and streaming prefix re-decodes)
            for opts, items in self._ordered_groups(batch):
                self._run_group(opts, items)

    @staticmethod
    def _ordered_groups(batch: list[tuple]) -> list[tuple[tuple, list[tuple]]]:
        """Group gathered items by option set; groups holding a priority
        item (a fresh stream's first feed) run first. Stable within each
        class, so steady feeds keep arrival order."""
        groups: dict[tuple, list[tuple]] = {}
        for item in batch:
            groups.setdefault(item[2], []).append(item)
        return sorted(groups.items(),
                      key=lambda kv: 0 if any(it[5] for it in kv[1]) else 1)

    def _run_group(self, opts: tuple, batch: list[tuple]) -> None:
        import jax.numpy as jnp

        cfg = self.pipeline.config
        interp_anchor, peak_normalize, pcm16, wlen = opts
        try:
            lengths = [len(item[0]) for item in batch]
            bucket = pick_bucket(max(lengths), self.pipeline.buckets)
            # fixed lane count: one compiled executable per LENGTH bucket
            # (a varying batch dim would recompile per concurrency level;
            # idle lanes are near-free on the MXU)
            B = self.max_batch
            tokens = np.zeros((B, bucket), np.int32)
            lane_len = [1] * B
            starts = np.zeros(B, np.int32)
            for i, item in enumerate(batch):
                codes = item[0]
                tokens[i, : len(codes)] = codes
                lane_len[i] = len(codes)
                starts[i] = item[4]
            lengths = lane_len
            if cfg.dynamic_global:
                dc = cfg.decoder_adanorm_dim
                cond = np.zeros((B, dc), np.float32)
                for i, item in enumerate(batch):
                    cond[i] = np.asarray(item[1], np.float32).reshape(-1)
                cond_j = jnp.asarray(cond)
            else:
                cond_j = None
            import os
            import time as _t

            t_up = _t.perf_counter()
            tokens_j = jnp.asarray(tokens)
            lengths_j = jnp.asarray(lengths, jnp.int32)
            if self._data_sharding is not None:
                import jax

                tokens_j = jax.device_put(tokens_j, self._data_sharding)
                lengths_j = jax.device_put(lengths_j, self._lane_sharding)
                if cond_j is not None:
                    cond_j = jax.device_put(cond_j, self._data_sharding)
            t0 = _t.perf_counter()
            audio, n_samples = self.pipeline._synth_fn(
                self.pipeline.weights, tokens_j, lengths_j, cond_j,
                interp_anchor_tokens=interp_anchor,
                peak_normalize=peak_normalize)
            t_disp = _t.perf_counter()
            # one packed device->host transfer for (audio, n_samples):
            # each np.asarray pays a full relay round trip; pcm16 halves
            # the audio bytes, window fetches move only the slice the
            # caller will emit, and the lane slice drops the padded idle
            # lanes (the device link is the serving bottleneck at
            # 12-36 MB/s in this environment)
            Bp = _pow2_lanes(len(batch), B)
            if wlen is not None:
                packed = np.asarray(_pack_window(
                    audio, n_samples, jnp.asarray(starts), int(wlen), Bp,
                    bool(pcm16)))
                win_np = packed[: Bp * wlen].reshape(Bp, wlen)
                if pcm16:
                    # pcm16 here is a TRANSFER encoding: callers (streaming
                    # prefix re-decodes) crossfade in float, so dequantize
                    # host-side — the noise (~3e-5) is the same quantization
                    # the WAV16 wire applies anyway
                    win_np = win_np.astype(np.float32) / 32767.0
                    n_np = packed[Bp * wlen:].view(np.int32)
                else:
                    n_np = packed[Bp * wlen:].astype(np.int32)
                decode_ms = (_t.perf_counter() - t0) * 1e3
                if os.environ.get("MIOTTS_TTFA_DEBUG"):
                    import sys

                    print(f"codec_group: bucket={bucket} wlen={wlen} "
                          f"lanes={Bp} pcm16={pcm16} bytes={packed.nbytes} "
                          f"up={(t0 - t_up) * 1e3:.1f}ms "
                          f"disp={(t_disp - t0) * 1e3:.1f}ms "
                          f"fetch={decode_ms - (t_disp - t0) * 1e3:.1f}ms",
                          file=sys.stderr)
                for i, item in enumerate(batch):
                    codes, fut, start = item[0], item[3], int(starts[i])
                    n_valid = int(n_np[i])
                    fut.set_result(SynthesisResult(
                        audio=win_np[i, : max(0, min(wlen, n_valid - start))],
                        sample_rate=cfg.sample_rate,
                        decode_ms=decode_ms,
                        n_codes=len(codes),
                        n_frames=n_valid // cfg.hop_length,
                        window_start=start,
                        n_total=n_valid,
                    ))
                return
            packed = np.asarray(_pack_pcm16(audio, n_samples, Bp) if pcm16
                                else _pack_f32(audio, n_samples, Bp))
            if os.environ.get("MIOTTS_TTFA_DEBUG"):
                import sys

                print(f"codec_group: bucket={bucket} wlen=None "
                      f"lanes={Bp} pcm16={pcm16} bytes={packed.nbytes} "
                      f"up={(t0 - t_up) * 1e3:.1f}ms "
                      f"disp={(t_disp - t0) * 1e3:.1f}ms "
                      f"fetch={(_t.perf_counter() - t_disp) * 1e3:.1f}ms",
                      file=sys.stderr)
            lane_size = Bp * audio.shape[1]
            if pcm16:
                audio_np = packed[:lane_size].reshape(Bp, audio.shape[1])
                n_np = packed[lane_size:].view(np.int32)
            else:
                audio_np = packed[:lane_size].reshape(Bp, audio.shape[1])
                n_np = packed[lane_size:].astype(np.int32)
            decode_ms = (_t.perf_counter() - t0) * 1e3
            for i, item in enumerate(batch):
                codes, fut = item[0], item[3]
                n_valid = int(n_np[i])
                fut.set_result(SynthesisResult(
                    audio=audio_np[i, :n_valid],
                    sample_rate=cfg.sample_rate,
                    decode_ms=decode_ms,
                    n_codes=len(codes),
                    n_frames=n_valid // cfg.hop_length,
                ))
        except Exception as e:  # deliver the failure to every waiter
            for item in batch:
                fut = item[3]
                if not fut.done():
                    fut.set_exception(e)
