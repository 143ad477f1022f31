"""Continuous-batching worker tests: lane join/leave, mixed sampler
settings, consistency with the single-request path."""

import concurrent.futures

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.models.llm import LLMEngine
from miotts_tpu.models.sampling import SamplerParams
from miotts_tpu.serving.batching import ContinuousBatcher
from miotts_tpu.testing import write_synthetic_llm_gguf


@pytest.fixture(scope="module")
def batcher(tmp_path_factory):
    path = tmp_path_factory.mktemp("cb") / "llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=64, seed=0)
    eng = LLMEngine(str(path), dtype=jnp.float32)
    b = ContinuousBatcher(eng, n_lanes=4, max_ctx=128, chunk=8)
    yield eng, b
    b.shutdown()


def test_single_request(batcher):
    eng, b = batcher
    h = b.submit("hello", SamplerParams(temp=0.8, seed=1), n_predict=20)
    toks = h.collect()
    assert 0 < len(toks) <= 20
    assert all(0 <= t < len(eng.tokenizer.tokens) for t in toks)


def test_greedy_matches_single_path(batcher):
    """temp=0 lanes are deterministic: batched output == single-request
    engine output."""
    eng, b = batcher
    expect = eng.generate_audio_tokens("hi there", n_predict=12, n_ctx=64,
                                       sampler=SamplerParams(temp=0.0))
    got = b.submit("hi there", SamplerParams(temp=0.0), n_predict=12).collect()
    assert got == expect


def test_concurrent_mixed_requests(batcher):
    eng, b = batcher

    def one(i):
        sampler = SamplerParams(temp=0.0 if i % 2 == 0 else 0.9,
                                top_k=0 if i % 2 == 0 else 40)
        return b.submit(f"request {i}", sampler, n_predict=10 + i).collect()

    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        results = list(ex.map(one, range(6)))
    for i, toks in enumerate(results):
        assert 0 < len(toks) <= 10 + i
    # greedy lanes must still be deterministic under concurrency
    expect = eng.generate_audio_tokens("request 0", n_predict=10, n_ctx=64,
                                       sampler=SamplerParams(temp=0.0))
    assert results[0] == expect[:len(results[0])]


def test_burst_submits_coalesce_and_match_single_path(batcher):
    """A simultaneous burst (barrier-released) flows through the batched
    prefill worker — possibly as one grouped forward, possibly split by
    drain timing — and greedy results must equal the single-request path
    either way. Mixed prompt lengths also cross prompt-bucket groups."""
    import threading

    eng, b = batcher
    texts = ["a", "bb longer prompt that still fits", "ccc", "d" * 40]
    barrier = threading.Barrier(len(texts))

    def one(text):
        barrier.wait()
        return b.submit(text, SamplerParams(temp=0.0), n_predict=10).collect()

    with concurrent.futures.ThreadPoolExecutor(len(texts)) as ex:
        results = list(ex.map(one, texts))
    for text, got in zip(texts, results):
        expect = eng.generate_audio_tokens(
            text, n_predict=10, n_ctx=64, sampler=SamplerParams(temp=0.0))
        assert got == expect, text


def test_cold_group_sizes_split_to_warmed_during_warmup_tail(tmp_path):
    """While the warmup tail is still loading the multi-lane prefill
    ladder (split_cold_until_warm), a burst that would coalesce into a
    COLD group size must split into the largest warmed size instead of
    compiling a new multi-lane executable mid-burst — and the greedy
    outputs must still match the single-request path."""
    import threading

    from miotts_tpu.serving import batching as batching_mod

    path = tmp_path / "llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=64, seed=0)
    eng = LLMEngine(str(path), dtype=jnp.float32)
    b = ContinuousBatcher(eng, n_lanes=4, max_ctx=128, chunk=8)
    try:
        # warm single-lane + 2-lane for the smallest prompt bucket only
        # (the state the fg warm leaves right as the server starts
        # listening), then freeze: the 4-lane executable stays "cold"
        bucket = 32
        b.warm_prefill(bucket)
        b.warm_prefill(bucket, n_lanes=2)
        b.split_cold_until_warm = True

        seen_group_sizes = []
        real = batching_mod.llm_prefill_generate_jit

        def spy(cfg, weights, eog_ids, n_steps, toks, lens, seeds, sampler):
            seen_group_sizes.append(int(toks.shape[0]))
            return real(cfg, weights, eog_ids, n_steps, toks, lens, seeds,
                        sampler)

        batching_mod.llm_prefill_generate_jit = spy
        try:
            texts = ["a", "bb", "ccc", "dddd"]  # all land in bucket 32
            barrier = threading.Barrier(len(texts))

            def one(text):
                barrier.wait()
                return b.submit(text, SamplerParams(temp=0.0),
                                n_predict=8).collect()

            with concurrent.futures.ThreadPoolExecutor(len(texts)) as ex:
                results = list(ex.map(one, texts))
        finally:
            batching_mod.llm_prefill_generate_jit = real
        # drain timing may or may not coalesce the burst, but no prefill
        # may exceed the largest warmed group size
        assert seen_group_sizes and max(seen_group_sizes) <= 2
        for text, got in zip(texts, results):
            expect = eng.generate_audio_tokens(
                text, n_predict=8, n_ctx=64, sampler=SamplerParams(temp=0.0))
            assert got == expect, text
        # once the tail finishes, cold sizes group on demand again
        b.split_cold_until_warm = False
    finally:
        b.shutdown()


def test_lane_reuse_after_completion(batcher):
    eng, b = batcher
    for round_ in range(3):
        hs = [b.submit(f"round {round_} req {i}", SamplerParams(temp=0.5),
                       n_predict=6) for i in range(4)]
        outs = [h.collect() for h in hs]
        assert all(0 < len(o) <= 6 for o in outs)
    assert all(l is None for l in b.lanes)


def test_budget_exact_cut(batcher):
    eng, b = batcher
    toks = b.submit("budget", SamplerParams(temp=0.7, seed=2), n_predict=5).collect()
    assert len(toks) <= 5


def test_per_lane_seed_reproducibility(batcher):
    """Same seed => identical tokens regardless of lane neighbors; different
    seed => (almost surely) different tokens."""
    eng, b = batcher
    sp42 = SamplerParams(temp=0.9, seed=42)
    a = b.submit("seed test", sp42, n_predict=12).collect()
    # resubmit alongside noise traffic on other lanes
    noise = [b.submit(f"noise {i}", SamplerParams(temp=1.0, seed=100 + i),
                      n_predict=12) for i in range(2)]
    c = b.submit("seed test", sp42, n_predict=12).collect()
    for h in noise:
        h.collect()
    assert a == c
    d = b.submit("seed test", SamplerParams(temp=0.9, seed=43), n_predict=12).collect()
    assert d != a


def test_prompt_too_long_rejected(batcher):
    eng, b = batcher
    import pytest as _pytest
    with _pytest.raises(ValueError, match="prompt is too long"):
        b.submit("x" * 4000, SamplerParams(), n_predict=4)


def test_worker_survives_chunk_failure(batcher, monkeypatch):
    """A device failure mid-chunk must fail the in-flight requests (raise,
    not hang) and leave the worker serving subsequent submits."""
    import miotts_tpu.serving.batching as bmod
    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0)
    try:
        real = bmod.llm_generate_chunk_batched
        real_sliced = bmod.llm_generate_chunk_batched_sliced
        calls = {"n": 0}

        def _maybe_boom():
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected device failure")

        def boom(*a, **k):
            _maybe_boom()
            return real(*a, **k)

        def boom_sliced(*a, **k):
            _maybe_boom()
            return real_sliced(*a, **k)

        monkeypatch.setattr(bmod, "llm_generate_chunk_batched", boom)
        monkeypatch.setattr(bmod, "llm_generate_chunk_batched_sliced",
                            boom_sliced)
        # n_predict must exceed first_chunk: the fused prefill serves the
        # first first_chunk tokens without any chunk dispatch, and the
        # injected failure targets the chunk step
        h = b.submit("fail me", n_predict=40)
        with pytest.raises(RuntimeError, match="injected device failure"):
            h.collect()
        # the worker recovered: a new request completes normally
        h2 = b.submit("works again", n_predict=40)
        toks = h2.collect()
        assert len(toks) > 0
    finally:
        b.shutdown()


def test_chunk_growth_ladder(batcher, monkeypatch):
    """A long-running lane graduates from first_chunk to the steady chunk
    to chunk_max (each boundary pays a device fetch round trip), the last
    dispatch shrinks to exactly the remaining budget, and the greedy
    output still matches the single-request path. Every dispatch runs the
    ONE chunk_max-sized executable — the walked sizes are its step_cap
    operand, so the static n_steps must always be chunk_max."""
    import miotts_tpu.serving.batching as bmod
    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0)
    try:
        assert b.first_chunk == 8 and b.chunk == 8 and b.chunk_max == 16
        assert b.ladder == (8, 16)
        sizes = []
        real = bmod.llm_generate_chunk_batched
        real_sliced = bmod.llm_generate_chunk_batched_sliced

        def spy(cfg, weights, eog, size, sampler, state, cap, rem):
            assert size == b.chunk_max
            sizes.append(int(cap))
            return real(cfg, weights, eog, size, sampler, state, cap, rem)

        def spy_sliced(cfg, weights, eog, size, width, sampler, state,
                       lanes, cap, rem):
            assert size == b.chunk_max
            sizes.append(int(cap))
            return real_sliced(cfg, weights, eog, size, width, sampler,
                               state, lanes, cap, rem)

        monkeypatch.setattr(bmod, "llm_generate_chunk_batched", spy)
        monkeypatch.setattr(bmod, "llm_generate_chunk_batched_sliced",
                            spy_sliced)
        got = b.submit("hi", SamplerParams(temp=0.0), n_predict=40).collect()
    finally:
        b.shutdown()
    expect = eng.generate_audio_tokens("hi", n_predict=40, n_ctx=64,
                                       sampler=SamplerParams(temp=0.0))
    assert got == expect
    assert set(sizes) <= {8, 16}
    if len(expect) == 40:  # no early EOG: the exact ladder walk is fixed
        # first 8 tokens ride the FUSED prefill (no chunk dispatch); the
        # lane is UNCONTENDED (no other reservation), so it skips the
        # middle ladder rung and runs budget-shrunk chunk_max dispatches:
        # 16 -> 16 (2 boundaries; round-5 solo fast path)
        assert sizes == [16, 16]


def test_width_sliced_chunk_used_and_identical(batcher, monkeypatch):
    """Below full occupancy the worker dispatches the width-sliced chunk
    step (gather active lanes -> pow2-width decode -> scatter back) and
    tokens are identical to the single-request path. The full-width step
    never runs for a lone request on a 4-lane batcher."""
    import miotts_tpu.serving.batching as bmod

    eng, b = batcher
    assert b.slice_chunks
    widths, full_calls = [], []
    real_sliced = bmod.llm_generate_chunk_batched_sliced
    real_full = bmod.llm_generate_chunk_batched

    def spy_sliced(cfg, weights, eog, size, width, sampler, state, lanes,
                   *rest):
        widths.append(width)
        assert lanes.shape == (width,)
        return real_sliced(cfg, weights, eog, size, width, sampler,
                           state, lanes, *rest)

    def spy_full(*a, **k):
        full_calls.append(1)
        return real_full(*a, **k)

    monkeypatch.setattr(bmod, "llm_generate_chunk_batched_sliced", spy_sliced)
    monkeypatch.setattr(bmod, "llm_generate_chunk_batched", spy_full)
    got = b.submit("slice me", SamplerParams(temp=0.0), n_predict=12).collect()
    expect = eng.generate_audio_tokens("slice me", n_predict=12, n_ctx=64,
                                       sampler=SamplerParams(temp=0.0))
    assert got == expect
    assert widths and set(widths) == {1}  # lone request -> width-1 chunks
    assert not full_calls
    # sampled (non-greedy) lanes are seed-reproducible through the sliced
    # path too: per-lane PRNG streams are gathered/scattered with the lane
    s = SamplerParams(temp=0.9, top_k=40, seed=7)
    assert (b.submit("vary", s, n_predict=10).collect()
            == b.submit("vary", s, n_predict=10).collect())


def test_pick_width_warm_gate(batcher):
    """An un-compiled width falls back to the next compiled pow2, then to
    the full-width step — a compiled 2x-width step beats a cold compile
    stalling the cohort. While the warmup tail runs
    (split_cold_until_warm), nothing new compiles at all."""
    _eng, b = batcher
    assert b._pick_width(8, 0) is None
    assert b._pick_width(8, 5) is None  # pow2(5)=8 >= n_lanes=4 -> full
    saved = (b.split_cold_until_warm, b._warm_chunks)
    try:
        b.split_cold_until_warm = True
        b._warm_chunks = frozenset({(8, 2)})
        assert b._pick_width(8, 1) == 2   # 1 cold -> compiled 2
        assert b._pick_width(8, 2) == 2   # exact hit
        assert b._pick_width(8, 3) is None  # pow2(3)=4 cold -> full
        assert b._pick_width(16, 1) is None  # other size: nothing warmed
        b.split_cold_until_warm = False
        assert b._pick_width(8, 1) == 2   # compiled 2 still beats cold 1
        assert b._pick_width(16, 1) == 1  # nothing covers: compile natural
        # full-width registered (an occupancy ramp-UP ran it): ramp-down
        # reuses it instead of cold-compiling a narrower width
        b._warm_chunks = frozenset({(8, b.n_lanes)})
        assert b._pick_width(8, 1) is None
    finally:
        b.split_cold_until_warm, b._warm_chunks = saved


def test_warm_chunk_registers_and_releases(batcher):
    """warm_chunk compiles on a throwaway all-done state (zero decode
    steps), registers (size, width), and release_warm_state drops the
    extra KV cache."""
    _eng, b = batcher
    b.warm_chunk(width=2)
    b.warm_chunk()  # full width
    assert {(b.chunk_max, 2), (b.chunk_max, b.n_lanes)} <= set(b._warm_chunks)
    assert b._warm_state is not None
    b.release_warm_state()
    assert b._warm_state is None


def test_binary_lane_skips_first_chunk(batcher, monkeypatch):
    """A lane whose consumer does NOT read tokens incrementally
    (early_tokens=False — the binary request path) starts at the steady
    chunk instead of first_chunk: under steady arrival churn a fresh lane
    exists almost always, and letting every fresh BINARY lane pull the
    cohort's dispatch down to first_chunk cost 10 fetch round trips per
    120-token request instead of 2-3 (measured 2.5 s -> ~950 ms llm_ms at
    conc=8 on a 32-lane server). An early_tokens lane still gets the small
    TTFA-first dispatch."""
    import miotts_tpu.serving.batching as bmod
    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0,
                          first_chunk=4)
    try:
        assert b.first_chunk == 4 and b.ladder == (4, 8, 16)
        sizes = []
        real = bmod.llm_generate_chunk_batched
        real_sliced = bmod.llm_generate_chunk_batched_sliced

        def spy(cfg, weights, eog, size, sampler, state, cap, rem):
            sizes.append(int(cap))
            return real(cfg, weights, eog, size, sampler, state, cap, rem)

        def spy_sliced(cfg, weights, eog, size, width, sampler, state,
                       lanes, cap, rem):
            sizes.append(int(cap))
            return real_sliced(cfg, weights, eog, size, width, sampler,
                               state, lanes, cap, rem)

        monkeypatch.setattr(bmod, "llm_generate_chunk_batched", spy)
        monkeypatch.setattr(bmod, "llm_generate_chunk_batched_sliced",
                            spy_sliced)
        got = b.submit("hi", SamplerParams(temp=0.0), n_predict=24,
                       early_tokens=False).collect()
        binary_sizes, sizes[:] = list(sizes), []
        got_early = b.submit("hi", SamplerParams(temp=0.0),
                             n_predict=24).collect()
        early_sizes = list(sizes)
    finally:
        b.shutdown()
    expect = eng.generate_audio_tokens("hi", n_predict=24, n_ctx=64,
                                       sampler=SamplerParams(temp=0.0))
    assert got == expect and got_early == expect  # math is size-invariant
    # binary never dispatches the small TTFA-first chunk FIRST — its
    # consumer reads nothing until completion, so it votes the cap
    # outright (a trailing budget-shrunk size may coincide numerically
    # with first_chunk; that's exactness, not TTFA pacing)
    assert binary_sizes[0] != 4
    if len(expect) == 24:  # no early EOG: exact walks are fixed
        # both consumers get their first first_chunk=4 tokens from the
        # FUSED prefill (no dispatch). The binary lane then votes
        # chunk_max=16 immediately (boundaries only cost it fetch RTTs)
        # and the remaining budget (4) shrinks the final step_cap
        # exactly; the early lane is solo/uncontended, so it too skips
        # the middle rung: 16, then the remaining 4
        assert binary_sizes == [16, 4]
        assert early_sizes == [16, 4]


def test_contended_lanes_keep_middle_rung(batcher, monkeypatch):
    """With two streaming requests in flight the solo fast path must NOT
    engage: the middle ladder rung (steady chunk) stays, so fresh
    arrivals keep frequent attach boundaries (TTFA protection). The solo
    fast path is strictly an uncontended optimization."""
    import miotts_tpu.serving.batching as bmod
    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0)
    try:
        sizes = []
        real = bmod.llm_generate_chunk_batched
        real_sliced = bmod.llm_generate_chunk_batched_sliced

        def spy(cfg, weights, eog, size, sampler, state, cap, rem):
            sizes.append(int(cap))
            return real(cfg, weights, eog, size, sampler, state, cap, rem)

        def spy_sliced(cfg, weights, eog, size, width, sampler, state,
                       lanes, cap, rem):
            sizes.append(int(cap))
            return real_sliced(cfg, weights, eog, size, width, sampler,
                               state, lanes, cap, rem)

        monkeypatch.setattr(bmod, "llm_generate_chunk_batched", spy)
        monkeypatch.setattr(bmod, "llm_generate_chunk_batched_sliced",
                            spy_sliced)
        h1 = b.submit("hi", SamplerParams(temp=0.0), n_predict=40)
        h2 = b.submit("hi there", SamplerParams(temp=0.0), n_predict=40)
        got1 = h1.collect()
        got2 = h2.collect()
    finally:
        b.shutdown()
    expect1 = eng.generate_audio_tokens("hi", n_predict=40, n_ctx=64,
                                        sampler=SamplerParams(temp=0.0))
    assert got1 == expect1 and len(got2) > 0
    if len(expect1) == 40:
        # while both lanes are live the cohort walks the middle rung at
        # least once (8 = steady chunk vote under contention)
        assert 8 in sizes


def test_chunk_max_env_flat(batcher, monkeypatch):
    """MIOTTS_CHUNK_MAX=chunk restores the flat (no-growth) dispatch."""
    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    monkeypatch.setenv("MIOTTS_CHUNK_MAX", "8")
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0)
    try:
        assert b.chunk_max == 8 and b.ladder == (8,)
        got = b.submit("hi", SamplerParams(temp=0.0), n_predict=24).collect()
    finally:
        b.shutdown()
    expect = eng.generate_audio_tokens("hi", n_predict=24, n_ctx=64,
                                       sampler=SamplerParams(temp=0.0))
    assert got == expect


def test_from_arrays_engine_through_batcher(tmp_path):
    """LLMEngine.from_arrays (the llm1bserve path: in-memory stretch
    configs served without a GGUF round-trip) drives the continuous
    batcher like a loaded engine and matches it token-for-token."""
    path = tmp_path / "llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=64, seed=3)
    loaded = LLMEngine(str(path), dtype=jnp.float32)
    mem = LLMEngine.from_arrays(loaded.config, loaded.weights,
                                loaded.tokenizer, quantize="bf16")
    assert mem.token_to_code == loaded.token_to_code
    b1 = ContinuousBatcher(loaded, n_lanes=2, max_ctx=96, chunk=8)
    b2 = ContinuousBatcher(mem, n_lanes=2, max_ctx=96, chunk=8)
    try:
        sp = SamplerParams(temp=0.0, seed=1)
        t1 = b1.submit("serve me", sp, n_predict=16).collect()
        t2 = b2.submit("serve me", sp, n_predict=16).collect()
        assert t1 == t2 and len(t1) > 0
    finally:
        b1.shutdown()
        b2.shutdown()


def test_prefill_thread_survives_group_failure(batcher, monkeypatch):
    """An exception escaping _prefill_group (e.g. a failed host->device
    upload — NOT the prefill dispatch the inner try already covers) must
    fail that group's requests and leave the prefill daemon draining; a
    dead daemon would leak the reserved lanes and hang every later
    submit."""
    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0)
    try:
        real = b._prefill_group
        calls = {"n": 0}

        def boom(bucket, group):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected upload failure")
            return real(bucket, group)

        monkeypatch.setattr(b, "_prefill_group", boom)
        h = b.submit("fail in prefill", n_predict=8)
        with pytest.raises(RuntimeError, match="injected upload failure"):
            h.collect()
        # lane freed + daemon alive: a new request completes normally
        h2 = b.submit("works again", n_predict=8)
        assert len(h2.collect()) > 0
        assert any(l is None for l in b.lanes)
    finally:
        b.shutdown()


def test_worker_survives_attach_failure(batcher, monkeypatch):
    """A failed attach_lanes in the worker loop (poisoned prefill arrays
    after a device fault) must fail only that group and keep the worker
    thread alive for subsequent requests."""
    import miotts_tpu.serving.batching as bmod
    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0)
    try:
        real = bmod.attach_lanes_gen
        calls = {"n": 0}

        def boom(state, *args, **kwargs):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected attach failure")
            return real(state, *args, **kwargs)

        monkeypatch.setattr(bmod, "attach_lanes_gen", boom)
        h = b.submit("fail in attach", n_predict=8)
        with pytest.raises(RuntimeError, match="injected attach failure"):
            h.collect()
        h2 = b.submit("works again", n_predict=8)
        assert len(h2.collect()) > 0
    finally:
        b.shutdown()


def test_device_stall_watchdog(batcher):
    """device_stalled flags work-in-flight with no chunk progress past the
    threshold (the wedged-device-link signature: every call blocks forever
    instead of erroring) and clears when idle or progressing."""
    import time

    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0)
    try:
        assert not b.device_stalled  # idle
        h = b.submit("watchdog", n_predict=8)
        assert len(h.collect()) > 0
        assert not b.device_stalled  # progressed + drained
        # simulate a wedge: work marked in flight, no progress since
        b.stall_threshold_s = 0.05
        b._work_started = time.monotonic() - 1.0
        b._last_progress = time.monotonic() - 1.0
        assert b.device_stalled
        b._work_started = None
        assert not b.device_stalled
    finally:
        b.shutdown()


def test_unfused_prefill_fallback(batcher, monkeypatch):
    """MIOTTS_FUSED_PREFILL=0 restores the unfused submit path (plain
    prefill + attach + small first chunk) with identical greedy tokens;
    and a prompt bucket with no room for the fused steps falls back
    automatically (_use_fused)."""
    from miotts_tpu.serving.batching import ContinuousBatcher

    eng, _shared = batcher
    monkeypatch.setenv("MIOTTS_FUSED_PREFILL", "0")
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=160, chunk=8, seed=0)
    try:
        assert not b.fused_prefill
        got = b.submit("hi", SamplerParams(temp=0.0), n_predict=20).collect()
    finally:
        b.shutdown()
    expect = eng.generate_audio_tokens("hi", n_predict=20, n_ctx=64,
                                       sampler=SamplerParams(temp=0.0))
    assert got == expect
    monkeypatch.delenv("MIOTTS_FUSED_PREFILL")
    # bucket 32 + first_chunk 8 > max_ctx 39: fused is skipped per-bucket
    b2 = ContinuousBatcher(eng, n_lanes=2, max_ctx=39, chunk=8, seed=0)
    try:
        assert b2.fused_prefill and not b2._use_fused(32)
        got2 = b2.submit("hi", SamplerParams(temp=0.0), n_predict=4).collect()
    finally:
        b2.shutdown()
    expect2 = eng.generate_audio_tokens("hi", n_predict=4, n_ctx=64,
                                        sampler=SamplerParams(temp=0.0))
    assert got2 == expect2


def test_fused_prefill_early_eog_and_budget(batcher):
    """Requests that finish entirely inside the fused prefill steps
    (tiny n_predict) complete cleanly — tokens delivered, lane freed —
    and the lane is reusable immediately."""
    eng, b = batcher
    expect = eng.generate_audio_tokens("hello", n_predict=3, n_ctx=64,
                                       sampler=SamplerParams(temp=0.0))
    for _ in range(6):  # cycle lanes through the fused-finish path
        got = b.submit("hello", SamplerParams(temp=0.0),
                       n_predict=3).collect()
        assert got == expect
