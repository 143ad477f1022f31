"""LLM engine tests: GGUF load, numpy-oracle prefill parity, prefill/decode
consistency, generation semantics, sampler chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.models.llm import (
    LLMEngine, init_kv_cache, llm_decode_step, llm_generate, llm_prefill,
    llm_prefill_jit,
    load_llm_gguf,
)
from miotts_tpu.models.sampling import (
    SamplerParams, SamplerState, init_sampler_state, sample_token,
    update_sampler_state,
)
from miotts_tpu.gguf import GGUFReader
from miotts_tpu.testing import write_synthetic_llm_gguf


@pytest.fixture(scope="module")
def tiny_llm(tmp_path_factory):
    path = tmp_path_factory.mktemp("llm") / "tiny_llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=64, dim=32, n_layers=2,
                             n_heads=4, n_kv_heads=2, ffn=64, seed=0)
    cfg, w, tok = load_llm_gguf(str(path), dtype=jnp.float32)
    with GGUFReader(path) as r:
        raw = {name: np.array(r.tensor(name)) for name in r.tensors}
    return str(path), cfg, w, tok, raw


def _oracle_prefill_logits(cfg, raw, tokens):
    """Plain-numpy qwen2 forward: RMSNorm, NEOX RoPE, GQA, SwiGLU."""
    def rms(x, g, eps=1e-6):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def rope_neox(x, pos, base):
        T, H, D = x.shape
        half = D // 2
        inv = base ** (-2.0 * np.arange(half) / D)
        ang = pos[:, None] * inv
        c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        x0, x1 = x[..., :half], x[..., half:]
        return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)

    x = raw["token_embd.weight"][tokens].astype(np.float64)
    T = len(tokens)
    pos = np.arange(T)
    hd = cfg.head_dim
    group = cfg.n_heads // cfg.n_kv_heads
    for i in range(cfg.n_layers):
        xn = rms(x, raw[f"blk.{i}.attn_norm.weight"], cfg.rms_eps)
        q = xn @ raw[f"blk.{i}.attn_q.weight"].T + raw[f"blk.{i}.attn_q.bias"]
        k = xn @ raw[f"blk.{i}.attn_k.weight"].T + raw[f"blk.{i}.attn_k.bias"]
        v = xn @ raw[f"blk.{i}.attn_v.weight"].T + raw[f"blk.{i}.attn_v.bias"]
        q = rope_neox(q.reshape(T, cfg.n_heads, hd), pos, cfg.rope_base)
        k = rope_neox(k.reshape(T, cfg.n_kv_heads, hd), pos, cfg.rope_base)
        v = v.reshape(T, cfg.n_kv_heads, hd)
        att = np.zeros((T, cfg.n_heads, hd))
        for h in range(cfg.n_heads):
            kh = k[:, h // group, :]
            vh = v[:, h // group, :]
            scores = q[:, h, :] @ kh.T / np.sqrt(hd)
            scores += np.where(np.tril(np.ones((T, T))) > 0, 0.0, -np.inf)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            att[:, h, :] = p @ vh
        x = x + att.reshape(T, -1) @ raw[f"blk.{i}.attn_output.weight"].T
        fn = rms(x, raw[f"blk.{i}.ffn_norm.weight"], cfg.rms_eps)
        gate = fn @ raw[f"blk.{i}.ffn_gate.weight"].T
        up = fn @ raw[f"blk.{i}.ffn_up.weight"].T
        x = x + ((gate / (1 + np.exp(-gate))) * up) @ raw[f"blk.{i}.ffn_down.weight"].T
    xn = rms(x, raw["output_norm.weight"], cfg.rms_eps)
    return xn @ raw["output.weight"].T


def test_prefill_matches_oracle(tiny_llm):
    _, cfg, w, tok, raw = tiny_llm
    tokens = np.array([5, 200, 17, 92, 260, 3], np.int32)
    ref = _oracle_prefill_logits(cfg, raw, tokens)

    ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    last, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w, jnp.asarray(tokens)[None], jnp.asarray([len(tokens)], jnp.int32), ck, cv)
    np.testing.assert_allclose(np.array(last[0]), ref[-1], rtol=2e-3, atol=2e-4)


def test_prefill_padding_invariance(tiny_llm):
    _, cfg, w, tok, raw = tiny_llm
    tokens = np.array([5, 200, 17, 92], np.int32)
    ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    fwd = jax.jit(llm_prefill, static_argnums=0)
    a, _, _ = fwd(cfg, w, jnp.asarray(tokens)[None], jnp.asarray([4], jnp.int32), ck, cv)
    padded = np.zeros(12, np.int32)
    padded[:4] = tokens
    b, _, _ = fwd(cfg, w, jnp.asarray(padded)[None], jnp.asarray([4], jnp.int32), ck, cv)
    np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-5, atol=1e-6)


def test_decode_step_consistency(tiny_llm):
    """prefill([t0..t3]) last-logits == prefill([t0..t2]) then decode(t3)."""
    _, cfg, w, tok, raw = tiny_llm
    tokens = np.array([5, 200, 17, 92], np.int32)
    fwd = jax.jit(llm_prefill, static_argnums=0)
    step = jax.jit(llm_decode_step, static_argnums=0)

    ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    full, _, _ = fwd(cfg, w, jnp.asarray(tokens)[None], jnp.asarray([4], jnp.int32), ck, cv)

    ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    _, ck, cv = fwd(cfg, w, jnp.asarray(tokens[:3])[None], jnp.asarray([3], jnp.int32), ck, cv)
    got, _, _ = step(cfg, w, jnp.asarray([92], jnp.int32), jnp.asarray([3], jnp.int32), ck, cv)
    np.testing.assert_allclose(np.array(got), np.array(full), rtol=2e-4, atol=2e-5)


def test_batched_decode_lanes_independent(tiny_llm):
    _, cfg, w, tok, raw = tiny_llm
    fwd = jax.jit(llm_prefill, static_argnums=0)
    t1 = np.array([5, 200, 17], np.int32)
    t2 = np.array([260, 9, 92, 33, 7], np.int32)
    batch = np.zeros((2, 5), np.int32)
    batch[0, :3] = t1
    batch[1, :] = t2
    ck, cv = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    both, _, _ = fwd(cfg, w, jnp.asarray(batch), jnp.asarray([3, 5], jnp.int32), ck, cv)
    ck1, cv1 = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    one, _, _ = fwd(cfg, w, jnp.asarray(t1)[None], jnp.asarray([3], jnp.int32), ck1, cv1)
    np.testing.assert_allclose(np.array(both[0]), np.array(one[0]), rtol=1e-5, atol=1e-6)


def test_prefill_kv_attach_matches_single_lane(tiny_llm):
    """The batched submit path (llm_prefill_kv + attach_lanes) must install
    exactly the state the legacy path (llm_prefill into a B=1 cache +
    attach_lane) did: same lane logits, same cache content over the prompt
    span, and pad rows (out-of-range lane index) must drop."""
    from miotts_tpu.models.llm import (
        attach_lane, attach_lanes, init_batched_state, llm_prefill_kv,
    )

    _, cfg, w, tok, raw = tiny_llm
    n_lanes, max_ctx = 4, 32
    prompts = [np.array([5, 200, 17], np.int32),
               np.array([260, 9, 92, 33, 7], np.int32),
               np.array([42, 3], np.int32)]
    T = 8  # prompt bucket
    toks = np.zeros((4, T), np.int32)  # padded to pow2 lanes (3 -> 4)
    lens = np.ones(4, np.int32)
    for i, p in enumerate(prompts):
        toks[i, :len(p)] = p
        lens[i] = len(p)
    lanes = np.array([2, 0, 3, n_lanes], np.int32)  # pad row -> OOB drop
    seeds = np.array([7, 8, 9, 0], np.uint32)

    kv_fwd = jax.jit(llm_prefill_kv, static_argnums=0)
    logits_k, new_k, new_v = kv_fwd(cfg, w, jnp.asarray(toks),
                                    jnp.asarray(lens))
    state = init_batched_state(cfg, n_lanes, max_ctx, seed=0)
    state = attach_lanes(state, jnp.asarray(lanes), logits_k, new_k, new_v,
                         jnp.asarray(lens), jnp.asarray(seeds))

    ref = init_batched_state(cfg, n_lanes, max_ctx, seed=0)
    fwd = jax.jit(llm_prefill, static_argnums=0)
    for i, p in enumerate(prompts):
        ck1, cv1 = init_kv_cache(cfg, 1, max_ctx, dtype=ref.cache_k.dtype)
        row = np.zeros((1, T), np.int32)
        row[0, :len(p)] = p
        l1, ck1, cv1 = fwd(cfg, w, jnp.asarray(row),
                           jnp.asarray([len(p)], jnp.int32), ck1, cv1)
        ref = attach_lane(ref, jnp.int32(lanes[i]), l1, ck1, cv1,
                          jnp.int32(len(p)), jnp.uint32(seeds[i]))

    np.testing.assert_allclose(np.asarray(state.logits),
                               np.asarray(ref.logits), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(state.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(state.done),
                                  np.asarray(ref.done))
    np.testing.assert_array_equal(np.asarray(state.key), np.asarray(ref.key))
    # cache must agree over each attached lane's prompt span (beyond it the
    # batched path leaves stale values that decode can never attend)
    ck = np.asarray(state.cache_k)
    ck_ref = np.asarray(ref.cache_k)
    for i, p in enumerate(prompts):
        lane, n = int(lanes[i]), len(p)
        np.testing.assert_allclose(ck[:, lane, :n], ck_ref[:, lane, :n],
                                   rtol=1e-5, atol=1e-6)
    # untouched lane (1) stays zero; the pad row wrote nowhere
    assert not np.any(ck[:, 1])


def test_engine_generate_and_codes(tiny_llm):
    path, cfg, w, tok, raw = tiny_llm
    eng = LLMEngine(path, dtype=jnp.float32)
    assert len(eng.token_to_code) == 64
    toks = eng.generate_audio_tokens("hi", n_predict=16, n_ctx=64,
                                     sampler=SamplerParams(temp=0.8, seed=1))
    assert 0 < len(toks) <= 16
    codes = eng.tokens_to_codes(toks)
    assert all(0 <= c < 64 for c in codes)
    # greedy must be deterministic
    g1 = eng.generate_audio_tokens("hi", n_predict=8, sampler=SamplerParams(temp=0.0))
    g2 = eng.generate_audio_tokens("hi", n_predict=8, sampler=SamplerParams(temp=0.0))
    assert g1 == g2


def test_tokenizer_specials_roundtrip(tiny_llm):
    _, cfg, w, tok, raw = tiny_llm
    ids = tok.encode("<|im_start|>user\nhi there<|im_end|>\n", parse_special=True)
    assert tok.token_to_id["<|im_start|>"] in ids
    assert tok.token_to_id["<|im_end|>"] in ids
    assert tok.decode(ids, special=True) == "<|im_start|>user\nhi there<|im_end|>\n"
    # audio token pieces
    sid = tok.token_to_id["<|s_5|>"]
    assert tok.token_piece(sid) == "<|s_5|>"


def test_sampler_greedy_topk_penalty():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 4.0, -1.0]])
    state = init_sampler_state(1)
    key = jax.random.PRNGKey(0)
    # greedy
    t = sample_token(logits, SamplerParams(temp=0.0, top_k=0), state, key)
    assert int(t[0]) == 1
    # top-k=1 equals argmax even with temperature
    t = sample_token(logits, SamplerParams(temp=1.0, top_k=1), state, key)
    assert int(t[0]) == 1
    # repeat penalty pushes down a recently sampled token
    state = update_sampler_state(state, jnp.asarray([1], jnp.int32))
    t = sample_token(logits, SamplerParams(temp=0.0, top_k=0, repeat_penalty=10.0),
                     state, key)
    assert int(t[0]) == 3  # 5/10=0.5 < 4.0
    # top-p keeps at least one candidate
    t = sample_token(logits, SamplerParams(temp=1.0, top_p=1e-6), init_sampler_state(1), key)
    assert int(t[0]) == 1


def test_sampler_distribution_matches_softmax():
    """Distributional conformance (token-exact RNG parity is impossible)."""
    logits = jnp.asarray([[0.0, 1.0, 2.0]])
    params = SamplerParams(temp=1.0, top_k=0, top_p=1.0)
    state = init_sampler_state(1)
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    toks = jax.vmap(lambda k: sample_token(logits, params, state, k))(keys)
    counts = np.bincount(np.array(toks).ravel(), minlength=3) / 4000
    expect = np.exp([0, 1, 2]) / np.exp([0, 1, 2]).sum()
    np.testing.assert_allclose(counts, expect, atol=0.03)


def test_bpe_merges_priority():
    """BPE must apply lowest-rank merges first (GPT-2 semantics)."""
    from miotts_tpu.runtime.tokenizer import BPETokenizer, TOKEN_TYPE_NORMAL

    tokens = ["h", "e", "l", "o", "he", "ll", "llo", "hello", "hel"]
    merges = ["h e", "l l", "ll o", "he llo"]  # ranks 0..3
    tok = BPETokenizer(tokens, merges, [TOKEN_TYPE_NORMAL] * len(tokens))
    ids = tok.encode("hello", parse_special=False)
    assert [tok.tokens[i] for i in ids] == ["hello"]
    # without the final merge, best available segmentation applies
    tok2 = BPETokenizer(tokens, merges[:3], [TOKEN_TYPE_NORMAL] * len(tokens))
    ids2 = tok2.encode("hello", parse_special=False)
    assert [tok2.tokens[i] for i in ids2] == ["he", "llo"]


def test_bpe_byte_fallback_and_specials_mix():
    from miotts_tpu.runtime.tokenizer import BPETokenizer, TOKEN_TYPE_CONTROL, TOKEN_TYPE_NORMAL
    from miotts_tpu.testing import synthetic_vocab

    tokens, types = synthetic_vocab(n_audio=4)
    tok = BPETokenizer(tokens, [], types)
    text = "ab<|s_2|>c"
    ids = tok.encode(text, parse_special=True)
    assert tok.decode(ids, special=True) == text
    # special must map to one control token
    sid = tok.token_to_id["<|s_2|>"]
    assert ids.count(sid) == 1


def test_unicode_prompt_tokenizes(tiny_llm):
    """Japanese text must survive pretokenization (primary model language)."""
    _, cfg, w, tok, raw = tiny_llm
    ids = tok.encode("こんにちは、世界。", parse_special=False)
    assert len(ids) > 0
    assert tok.decode(ids) == "こんにちは、世界。"


def test_exact_top_k_matches_lax_top_k():
    """The tile-max prefilter top-k (sampling.exact_top_k) must be exact:
    identical values and an index set selecting those same values, across
    vocab sizes that exercise the padded/unpadded and degenerate paths."""
    from miotts_tpu.models.sampling import exact_top_k

    rng = np.random.RandomState(7)
    for V, k in [(151_936, 50), (151_936, 256), (152_000, 1),
                 (12_345, 50), (4_000, 17), (300, 50), (64, 8)]:
        x = jnp.asarray(rng.randn(3, V).astype(np.float32))
        v, i = jax.jit(lambda a: exact_top_k(a, k))(x)
        ve, ie = jax.lax.top_k(x, min(k, V))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(ve))
        # ties may legally report a different index with the same value
        gathered = np.take_along_axis(np.asarray(x), np.asarray(i), axis=1)
        np.testing.assert_array_equal(gathered, np.asarray(ve))
        assert all(len(set(row)) == len(row) for row in np.asarray(i))


def test_sampler_topk_disabled_full_vocab():
    """top_k<=0 must not truncate (reference: no top-k filter is added)."""
    V = 5000
    rng = np.random.RandomState(0)
    base = rng.randn(V).astype(np.float32) * 0.01
    base[4321] = 50.0  # far outside any top-256 pool if truncation ignored it
    logits = jnp.asarray(base)[None]
    state = init_sampler_state(1)
    t = sample_token(logits, SamplerParams(temp=1.0, top_k=0, top_p=0.9),
                     state, jax.random.PRNGKey(0))
    assert int(t[0]) == 4321
    t = sample_token(logits, SamplerParams(temp=1.0, top_k=0, top_p=1.0),
                     state, jax.random.PRNGKey(0))
    assert int(t[0]) == 4321


def test_unfused_load_matches_fused(tmp_path, monkeypatch):
    """MIOTTS_LLM_FUSE=0 keeps the separate-projection leaves working (the
    layout an operator pins for whole-projection tp shards): same logits and
    same greedy tokens as the fused default."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from miotts_tpu.models.llm import (
        SamplerParams, init_kv_cache, llm_generate, llm_prefill, load_llm_gguf,
    )
    from miotts_tpu.testing import write_synthetic_llm_gguf

    path = tmp_path / "llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=64, dim=64, n_layers=2,
                             n_heads=4, n_kv_heads=2, ffn=96, seed=3)
    cfg_f, w_f, tok = load_llm_gguf(str(path), dtype=jnp.float32)
    monkeypatch.setenv("MIOTTS_LLM_FUSE", "0")
    cfg_u, w_u, _ = load_llm_gguf(str(path), dtype=jnp.float32)
    assert cfg_f == cfg_u
    assert "wqkv" in w_f and "wq" in w_u and "w_gateup" in w_f and "w_gate" in w_u

    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 200, size=(2, 8)).astype(np.int32)
    lengths = jnp.asarray([8, 6], jnp.int32)
    ck, cv = init_kv_cache(cfg_f, 2, 32, dtype=jnp.float32)
    ref, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg_f, w_f, jnp.asarray(tokens), lengths, ck, cv)
    ck, cv = init_kv_cache(cfg_u, 2, 32, dtype=jnp.float32)
    got, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg_u, w_u, jnp.asarray(tokens), lengths, ck, cv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    eog = jnp.asarray([tok.eos_id], jnp.int32)
    ck, cv = init_kv_cache(cfg_f, 2, 48, dtype=jnp.float32)
    out_f, n_f = llm_generate(cfg_f, w_f, jnp.asarray(tokens), lengths, eog,
                              jax.random.PRNGKey(0), 8,
                              SamplerParams(temp=0.0), ck, cv)
    ck, cv = init_kv_cache(cfg_u, 2, 48, dtype=jnp.float32)
    out_u, n_u = llm_generate(cfg_u, w_u, jnp.asarray(tokens), lengths, eog,
                              jax.random.PRNGKey(0), 8,
                              SamplerParams(temp=0.0), ck, cv)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_u))
    np.testing.assert_array_equal(np.asarray(n_f), np.asarray(n_u))


def test_output_layout_parity(tiny_llm, monkeypatch):
    """Token-major ([V, D], the CPU default) and feature-major ([D, V], the
    TPU default) logits heads produce identical prefill logits and greedy
    generations — the layout is a pure performance choice."""
    path, *_ = tiny_llm
    outs = {}
    for layout in ("token", "feature"):
        monkeypatch.setenv("MIOTTS_OUTPUT_LAYOUT", layout)
        cfg, w, tok = load_llm_gguf(path, dtype=jnp.float32)
        assert cfg.output_token_major == (layout == "token")
        V = len(tok.tokens)
        assert w["output"].shape == ((V, cfg.dim) if layout == "token"
                                     else (cfg.dim, V))
        prompt = jnp.asarray(np.arange(8, dtype=np.int32)[None])
        plen = jnp.asarray([8], jnp.int32)
        ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        logits, _, _ = llm_prefill_jit(cfg, w, prompt, plen, ck, cv)
        eng = LLMEngine(path, dtype=jnp.float32)
        toks = eng.generate_audio_tokens("layout parity", n_predict=12,
                                         sampler=SamplerParams(temp=0.0))
        outs[layout] = (np.asarray(logits), toks)
    np.testing.assert_allclose(outs["token"][0], outs["feature"][0],
                               rtol=1e-5, atol=1e-6)
    assert outs["token"][1] == outs["feature"][1]


def test_decode_attention_pallas_matches_xla_interpret():
    """The fused decode-attention kernel (interpret mode — CPU coverage of
    the kernel math) matches the XLA path across cache dtypes, GQA
    geometries and ragged pos (incl. an empty-cache lane)."""
    from miotts_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas, decode_attention_xla)

    rng = np.random.RandomState(0)
    cases = [(3, 40, 2, 6, 64, jnp.float32),
             (2, 33, 2, 6, 64, jnp.bfloat16),
             (1, 16, 4, 3, 64, jnp.float32)]
    for B, S, KVH, G, HD, cdt in cases:
        q = jnp.asarray(rng.randn(B, KVH, G, HD).astype(np.float32),
                        jnp.bfloat16)
        kc = jnp.asarray(rng.randn(B, KVH, HD).astype(np.float32), cdt)
        vc = jnp.asarray(rng.randn(B, KVH, HD).astype(np.float32), cdt)
        ck = jnp.asarray(rng.randn(B, S, KVH, HD).astype(np.float32), cdt)
        cv = jnp.asarray(rng.randn(B, S, KVH, HD).astype(np.float32), cdt)
        pos = jnp.asarray(rng.randint(0, S, B), jnp.int32).at[0].set(0)
        scale = 1.0 / np.sqrt(HD)
        a = decode_attention_xla(q, kc, vc, ck, cv, scale, pos)
        b = decode_attention_pallas(q, kc, vc, ck, cv, scale, pos,
                                    out_dtype=jnp.float32, interpret=True)
        tol = 2e-2 if cdt == jnp.bfloat16 else 1e-5
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=tol)


def test_decode_step_pallas_interpret_matches_xla(tiny_llm):
    """The full decode step routed through the Pallas kernel (interpret
    mode) generates the same greedy tokens as the XLA attention path."""
    import dataclasses

    path, cfg, w, tok, raw = tiny_llm
    outs = {}
    for impl in ("xla", "pallas_interpret"):
        c = dataclasses.replace(cfg, decode_attn=impl)
        prompt = jnp.asarray(np.arange(6, dtype=np.int32)[None])
        ck, cv = init_kv_cache(c, 1, 48, dtype=jnp.float32)
        out, n = llm_generate(c, w, prompt, jnp.asarray([6], jnp.int32),
                              jnp.asarray([-1], jnp.int32),
                              jax.random.PRNGKey(0), 10,
                              SamplerParams(temp=0.0), ck, cv)
        outs[impl] = np.asarray(out)
    np.testing.assert_array_equal(outs["xla"], outs["pallas_interpret"])


def test_batcher_mesh_pins_xla_decode_attention(tiny_llm):
    """A mesh-owning ContinuousBatcher must pin decode_attn="xla": a
    pallas_call is opaque to the GSPMD partitioner, so a sharded chunk
    step dispatching the kernel would fail to partition on real
    multi-chip TPU while every CPU test stays green."""
    from miotts_tpu.parallel.mesh import make_mesh
    from miotts_tpu.serving.batching import ContinuousBatcher

    path, *_ = tiny_llm
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    eng = LLMEngine(path, dtype=jnp.float32)
    assert eng.config.decode_attn == "auto"
    mesh = make_mesh(devs[:2], tp=1)
    b = ContinuousBatcher(eng, n_lanes=2, max_ctx=64, chunk=4, mesh=mesh)
    try:
        assert b.cfg.decode_attn == "xla"
        assert eng.config.decode_attn == "xla"
    finally:
        b.shutdown()


def test_unknown_decode_attn_warns_and_runs_xla(tiny_llm, capsys):
    """A typo'd decode_attn value must not silently measure the wrong
    implementation: warn on stderr and run the XLA path."""
    import dataclasses

    from miotts_tpu.models.llm import _resolve_decode_attn

    path, cfg, w, tok, raw = tiny_llm
    c = dataclasses.replace(cfg, decode_attn="palas")
    assert _resolve_decode_attn(c) == "xla"
    assert "unknown decode_attn" in capsys.readouterr().err
