"""Multi-device sharding tests on the virtual 8-device CPU mesh:
tp-sharded LLM must produce identical results to single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.models.llm import (
    SamplerParams, init_kv_cache, llm_generate, llm_prefill, load_llm_gguf,
)
from miotts_tpu.parallel.mesh import (
    llm_data_shardings, make_mesh, shard_llm_weights,
)
from miotts_tpu.testing import write_synthetic_llm_gguf


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    path = tmp_path_factory.mktemp("par") / "llm.gguf"
    # dims divisible by tp=4: heads 8, kv 8 (head grouping must split evenly)
    write_synthetic_llm_gguf(str(path), n_audio=64, dim=64, n_layers=2,
                             n_heads=8, n_kv_heads=8, ffn=128, seed=0)
    return load_llm_gguf(str(path), dtype=jnp.float32)


def test_mesh_shapes():
    mesh = make_mesh(jax.devices()[:8], tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(jax.devices()[:8], tp=1)
    assert mesh.shape == {"dp": 8, "tp": 1}


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_sharded_prefill_matches_single_device(llm, tp):
    cfg, w, tok = llm
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 200, size=(2, 8)).astype(np.int32)
    lengths = np.asarray([8, 5], np.int32)

    ck, cv = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    ref, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w, jnp.asarray(tokens), jnp.asarray(lengths), ck, cv)

    mesh = make_mesh(jax.devices()[: 2 * tp], tp=tp)
    with mesh:
        ws = shard_llm_weights(mesh, w)
        data = llm_data_shardings(mesh)
        toks_s = jax.device_put(tokens, data["tokens"])
        len_s = jax.device_put(lengths, data["lengths"])
        ck, cv = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
        ck = jax.device_put(np.asarray(ck), data["cache"])
        cv = jax.device_put(np.asarray(cv), data["cache"])
        got, _, _ = jax.jit(llm_prefill, static_argnums=0)(
            cfg, ws, toks_s, len_s, ck, cv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_sharded_greedy_generation_matches(llm):
    cfg, w, tok = llm
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, 200, size=(2, 8)).astype(np.int32)
    lengths = jnp.asarray([8, 8], jnp.int32)
    eog = jnp.asarray([tok.eos_id], jnp.int32)
    sampler = SamplerParams(temp=0.0)
    key = jax.random.PRNGKey(0)

    ck, cv = init_kv_cache(cfg, 2, 48, dtype=jnp.float32)
    ref, ref_n = llm_generate(cfg, w, jnp.asarray(tokens), lengths, eog, key,
                              8, sampler, ck, cv)

    mesh = make_mesh(jax.devices()[:8], tp=4)
    with mesh:
        ws = shard_llm_weights(mesh, w)
        data = llm_data_shardings(mesh)
        ck, cv = init_kv_cache(cfg, 2, 48, dtype=jnp.float32)
        got, got_n = llm_generate(
            cfg, ws, jax.device_put(tokens, data["tokens"]),
            jax.device_put(np.asarray(lengths), data["lengths"]), eog, key,
            8, sampler,
            jax.device_put(np.asarray(ck), data["cache"]),
            jax.device_put(np.asarray(cv), data["cache"]))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(ref_n))


@pytest.fixture(scope="module")
def llm_int8(tmp_path_factory):
    path = tmp_path_factory.mktemp("par8") / "llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=64, dim=64, n_layers=2,
                             n_heads=8, n_kv_heads=8, ffn=128, seed=0)
    return load_llm_gguf(str(path), dtype=jnp.float32, quantize="int8")


def test_tp_sharded_int8_prefill_matches_single_device(llm_int8):
    """W8A8 leaves ({"q8","s8"}) shard with megatron tp specs and reproduce
    the single-device int8 logits (same quantized numerics, different
    partitioning)."""
    cfg, w, tok = llm_int8
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, 200, size=(2, 8)).astype(np.int32)
    lengths = np.asarray([8, 6], np.int32)

    ck, cv = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    ref, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w, jnp.asarray(tokens), jnp.asarray(lengths), ck, cv)

    mesh = make_mesh(jax.devices()[:4], tp=2)
    with mesh:
        ws = shard_llm_weights(mesh, w)
        # int8 payload sharded over tp on the column-parallel leaves
        assert ws["wqkv"]["q8"].sharding.spec == jax.sharding.PartitionSpec(
            None, None, "tp")
        assert ws["wqkv"]["s8"].sharding.spec == jax.sharding.PartitionSpec(
            None, "tp")
        assert ws["wo"]["q8"].sharding.spec == jax.sharding.PartitionSpec(
            None, "tp", None)
        data = llm_data_shardings(mesh)
        toks_s = jax.device_put(tokens, data["tokens"])
        len_s = jax.device_put(lengths, data["lengths"])
        ck, cv = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
        ck = jax.device_put(np.asarray(ck), data["cache"])
        cv = jax.device_put(np.asarray(cv), data["cache"])
        got, _, _ = jax.jit(llm_prefill, static_argnums=0)(
            cfg, ws, toks_s, len_s, ck, cv)
    # int32 partial dots psum exactly; activation-quant scales are global ->
    # near-exact agreement (f32 scale multiplies reorder slightly)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tp_sharded_int8_generation_runs(llm_int8):
    cfg, w, tok = llm_int8
    mesh = make_mesh(jax.devices()[:4], tp=2)
    rng = np.random.RandomState(2)
    tokens = rng.randint(0, 200, size=(2, 6)).astype(np.int32)
    with mesh:
        ws = shard_llm_weights(mesh, w)
        data = llm_data_shardings(mesh)
        toks_s = jax.device_put(tokens, data["tokens"])
        len_s = jax.device_put(np.asarray([6, 6], np.int32), data["lengths"])
        ck, cv = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
        ck = jax.device_put(np.asarray(ck), data["cache"])
        cv = jax.device_put(np.asarray(cv), data["cache"])
        out, n = llm_generate(cfg, ws, toks_s, len_s,
                              jnp.asarray([-1], jnp.int32),
                              jax.random.PRNGKey(0), 8,
                              SamplerParams(temp=0.8), ck, cv)
    assert np.asarray(n).tolist() == [8, 8]
    assert (np.asarray(out) >= 0).all()
