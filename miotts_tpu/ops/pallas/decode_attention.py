"""Fused KV-cache decode attention for the LLM decode step.

The 0.1B decode step is latency-bound: ~170 serialized kernels per step
hide all the weight DMA (DESIGN.md "LLM" section), so per-layer op count
is the step-time lever. XLA lowers one layer's cache attention as ~5 ops
(scores einsum, mask where, softmax, probs cast, value einsum); this
kernel runs the whole thing — current-token score included — as ONE
pallas_call per layer.

Shapes exploit the MioTTS geometry: the KV cache's (KVH, HD) trails are
viewed as one C = KVH*HD axis (a free reshape on the caller side — row-
major contiguity), which for the 0.1B is exactly 128 lanes. Queries build
a block-diagonal [KVH*G, C] tile in-kernel so the per-kv-head scores for
every query head come out of a single MXU dot against the [S, C] cache
view; the value pass reuses the same trick and folds the off-diagonal
blocks away with static lane slices.

The kernel reads the cache STRICTLY below pos and takes the current
token's k/v as separate operands — so callers can defer the cache scatter
to one batched [L, B] write per step (2 scatters instead of 2*n_layers)
without the attention ever seeing a stale slot.

Reference surface matched: llama.cpp's per-token KV-cache attention as
driven by mio-tts-cli.cpp:1042-1058 (scores/softmax in f32, values bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def decode_attention_xla(q, k_cur, v_cur, cache_k, cache_v, scale, pos):
    """Reference XLA path, same operand contract as the kernel.

    q: [B, KVH, G, HD]; k_cur/v_cur: [B, KVH, HD] (cache dtype);
    cache_k/cache_v: [B, S, KVH, HD]; pos: [B] int32.
    Returns att [B, KVH*G*HD] f32-accumulated, cache-dtype values.
    """
    B, S = cache_k.shape[:2]
    kmask = jnp.arange(S, dtype=jnp.int32)[None, :] < pos[:, None]
    scores = jnp.einsum("bngd,bsnd->bngs", q, cache_k,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(kmask[:, None, None, :], scores, -jnp.inf)
    s_cur = jnp.einsum("bngd,bnd->bng", q, k_cur,
                       preferred_element_type=jnp.float32)[..., None] * scale
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_cur)
    e = jnp.where(kmask[:, None, None, :], jnp.exp(scores - m), 0.0)
    e_cur = jnp.exp(s_cur - m)
    denom = jnp.sum(e, axis=-1, keepdims=True) + e_cur
    probs = (e / denom).astype(cache_v.dtype)
    att = jnp.einsum("bngs,bsnd->bngd", probs, cache_v)
    att = att + (e_cur / denom).astype(att.dtype) * v_cur[:, :, None, :].astype(att.dtype)
    return att.reshape(B, -1)


def _kernel(pos_ref, q_ref, kc_ref, vc_ref, ck_ref, cv_ref, out_ref,
            *, scale: float, kvh: int, g: int, hd: int, lb: int,
            n_lanes: int):
    """Lane-blocked body: one program handles ``lb`` lanes with TWO wide
    MXU dots. Queries stack into [lb*NG, C] rows whose per-kv-head columns
    are block-diagonal; keys/values stack into [lb*S, C]. The cross-lane
    score blocks the big dot produces are masked off before softmax (and
    contribute exact zeros to the value dot), so the extra MXU work buys
    one kernel + two dense dots instead of per-lane skinny ones — the
    per-lane grid variant measured even with plain XLA (0.724 vs 0.728
    ms/step); the win is in batching the rows."""
    import jax.experimental.pallas as pl

    S = ck_ref.shape[1]
    NG = kvh * g
    R = lb * NG  # score rows
    base = pl.program_id(0) * lb

    q = q_ref[...].astype(ck_ref.dtype)  # [lb, KVH, G, HD]
    qf = q.reshape(R, hd)  # leading-dim merge: row r = (lane, n, g)
    # row r's kv head: n(r) = (r % NG) // g; its lane: r // NG
    r2 = jax.lax.broadcasted_iota(jnp.int32, (R, kvh * hd), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (R, kvh * hd), 1)
    row_n = (r2 % NG) // g
    q_big = jnp.where(c2 // hd == row_n,
                      jnp.concatenate([qf] * kvh, axis=1), 0)  # [R, C]

    ck = ck_ref[...].reshape(lb * S, kvh * hd)  # [lb*S, C]
    scores = jax.lax.dot_general(
        q_big, ck, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [R, lb*S]

    # per-row pos (clamped: the last grid block may pad past n_lanes)
    pos_rows = jnp.concatenate(
        [jnp.full((NG, 1),
                  pos_ref[jnp.minimum(base + b, n_lanes - 1), 0], jnp.int32)
         for b in range(lb)], axis=0)  # [R, 1]

    rr = jax.lax.broadcasted_iota(jnp.int32, (R, lb * S), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (R, lb * S), 1)
    same_lane = (rr // NG) == (cc // S)
    valid = same_lane & ((cc % S) < pos_rows)
    scores = jnp.where(valid, scores, -jnp.inf)

    # current token: k/v ride in as operands (cache slot at pos may be
    # stale — callers batch the scatter after the layer stack). Row r
    # wants kc[lane(r), n(r)]: a one-hot gather dot.
    kc = kc_ref[...].astype(jnp.float32).reshape(lb * kvh, hd)
    vc = vc_ref[...].astype(jnp.float32).reshape(lb * kvh, hd)
    if n_lanes % lb:
        # ragged last block: pad-lane rows are garbage (NaN in interpret
        # mode) and 0*NaN poisons the one-hot gather dots below
        selr = jax.lax.broadcasted_iota(jnp.int32, (lb * kvh, hd), 0) // kvh
        kc = jnp.where(base + selr < n_lanes, kc, 0)
        vc = jnp.where(base + selr < n_lanes, vc, 0)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (R, lb * kvh), 0)
    csel = jax.lax.broadcasted_iota(jnp.int32, (R, lb * kvh), 1)
    sel = ((rsel // NG) * kvh + (rsel % NG) // g == csel).astype(jnp.float32)
    kc_rows = jax.lax.dot_general(
        sel, kc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [R, HD]
    s_cur = jnp.sum(qf.astype(jnp.float32) * kc_rows, axis=1,
                    keepdims=True) * scale  # [R, 1]

    m = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), s_cur)
    e = jnp.where(valid, jnp.exp(scores - m), 0.0)
    e_cur = jnp.exp(s_cur - m)
    denom = jnp.sum(e, axis=1, keepdims=True) + e_cur
    probs = (e / denom).astype(cv_ref.dtype)

    cv = cv_ref[...].reshape(lb * S, kvh * hd)
    if n_lanes % lb:
        # ragged last block: padded lanes carry garbage (NaN in interpret
        # mode) and 0*NaN poisons the value dot's accumulation — zero the
        # pad rows. Statically skipped when the grid divides evenly.
        kvr = jax.lax.broadcasted_iota(jnp.int32, (lb * S, kvh * hd), 0) // S
        cv = jnp.where(base + kvr < n_lanes, cv, 0)
    att2 = jax.lax.dot_general(
        probs, cv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [R, C]
    # fold the block-diagonal back to [R, HD]: row r wants cols
    # [n(r)*HD, (n(r)+1)*HD). Static lane slices + row masks instead of a
    # lane-splitting reshape (Mosaic-friendly).
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (R, hd), 0)
    att_d = jnp.zeros((R, hd), jnp.float32)
    for n in range(kvh):
        att_d = att_d + jnp.where((r_idx % NG) // g == n,
                                  att2[:, n * hd:(n + 1) * hd], 0.0)
    vc_rows = jax.lax.dot_general(
        sel, vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    att_d = att_d + (e_cur / denom) * vc_rows
    out_ref[...] = att_d.reshape(lb, NG, hd).astype(out_ref.dtype)


def _pick_lane_block(B: int, S: int, C: int, NG: int) -> int:
    """Largest pow2 lane block (<= 8) whose working set stays well under
    VMEM. Per block: 2*lb*S*C cache bytes (bf16 as f32 in-flight ~ 4B/elem
    charged) plus the score/e/probs/mask arrays, which are
    [lb*NG, lb*S] — QUADRATIC in lb (~12 f32-equivalent bytes per cell)."""
    lb = 1
    while True:
        nxt = lb * 2
        if nxt > min(B, 8) or nxt * S * (4 * C + 12 * NG * nxt) > 8_000_000:
            return lb
        lb = nxt


def decode_attention_pallas(q, k_cur, v_cur, cache_k, cache_v, scale, pos,
                            out_dtype=jnp.bfloat16, interpret=False):
    """Fused decode-attention: one pallas_call per layer, lanes folded into
    lane-blocked programs (grid = ceil(B / lb)). Operand contract as
    decode_attention_xla. ``interpret=True`` runs the kernel in the Pallas
    interpreter (CPU test coverage)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, KVH, HD = cache_k.shape
    G = q.shape[2]
    C = KVH * HD
    NG = KVH * G
    ck2 = cache_k.reshape(B, S, C)
    cv2 = cache_v.reshape(B, S, C)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)
    lb = _pick_lane_block(B, S, C, NG)

    kern = functools.partial(_kernel, scale=float(scale), kvh=KVH, g=G,
                             hd=HD, lb=lb, n_lanes=B)
    att = pl.pallas_call(
        kern,
        grid=(pl.cdiv(B, lb),),
        in_specs=[
            # SMEM blocks may not be sub-blocked: the whole [B, 1] pos
            # array rides along and the kernel indexes it by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lb, KVH, G, HD), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, KVH, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, KVH, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lb, KVH * G, HD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KVH * G, HD), out_dtype),
        interpret=interpret,
    )(pos2, q, k_cur, v_cur, ck2, cv2)
    # the (kvh, g) row order matches the caller's q head layout, so this
    # reshape is a free row-major view
    return att.reshape(B, KVH * G * HD)
