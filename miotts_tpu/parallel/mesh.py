"""Device mesh + sharding rules for the MioTTS stack.

Axes:
- ``dp``: data/request parallelism — server batch lanes (the TPU-native
  replacement for the reference's ``-np`` worker slots,
  tts-mio-server.cpp:2713-2777) and multi-chip request fan-out.
- ``tp``: tensor parallelism for the LLM — megatron layout: QKV/gate/up
  column-parallel (output features sharded), attn-out/down row-parallel
  (input features sharded); XLA inserts the psum on the row-parallel matmul
  from the shardings alone.

The 0.1B production model runs replicated on one chip; ``tp`` exists for the
1B+ stretch config (BASELINE.json config 5).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: int | None = None, tp: int | None = None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: tp=1, dp=all devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tp is None:
        tp = 1
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp*tp ({dp}*{tp}) != n_devices ({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_sp_mesh(devices=None, sp: int | None = None) -> Mesh:
    """1-D ("sp",) mesh for sequence-parallel codec decodes.

    The reference has no analog (single-process inference, SURVEY §2); on a
    multi-chip host this is the latency lever for ONE long utterance: dp
    fan-out shards *requests*, so a single request uses one chip — sp shards
    the request's own time axis instead, and GSPMD derives the conv halo
    exchanges / norm-stat reductions from the constraints in
    models/miocodec.codec_decode_spec."""
    if devices is None:
        devices = jax.devices()
    if sp is not None:
        if sp > len(devices):  # a stripped assert would silently undersize
            raise ValueError(f"sp={sp} > {len(devices)} devices")
        devices = devices[:sp]
    return Mesh(np.asarray(devices), axis_names=("sp",))


def _vocab_axis_specs(mesh: Mesh, weights: Any) -> tuple:
    """(token_embd_spec, output_spec): shard the vocab axis over tp.

    The 152k-row embedding and logits head are the two biggest tensors in
    the model (right at 1B+ scale they dominate HBM); both shard on the
    vocab axis — GSPMD inserts the masked-gather psum for the lookup and
    the logits all-gather for sampling. The head may be stored [D, V]
    (feature-major, TPU) or [V, D] (token-major, CPU hosts / tied embd), so
    the vocab axis is identified against dim (from attn_norm [L, D]);
    non-tp-divisible vocab (tiny test models) stays replicated."""
    tp = mesh.shape.get("tp", 1)
    embd = weights.get("token_embd")
    an = weights.get("attn_norm")
    dim = None if an is None else (
        an["q"].shape[-1] if isinstance(an, dict) else an.shape[-1])
    embd_spec = P(None, None)
    if tp > 1 and embd is not None and not isinstance(embd, dict):
        if embd.shape[0] % tp == 0 and embd.shape[0] != embd.shape[1]:
            embd_spec = P("tp", None)  # [V, D]
    ow = weights.get("output")
    out_spec = P(None, None)
    if tp > 1 and ow is not None:
        if isinstance(ow, dict):  # quant leaves are [D, V]-derived
            payload = [ow[k] for k in ("q8", "q4i8", "q4", "q") if k in ow]
            if not payload:
                raise ValueError(
                    f"unrecognized quantized head leaf keys {sorted(ow)}")
            v = payload[0].shape[-1]
            if v % tp == 0:
                out_spec = P(None, "tp")
        else:
            a, b = ow.shape
            if a != b and dim is not None:
                if b == dim and a % tp == 0:      # token-major [V, D]
                    out_spec = P("tp", None)
                elif a == dim and b % tp == 0:    # feature-major [D, V]
                    out_spec = P(None, "tp")
    return embd_spec, out_spec


def llm_weight_shardings(mesh: Mesh, weights: Any) -> Any:
    """PartitionSpec pytree for the LLM weight dict (models/llm.py layout:
    stacked [n_layers, ...], linear weights pre-transposed to [in, out])."""
    embd_spec, out_spec = _vocab_axis_specs(mesh, weights)
    specs = {
        "token_embd": embd_spec,           # [V, D] vocab-sharded over tp
        "attn_norm": P(None, None),
        "wq": P(None, None, "tp"),         # [L, D, H*hd] column-parallel
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        # fused [L, D, (H+2KV)*hd]: still column-parallel; the q/k/v segment
        # slices after the matmul cross shard boundaries, which GSPMD
        # reshards automatically (exact, collective-cost only)
        "wqkv": P(None, None, "tp"),
        "wo": P(None, "tp", None),         # [L, H*hd, D] row-parallel
        "ffn_norm": P(None, None),
        "w_gate": P(None, None, "tp"),     # [L, D, FF]
        "w_up": P(None, None, "tp"),
        "w_gateup": P(None, None, "tp"),   # fused [L, D, 2*FF]
        "w_down": P(None, "tp", None),     # [L, FF, D]
        "bq": P(None, "tp"),
        "bk": P(None, "tp"),
        "bv": P(None, "tp"),
        "bqkv": P(None, "tp"),
        "q_norm": P(None, None),
        "k_norm": P(None, None),
        "output_norm": P(None),
        "output": out_spec,                # [D, V] vocab-sharded over tp
    }
    def leaf_specs(k, v):
        spec = specs[k]
        if not isinstance(v, dict):
            return NamedSharding(mesh, spec)
        # quantized leaves (models/llm.py tq): the int8 payload shards like
        # the dense weight; scales follow the sharded axis they vary along.
        # W8A8 {"q8": [..., K, N], "s8": [..., N]}: per-N scale -> shard only
        # when N (the last weight axis) is column-parallel.
        # Q8_0 {"q": [..., K, N], "s": [..., K//32, N]}: scale blocks run
        # down K -> same spec as the weight.
        out = {}
        for name, arr in v.items():
            if name in ("q", "q8", "q4i8", "q4"):
                out[name] = NamedSharding(mesh, spec)
            elif name == "s":
                out[name] = NamedSharding(mesh, spec)
            elif name in ("s8", "s4"):
                # drop the K axis from the spec: P(l, k, n) -> P(l, n)
                parts = list(spec)
                n_axis = parts[-1] if len(parts) >= 1 else None
                lead = parts[:-2]
                out[name] = NamedSharding(mesh, P(*lead, n_axis))
            else:  # pragma: no cover - future leaf kinds stay replicated
                out[name] = NamedSharding(mesh, P())
        return out

    out = {}
    for k, v in weights.items():
        if v is None:
            out[k] = None
        else:
            out[k] = leaf_specs(k, v)
    return out


def llm_data_shardings(mesh: Mesh) -> dict:
    """Shardings for activations/caches: batch lanes over dp, KV heads over tp."""
    return {
        "tokens": NamedSharding(mesh, P("dp", None)),
        "lengths": NamedSharding(mesh, P("dp")),
        "cache": NamedSharding(mesh, P(None, "dp", None, "tp", None)),
        "logits": NamedSharding(mesh, P("dp", None)),
    }


def shard_llm_weights(mesh: Mesh, weights: Any) -> Any:
    shardings = llm_weight_shardings(mesh, weights)

    def put(v, s):
        if v is None:
            return None
        if isinstance(v, dict):
            return {name: jax.device_put(arr, s[name]) for name, arr in v.items()}
        return jax.device_put(v, s)

    return {k: put(v, shardings[k]) for k, v in weights.items()}


def codec_data_sharding(mesh: Mesh):
    """Codec decode shards over batch lanes only (model is small; weights
    replicated)."""
    return NamedSharding(mesh, P("dp", None))


# ---------------------------------------------------------------------------
# serving fan-out (--mio-backend-devices)
# ---------------------------------------------------------------------------

def parse_backend_devices(spec: str):
    """Resolve the ``--mio-backend-devices`` flag to a device list.

    The reference takes comma-separated GGML backend names and round-robins
    worker slots over them (tts-mio-server.cpp:950-984, 2659-2746); the
    TPU-native equivalent is a dp mesh over the named chips, with batch
    lanes sharded across it. Accepted forms:
      ""            -> None (single default device)
      "all"         -> every visible device
      "0,2,3"       -> devices by index (a single "2" is index 2, not a
                       count — a bare integer must not change meaning when
                       a comma appears)
      "TPU:0,TPU:1" -> devices by platform:id name (case-insensitive)
    """
    spec = (spec or "").strip()
    if not spec:
        return None
    devices = jax.devices()
    if spec.lower() == "all":
        return list(devices)
    parts = [p.strip() for p in spec.split(",") if p.strip()]
    out = []
    by_name = {f"{d.platform}:{d.id}".lower(): d for d in devices}
    for p in parts:
        if p.isdigit():
            i = int(p)
            if i >= len(devices):
                raise ValueError(f"device index {i} out of range "
                                 f"({len(devices)} visible)")
            out.append(devices[i])
        elif p.lower() in by_name:
            out.append(by_name[p.lower()])
        else:
            raise ValueError(
                f"unknown device {p!r}; visible: {sorted(by_name)}")
    return out


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """device_put every array leaf fully replicated over the mesh (weights
    of models small enough to copy per chip: the codec and the 0.1B LLM)."""
    s = NamedSharding(mesh, P())

    def put(v):
        if v is None:
            return None
        return jax.device_put(v, s)

    return jax.tree.map(put, tree)


def gen_state_shardings(mesh: Mesh) -> dict:
    """Per-leaf shardings for a batched GenState (models/llm.py): lanes over
    dp, KV heads over tp (tp=1 in dp-only serving meshes)."""
    return {
        "logits": NamedSharding(mesh, P("dp", None)),
        "cache_k": NamedSharding(mesh, P(None, "dp", None, "tp", None)),
        "cache_v": NamedSharding(mesh, P(None, "dp", None, "tp", None)),
        "pos": NamedSharding(mesh, P("dp")),
        "ring": NamedSharding(mesh, P("dp", None)),
        "ring_idx": NamedSharding(mesh, P()),
        "done": NamedSharding(mesh, P("dp")),
        "key": NamedSharding(mesh, P("dp", None)),
    }


def shard_gen_state(mesh: Mesh, state):
    sh = gen_state_shardings(mesh)
    return type(state)(**{
        k: jax.device_put(getattr(state, k), sh[k]) for k in state._fields})
