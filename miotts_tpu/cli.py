"""llama-tts-mio CLI with the reference's exact flag surface
(tts-mio-cli.cpp:74-118, parse_args :729-931, main :1065-1334).

Modes (reference parity):
- local-LLM text synthesis        (-m + -p/--prompt-file)
- external LLM API synthesis      (--llm-api-url ...)
- codes-in decode, no LLM         (--tts-mio-codes/-in)  [CLI test T6]
- codes-only dump                 (--tts-mio-codes-only) [T5]
- embedding-only reference encode (--tts-mio-embedding-only) [T3]
- reference-dir key management    (--tts-reference-dir, --tts-remove-reference-key)

Env fallbacks: MIO_TTS_LLM_API_URL / _KEY / _MODEL / _HEADERS
(tts-mio-cli.cpp:872-899).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="llama-tts-mio", add_help=False)
    p.add_argument("-mv", "--model-vocoder", dest="model_vocoder", default="")
    p.add_argument("-m", "--model", dest="model", default="")
    p.add_argument("--llm-api-url", default="")
    p.add_argument("--llm-api-key", default="")
    p.add_argument("--llm-api-model", default="")
    p.add_argument("--llm-api-headers", default="")
    p.add_argument("--llm-api-timeout", type=int, default=120)
    p.add_argument("--llm-api-mode", default="openai-chat", choices=["openai-chat", "generic"])
    p.add_argument("-p", "--prompt", default="")
    p.add_argument("--prompt-file", default="")
    p.add_argument("-o", "--output", default="output.wav")
    p.add_argument("-n", "--n-predict", dest="n_predict", type=int, default=400)
    p.add_argument("--temp", type=float, default=0.8)
    p.add_argument("--top-p", dest="top_p", type=float, default=1.0)
    p.add_argument("--top-k", dest="top_k", type=int, default=50)
    p.add_argument("--repeat-penalty", dest="repeat_penalty", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--threads", type=int, default=2)
    p.add_argument("--ctx-size", dest="n_ctx", type=int, default=700)
    p.add_argument("-ngl", "--n-gpu-layers", dest="n_gpu_layers", type=int, default=-1)
    p.add_argument("-fa", "--flash-attn", dest="flash_attn", default="auto")
    p.add_argument("--llm-quant", dest="llm_quant", default="",
                   choices=["", "bf16", "output", "output_int8",
                            "output_int4", "q8_0", "int8",
                            "int8_output_int4"],
                   help="LLM weight numerics (default bf16; int8 = W8A8 "
                        "everywhere; output_int8/output_int4 = W8A8/W4A8 "
                        "logits head only — measured 25%%/36%% off the 0.1B "
                        "decode step; int8_output_int4 stacks both; "
                        "int4 is the aggressive end, like the "
                        "reference's Q4_0 mobile exports)")
    # env fallback MIOTTS_CPU_NATIVE=1/0 (the knob llm_cpu.py documents)
    _cpu_native_env = {"1": "on", "on": "on", "0": "off", "off": "off"}.get(
        os.environ.get("MIOTTS_CPU_NATIVE", "").lower(), "auto")
    p.add_argument("--cpu-native", dest="cpu_native",
                   default=_cpu_native_env,
                   choices=["auto", "on", "off"],
                   help="native int8/int4 CPU LLM decode on CPU-only hosts "
                        "(auto: when the GGUF is Q8_0/Q4_0; env fallback "
                        "MIOTTS_CPU_NATIVE=1)")
    # TPU addition (no reference counterpart — the reference is single-
    # process): shard the codec decode's TIME axis over this many devices
    # (parallel/mesh.make_sp_mesh) so one long utterance uses every chip
    p.add_argument("--sequence-parallel", dest="sequence_parallel",
                   type=int, default=1,
                   help="shard the codec decode's time axis over N devices "
                        "(single-utterance latency on multi-chip hosts; "
                        "codec only — LLM decode is unaffected)")
    p.add_argument("--tts-mio-codes", default="")
    p.add_argument("--tts-mio-codes-in", default="")
    p.add_argument("--tts-mio-codes-out", default="")
    p.add_argument("--tts-mio-codes-only", action="store_true")
    p.add_argument("--tts-reference-audio", default="")
    p.add_argument("--tts-wavlm-model", default="")
    p.add_argument("--tts-max-reference-seconds", type=float, default=20.0)
    p.add_argument("--tts-reference-dir", default="")
    p.add_argument("--tts-remove-reference-key", default="")
    p.add_argument("--tts-mio-embedding-in", default="")
    p.add_argument("-emb", "--tts-mio-default-embedding-in",
                   dest="embedding_default_in", default="")
    p.add_argument("--tts-mio-embedding-out", default="")
    p.add_argument("--tts-mio-embedding-only", action="store_true")
    # TPU addition (no reference counterpart): stream the output WAV while
    # the LLM is still generating — chunked codec prefix re-decodes feed the
    # file incrementally (streaming.stream_text_to_audio); the header's
    # sizes are patched on completion so the artifact is a normal WAV
    p.add_argument("--tts-stream-output", action="store_true")
    p.add_argument("-h", "--help", action="store_true", dest="show_help")
    return p


def _err(msg: str) -> int:
    print(f"error: {msg}", file=sys.stderr)
    return 1


def _apply_platform_env() -> None:
    """MIOTTS_PLATFORM=cpu|tpu forces the JAX platform even where site hooks
    hard-set jax_platforms (some sandboxes override the JAX_PLATFORMS env)."""
    plat = os.environ.get("MIOTTS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def _make_llm_engine(args):
    """LLM engine selection: the XLA engine by default; the native int8/int4
    CPU engine (models/llm_cpu.py) on CPU-only hosts for local real-time
    decode — "auto" picks it when the backend is CPU and the GGUF already
    carries Q8_0 or Q4_0 matmul weights (the shipped MioTTS-0.1B-Q8_0
    format, or a standard llama.cpp 4-bit export)."""
    from .models.llm import LLMEngine

    mode = getattr(args, "cpu_native", "auto")
    if mode != "off":
        import jax

        if jax.default_backend() == "cpu":
            try:
                from .models.llm_cpu import (
                    NativeCpuLLMEngine, gguf_llm_cpu_native_ok,
                )

                if mode == "on" or gguf_llm_cpu_native_ok(args.model):
                    return NativeCpuLLMEngine(args.model)
            except Exception:
                if mode == "on":
                    raise
    return LLMEngine(args.model, quantize=(args.llm_quant or None))


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.show_help:
        parser.print_usage(sys.stderr)
        return 0
    _apply_platform_env()

    # env fallbacks (tts-mio-cli.cpp:872-899)
    args.llm_api_url = args.llm_api_url or os.environ.get("MIO_TTS_LLM_API_URL", "")
    args.llm_api_key = args.llm_api_key or os.environ.get("MIO_TTS_LLM_API_KEY", "")
    args.llm_api_model = args.llm_api_model or os.environ.get("MIO_TTS_LLM_API_MODEL", "")
    args.llm_api_headers = args.llm_api_headers or os.environ.get("MIO_TTS_LLM_API_HEADERS", "")

    if not args.model_vocoder:
        return _err("-mv/--model-vocoder is required")

    # -fa on => prefer the Pallas banded-attention kernel (flash-attn analog)
    if args.flash_attn in ("on", "1", "true", "enabled"):
        os.environ.setdefault("MIOTTS_ATTN_IMPL", "pallas")
    elif args.flash_attn in ("off", "0", "false", "disabled"):
        os.environ.setdefault("MIOTTS_ATTN_IMPL", "dense")

    prompt = args.prompt
    if args.prompt_file:
        try:
            prompt = Path(args.prompt_file).read_text(encoding="utf-8").strip()
        except OSError as e:
            return _err(f"failed to read prompt file: {e}")

    from .pipeline import MioTTSPipeline
    from .runtime.audio_io import save_wav16
    from .runtime.codes_io import load_codes, parse_codes_text, save_codes

    sp_devices = None
    if args.sequence_parallel and args.sequence_parallel > 1:
        import jax

        devs = jax.devices()
        if args.sequence_parallel > len(devs):
            return _err(f"--sequence-parallel {args.sequence_parallel} > "
                        f"{len(devs)} visible devices")
        sp_devices = devs[: args.sequence_parallel]

    try:
        pipe = MioTTSPipeline(args.model_vocoder,
                              wavlm_path=args.tts_wavlm_model or None,
                              sp_devices=sp_devices)
    except Exception as e:
        return _err(f"failed to load MioCodec GGUF: {e}")

    # reference-key removal mode (tts-mio-cli.cpp main)
    if args.tts_remove_reference_key:
        if not args.tts_reference_dir:
            return _err("--tts-reference-dir is required with --tts-remove-reference-key")
        path = Path(args.tts_reference_dir) / f"{args.tts_remove_reference_key}.emb.gguf"
        if path.exists():
            path.unlink()
            print(f"removed reference: {path}", file=sys.stderr)
            return 0
        return _err(f"reference key not found: {args.tts_remove_reference_key}")

    # ---- embedding acquisition -------------------------------------------------
    embedding = None
    if args.tts_reference_audio:
        if not args.tts_wavlm_model:
            return _err("--tts-wavlm-model is required with --tts-reference-audio")
        try:
            embedding = pipe.reference_to_embedding(
                args.tts_reference_audio, args.tts_max_reference_seconds)
        except Exception as e:
            return _err(f"failed to extract reference embedding: {e}")
        if args.tts_mio_embedding_out:
            pipe.save_embedding(args.tts_mio_embedding_out, embedding)
            print(f"saved embedding: {args.tts_mio_embedding_out}", file=sys.stderr)
        if args.tts_mio_embedding_only:
            return 0
    elif args.tts_mio_embedding_in:
        try:
            embedding = pipe.load_embedding(args.tts_mio_embedding_in)
        except Exception as e:
            return _err(f"failed to load embedding GGUF: {e}")
    elif args.embedding_default_in:
        try:
            embedding = pipe.load_embedding(args.embedding_default_in)
        except Exception as e:
            return _err(f"failed to load default embedding GGUF: {e}")

    if args.tts_mio_embedding_only:
        return _err("--tts-mio-embedding-only requires --tts-reference-audio")

    # ---- streaming output mode (TPU addition) -----------------------------------
    # --tts-mio-codes-only skips synthesis entirely, so it takes precedence
    # over streaming output (which exists to overlap synthesis with
    # generation) — fall through to the normal codes-dump path
    if args.tts_stream_output and not args.tts_mio_codes_only:
        if not prompt or args.llm_api_url or not args.model:
            return _err("--tts-stream-output requires -p/--prompt with a local LLM (-m)")
        import time

        from .models.llm import LLMEngine, SamplerParams
        from .runtime.audio_io import (
            encode_pcm16, wav16_header, wav16_streaming_header,
        )
        from .streaming import stream_text_to_audio

        try:
            engine = _make_llm_engine(args)
        except Exception as e:
            return _err(f"failed to load LLM GGUF: {e}")
        sampler = SamplerParams(
            temp=args.temp, top_k=args.top_k, top_p=args.top_p,
            repeat_penalty=args.repeat_penalty, seed=args.seed,
        )
        stats = {"n_samples": 0, "ttfa": None}
        stream_codes: list[int] = []
        pieces: list[np.ndarray] = []
        t0 = time.perf_counter()
        try:
            f = open(args.output, "wb")
        except OSError as e:
            return _err(f"failed to open output wav: {e}")
        try:
            with f:
                f.write(wav16_streaming_header(pipe.sample_rate))

                def on_audio(pcm: np.ndarray) -> None:
                    if stats["ttfa"] is None:
                        stats["ttfa"] = time.perf_counter() - t0
                    buf = encode_pcm16(pcm)
                    f.write(buf)
                    f.flush()
                    stats["n_samples"] += len(buf) // 2
                    pieces.append(np.asarray(pcm, np.float32))

                def on_token(tok, i, is_eog) -> bool:
                    code = engine.token_to_code_or_none(tok)
                    if code is not None:
                        stream_codes.append(code)
                    return True

                _, n_codes = stream_text_to_audio(
                    pipe, engine, prompt, embedding,
                    n_predict=args.n_predict, n_ctx=args.n_ctx,
                    sampler=sampler, on_audio=on_audio, on_token=on_token)
                if not n_codes:
                    return _err("no Mio audio codes were found in token sequence")
                # final peak normalization (mio_tts_synthesize parity,
                # mio-tts-lib.cpp:1299-1310): the streamed chunks could not
                # know the global peak, so rewrite the payload if it clipped
                peak = max((float(np.abs(p).max()) for p in pieces if p.size),
                           default=0.0)
                if peak > 0.98:
                    f.seek(44)
                    gain = np.float32(0.95 / peak)
                    for p in pieces:
                        f.write(encode_pcm16(p * gain))
                # patch the placeholder RIFF/data sizes -> a normal WAV
                f.seek(0)
                f.write(wav16_header(stats["n_samples"], pipe.sample_rate))
        except Exception as e:
            return _err(f"streaming synthesis failed: {e}")
        if args.tts_mio_codes_out:
            try:
                save_codes(args.tts_mio_codes_out, stream_codes)
                print(f"saved codes: {args.tts_mio_codes_out}", file=sys.stderr)
            except (OSError, ValueError) as e:
                return _err(f"failed to save codes: {e}")
        ttfa_ms = (stats["ttfa"] or 0.0) * 1e3
        print(f"synth breakdown: streaming ttfa={ttfa_ms:.1f}ms "
              f"n_codes={n_codes} n_samples={stats['n_samples']}", file=sys.stderr)
        print(f"wrote {args.output} ({stats['n_samples']} samples @ "
              f"{pipe.sample_rate} Hz)", file=sys.stderr)
        return 0

    # ---- codes acquisition -------------------------------------------------------
    codes: list[int] | None = None
    if args.tts_mio_codes:
        try:
            codes = parse_codes_text(args.tts_mio_codes)
        except ValueError as e:
            return _err(str(e))
    elif args.tts_mio_codes_in:
        try:
            codes = load_codes(args.tts_mio_codes_in)
        except (OSError, ValueError) as e:
            return _err(f"failed to load codes: {e}")
    elif prompt:
        if args.llm_api_url:
            from .runtime.llm_api import generate_audio_codes_external

            try:
                codes = generate_audio_codes_external(args, prompt)
            except Exception as e:
                return _err(f"external LLM API request failed: {e}")
        else:
            if not args.model:
                return _err("-m/--model is required with --prompt (or set --llm-api-url)")
            from .models.llm import LLMEngine, SamplerParams

            try:
                engine = _make_llm_engine(args)
            except Exception as e:
                return _err(f"failed to load LLM GGUF: {e}")
            sampler = SamplerParams(
                temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                repeat_penalty=args.repeat_penalty, seed=args.seed,
            )
            tokens = engine.generate_audio_tokens(prompt, n_predict=args.n_predict,
                                                  n_ctx=args.n_ctx, sampler=sampler)
            codes = engine.tokens_to_codes(tokens)
            if not codes:
                return _err("no Mio audio codes were found in token sequence")
    else:
        return _err("no input: provide -p/--prompt, --tts-mio-codes or --tts-mio-codes-in")

    if args.tts_mio_codes_out:
        try:
            save_codes(args.tts_mio_codes_out, codes)
            print(f"saved codes: {args.tts_mio_codes_out}", file=sys.stderr)
        except (OSError, ValueError) as e:
            return _err(f"failed to save codes: {e}")
    if args.tts_mio_codes_only:
        return 0

    # ---- synthesis -----------------------------------------------------------------
    try:
        result = pipe.synthesize(codes, embedding)
    except Exception as e:
        return _err(f"MioCodec decode failed: {e}")

    print(f"synth breakdown: decode={result.decode_ms:.1f}ms "
          f"n_codes={result.n_codes} n_frames={result.n_frames}", file=sys.stderr)

    try:
        save_wav16(args.output, result.audio, result.sample_rate)
    except OSError as e:
        return _err(f"failed to write output wav: {e}")
    print(f"wrote {args.output} ({result.audio.size} samples @ {result.sample_rate} Hz)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
