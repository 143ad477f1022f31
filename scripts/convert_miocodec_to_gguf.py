#!/usr/bin/env python3
"""Convert MioCodec (safetensors + config.yaml) to GGUF.

CLI parity with the reference converter of the same name. Default mode
exports dynamic-global speaker conditioning; --static-preset-mode folds a
preset embedding's AdaLN into fixed norms.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from miotts_tpu.convert.miocodec import convert_miocodec  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("codec_dir", nargs="?", default="",
                   help="MioCodec directory with config.yaml + model.safetensors")
    p.add_argument("--codec-config", default="")
    p.add_argument("--codec-weights", default="")
    p.add_argument("--preset-embedding", default="",
                   help="required only with --static-preset-mode")
    p.add_argument("--dynamic-global-embedding", action="store_true",
                   help="export runtime-conditioning tensors (default mode)")
    p.add_argument("--static-preset-mode", action="store_true")
    p.add_argument("--samples-per-token", type=int, default=960)
    p.add_argument("--vocoder-upsample-rates", default="8,8,2,2,2")
    p.add_argument("-o", "--outfile", required=True)
    args = p.parse_args()

    cfg = args.codec_config
    weights = args.codec_weights
    if args.codec_dir:
        d = Path(args.codec_dir)
        cfg = cfg or str(d / "config.yaml")
        weights = weights or str(d / "model.safetensors")
    if not cfg or not weights:
        p.error("set --codec-config and --codec-weights, or pass CODEC_DIR")

    dynamic = not args.static_preset_mode
    if not dynamic and not args.preset_embedding:
        p.error("--preset-embedding is required with --static-preset-mode")
    if dynamic and args.preset_embedding:
        print("warning: --preset-embedding is ignored in dynamic mode.", file=sys.stderr)

    summary = convert_miocodec(
        cfg, weights, args.outfile,
        dynamic_global=dynamic,
        preset_embedding=args.preset_embedding if not dynamic else "",
        samples_per_token=args.samples_per_token,
        vocoder_upsample_rates=tuple(
            int(x) for x in args.vocoder_upsample_rates.split(",") if x.strip()),
    )
    print(json.dumps(summary, ensure_ascii=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
