#!/usr/bin/env python3
"""Convert torchaudio WavLM Base+ (wavlm_base_plus.pth) to GGUF."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from miotts_tpu.convert.wavlm import convert_wavlm  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wavlm-weights", required=True)
    p.add_argument("--num-transformer-layers", type=int, default=2)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("-o", "--outfile", required=True)
    args = p.parse_args()
    print(json.dumps(convert_wavlm(args.wavlm_weights, args.outfile,
                                   args.num_transformer_layers, args.sample_rate)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
