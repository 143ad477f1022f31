"""Requantize an LLM GGUF's matmul weights (llama-quantize analog).

Usage: python scripts/quantize_gguf.py src.gguf dst.gguf [q4_0|q8_0]
"""

import argparse
import sys

sys.path.insert(0, ".")

from miotts_tpu.convert.quantize import requantize_gguf  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("target", nargs="?", default="q4_0",
                   choices=["q4_0", "q8_0"])
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args()
    counts = requantize_gguf(args.src, args.dst, args.target,
                             verbose=args.verbose)
    print(f"wrote {args.dst}: " +
          ", ".join(f"{n}x {t}" for t, n in sorted(counts.items())))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
