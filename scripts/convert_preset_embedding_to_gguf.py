#!/usr/bin/env python3
"""Convert a speaker-embedding preset (.pt / .npz) to *.emb.gguf.

Parity with the reference converter: tensor 'mio.global_embedding', KV
'mio.embedding.dim' (mio-tts-lib.cpp:288-347 load contract)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from miotts_tpu.convert.miocodec import _load_embedding  # noqa: E402
from miotts_tpu.gguf.writer import save_embedding_gguf  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("embedding", help="path to .pt or .npz preset embedding")
    p.add_argument("-o", "--outfile", required=True)
    args = p.parse_args()
    emb = _load_embedding(Path(args.embedding))
    save_embedding_gguf(args.outfile, emb)
    print(json.dumps({"outfile": str(Path(args.outfile).resolve()),
                      "embedding_dim": int(emb.size)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
