"""Python round trip against a running miotts-tpu server through the same
C ABI bridge a mobile/desktop app links (miotts_tpu/bindings/client.py is
a ctypes wrapper over libmio_tpu_client).

Usage: python examples/python_client.py [base_url] [voice.emb.gguf] [out.wav]
"""

import json
import sys

from miotts_tpu.bindings.client import MioTPUClient


def main() -> int:
    url = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:18089"
    emb = sys.argv[2] if len(sys.argv) > 2 else None
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/python_client_demo.wav"

    with MioTPUClient(url) as c:
        health = json.loads(c.health_json())
        print(f"server ok: parallel={health['parallel']} "
              f"devices={health.get('backend_devices', 1)}")
        c.set_generation_params(n_predict=64, temp=0.8, seed=42)

        key = "py_demo_voice"
        if emb:
            c.add_reference_from_gguf(key, emb)
            print("references:", c.list_references_json())

        c.synthesize_to_wav("Hello from the Python client.", key if emb else "",
                            out, n_predict=48)
        print("wrote", out)

        codes = [(i * 37) % 128 for i in range(24)]
        c.synthesize_codes_to_wav(codes, key if emb else "", out + ".codes.wav")
        print("wrote", out + ".codes.wav")

        if emb:
            c.remove_reference(key)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
