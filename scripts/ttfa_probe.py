#!/usr/bin/env python3
"""Client-side TTFA timeline probe: one SSE stream-audio request, printing
the elapsed ms to response headers, each SSE event type's first arrival, and
total. Aligns with the server's ttfa_debug stderr lines (same monotonic
clock) to localize served-TTFA gaps. Usage:
    python scripts/ttfa_probe.py [url] [n_requests]
"""
import json
import sys
import time
import urllib.request


def probe(url: str) -> None:
    body = {"reference_key": "preset",
            "text": "Hello, this is a benchmark request.",
            "n_predict": 200, "stream_tokens": True, "stream_audio": True}
    req = urllib.request.Request(
        f"{url}/mio/tts/stream", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    seen: dict[str, float] = {}
    ev_count: dict[str, int] = {}
    with urllib.request.urlopen(req, timeout=300) as r:
        seen["headers"] = time.perf_counter() - t0
        buf = b""
        while True:
            # read1, not read: read(n) on chunked blocks until n bytes
            # accumulate across chunk boundaries, delaying small events
            chunk = r.read1(4096)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                block, buf = buf.split(b"\n\n", 1)
                lines = block.decode("utf-8", "replace").split("\n")
                ev = next((ln[7:] for ln in lines
                           if ln.startswith("event: ")), "")
                if ev:
                    seen.setdefault(ev, time.perf_counter() - t0)
                    ev_count[ev] = ev_count.get(ev, 0) + 1
    seen["done"] = time.perf_counter() - t0
    print("probe: abs_t0=%.1f " % (t0 * 1e3)
          + " ".join(f"{k}={v * 1e3:.1f}ms" for k, v in seen.items())
          + " counts=" + json.dumps(ev_count))


if __name__ == "__main__":
    url = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:18202"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    for _ in range(n):
        probe(url)
