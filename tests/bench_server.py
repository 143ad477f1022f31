#!/usr/bin/env python3
"""Server concurrency/latency benchmark — equivalent of the reference's
tests/test_performance.sh: sweeps concurrency levels against
POST /mio/tts/stream and reports success rate, RPS, latency percentiles
and TTFB into summary.csv.

Usage:
  python tests/bench_server.py --url http://127.0.0.1:18089 \
      --reference-key preset [--concurrency 1,2,4,8,16,32] \
      [--requests-per-worker 2] [--text "..."] [--codes 1,2,3]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import csv
import json
import os
import statistics
import sys
import time
import urllib.request


def one_request(url: str, payload: bytes) -> tuple[bool, float, float, float]:
    """Returns (ok, total_sec, ttfb_sec, llm_ms)."""
    req = urllib.request.Request(
        f"{url}/mio/tts/stream", data=payload,
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            first = r.read(1)
            ttfb = time.perf_counter() - t0
            while r.read(65536):
                pass
            ok = bool(first)
        return ok, time.perf_counter() - t0, ttfb, float("nan")
    except Exception:
        return False, time.perf_counter() - t0, float("nan"), float("nan")


def one_sse_request(url: str, payload: bytes) -> tuple[bool, float, float, float]:
    """SSE request. Returns (ok, total_sec, first_audio_sec, llm_ms):
    first_audio_sec = time to the first audio bytes (audio_chunk event with
    stream_audio, else the audio_data blob) — the server-level TTFA;
    llm_ms = the per-request generation time the server reports in
    generation_complete (amortized under continuous batching)."""
    req = urllib.request.Request(
        f"{url}/mio/tts/stream", data=payload,
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    first_audio = float("nan")
    llm_ms = float("nan")
    got_audio = False
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            buf = b""
            while True:
                # read1: return as soon as bytes are available — read(n)
                # on a chunked response blocks until it fills n bytes
                # ACROSS chunk boundaries, which holds small early SSE
                # events hostage to later ones and inflates measured TTFA
                chunk = r.read1(4096)
                if not chunk:
                    break
                buf += chunk
                while b"\n\n" in buf:
                    block, buf = buf.split(b"\n\n", 1)
                    lines = block.decode("utf-8", "replace").split("\n")
                    ev = next((l[7:] for l in lines
                               if l.startswith("event: ")), "")
                    data = next((l[6:] for l in lines
                                 if l.startswith("data: ")), "")
                    if ev in ("audio_chunk", "audio_data"):
                        got_audio = True
                        if first_audio != first_audio:
                            first_audio = time.perf_counter() - t0
                            if os.environ.get("MIOTTS_TTFA_DEBUG"):
                                print(f"client_ttfa: abs_t0={t0 * 1e3:.1f} "
                                      f"abs_first_audio="
                                      f"{(t0 + first_audio) * 1e3:.1f}",
                                      file=sys.stderr)
                    elif ev == "generation_complete":
                        try:
                            llm_ms = float(json.loads(data).get("llm_ms"))
                        except (ValueError, TypeError):
                            pass
                    elif ev == "error":
                        return (False, time.perf_counter() - t0,
                                first_audio, llm_ms)
        return got_audio, time.perf_counter() - t0, first_audio, llm_ms
    except Exception:
        return False, time.perf_counter() - t0, first_audio, llm_ms


def percentile(xs: list[float], p: float) -> float:
    if not xs:
        return float("nan")
    xs = sorted(xs)
    k = min(len(xs) - 1, int(round(p / 100.0 * (len(xs) - 1))))
    return xs[k]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:18089")
    ap.add_argument("--reference-key", default="preset")
    ap.add_argument("--text", default="Hello, this is a benchmark request.")
    ap.add_argument("--codes", default="", help="CSV codes (skips the LLM)")
    ap.add_argument("--n-predict", type=int, default=200)
    ap.add_argument("--concurrency", default="1,2,4,8,16,32")
    ap.add_argument("--requests-per-worker", type=int, default=2)
    ap.add_argument("--mode", default="binary",
                    choices=["binary", "sse", "stream-audio", "overlap"],
                    help="binary: chunked WAV after full synthesis; "
                         "sse: token events (measures amortized llm_ms under "
                         "continuous batching); stream-audio: SSE with "
                         "incremental PCM (ttfb column = server-level TTFA); "
                         "overlap: binary with overlap_synthesis=true "
                         "(LLM-interleaved codec decode, full WAV response)")
    ap.add_argument("--out", default="summary.csv")
    args = ap.parse_args()

    body: dict = {"reference_key": args.reference_key}
    if args.codes:
        body["codes"] = [int(c) for c in args.codes.split(",")]
    else:
        body["text"] = args.text
        body["n_predict"] = args.n_predict
    if args.mode in ("sse", "stream-audio"):
        body["stream_tokens"] = True
    if args.mode == "stream-audio":
        body["stream_audio"] = True
    if args.mode == "overlap":
        body["overlap_synthesis"] = True
    payload = json.dumps(body).encode()

    def run_one(_):
        if args.mode in ("binary", "overlap"):
            return one_request(args.url, payload)
        return one_sse_request(args.url, payload)

    # column semantics per mode: binary/overlap = first response byte; sse =
    # the final audio_data blob (== full synthesis latency, NOT first-byte);
    # stream-audio = first incremental PCM chunk (true server-level TTFA)
    ttfb_col = {"binary": "ttfb_p50_ms", "overlap": "ttfb_p50_ms",
                "sse": "audio_blob_p50_ms",
                "stream-audio": "ttfa_p50_ms"}[args.mode]
    rows = [("concurrency", "requests", "ok", "rps",
             "avg_ms", "p50_ms", "p90_ms", "p95_ms", "p99_ms", ttfb_col,
             "llm_ms_p50")]
    for conc in [int(c) for c in args.concurrency.split(",")]:
        n_req = conc * args.requests_per_worker
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(conc) as ex:
            results = list(ex.map(run_one, range(n_req)))
        wall = time.perf_counter() - t0
        oks = [r for r in results if r[0]]
        lats = [r[1] * 1e3 for r in oks]
        ttfbs = [r[2] * 1e3 for r in oks if r[2] == r[2]]
        llms = [r[3] for r in oks if r[3] == r[3]]
        row = (conc, n_req, len(oks), round(len(oks) / wall, 2),
               round(statistics.fmean(lats), 1) if lats else "nan",
               round(percentile(lats, 50), 1), round(percentile(lats, 90), 1),
               round(percentile(lats, 95), 1), round(percentile(lats, 99), 1),
               round(percentile(ttfbs, 50), 1) if ttfbs else "nan",
               round(percentile(llms, 50), 1) if llms else "nan")
        rows.append(row)
        print(" ".join(f"{k}={v}" for k, v in zip(rows[0], row)), file=sys.stderr)

    with open(args.out, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
