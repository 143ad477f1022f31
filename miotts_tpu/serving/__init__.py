"""Serving: HTTP server with /mio/* + /v1/audio/* parity, reference cache,
SSE streaming, and batched synthesis lanes."""
