"""Pallas TPU kernels for the hot ops (banded local attention, decode
attention). Pure-XLA fallbacks live in ops/; dispatch happens in
ops/attention.py."""
