"""Checkpoint -> GGUF converters (MioCodec, WavLM Base+, preset embeddings).

Emit the same tensor contract the reference converters produce
(``scripts/convert_*_to_gguf.py`` in the reference repo), written through
this framework's own GGUF writer. Torch is used only for checkpoint reading;
all math is numpy.
"""
