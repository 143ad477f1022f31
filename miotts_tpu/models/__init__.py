"""Model engines: MioCodec decoder, global (speaker) encoder, WavLM extractor,
and the MioTTS codec-token LLM."""
