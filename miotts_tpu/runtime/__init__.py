"""Host-side runtime: audio/codes/embedding I/O, resampling, timing."""
