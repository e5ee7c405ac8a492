"""Host-side utilities: WAV I/O, ring buffers, telemetry, config."""
