"""spittle_tpu: a TPU-native speech-to-text framework.

A from-scratch rebuild of the Spittle dictation stack (reference:
tchamp1912/Spittle) designed TPU-first:

- the audio DSP chain (resample -> VAD -> log-mel) runs as batched JAX/XLA
  computations with Pallas kernels on the hot paths, replacing the
  reference's cpal -> rubato -> Silero-ONNX -> whisper.cpp mel frontend
  (`src-tauri/src/audio_toolkit/`);
- Whisper and Parakeet FastConformer-TDT forward passes are implemented
  from scratch in JAX with Pallas flash attention and static KV caches,
  replacing the transcribe-rs native engines
  (`src-tauri/src/managers/transcription.rs:444-534`);
- a batching serving layer coalesces concurrent push-to-talk sessions and
  shards across chips with `jax.sharding`/`pjit` over a device `Mesh`;
- the app-shell logic (pipeline state machine, text filters, jargon,
  settings, history, model manager) is ported with behavior parity.
"""

__version__ = "0.1.0"
