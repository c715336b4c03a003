"""Runtime utilities: RNG, image IO, OBJ IO, profiling, checkpointing, native."""
