"""Framework utilities: checkpointing, metrics, RNG seeding."""
