"""Host utilities: grids, timing, checkpointing."""
