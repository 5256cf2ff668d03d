"""Simulation models: grey/real-gas columns, shallow water, sweep harnesses."""
