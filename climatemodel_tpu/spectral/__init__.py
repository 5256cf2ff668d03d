"""Spectroscopy: HITRAN tables, humidity/temperature profiles, bands."""
