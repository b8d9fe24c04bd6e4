"""Utility subsystems: image I/O, statistics, configuration."""
