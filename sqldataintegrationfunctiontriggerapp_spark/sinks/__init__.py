"""Sinks: HTTP POST with classified retry (reference A7-A9, A12, A15)."""
