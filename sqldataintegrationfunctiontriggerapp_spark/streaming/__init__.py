"""Structured Streaming layer: pipeline wiring (foreachBatch change->project
->post), watermark/window analytics, streaming dedup."""
