"""Engine operators: allowlist projection, dedup family, similarity search,
multimodal column plumbing."""
