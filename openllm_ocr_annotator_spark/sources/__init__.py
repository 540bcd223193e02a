"""Table sources: registry + snapshot/manifest layer."""
