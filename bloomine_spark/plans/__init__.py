"""Physical-plan introspection and audit helpers."""
