"""Physical-plan introspection and quality assertions."""
