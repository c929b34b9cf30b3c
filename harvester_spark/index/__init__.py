"""Inverted index build: SPIMI construction, varbyte block codec, catalog."""
