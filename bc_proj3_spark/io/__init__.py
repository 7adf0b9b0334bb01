"""Landing-zone IO: run-date file discovery and offline source fetchers."""
