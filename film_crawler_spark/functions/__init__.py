"""Column-level primitives: URLs, images, text analysis."""
